from .merge import insert_if_absent, scd2_apply_versions, upsert

__all__ = ["upsert", "insert_if_absent", "scd2_apply_versions"]
