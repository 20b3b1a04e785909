from .catalog import REGISTRY, QuerySpec, oracle_sql, queries, register

__all__ = ["REGISTRY", "QuerySpec", "register", "queries", "oracle_sql"]
