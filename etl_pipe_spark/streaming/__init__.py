from .watermark import WatermarkStore

__all__ = ["WatermarkStore"]
