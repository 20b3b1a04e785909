from .coercion import safe_bool, safe_int, safe_numeric
from .parity import dsum, money

__all__ = ["safe_bool", "safe_int", "safe_numeric", "dsum", "money"]
