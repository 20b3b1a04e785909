"""Lenient scalar coercions as native column expressions (no Python UDFs).

The reference coerces untrusted JSON payload values with four small
Python helpers (reference transform.py:12-47: safe_get / safe_bool /
safe_numeric / safe_int).  Spark's plain ``cast`` is stricter (ANSI
mode errors; non-ANSI maps "yes" -> NULL), so each helper is re-built
as a ``when`` ladder over ``try_cast`` — whole-stage-codegen'd JVM
expressions, ANSI-safe, zero Python on the hot path.

All helpers take a STRING column (payload fields are parsed as string
first — see schemas.INPUT_DATA_PAYLOAD) and return the typed column.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# A JSON scalar that was numeric (or a numeric string).  Used by
# safe_bool to distinguish Python's `bool(number)` branch from its
# string branch after from_json has stringified everything.
_NUMERIC_RE = r"^-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?$"


def safe_bool(col: Column) -> Column:
    """Lenient bool (reference transform.py:19-27).

    * NULL -> NULL
    * "true"/"false" (JSON booleans arrive stringified) -> themselves
    * numeric -> value != 0   (Python ``bool(val)``: 0 -> False, 2 -> True)
    * other string -> lower() in ("true", "1", "yes")  ("no" -> False)

    Divergence note: after JSON stringification the string "2" and the
    number 2 are indistinguishable; we take the numeric branch
    (2 -> True) whereas the reference's string branch would give False.
    Pinned in tests/test_coercions.py.
    """
    num = col.try_cast("double")
    return (
        F.when(col.isNull(), F.lit(None).cast("boolean"))
        .when(col.rlike(_NUMERIC_RE), num != 0)
        .otherwise(F.lower(col).isin("true", "1", "yes"))
    )


def safe_numeric(col: Column) -> Column:
    """Lenient float (reference transform.py:30-37): ``float(val)`` or NULL.

    ``try_cast`` to double matches Python ``float`` including special
    spellings: "inf" / "infinity" / "nan" parse case-insensitively,
    signed and whitespace-trimmed, on both sides (verified on Spark
    4.1 — SPARK-27768 special floating-point literals).  The one gap is
    SIGNED NaN: Python ``float("-nan")`` == nan while Spark's cast
    rejects the sign — normalized here so both agree.  The full matrix
    is pinned in tests/test_coercions.py.
    """
    signed_nan = F.lower(F.trim(col)).isin("-nan", "+nan")
    return F.when(signed_nan, F.lit("nan")).otherwise(col).try_cast("double")


def safe_int(col: Column) -> Column:
    """Lenient int (reference transform.py:40-47): ``int(val)`` or NULL.

    Python raises on ``int("3.7")`` (-> NULL) but truncates ``int(3.7)``
    (-> 3).  After stringification both look like "3.7"; like the
    reference's JSON path (json numbers land as Python int/float, so
    3.7 -> truncate) we truncate any numeric, and NULL out garbage.
    Integral strings ("42") cast directly.
    """
    direct = col.try_cast("long")
    via_double = col.try_cast("double").try_cast("long")
    # cast double->long truncates toward zero — matching Python int().
    return F.coalesce(direct, via_double)


def safe_get(struct_col: Column, field: str) -> Column:
    """Reference transform.py:12-17 — tolerant dict lookup.

    Vanishes in Spark: field access on a NULL struct (unparseable or
    non-dict JSON) is NULL naturally.
    """
    return struct_col.getField(field)
