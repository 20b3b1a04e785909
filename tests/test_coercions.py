"""Pin the lenient coercion semantics (SURVEY §2.7 F8-F10, §2.8 JS1).

These are the reference's distinctive edge cases (reference
transform.py:12-104): "yes"-style booleans, string-encoded numbers,
whole-payload-as-string, non-dict garbage.  Divergences from the
reference (documented in functions/coercion.py) are pinned too.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipe_spark.functions.coercion import safe_bool, safe_int, safe_numeric
from etl_pipe_spark.functions.json_flatten import flatten_input_data


def _eval(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    return [r.out for r in df.select(fn(F.col("raw")).alias("out")).collect()]


BOOL_CASES = [
    ("true", True), ("TRUE", True), ("True", True), ("yes", True), ("YES", True),
    ("1", True), ("no", False), ("false", False), ("0", False), ("0.0", False),
    ("2", True),  # divergence: numeric branch (bool(2)) wins post-stringification
    ("-1", True), ("garbage", False), (None, None), ("", False),
]

INT_CASES = [
    ("42", 42), ("-7", -7), ("3.7", 3), ("-3.7", -3),  # truncate toward zero
    ("0", 0), ("1e2", 100), ("garbage", None), (None, None), ("", None),
    # Java literals the JVM parser accepts but Python int()/float()
    # reject (r6 verdict item 1) — must degrade to NULL:
    ("0D", None), ("3.7f", None), ("1F", None), ("0x1p3", None),
    ("0x10", None), ("12L", None),
    ("1_000", 1000),  # PEP-515 underscores: Python int() accepts
    (" 42 ", 42),
]

NUM_CASES = [
    ("3.7", 3.7), ("-0.5", -0.5), ("1e3", 1000.0), ("42", 42.0),
    ("garbage", None), (None, None), ("", None),
    # Java literals -> NULL, exactly like Python float() raising:
    ("0D", None), ("3.7f", None), ("1F", None), ("0x1p3", None),
    ("0x10", None), ("1d", None), (".5F", None),
    ("1_000", 1000.0), ("1_0.5_5e1_0", 10.55e10),  # PEP-515 underscores
    ("1__0", None), ("_1", None), ("1_", None),    # invalid placements
    ("5.", 5.0), (".5", 0.5), ("+.5e2", 50.0), (" -2.5 ", -2.5),
]


def test_safe_bool(spark):
    got = _eval(spark, safe_bool, [v for v, _ in BOOL_CASES])
    assert got == [e for _, e in BOOL_CASES]


def test_safe_int(spark):
    got = _eval(spark, safe_int, [v for v, _ in INT_CASES])
    assert got == [e for _, e in INT_CASES]


def test_safe_numeric(spark):
    got = _eval(spark, safe_numeric, [v for v, _ in NUM_CASES])
    assert got == [e for _, e in NUM_CASES]


def test_safe_numeric_special_spellings_match_python_float(spark):
    """Python float() accepts inf/infinity/nan (any case, sign, outer
    whitespace); every such spelling must parse identically here —
    including signed NaN, which Spark's raw cast rejects and
    safe_numeric normalizes."""
    import math

    spellings = [
        "inf", "Inf", "INFINITY", "-infinity", "+inf", " -Inf ",
        "nan", "NaN", "-nan", "+NAN", " nan ",
        "infi", "na", "+-inf",  # garbage on both sides
    ]
    got = _eval(spark, safe_numeric, spellings)
    for raw, out in zip(spellings, got):
        try:
            expect = float(raw)
        except ValueError:
            expect = None
        if expect is None:
            assert out is None, (raw, out)
        elif math.isnan(expect):
            assert out is not None and math.isnan(out), (raw, out)
        else:
            assert out == expect, (raw, out)


@pytest.mark.parametrize(
    "payload,expect",
    [
        # string-encoded numbers + yes/no booleans
        (
            '{"value": "3.7", "start_year": "2020", "actuals_flag": "yes", "pfs_flag": "no"}',
            {"inp_value": 3.7, "inp_start_year": 2020, "inp_actuals_flag": True, "inp_pfs_flag": False},
        ),
        # native JSON types incl. 0/1 booleans
        (
            '{"value": 12.5, "end_year": 2025, "actuals_flag": 0, "ppc_flag": 1}',
            {"inp_value": 12.5, "inp_end_year": 2025, "inp_actuals_flag": False, "inp_ppc_flag": True},
        ),
        # non-dict garbage -> every typed field NULL (reference transform.py:58-61)
        ("not json at all", {"inp_value": None, "inp_actuals_flag": None, "inp_unit": None}),
        ('"a bare string"', {"inp_value": None, "inp_actuals_flag": None}),
        # unknown keys ignored, known missing keys NULL
        ('{"unknown": 1, "unit": "mg"}', {"inp_unit": "mg", "inp_value": None}),
    ],
)
def test_flatten_input_data(spark, payload, expect):
    df = spark.createDataFrame([(payload,)], "payload string")
    row = df.select(*flatten_input_data(F.col("payload"))).collect()[0]
    for k, v in expect.items():
        assert row[k] == v, f"{k}: got {row[k]!r}, want {v!r} for payload {payload!r}"
    assert row["input_data_full_text"] == payload
