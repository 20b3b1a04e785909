"""Property-based coercion tests (hypothesis): the safe_* ladders must
agree with an executable Python model of the reference semantics
(reference transform.py:19-47, with the documented stringification
divergences) over arbitrary inputs — not just the hand-picked cases.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from etl_pipe_spark.functions.coercion import _NUMERIC_RE, safe_bool, safe_int, safe_numeric

# mix of adversarial shapes: plain words, numeric strings, bool words,
# whitespace, signs, scientific notation, unicode
_raw = st.one_of(
    st.none(),
    st.sampled_from(["true", "TRUE", "false", "yes", "no", "0", "1", "2", "-1",
                     "3.7", "-3.7", "1e3", "-2.5e-1", "", " ", "NaN", "inf"]),
    st.text(max_size=12),
    st.integers(-10**12, 10**12).map(str),
    st.floats(allow_nan=False, allow_infinity=False, width=32).map(repr),
)

_num_re = re.compile(_NUMERIC_RE)


def _model_bool(v):
    if v is None:
        return None
    if _num_re.fullmatch(v):
        return float(v) != 0
    return v.lower() in ("true", "1", "yes")


def _model_numeric(v):
    if v is None:
        return None
    try:
        return float(v)
    except ValueError:
        return None


def _model_int(v):
    if v is None:
        return None
    try:
        return int(v)
    except ValueError:
        f = _model_numeric(v)
        if f is None or f != f or abs(f) > 2**63 - 1:
            return None
        return int(f)  # truncation toward zero, like Spark double->long


def _run(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    return [r.out for r in df.select(fn(F.col("raw")).alias("out")).collect()]


@settings(max_examples=30, deadline=None)
@given(st.lists(_raw, min_size=1, max_size=40))
def test_safe_bool_matches_model(spark, values):
    assert _run(spark, safe_bool, values) == [_model_bool(v) for v in values]


@settings(max_examples=30, deadline=None)
@given(st.lists(_raw, min_size=1, max_size=40))
def test_safe_numeric_matches_model(spark, values):
    got = _run(spark, safe_numeric, values)
    want = [_model_numeric(v) for v in values]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        if w is not None and w != w:  # NaN
            assert g != g
        else:
            assert g == w


@settings(max_examples=30, deadline=None)
@given(st.lists(_raw, min_size=1, max_size=40))
def test_safe_int_matches_model(spark, values):
    assert _run(spark, safe_int, values) == [_model_int(v) for v in values]
