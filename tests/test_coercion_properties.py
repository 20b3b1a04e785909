"""Property-based coercion tests (hypothesis): the safe_* ladders must
agree with an executable Python model of the reference semantics
(reference transform.py:19-47, with the documented stringification
divergences) over arbitrary inputs — not just the hand-picked cases.

The model is ``float(val)`` / ``int(val)`` (the reference helpers)
plus the two divergences coercion.py documents:

* only ASCII spellings of the Python numeric grammar are accepted —
  exotic inputs Python would also parse (non-ASCII decimal digits)
  degrade to NULL;
* integers ride Spark's 64-bit long — beyond-range values NULL (or
  saturate where Spark's double->long cast saturates) instead of
  returning arbitrary-precision ints.

The example database is seeded with the Java-literal family that
try_cast accepts but Python rejects ("0D", "3.7f", "1F", "0x1p3") —
the exact bug class this suite exists to catch.
"""

from __future__ import annotations

import re

from hypothesis import example, given, settings, strategies as st

from pyspark.sql import functions as F

from etl_pipe_spark.functions.coercion import (
    _NUMERIC_RE,
    _WS_CHARS,
    PY_FLOAT_GRAMMAR,
    PY_INT_GRAMMAR,
    safe_bool,
    safe_int,
    safe_numeric,
)


def _empirical_float_ws() -> str:
    """The whitespace set Python's float() ACTUALLY strips, derived by
    calling float() itself over the BMP — deliberately NOT the
    engine's _WS_CHARS constant, so engine and model cannot certify a
    shared wrong trim set (the r7 ADVICE finding: \\x1c-\\x1f are
    str.isspace() yet float() rejects them, and a model that reused
    the engine constant was blind to it)."""
    out = []
    for i in range(0x10000):
        ch = chr(i)
        if not ch.isspace() and ch not in "\x85\xa0":
            continue  # float strips only whitespace-class chars
        try:
            float(ch + "1")
        except ValueError:
            continue
        out.append(ch)
    return "".join(out)


_MODEL_WS = _empirical_float_ws()


def test_engine_ws_constant_matches_python_float():
    """The engine's trim set must equal float()'s empirical strip set —
    a char float() rejects must not be trimmed (else "\\x1c42" would
    coerce where the reference raises), and a char float() strips must
    be trimmed (else " 42" would NULL where the reference parses)."""
    assert set(_WS_CHARS) == set(_MODEL_WS), sorted(
        hex(ord(c)) for c in set(_WS_CHARS) ^ set(_MODEL_WS)
    )

_JAVA_LITERALS = ["0D", "3.7f", "1F", "0x1p3", "0x10", "12L", "1d", ".5F"]

# mix of adversarial shapes: plain words, numeric strings, bool words,
# whitespace, signs, scientific notation, unicode, Java literals,
# PEP-515 underscores
_raw = st.one_of(
    st.none(),
    st.sampled_from(["true", "TRUE", "false", "yes", "no", "0", "1", "2", "-1",
                     "3.7", "-3.7", "1e3", "-2.5e-1", "", " ", "NaN", "inf",
                     "-nan", "+Infinity", "1_000", "1__0", "_1", "1_", "5.",
                     ".5", "+.5e1_0", "9" * 19, "9" * 20] + _JAVA_LITERALS),
    st.text(max_size=12),
    st.integers(-10**12, 10**12).map(str),
    st.floats(allow_nan=False, allow_infinity=False, width=32).map(repr),
)

_num_re = re.compile(_NUMERIC_RE)
_float_re = re.compile(f"^{PY_FLOAT_GRAMMAR}$")
_int_re = re.compile(f"^{PY_INT_GRAMMAR}$")


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
        f = float(v)  # the reference helper (transform.py:30-37)
    except ValueError:
        return None
    # documented divergence: the engine's gate is the ASCII Python-float
    # grammar over the Python-whitespace-trimmed input
    if not _float_re.fullmatch(v.strip(_MODEL_WS).lower()):
        return None
    return f


def _model_int(v):
    if v is None:
        return None
    s = v.strip(_MODEL_WS)
    if _int_re.fullmatch(s):
        i = int(s)  # the reference helper (transform.py:40-47)
        if -(2**63) <= i <= 2**63 - 1:
            return i
        # documented divergence: beyond-long integers overflow the
        # direct cast and fall through to the double path below
    f = _model_numeric(v)
    if f is None or f != f or f in (float("inf"), float("-inf")):
        return None
    # Spark try_cast double->long: NULL outside [Long.Min.toDouble,
    # Long.Max.toDouble] == [-2^63, 2^63]; saturating toLong inside.
    if f < -(2.0**63) or f > 2.0**63:
        return None
    return max(-(2**63), min(2**63 - 1, int(f)))


def _run(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    return [r.out for r in df.select(fn(F.col("raw")).alias("out")).collect()]


@settings(max_examples=30, deadline=None)
@given(st.lists(_raw, min_size=1, max_size=40))
def test_safe_bool_matches_model(spark, values):
    assert _run(spark, safe_bool, values) == [_model_bool(v) for v in values]


def test_safe_numeric_matches_model_separators(spark):
    """The r7 ADVICE case pinned: \x1c-\x1f are isspace() but
    float() rejects them -- "\x1c42" must be NULL, not 42.0."""
    values = ["\x1c42", "\x1d1", "1\x1e", "\x1f3.5", "\xa042", " 1", "\x0b7"]
    got = _run(spark, safe_numeric, values)
    assert got == [_model_numeric(v) for v in values]


@settings(max_examples=30, deadline=None)
@given(st.lists(_raw, min_size=1, max_size=40))
@example(_JAVA_LITERALS)
@example(["1_000", "1__0", "_1", "1_", "١٢٣", "  3.5 ", "9" * 19])
@example(["\x1c42", "\x1d1", "1\x1e", "\x1f3.5", "\xa042", "\u202f1"])
def test_safe_numeric_matches_model(spark, values):
    got = _run(spark, safe_numeric, values)
    want = [_model_numeric(v) for v in values]
    assert len(got) == len(want)
    for v, g, w in zip(values, got, want):
        if w is not None and w != w:  # NaN
            assert g != g, (v, g, w)
        else:
            assert g == w, (v, g, w)


@settings(max_examples=30, deadline=None)
@given(st.lists(_raw, min_size=1, max_size=40))
@example(_JAVA_LITERALS)
@example(["1_000", "9" * 19, "9" * 20, "9223372036854775807",
          "-9223372036854775808", "9223372036854775808", "١٢٣"])
@example(["\x1c42", "\x1d1", "1\x1e", "\x1f3", "\xa042", "\u202f1"])
def test_safe_int_matches_model(spark, values):
    got = _run(spark, safe_int, values)
    want = [_model_int(v) for v in values]
    for v, g, w in zip(values, got, want):
        assert g == w, (v, g, w)


# Numeric-regex boundary for safe_bool (r6 verdict item 4): the
# _NUMERIC_RE branch decides bool("2")-vs-string semantics; pin its
# edges so a regex change can't silently flip the branch.
_BOOL_BOUNDARY = st.sampled_from([
    "0", "-0", "0.0", "00", "2", "2.", ".2", "2e1", "2E1", "-2e-1",
    "2e", "e2", "+2", "2.5.1", "nan", "inf", "1_0", "yes", "true", "",
])


@settings(max_examples=30, deadline=None)
@given(st.lists(_BOOL_BOUNDARY, min_size=1, max_size=20))
def test_safe_bool_numeric_boundary(spark, values):
    assert _run(spark, safe_bool, values) == [_model_bool(v) for v in values]
