"""Property-based JS1/JS2 flatten tests (r6 verdict item 4): the
flatten_input_data / flatten_event_data ladders must agree with an
executable Python model of reference transform.py:50-104 over
arbitrary JSON payloads — known keys with adversarial values, unknown
keys, non-dict garbage, corrupt text, NULL payloads.

The model is the reference flatten (dict-get per allowlisted key +
safe_* coercion) composed with the engine's two documented
divergences:

* **stringification** — ``from_json`` with the all-string payload
  schema stringifies every value before coercion, so the model
  coerces ``_stringify(value)`` (JSON-number floats print like Java
  ``Double.toString`` — the generator keeps floats in the regime
  where that equals Python ``repr`` — ints print exactly, booleans
  lowercase, nested subtrees as compact JSON) with the SAME
  _model_bool/_model_numeric/_model_int used by the coercion
  property suite.  This bakes in the documented bool("2")-branch and
  truncate-"3.7" divergences.
* **full text** — the engine passes the ORIGINAL payload string
  through (the reference re-serializes the parsed dict and NULLs
  garbage payloads).
"""

from __future__ import annotations

import json

from hypothesis import example, given, settings, strategies as st

from pyspark.sql import functions as F

from etl_pipe_spark.functions.json_flatten import (
    EVENT_DATA_FIELDS,
    INPUT_DATA_FIELDS,
    flatten_event_data,
    flatten_input_data,
)
from etl_pipe_spark.functions.coercion import safe_bool, safe_int, safe_numeric
from tests.test_coercion_properties import (
    _model_bool,
    _model_int,
    _model_numeric,
)

# Floats whose Java Double.toString equals Python repr (magnitude in
# (1e-3, 1e7), short decimals) — outside that regime the two differ in
# exponent spelling ("1.0E16" vs "1e+16"), which only matters for
# identity-kept fields, so the generator simply stays inside it.
_SAFE_FLOATS = [2.5, 0.1, 3.7, -12.25, 0.004, 123456.5, 1.0, -0.5, 55.0, -0.0]

_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-10**19, 10**19),
    st.sampled_from(_SAFE_FLOATS),
    st.sampled_from(["3.7", "1e3", "0D", "3.7f", "0x1p3", "yes", "no",
                     "true", "TRUE", "1", "0", "2", "", " 42 ", "garbage",
                     "1_0", "nan", "-inf"]),
    st.text(max_size=8),
)
# Nested subtrees reach the engine as Jackson's compact re-serialization
# and the model as json.dumps — identical only for plain-ASCII strings
# (Jackson escapes control chars with UPPERCASE hex and writes non-ASCII
# raw; both are serializer cosmetics, not semantics), so nested string
# values stay in a safe alphabet.
_nested = st.one_of(
    st.dictionaries(st.sampled_from(["a", "b"]),
                    st.one_of(st.integers(-5, 5), st.booleans(),
                              st.text(alphabet="abz 019_.", max_size=4)),
                    max_size=2),
    st.lists(st.integers(0, 5), max_size=3),
)
_KNOWN_INPUT = [k for k, _, _ in INPUT_DATA_FIELDS]
_KNOWN_EVENT = [k for k, _, _ in EVENT_DATA_FIELDS]


def _payloads(known_keys):
    body = st.dictionaries(
        st.sampled_from(known_keys + ["unknown_key", "x"]),
        st.one_of(_scalar, _nested),
        max_size=8,
    ).map(lambda d: json.dumps(d))
    return st.one_of(
        body,
        st.sampled_from(["not json", '"bare string"', "[1,2]", '{"value":',
                         "", "   ", "null", "{}"]),
        st.none(),
    )


def _stringify(v):
    """What from_json's all-string schema hands the coercion ladder."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return v
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v)  # valid only in the generator's float regime
    return json.dumps(v, separators=(",", ":"))


_MODEL_COERCE = {
    safe_numeric: _model_numeric,
    safe_int: _model_int,
    safe_bool: _model_bool,
}


def _model_flatten(payload, fields, full_name):
    d = None
    if payload is not None:
        try:
            parsed = json.loads(payload)
            if isinstance(parsed, dict):
                d = parsed
        except ValueError:
            d = None
    out = {}
    for key, name, coerce in fields:
        s = _stringify(d.get(key)) if d is not None else None
        model = _MODEL_COERCE.get(coerce)
        out[name] = model(s) if model else s
    out[full_name] = payload  # divergence: original text passes through
    return out


def _run(spark, payloads, flatten_fn, full_name):
    df = spark.createDataFrame([(p,) for p in payloads], "payload string")
    rows = df.select(*flatten_fn(F.col("payload"))).collect()
    return [r.asDict() for r in rows]


def _assert_rows_match(got_rows, want_rows, payloads):
    for p, g, w in zip(payloads, got_rows, want_rows):
        assert set(g) == set(w), (p, g, w)
        for k in w:
            gv, wv = g[k], w[k]
            if isinstance(wv, float) and wv != wv:  # NaN
                assert gv is not None and gv != gv, (p, k, gv, wv)
            else:
                assert gv == wv, (p, k, gv, wv)


@settings(max_examples=25, deadline=None)
@given(st.lists(_payloads(_KNOWN_INPUT), min_size=1, max_size=25))
@example(['{"value": "0D", "start_year": "0x1p3", "actuals_flag": 2}'])
@example(['{"value": 3.7, "start_year": 3.7, "unit": {"a":1}, "pfs_flag": "no"}'])
@example([None, "", "not json", "[1,2]", '"bare string"', "{}"])
def test_flatten_input_data_matches_model(spark, values):
    got = _run(spark, values, flatten_input_data, "input_data_full_text")
    want = [_model_flatten(p, INPUT_DATA_FIELDS, "input_data_full_text")
            for p in values]
    _assert_rows_match(got, want, values)


@settings(max_examples=25, deadline=None)
@given(st.lists(_payloads(_KNOWN_EVENT), min_size=1, max_size=25))
@example(['{"year": "1e3", "share_value": true, "launch_date": 2.5}'])
@example(['{"year": 10000000000000000000, "erosion_rate": "nan"}'])
def test_flatten_event_data_matches_model(spark, values):
    got = _run(spark, values, flatten_event_data, "event_data_full_text")
    want = [_model_flatten(p, EVENT_DATA_FIELDS, "event_data_full_text")
            for p in values]
    _assert_rows_match(got, want, values)
