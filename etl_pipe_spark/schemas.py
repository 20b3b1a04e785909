"""Explicit schema registry — never ``inferSchema`` on a correctness path.

Mirrors the reference's fixed-and-declared schema stance (the target
DDL at reference setup_target.py:11-241 and the hand-maintained JSONB
key allowlists at reference config.py:32-45): one StructType constant
per table, plus typed payload schemas for ``from_json``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Driver test tables (/root/testdata/sf*/ — TESTDATA.md)
# ``events.ts`` is declared LongType: the files store TIMESTAMP(NANOS)
# which we read via nanosAsLong (see session.py); the loader derives a
# micro-truncated TIMESTAMP_NTZ alongside the exact int64.
# --------------------------------------------------------------------------

REGION = T.StructType([
    T.StructField("r_regionkey", T.IntegerType()),
    T.StructField("r_name", T.StringType()),
])

NATION = T.StructType([
    T.StructField("n_nationkey", T.IntegerType()),
    T.StructField("n_name", T.StringType()),
    T.StructField("n_regionkey", T.IntegerType()),
])

CUSTOMER = T.StructType([
    T.StructField("c_custkey", T.LongType()),
    T.StructField("c_name", T.StringType()),
    T.StructField("c_nationkey", T.IntegerType()),
    T.StructField("c_acctbal", T.DoubleType()),
    T.StructField("c_mktsegment", T.StringType()),
])

SUPPLIER = T.StructType([
    T.StructField("s_suppkey", T.LongType()),
    T.StructField("s_name", T.StringType()),
    T.StructField("s_nationkey", T.IntegerType()),
    T.StructField("s_acctbal", T.DoubleType()),
])

PART = T.StructType([
    T.StructField("p_partkey", T.LongType()),
    T.StructField("p_name", T.StringType()),
    T.StructField("p_brand", T.StringType()),
    T.StructField("p_type", T.StringType()),
    T.StructField("p_size", T.IntegerType()),
    T.StructField("p_retailprice", T.DoubleType()),
])

ORDERS = T.StructType([
    T.StructField("o_orderkey", T.LongType()),
    T.StructField("o_custkey", T.LongType()),
    T.StructField("o_orderstatus", T.StringType()),
    T.StructField("o_totalprice", T.DoubleType()),
    T.StructField("o_orderdate", T.TimestampNTZType()),
    T.StructField("o_orderpriority", T.StringType()),
])

LINEITEM = T.StructType([
    T.StructField("l_orderkey", T.LongType()),
    T.StructField("l_partkey", T.LongType()),
    T.StructField("l_suppkey", T.LongType()),
    T.StructField("l_linenumber", T.IntegerType()),
    T.StructField("l_quantity", T.DoubleType()),
    T.StructField("l_extendedprice", T.DoubleType()),
    T.StructField("l_discount", T.DoubleType()),
    T.StructField("l_tax", T.DoubleType()),
    T.StructField("l_returnflag", T.StringType()),
    T.StructField("l_linestatus", T.StringType()),
    T.StructField("l_shipdate", T.TimestampNTZType()),
])

# Raw on-disk shape.  The ts column's physical layout varies by data
# generation (TIMESTAMP(NANOS) read as int64 under nanosAsLong, or
# plain TIMESTAMP(MICROS)); readers take the footer schema at runtime
# and normalize via sources.catalog._events_normalize.  This constant
# documents the NANOS variant.
EVENTS_RAW = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("label", T.IntegerType()),
])

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS_RAW,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --------------------------------------------------------------------------
# JSON payload schemas.
#
# The reference lifts a hand-maintained allowlist of JSONB keys into
# typed columns (reference config.py:34-38 INPUT_DATA_KEYS = 12 keys,
# config.py:42-45 EVENT_DATA_KEYS = 7 keys; flattening loops at
# reference transform.py:50-104).  We parse every payload field as
# STRING first so the lenient safe_* coercions (functions/coercion.py)
# see the same raw values the reference's Python code saw, regardless
# of whether the JSON author wrote `1`, `"1"`, `true` or `"yes"`.
# --------------------------------------------------------------------------

def _all_string(*names: str) -> T.StructType:
    return T.StructType([T.StructField(n, T.StringType()) for n in names])


# reference config.py:34-38 (keys) + transform.py:66-81 (target types)
INPUT_DATA_PAYLOAD = _all_string(
    "value", "unit", "start_year", "end_year", "input_type", "timeframe",
    "dosing_type", "actuals_flag", "curve_type", "selected_output",
    "pfs_flag", "ppc_flag",
)

# reference config.py:42-45 (keys) + transform.py:95-104 (target types)
EVENT_DATA_PAYLOAD = _all_string(
    "year", "share_value", "entry_quarter", "erosion_rate", "launch_date",
    "steady_state", "sob_value",
)

# Driver events.props payload — single int-valued key "k".
EVENTS_PROPS_PAYLOAD = _all_string("k")
