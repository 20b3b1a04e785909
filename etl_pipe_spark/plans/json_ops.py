"""JSON operators (SURVEY.md §2.8 JS1-JS3) with oracle-checked lenient
coercion semantics (§2.7 F8-F10).

The DuckDB oracles replicate the ladders exactly — including the
places where naive SQL would diverge: DuckDB CAST('3.7' AS BIGINT)
*rounds* to 4 while Spark (and Python int()) truncate, so oracle
integer coercion goes through trunc(TRY_CAST(... AS DOUBLE)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schemas
from ..functions.coercion import safe_bool, safe_int, safe_numeric
from ..functions.json_flatten import flatten_input_data
from ..sources.catalog import load_table
from .catalog import register

# --------------------------------------------------------------------------
# JS1-lite: flatten the driver's events.props payload.
# --------------------------------------------------------------------------

_PROPS_ORACLE = """
SELECT
  event_id,
  CASE WHEN json_valid(props)
       THEN CAST(trunc(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS BIGINT)
       END AS prop_k,
  props AS props_full_text
FROM events
"""


@register("json_flatten_props", oracle=_PROPS_ORACLE)
def json_flatten_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json + typed lift of the events.props payload (JS1/JS3)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), schemas.EVENTS_PROPS_PAYLOAD)
    return ev.select(
        "event_id",
        safe_int(parsed.getField("k")).alias("prop_k"),
        F.col("props").alias("props_full_text"),
    )


# --------------------------------------------------------------------------
# JS1 full: the reference input_data flatten, driven through a payload
# column synthesized deterministically from events rows so every edge
# case in FIXTURES.md (string-encoded numbers, yes/no/0/1 booleans,
# whole-payload-as-string, non-dict garbage, unknown keys) is covered
# identically on both engines.
# --------------------------------------------------------------------------

_PAYLOAD_CASE_SQL = """
  CASE event_type
    WHEN 'click' THEN '{"value": "3.7", "unit": "mg", "start_year": "2020", "actuals_flag": "yes", "pfs_flag": "no"}'
    WHEN 'view' THEN '{"value": 12.25, "end_year": 2025, "actuals_flag": 0, "ppc_flag": 1, "curve_type": "linear"}'
    WHEN 'error' THEN 'not valid json'
    WHEN 'purchase' THEN '"a bare json string"'
    ELSE '{"value": null, "actuals_flag": true, "pfs_flag": "TRUE", "unknown_key": 5, "unit": "kg"}'
  END
"""

# safe_bool ladder in DuckDB SQL (mirrors functions/coercion.py).
_NUM_RE = "^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"


def _duck_safe_bool(expr: str) -> str:
    return f"""CASE
      WHEN {expr} IS NULL THEN NULL
      WHEN regexp_matches({expr}, '{_NUM_RE}') THEN TRY_CAST({expr} AS DOUBLE) != 0
      ELSE lower({expr}) IN ('true', '1', 'yes') END"""


def _duck_safe_int(expr: str) -> str:
    return f"CAST(trunc(TRY_CAST({expr} AS DOUBLE)) AS BIGINT)"


def _duck_field(key: str) -> str:
    return f"CASE WHEN json_valid(payload) THEN json_extract_string(payload, '$.{key}') END"


_INPUT_FLATTEN_ORACLE = f"""
WITH src AS (
  SELECT event_id, {_PAYLOAD_CASE_SQL} AS payload FROM events
)
SELECT
  event_id,
  TRY_CAST({_duck_field('value')} AS DOUBLE) AS inp_value,
  {_duck_field('unit')} AS inp_unit,
  {_duck_safe_int(_duck_field('start_year'))} AS inp_start_year,
  {_duck_safe_int(_duck_field('end_year'))} AS inp_end_year,
  {_duck_field('input_type')} AS inp_input_type,
  {_duck_field('timeframe')} AS inp_timeframe,
  {_duck_field('dosing_type')} AS inp_dosing_type,
  {_duck_safe_bool(_duck_field('actuals_flag'))} AS inp_actuals_flag,
  {_duck_field('curve_type')} AS inp_curve_type,
  {_duck_field('selected_output')} AS inp_selected_output,
  {_duck_safe_bool(_duck_field('pfs_flag'))} AS inp_pfs_flag,
  {_duck_safe_bool(_duck_field('ppc_flag'))} AS inp_ppc_flag,
  payload AS input_data_full_text
FROM src
"""


@register("json_flatten_input_data", oracle=_INPUT_FLATTEN_ORACLE)
def json_flatten_input_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 12-column input_data flatten (JS1, transform.py:50-81).

    Payload synthesized per event_type to hit every lenient-coercion
    edge case; flattening itself is the reusable
    functions.json_flatten.flatten_input_data.
    """
    ev = load_table(spark, sf_dir, "events")
    payload = F.expr(_PAYLOAD_CASE_SQL)
    # parse once per row behind a projection barrier (see
    # functions/json_flatten._flatten)
    return (
        ev.withColumn("payload", payload)
        .withColumn("__parsed", F.from_json("payload", schemas.INPUT_DATA_PAYLOAD))
        .select(
            "event_id",
            *flatten_input_data(F.col("payload"), parsed=F.col("__parsed")),
        )
    )


# --------------------------------------------------------------------------
# F8-F10 kitchen sink: the safe_* ladders over adversarial scalar strings.
# --------------------------------------------------------------------------

_SCALAR_CASE_SQL = """
  CASE event_type
    WHEN 'click' THEN 'yes'
    WHEN 'view' THEN '0'
    WHEN 'error' THEN '3.7'
    WHEN 'purchase' THEN 'garbage'
    ELSE '-2.5e1'
  END
"""

_COERCION_ORACLE = f"""
WITH src AS (SELECT event_id, {_SCALAR_CASE_SQL} AS raw FROM events)
SELECT
  event_id,
  raw,
  {_duck_safe_bool('raw')} AS as_bool,
  {_duck_safe_int('raw')} AS as_int,
  TRY_CAST(raw AS DOUBLE) AS as_double
FROM src
"""


@register("coercion_kitchen_sink", oracle=_COERCION_ORACLE)
def coercion_kitchen_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """safe_bool/safe_int/safe_numeric parity across engines (F8-F10).

    Pins: "yes"->true, "0"->false, "3.7"->3 (truncate, not DuckDB's
    native rounding cast), "garbage"->NULL, scientific notation.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("raw", F.expr(_SCALAR_CASE_SQL)).select(
        "event_id",
        "raw",
        safe_bool(F.col("raw")).alias("as_bool"),
        safe_int(F.col("raw")).alias("as_int"),
        safe_numeric(F.col("raw")).alias("as_double"),
    )


# --------------------------------------------------------------------------
# MapType handling: JSON payload as a map column.
# --------------------------------------------------------------------------

_MAP_ORACLE = """
SELECT event_id,
       to_json(list_sort(json_keys(props))) AS prop_keys,
       CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
       json_extract_string(props, '$.k') AS k_value,
       list_contains(json_keys(props), 'k') AS has_k
FROM events
"""


@register("json_as_map", oracle=_MAP_ORACLE)
def json_as_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload parsed as MapType: keys, size, lookup, membership.

    The schema-free counterpart of the allowlist flatten (JS1) — for
    payloads whose key set is open-ended, parse to map<string,string>
    and operate with map functions.

    ``prop_keys`` is sorted on BOTH sides (``array_sort`` / DuckDB
    ``list_sort``) so the comparison is key-order independent, then
    serialized with ``to_json`` so the driver's pandas canonicalizer
    can hash it (list cells are unhashable there).
    """
    ev = load_table(spark, sf_dir, "events")
    return map_project(ev)


def map_project(ev: DataFrame, payload_col: str = "props") -> DataFrame:
    """The json_as_map projection over any (event_id, payload) frame.

    Factored out so the multi-key fixture test can drive the exact
    production expressions on payloads richer than the testdata's
    single-key props.  Parse + key-extract happen once per row behind
    projection barriers (the inlined form re-parses the payload per
    output column; see functions/json_flatten._flatten).
    """
    from pyspark.sql import types as T

    return (
        ev.withColumn(
            "__m",
            F.from_json(F.col(payload_col), T.MapType(T.StringType(), T.StringType())),
        )
        .withColumn("__keys", F.array_sort(F.map_keys("__m")))
        .select(
            "event_id",
            F.to_json(F.col("__keys")).alias("prop_keys"),
            F.size(F.col("__keys")).alias("n_keys"),
            F.element_at(F.col("__m"), "k").alias("k_value"),
            F.array_contains(F.col("__keys"), "k").alias("has_k"),
        )
    )
