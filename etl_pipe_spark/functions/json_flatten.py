"""JSON payload flattening (the reference's signature transformation).

Reference transform.py:50-104 flattens JSONB dicts into typed columns
through a hand-maintained key allowlist (config.py:32-45) with lenient
per-value coercion; unknown keys survive only in a full-text JSON dump.

Spark-first re-expression: one ``from_json`` with an all-string
payload schema (so the coercion ladders see raw values), then native
``safe_*`` column expressions per field — zero Python UDFs, fully
codegen'd.  Malformed/non-dict JSON yields a NULL struct, so every
flattened field is NULL, matching the reference's garbage tolerance.

Full-text divergence note: the reference re-serializes the parsed
dict (``json.dumps``); we pass the original string through untouched —
same information, preserves unknown keys and author formatting.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .. import schemas
from .coercion import safe_bool, safe_int, safe_numeric


def _identity(c: Column) -> Column:
    return c


# (payload key, output column, coercion) — reference transform.py:66-81
INPUT_DATA_FIELDS = [
    ("value", "inp_value", safe_numeric),
    ("unit", "inp_unit", _identity),
    ("start_year", "inp_start_year", safe_int),
    ("end_year", "inp_end_year", safe_int),
    ("input_type", "inp_input_type", _identity),
    ("timeframe", "inp_timeframe", _identity),
    ("dosing_type", "inp_dosing_type", _identity),
    ("actuals_flag", "inp_actuals_flag", safe_bool),
    ("curve_type", "inp_curve_type", _identity),
    ("selected_output", "inp_selected_output", _identity),
    ("pfs_flag", "inp_pfs_flag", safe_bool),
    ("ppc_flag", "inp_ppc_flag", safe_bool),
]

# reference transform.py:95-104
EVENT_DATA_FIELDS = [
    ("year", "evt_year", safe_int),
    ("share_value", "evt_share_value", safe_numeric),
    ("entry_quarter", "evt_entry_quarter", _identity),
    ("erosion_rate", "evt_erosion_rate", safe_numeric),
    ("launch_date", "evt_launch_date", _identity),
    ("steady_state", "evt_steady_state", safe_numeric),
    ("sob_value", "evt_sob_value", safe_numeric),
]


def _flatten(col: Column, payload_schema, fields, full_text_name: str,
             parsed: Column | None = None) -> list[Column]:
    # Callers on a hot path should pass ``parsed`` = a from_json struct
    # ALREADY materialized in its own projection (withColumn barrier):
    # inlining from_json here embeds a copy of the parse into every
    # flattened column, and codegen's subexpression elimination does
    # not recover it through the safe_* when-ladders — measured 12
    # parses per row, 3.7 s -> 0.6 s at sf0.1 for the 12-key flatten.
    if parsed is None:
        parsed = F.from_json(col, payload_schema)
    out = [coerce(parsed.getField(key)).alias(name) for key, name, coerce in fields]
    out.append(col.alias(full_text_name))
    return out


def flatten_input_data(col: Column, parsed: Column | None = None) -> list[Column]:
    """12 typed columns + full text (reference transform.py:50-81 JS1)."""
    return _flatten(col, schemas.INPUT_DATA_PAYLOAD, INPUT_DATA_FIELDS,
                    "input_data_full_text", parsed=parsed)


def flatten_event_data(col: Column, parsed: Column | None = None) -> list[Column]:
    """7 typed columns + full text (reference transform.py:84-104 JS2)."""
    return _flatten(col, schemas.EVENT_DATA_PAYLOAD, EVENT_DATA_FIELDS,
                    "event_data_full_text", parsed=parsed)
