"""Deterministic reference-shaped fc_* fixtures (FIXTURES.md Family B).

Small hand-built datasets covering every semantic edge the reference's
flows exercise: OR-of-lifecycle-timestamp increments, append-only
version chains with one open version, runs in all three states (incl.
zero-branch runs and zero-calc branches), nullable double-role FKs,
and JSON payloads hitting each lenient-coercion branch.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _t(**kw) -> dt.datetime:
    return T0 + dt.timedelta(**kw)


def build_sources(spark: SparkSession) -> dict:
    src = {}

    src["fc_model"] = spark.createDataFrame(
        [
            ("m1", "Model One", "EPI", "GLOBAL", "Oncology", "Lung", True, "EU", "DE"),
            ("m2", "Model Two", "TREND", "LOCAL", "Immunology", "RA", False, "NA", "US"),
        ],
        "id string, model_display_name string, model_type string, "
        "model_publish_level string, therapeutic_area_name string, "
        "model_disease_area_name string, has_inherent_event boolean, "
        "model_region_display_name string, model_country_display_name string",
    )

    src["fc_forecast_init"] = spark.createDataFrame(
        [
            ("f1", "FC 2024H1", _t(days=-60), _t(days=120), 2024, 2034, True),
            ("f2", "FC 2024H2", _t(days=60), _t(days=240), 2025, 2035, False),
        ],
        "id string, forecast_cycle_display_name string, "
        "forecast_cycle_start_dt timestamp_ntz, forecast_cycle_end_dt timestamp_ntz, "
        "horizon_start_limit int, horizon_end_limit int, starter_created boolean",
    )

    # Scenarios: each lifecycle timestamp column independently exercised
    # (P1 OR-predicate coverage); s6 has NULL actor fields for the
    # NULL-propagating concat paths.
    scen_ddl = (
        "id string, scenario_display_name string, status string, is_starter boolean, "
        "currency string, currency_code string, scenario_start_year int, "
        "scenario_end_year int, scenario_region_name string, scenario_country_name string, "
        "created_at timestamp_ntz, created_by string, updated_at timestamp_ntz, "
        "updated_by string, submitted_at timestamp_ntz, submitted_by string, "
        "locked_at timestamp_ntz, locked_by string, withdraw_at timestamp_ntz, "
        "withdraw_by string, delete_at timestamp_ntz, model_id string, forecast_init_id string"
    )
    src["fc_scenario"] = spark.createDataFrame(
        [
            # old scenario, untouched since T0 (filtered out by since=T0)
            ("s0", "Old", "DRAFT", False, "Euro", "EUR", 2024, 2030, "EU", "DE",
             _t(days=-30), "alice", _t(days=-29), "alice", None, None, None, None,
             None, None, None, "m1", "f1"),
            # created after T0
            ("s1", "Fresh", "DRAFT", True, "Dollar", "USD", 2024, 2031, "NA", "US",
             _t(hours=1), "bob", _t(hours=1), "bob", None, None, None, None,
             None, None, None, "m2", "f2"),
            # old create, recent update
            ("s2", "Updated", "DRAFT", False, "Euro", "EUR", 2024, 2032, "EU", "FR",
             _t(days=-10), "carol", _t(hours=2), "carol", None, None, None, None,
             None, None, None, "m1", "f1"),
            # recent submit only
            ("s3", "Submitted", "SUBMITTED", False, "Euro", "EUR", 2024, 2030, "EU", "DE",
             _t(days=-10), "dave", _t(days=-9), "dave", _t(hours=3), "dave", None, None,
             None, None, None, "m1", "f2"),
            # recent lock only
            ("s4", "Locked", "LOCKED", False, "Yen", "JPY", 2024, 2033, "APAC", "JP",
             _t(days=-10), "erin", _t(days=-9), "erin", _t(days=-8), "erin",
             _t(hours=4), "erin", None, None, None, "m2", "f1"),
            # recent withdraw only, NULL actors downstream
            ("s5", "Withdrawn", "WITHDRAWN", False, "Euro", "EUR", 2024, 2030, "EU", "IT",
             _t(days=-10), "frank", _t(days=-9), "frank", None, None, None, None,
             _t(hours=5), None, None, "m1", "f1"),
        ],
        scen_ddl,
    )

    src["fc_model_node_tab"] = spark.createDataFrame(
        [("t1", "Epidemiology", 1, 1), ("t2", "Market", 1, 2)],
        "id string, tab_display_name string, tab_level int, tab_seq int",
    )
    src["fc_model_node_groups"] = spark.createDataFrame(
        [("g1", "t1", "Population", "INPUT", 1), ("g2", "t2", "Share", "INPUT", 1),
         ("g3", "t2", "Price", "CALC", 2)],
        "id string, model_node_tab_id string, group_display_name string, "
        "group_type string, group_seq int",
    )
    src["fc_model_node"] = spark.createDataFrame(
        [
            ("n1", "g1", "Incidence", "input", 1, "epi"),
            ("n2", "g1", "Prevalence", "input", 2, "epi"),
            ("n3", "g2", "Share", "input", 1, "mkt"),
            ("n4", "g3", "Net Price", "calc", 1, "mkt"),
        ],
        "id string, model_node_group_id string, node_display_name string, "
        "node_type string, node_seq int, flow string",
    )

    # Version chains (append-only): n1@s1 has 3 versions (2 closed, 1
    # open); payloads hit every coercion branch.
    ndata_ddl = (
        "id string, scenario_id string, model_node_id string, input_data string, "
        "input_hash string, input_validated boolean, input_validation_message string, "
        "source string, created_at timestamp_ntz, end_at timestamp_ntz, created_by string"
    )
    src["fc_scenario_node_data"] = spark.createDataFrame(
        [
            ("nd1", "s1", "n1",
             '{"value": "3.7", "unit": "mg", "start_year": "2024", "actuals_flag": "yes", "pfs_flag": "no"}',
             "h1", True, None, "manual", _t(hours=1), _t(hours=2), "bob"),
            ("nd2", "s1", "n1",
             '{"value": 12.25, "end_year": 2030, "actuals_flag": 0, "ppc_flag": 1, "curve_type": "linear"}',
             "h2", False, "range check failed", "manual", _t(hours=2), _t(hours=6), "bob"),
            ("nd3", "s1", "n1", "not valid json",
             "h3", None, None, "import", _t(hours=6), None, "bob"),
            ("nd4", "s1", "n2", '"a bare string"',
             "h4", True, None, "manual", _t(hours=3), None, "carol"),
            ("nd5", "s2", "n3",
             '{"value": null, "actuals_flag": true, "pfs_flag": "TRUE", "unknown_key": 5}',
             "h5", True, None, "manual", _t(hours=4), None, "carol"),
            # old version closed before T0: excluded at since=T0
            ("nd0", "s0", "n1", '{"value": 1}',
             "h0", True, None, "manual", _t(days=-20), _t(days=-15), "alice"),
        ],
        ndata_ddl,
    )

    # Runs: success with 2 branches, failed with 1 branch (no calcs),
    # in-progress with 0 branches (left-join zero counts, A1).
    src["fc_scenario_run"] = spark.createDataFrame(
        [
            ("r1", "s1", "SUCCESS", _t(hours=7), "bob", _t(hours=7, minutes=12, seconds=30), None),
            ("r2", "s2", "FAILED", _t(hours=8), "carol", _t(hours=8, minutes=1), "node exploded"),
            ("r3", "s3", "IN_PROGRESS", _t(hours=9), "dave", None, None),
            ("r0", "s0", "SUCCESS", _t(days=-20), "alice", _t(days=-20, minutes=5), None),
        ],
        "id string, scenario_id string, run_status string, run_at timestamp_ntz, "
        "run_by string, run_complete_at timestamp_ntz, fail_reason string",
    )
    src["fc_scenario_run_branch"] = spark.createDataFrame(
        [("br1", "r1", "base"), ("br2", "r1", "loe"), ("br3", "r2", "base"),
         ("br0", "r0", "base")],
        "id string, scenario_run_id string, event_tag string",
    )
    src["fc_scenario_node_calc"] = spark.createDataFrame(
        [
            ("c1", "br1", "n1", "success", None, _t(hours=7, minutes=1),
             _t(hours=7, minutes=1, seconds=2, microseconds=500000), '{"out": [1, 2]}', _t(hours=7, minutes=2)),
            ("c2", "br1", "n4", "failed", "div by zero", _t(hours=7, minutes=2),
             _t(hours=7, minutes=2, seconds=1), '{"out": null}', _t(hours=7, minutes=3)),
            ("c3", "br2", "n4", "timeout", "exceeded budget", _t(hours=7, minutes=3),
             _t(hours=7, minutes=8), None, _t(hours=7, minutes=9)),
        ],
        "id string, scenario_run_branch_id string, model_node_id string, status string, "
        "fail_reason string, processing_start_at timestamp_ntz, "
        "processing_end_at timestamp_ntz, output_data string, created_at timestamp_ntz",
    )

    src["fc_event_type"] = spark.createDataFrame(
        [("et1", "LOE", True), ("et2", "Launch", False)],
        "id string, display_name string, inherent boolean",
    )
    src["fc_scenario_event_type"] = spark.createDataFrame(
        [("st1", "s1", "et1"), ("st2", "s2", "et2")],
        "id string, scenario_id string, event_type_id string",
    )
    # Event versions: ev1->ev2 chain; ev2 has NULL population node
    # (coalesce path); ev3 both role FKs NULL.
    src["fc_scenario_event_data"] = spark.createDataFrame(
        [
            ("ev1", "st1", "n1", "n3",
             '{"year": "2026", "share_value": "0.4", "entry_quarter": "Q2", "erosion_rate": 0.1}',
             "eh1", False, '{"q1": 0.2}', True, None, _t(hours=1), _t(hours=5), "bob"),
            ("ev2", "st1", None, "n3",
             '{"year": 2027, "share_value": 0.35, "steady_state": 0.2, "sob_value": "0.6"}',
             "eh2", True, None, False, "share out of bounds", _t(hours=5), None, "bob"),
            ("ev3", "st2", None, None, "garbage payload",
             "eh3", False, None, None, None, _t(hours=6), None, "carol"),
        ],
        "id string, scenario_event_type_id string, population_node_id string, "
        "parent_product_node_id string, event_data string, event_data_hash string, "
        "is_overridden boolean, event_shares_overridden string, is_validated boolean, "
        "input_validation_message string, created_at timestamp_ntz, end_at timestamp_ntz, "
        "created_by string",
    )
    return src
