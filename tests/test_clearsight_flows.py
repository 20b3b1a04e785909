"""Semantic pins for the six ClearSight flows against reference-shaped
fixtures — the "a reference user could switch" parity tests."""

from __future__ import annotations

import pytest

from etl_pipe_spark.flows.clearsight import (
    event_data_flow,
    node_calc_flow,
    node_data_flow,
    runs_flow,
    scenarios_flow,
    timeline_flow,
)
from tests.clearsight_fixtures import T0, build_sources


@pytest.fixture(scope="module")
def src(spark):
    return build_sources(spark)


def test_scenarios_incremental_or_predicate(spark, src):
    """Each lifecycle timestamp independently triggers re-extraction
    (reference extract.py:101-105); untouched rows stay out."""
    rows = {r.id: r for r in scenarios_flow(src, T0).collect()}
    assert set(rows) == {"s1", "s2", "s3", "s4", "s5"}  # s0 untouched
    # denormalized model/forecast columns with reference aliases
    s1 = rows["s1"]
    assert s1.model_display_name == "Model Two"
    assert s1.loe_enabled is False
    assert s1.disease_area_name == "RA"
    assert s1.forecast_cycle_name == "FC 2024H2"


def test_node_data_versions_and_flatten(spark, src):
    rows = {r.id: r for r in node_data_flow(src, T0).collect()}
    assert set(rows) == {"nd1", "nd2", "nd3", "nd4", "nd5"}  # nd0 too old
    # lenient coercions (reference transform.py:66-81)
    nd1 = rows["nd1"]
    assert nd1.inp_value == 3.7 and nd1.inp_start_year == 2024
    assert nd1.inp_actuals_flag is True and nd1.inp_pfs_flag is False
    nd2 = rows["nd2"]
    assert nd2.inp_actuals_flag is False and nd2.inp_ppc_flag is True
    assert nd2.validation_message == "range check failed"  # F11 bug fixed
    # garbage / bare-string payloads -> all typed fields NULL
    for key in ("nd3", "nd4"):
        assert rows[key].inp_value is None and rows[key].inp_actuals_flag is None
    # unknown keys ignored but preserved in full text
    assert '"unknown_key": 5' in rows["nd5"].input_data_full_text
    # version chain: closed versions flagged not-current
    assert rows["nd1"].is_current_version is False
    assert rows["nd3"].is_current_version is True
    # hierarchy denormalization
    assert rows["nd1"].tab_name == "Epidemiology" and rows["nd1"].group_name == "Population"


def test_runs_rollup_zero_branch_semantics(spark, src):
    rows = {r.run_id: r for r in runs_flow(src, T0).collect()}
    assert set(rows) == {"r1", "r2", "r3"}
    r1 = rows["r1"]
    assert r1.branch_count == 2 and r1.total_nodes_processed == 3
    assert (r1.nodes_success, r1.nodes_failed, r1.nodes_timeout) == (1, 1, 1)
    assert r1.run_duration_minutes == 12.5  # 12m30s
    r2 = rows["r2"]  # branch with zero calcs
    assert r2.branch_count == 1 and r2.total_nodes_processed == 0
    r3 = rows["r3"]  # zero branches, in progress
    assert r3.branch_count == 0 and r3.total_nodes_processed == 0
    assert r3.run_duration_minutes is None


def test_node_calc_duration_and_passthrough(spark, src):
    rows = {r.id: r for r in node_calc_flow(src, T0).collect()}
    assert set(rows) == {"c1", "c2", "c3"}
    assert rows["c1"].processing_duration_s == 2.5
    assert rows["c1"].output_data_text == '{"out": [1, 2]}'
    assert rows["c3"].output_data_text is None
    assert rows["c1"].run_id == "r1" and rows["c3"].event_tag == "loe"


def test_event_data_double_role_joins(spark, src):
    rows = {r.id: r for r in event_data_flow(src, T0).collect()}
    assert set(rows) == {"ev1", "ev2", "ev3"}
    ev1 = rows["ev1"]
    assert ev1.population_node_name == "Incidence"
    assert ev1.parent_product_name == "Share"
    assert ev1.evt_year == 2026 and ev1.evt_share_value == 0.4  # string-encoded
    assert ev1.is_current_version is False
    ev2 = rows["ev2"]
    assert ev2.population_node_name is None and ev2.parent_product_name == "Share"
    assert ev2.evt_sob_value == 0.6 and ev2.is_current_version is True
    ev3 = rows["ev3"]  # garbage payload + both roles NULL
    assert ev3.evt_year is None and ev3.population_node_name is None


def test_timeline_branches_and_keys(spark, src):
    tl = timeline_flow(src, T0).collect()
    keys = [r.source_key for r in tl]
    assert len(keys) == len(set(keys))  # dedup keys unique (L6)
    by_type = {}
    for r in tl:
        by_type.setdefault(r.event_type, []).append(r)
    assert len(by_type["SCENARIO_CREATED"]) == 1      # only s1 created after T0
    assert len(by_type["SUBMITTED"]) == 1             # s3
    assert len(by_type["LOCKED"]) == 1                # s4
    assert len(by_type["WITHDRAWN"]) == 1             # s5
    assert len(by_type["NODE_EDITED"]) == 5
    assert len(by_type["EVENT_EDITED"]) == 3
    assert len(by_type["RUN_TRIGGERED"]) == 3
    assert len(by_type["RUN_COMPLETED"]) == 2         # r3 not complete
    # F1 NULL-propagating concat: nd3 has NULL input_validated ->
    # whole description NULL (faithful to PG || semantics)
    ne3 = [r for r in by_type["NODE_EDITED"] if r.source_key == "NE_nd3"][0]
    assert ne3.description is None
    # F2 COALESCE fragment: ev2 has no population node -> no segment suffix
    evt2 = [r for r in by_type["EVENT_EDITED"] if r.source_key == "EVT_ev2"][0]
    assert evt2.description == "Event edited: LOE"
    # failed run description includes the error via COALESCE
    rc2 = [r for r in by_type["RUN_COMPLETED"] if r.source_key == "RC_r2"][0]
    assert rc2.description == "Run completed: FAILED | Error: node exploded"
    # ordered by event_time with source_key tiebreak
    times = [(r.event_time, r.source_key) for r in tl]
    assert times == sorted(times)


def test_flows_compose_with_merge_sinks(spark, src, tmp_path):
    """Timeline -> insert-if-absent replay (the reference's L6 recipe)."""
    from etl_pipe_spark.operators.merge import ParquetMergeSink, insert_if_absent

    tl = timeline_flow(src, T0)
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in tl.schema.fields)
    sink = ParquetMergeSink(spark, str(tmp_path / "timeline"), ddl)
    n1 = sink.write(insert_if_absent(sink.read(), tl, ["source_key"]))
    n2 = sink.write(insert_if_absent(sink.read(), tl, ["source_key"]))  # replay
    assert n1 == n2 == tl.count()
