"""Bounds for the approximate aggregates.

The query itself now emits the error-bound booleans (hash-checkable
against the DuckDB oracle, which asserts them TRUE); this test pins
the same contract at sf0.001 and sanity-checks the exact side.
"""

from __future__ import annotations

from etl_pipe_spark.plans.catalog import queries


def test_approx_aggregates_error_bounds(spark, sf_dir):
    rows = queries()["approx_aggregates"](spark, sf_dir).collect()
    assert len(rows) == 3  # A, N, R
    for r in rows:
        assert r.n_exact_rows >= r.exact_orders > 0
        assert r.hll_within_bounds, f"HLL out of bounds for {r.l_returnflag}"
        for q in ("q50", "q95", "q99"):
            assert r[f"{q}_within_bounds"], (
                f"{q} rank out of bounds for {r.l_returnflag}"
            )
