"""Bounds for the approximate aggregates (no oracle by design)."""

from __future__ import annotations

import json

from etl_pipe_spark.plans.catalog import queries


def test_approx_aggregates_error_bounds(spark, sf_dir):
    rows = queries()["approx_aggregates"](spark, sf_dir).collect()
    assert len(rows) == 3  # A, N, R
    for r in rows:
        rel_err = abs(r.approx_orders - r.exact_orders) / r.exact_orders
        assert rel_err < 0.05, f"HLL error {rel_err:.3f} for {r.l_returnflag}"
        q50, q95, q99 = json.loads(r.price_quantiles)
        assert q50 <= q95 <= q99
