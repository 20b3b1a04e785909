#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is fully materialized via the noop writer (count() would
let Spark prune projections and undercount the real work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The round-1 headline subset — timed since BENCH_r01, kept as a named
# group so round-over-round regressions in the long tail don't hide a
# regression here (docs/BENCH_COMPARE.md tracks the diff).  The bench
# itself now times EVERY registered query.
HEADLINE = [
    "run_summary_rollup",
    "pricing_summary",
    "denorm_join",
    "double_role_dim_join",
    "timeline_union",
    "topk_orders",
    "wide_projection",
    "json_flatten_props",
    "tumbling_window_agg",
    "session_window_agg",
    "current_version_window",
    "doc_quality_score",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_topk_cosine",
    "similarity_ann_ivf",
    "similarity_srp_lsh",
    "multimodal_features",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q10_returned_items",
    "asof_join_last_event",
    "range_join_bucketed",
    "doc_chunking",
    "tfidf_top_terms",
    "pandas_group_zscore",
]


# Machine-drift calibration set (VERDICT r8 item 8): three cheap,
# plan-stable queries timed since r1.  Round-over-round comparisons
# divide each round's totals by that round's calibration total.
CALIBRATION = ["incremental_scan", "wide_projection", "tpch_q6_forecast_revenue"]


def main() -> None:
    from etl_pipe_spark.plans.catalog import queries
    from etl_pipe_spark.session import get_spark

    spark = get_spark("etl-pipe-spark-bench")
    qs = queries()

    # Warm the JVM, file listing, and parquet footers for every table so
    # query timings measure plan execution, not first-touch I/O.
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        try:
            spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
        except Exception:
            pass
    # initialize the noop writer path so query 1 doesn't absorb it
    spark.range(10).write.mode("overwrite").format("noop").save()

    # One UNTIMED execution of a representative heavy text query:
    # the first wide codegen pipeline of the session absorbs ~10 s of
    # JIT/codegen warmup that best-of-2 cannot amortize (measured
    # dedup_minhash_lsh trace: 12.9 -> 4.5 -> 2.6 -> 2.4 s), which
    # reads as a phantom regression in round-over-round diffs.
    warm_name = "dedup_minhash_lsh" if "dedup_minhash_lsh" in qs else next(
        (n for n in qs if n.startswith("dedup_")), None)
    try:
        if warm_name is None:
            raise KeyError("no dedup_* query registered")
        qs[warm_name](spark, SF_DIR).write.mode(
            "overwrite").format("noop").save()
    except Exception as exc:  # stdout must stay one JSON line
        print(f"bench: JIT warmup skipped ({exc}) — first heavy query "
              f"will absorb codegen warmup", file=sys.stderr)

    # Best-of-2 per query: single-shot local[N] timings carry 5-10x
    # scheduler/GC noise; the minimum reflects the plan's real cost.
    from etl_pipe_spark.operators.ordering import release_rank_caches

    timings: dict[str, float] = {}
    for name in qs:  # the FULL registry, registration order
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
            # drain INSIDE the loop: run 2 must not read run 1's
            # still-persisted rank frames through Spark's CacheManager
            # (canonicalized-plan matching) — that reports a warm-cache
            # time, understating the plan's real cost.  The caches are
            # performance-only (operators/ordering.py), so the drain is
            # safe at any point.
            release_rank_caches()
        timings[name] = round(best, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "registry_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # r01-comparable subset total (BENCH_r01 timed exactly these 28)
        "headline_total_sec": round(
            sum(timings[n] for n in HEADLINE if n in timings), 3
        ),
        # Fixed 3-query calibration total (round 9, VERDICT r8 item 8):
        # two rounds of driver-noise adjudication showed wall-clock on
        # this box is the weakest signal in the loop — dividing any
        # round's totals by ITS OWN calibration total self-corrects
        # round-over-round diffs for box state.  The three queries are
        # plan-stable scan/filter/agg shapes untouched since r1.
        "calibration_total_sec": round(
            sum(timings[n] for n in CALIBRATION if n in timings), 3
        ),
    }
    # Self-persist every run (round 10, VERDICT r9 item 6): BENCH_r08's
    # stored stdout kept only the last 2000 chars of the ~8 KB JSON
    # line, which cost round 9 its round-over-round table.  Writing the
    # full payload to docs/bench_runs/ from the bench itself makes a
    # truncated capture recoverable.  Best-effort: the stdout contract
    # (ONE JSON line) must survive an unwritable repo.
    try:
        runs_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "docs", "bench_runs")
        os.makedirs(runs_dir, exist_ok=True)
        cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 0))
        fname = f"bench_{time.strftime('%Y%m%dT%H%M%SZ', time.gmtime())}" \
                f"_sf{sf}_c{cpus}.json"
        with open(os.path.join(runs_dir, fname), "w") as fh:
            json.dump(payload, fh, indent=1)
    except OSError as exc:
        print(f"bench: run-log write skipped ({exc})", file=sys.stderr)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
