#!/usr/bin/env python
"""Time individual registered queries in isolation (best-of-N, noop
sink — guide §1.4) for optimization before/after evidence.

Usage:  python tools/qtime.py name [name ...] [--runs N]

Prints one line per query: name, all run times, and the minimum.
Same session settings as bench.py (local[$SPARK_GRAFT_CPUS],
$SPARK_GRAFT_SF_DIR), same JIT warm-up convention, so numbers are
comparable to the bench's per-query column.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    argv = sys.argv[1:]
    runs = 3
    args: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--runs"):
            if "=" in a:
                runs = int(a.split("=", 1)[1])
            else:  # space-separated form: --runs N
                i += 1
                runs = int(argv[i])
        elif not a.startswith("--"):
            args.append(a)
        i += 1

    from etl_pipe_spark.operators.ordering import release_rank_caches
    from etl_pipe_spark.plans.catalog import queries
    from etl_pipe_spark.session import get_spark

    spark = get_spark("qtime")
    qs = queries()
    # same warm-up as bench.py: tables + noop + one heavy codegen query
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        try:
            spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
        except Exception:
            pass
    spark.range(10).write.mode("overwrite").format("noop").save()
    try:
        qs["dedup_minhash_lsh"](spark, SF_DIR).write.mode(
            "overwrite").format("noop").save()
    except Exception:
        pass
    release_rank_caches()

    for name in args:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            continue
        times = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            times.append(round(time.perf_counter() - t0, 3))
            release_rank_caches()
        print(f"{name}: min={min(times)}  runs={times}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
