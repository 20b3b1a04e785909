#!/usr/bin/env python
"""Scale evidence for the BQ (1-bit) index leg vs the SQ8 leg.

The claim under test (operators/bq.py + index_store BQ leg): sign-bit
codes cost 8 bytes/vector at dim 64 — 4x under SQ8's 64 bytes, 32x
under float32 — and the Hamming scan is pure-integer ``bit_count(xor)``
inside whole-stage codegen, so the shortlist stage should be the
cheapest of the three quantizer legs and scale linearly in N.

Per corpus size this sweep measures:

  * bq_build    — thresholds + pack + clustered write (one-time)
  * sq8_build   — the SQ8 comparator (stats + Arrow encode + write)
  * bq_search   — Q queries, corpus-relative shortlist, RELOADED codes
  * sq8_search  — same queries, k=shortlist, RELOADED codes
  * bytes on disk for both code tables

Corpora come from dedup_scaling.gen_embeddings (16-cluster synthetic,
unit-normalized, cached under /tmp/dedup_scale).

Usage:  python tools/bq_scaling.py [--scales 1000000,4000000]
Prints one JSON line per scale.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dedup_scaling import gen_embeddings  # noqa: E402

N_QUERIES = 20


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1000000,4000000")
    ap.add_argument("--shortlist", type=int, default=100)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import functions as F

    from etl_pipe_spark.operators.index_store import (
        build_bq_index, build_sq8_index, search_bq_index, search_sq8_index)
    from etl_pipe_spark.session import get_spark

    spark = get_spark("bq-scaling")
    for n in scales:
        sf_dir = gen_embeddings(n)
        emb = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet")
        ).select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        stride = max(1, n // N_QUERIES)
        q = emb.filter(F.col("vec_id") % stride == 0).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
        n_q = q.count()

        row: dict = {"n": n, "n_queries": n_q, "shortlist": args.shortlist}
        work = f"/tmp/bq_scale/n{n}"
        shutil.rmtree(work, ignore_errors=True)

        t0 = time.time()
        build_bq_index(spark, emb, f"{work}/bq")
        row["bq_build_s"] = round(time.time() - t0, 1)

        t0 = time.time()
        build_sq8_index(spark, emb, f"{work}/sq8")
        row["sq8_build_s"] = round(time.time() - t0, 1)

        row["bq_codes_mb"] = round(_du(f"{work}/bq/codes") / 1e6, 1)
        row["sq8_codes_mb"] = round(_du(f"{work}/sq8/codes") / 1e6, 1)

        t0 = time.time()
        c1 = search_bq_index(spark, f"{work}/bq", q,
                             shortlist=args.shortlist).count()
        row["bq_search_s"] = round(time.time() - t0, 1)

        t0 = time.time()
        c2 = search_sq8_index(spark, f"{work}/sq8", q,
                              k=args.shortlist).count()
        row["sq8_search_s"] = round(time.time() - t0, 1)

        row["bq_rows"], row["sq8_rows"] = c1, c2
        print(json.dumps(row), flush=True)
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
