#!/usr/bin/env python
"""Scale evidence for the persisted LSH index (round 7).

The claim under test (operators/index_store.py build/probe/append):
once history's band-key + shingle-set tables are built, a daily
batch's near-dup cost tracks the BATCH — history text is never
re-shingled or re-hashed.  This sweep measures, per corpus size:

  * build    — the one-time index build over history (99% of docs)
  * probe    — a 1% batch probed against the RELOADED files
  * append   — the 1% batch appended under frozen parameters
  * naive    — the unamortized comparator: re-signature history
               in-memory and probe (what every run pays WITHOUT the
               persisted index — the incremental_neardup_lsh shape)
  * winnow   — winnowing_fingerprints over the same corpus (pure
               map pass; should scale ~linearly with bytes)

Corpora come from dedup_scaling.gen_corpus (cached under
/tmp/dedup_scale/n{n}; 30% boilerplate-headed, 1% near-dups).

Usage:  python tools/lsh_index_scaling.py [--scales 250000,1000000]
Prints one JSON line per (scale) row.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dedup_scaling import OUT_ROOT, gen_corpus  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="250000,1000000")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import functions as F

    from etl_pipe_spark.operators.dedup import (
        jaccard_verify, lsh_probe_pairs, minhash_signatures_arrays,
        shingle_arrays)
    from etl_pipe_spark.operators.index_store import (
        append_to_lsh_index, build_lsh_index, probe_lsh_index)
    from etl_pipe_spark.plans.extensions import winnowing_fingerprints
    from etl_pipe_spark.session import get_spark

    spark = get_spark("lsh-index-scaling")
    for n in scales:
        sf_dir = gen_corpus(n)
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")).select("doc_id", "text")
        # Residue 7, NOT 0: gen_corpus's near-dup sources sit at
        # 97*j mod n_base with n_base ≡ 0 (mod 100), so a %100==0
        # batch would alias every batch near-dup's SOURCE into the
        # batch too (97j ≡ 0 whenever j ≡ 0) and the history probe
        # would correctly — but uselessly — find zero pairs.
        hist = docs.filter(F.col("doc_id") % 100 != 7)
        batch = docs.filter(F.col("doc_id") % 100 == 7)
        row: dict = {"n_docs": n, "batch_docs": batch.count()}

        path = os.path.join(OUT_ROOT, f"lshidx_{n}")
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.time()
        build_lsh_index(spark, hist, path)
        row["build"] = round(time.time() - t0, 2)

        t0 = time.time()
        row["probe_pairs"] = probe_lsh_index(spark, path, batch,
                                             threshold=0.5).count()
        row["probe"] = round(time.time() - t0, 2)

        next_day = batch.select(
            (F.col("doc_id") + 10_000_000_000).alias("doc_id"), "text")
        t0 = time.time()
        append_to_lsh_index(spark, next_day, path)
        row["append"] = round(time.time() - t0, 2)

        # Unamortized comparator: every run re-signatures history.
        sharr = shingle_arrays(docs, n=3)
        t0 = time.time()
        hist_sig = minhash_signatures_arrays(
            sharr.filter(F.col("doc_id") % 100 != 7))
        batch_sig = minhash_signatures_arrays(
            sharr.filter(F.col("doc_id") % 100 == 7))
        cand = lsh_probe_pairs(hist_sig, batch_sig)
        row["naive_pairs"] = jaccard_verify(sharr, cand, 0.5).count()
        row["naive"] = round(time.time() - t0, 2)

        # Same unamortized shape on the Arrow kernel route — what the
        # registered incremental_neardup_lsh now runs (round 8): the
        # naive-vs-kernel delta is the batch+history signature cost
        # moving out of the interpreted HOF expression.
        from etl_pipe_spark.operators.dedup import (
            lsh_build_kernel, lsh_probe_pairs_kernel)

        t0 = time.time()
        rows_k = lsh_build_kernel(docs, n=3).persist()
        cand_k = lsh_probe_pairs_kernel(
            rows_k.filter(F.col("doc_id") % 100 != 7),
            rows_k.filter(F.col("doc_id") % 100 == 7))
        row["kernel_pairs"] = jaccard_verify(
            rows_k.select("doc_id", "shingles"), cand_k, 0.5).count()
        row["kernel_inmem"] = round(time.time() - t0, 2)
        rows_k.unpersist()

        t0 = time.time()
        row["winnow_rows"] = winnowing_fingerprints(spark, sf_dir).count()
        row["winnow"] = round(time.time() - t0, 2)

        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
