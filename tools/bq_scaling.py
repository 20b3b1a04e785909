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

from dedup_scaling import OUT_ROOT, gen_embeddings  # noqa: E402

N_QUERIES = 20


def gen_embeddings_uniform(n: int, seed: int = 23) -> str:
    """Isotropic unit vectors — the WELL-SEPARATED end of the recall
    envelope (the 16-cluster corpus is the dense end: ~n/16 points per
    center with 0.3 jitter, where top-5 distinctions are sub-jitter
    and any binary prefilter needs shortlist ~ cell density)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = os.path.join(OUT_ROOT, f"u{n}")
    path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.Generator(np.random.PCG64(seed))
    vecs = rng.normal(size=(n, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array((np.arange(n) % 16).astype("int32"), pa.int32()),
    }), path)
    return out_dir


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def recall_sweep(scales: list[int], shortlist: int = 50,
                 corpus: str = "clustered") -> None:
    """Fixed-shortlist recall@5 vs corpus size, per code family:
    64-bit midrange sign codes vs 128/256-bit SRP codes — the
    measured form of the 'bits must grow with log(corpus)' rule the
    registered srp_bq_hamming_rerank query pins at small scale.

    Ground truth is exact brute-force cosine (BLAS per Arrow batch,
    per-batch top-(k+1) prune — the sq8_search_topk shape over RAW
    vectors)."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from etl_pipe_spark.operators import bq as BQ
    from etl_pipe_spark.session import get_spark

    spark = get_spark("bq-recall-scaling")
    k = 5
    gen = gen_embeddings_uniform if corpus == "uniform" else gen_embeddings
    for n in scales:
        sf_dir = gen(n)
        emb = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet")
        ).select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        stride = max(1, n // N_QUERIES)
        q = emb.filter(F.col("vec_id") % stride == 0).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
        q_rows = q.collect()
        qids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
        Q = np.array([r["qv"] for r in q_rows], dtype=np.float64)
        qn = np.linalg.norm(Q, axis=1)

        def exact_op(batches, qids=qids, Q=Q, qn=qn):
            for b in batches:
                ids = np.asarray(b.column(0), dtype=np.int64)
                nb = len(ids)
                if nb == 0:
                    continue
                dim = Q.shape[1]
                X = np.asarray(b.column(1).flatten(),
                               dtype=np.float64).reshape(nb, dim)
                xn = np.linalg.norm(X, axis=1)
                xn[xn == 0.0] = 1.0
                s = (Q @ X.T) / (qn[:, None] * xn[None, :])
                take = min(k + 1, nb)
                top = np.argpartition(-s, take - 1, axis=1)[:, :take]
                yield pa.record_batch({
                    "query_id": np.repeat(qids, take),
                    "neighbor_id": ids[top.reshape(-1)],
                    "score": np.take_along_axis(s, top, axis=1).reshape(-1),
                })

        cand = emb.mapInArrow(
            exact_op, "query_id bigint, neighbor_id bigint, score double")
        w = W.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("neighbor_id"))
        t0 = time.time()
        truth_rows = (
            cand.filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)
            .select("query_id", "neighbor_id").collect()
        )
        brute_s = time.time() - t0
        truth: dict[int, set] = {}
        for r in truth_rows:
            truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

        emb_cache = emb.persist()
        emb_cache.count()
        row = {"n": n, "corpus": corpus, "n_queries": len(qids),
               "shortlist": shortlist, "brute_s": round(brute_s, 1)}
        for fam, bits in (("mid64", 64), ("srp128", 128), ("srp256", 256)):
            t0 = time.time()
            if fam == "mid64":
                thr = BQ.bq_thresholds(emb_cache)
                codes = BQ.bq_pack_kernel(emb_cache, thr)
                pq_ = BQ.bq_pack_kernel(
                    q.withColumnRenamed("query_id", "vec_id")
                    .withColumnRenamed("qv", "v"), thr
                ).withColumnRenamed("vec_id", "query_id")
                for wd in range(BQ.n_words(bits)):
                    pq_ = pq_.withColumnRenamed(f"code{wd}", f"qcode{wd}")
            else:
                codes = BQ.srp_pack_kernel(emb_cache, bits, prefix="code")
                pq_ = BQ.srp_pack_kernel(q, bits, id_col="query_id",
                                         vec_col="qv", prefix="qcode")
            short = BQ.hamming_shortlist_kernel(codes, pq_, bits, shortlist)
            # exact rerank on the driver: shortlist is queries x C rows
            srows = short.collect()
            wall = time.time() - t0
            ids_needed = sorted({r["neighbor_id"] for r in srows})
            vec_map = {
                r["vec_id"]: np.array(r["v"]) for r in
                emb_cache.filter(F.col("vec_id").isin(ids_needed)).collect()
            }
            qvec = {int(i): Q[j] for j, i in enumerate(qids)}
            per_q: dict[int, list] = {}
            for r in srows:
                per_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
            hits = tot = 0
            for qid, cands in per_q.items():
                qv = qvec[qid]
                scores = sorted(
                    ((-float(np.dot(qv, vec_map[c])
                             / (np.linalg.norm(qv)
                                * np.linalg.norm(vec_map[c]))), c)
                     for c in cands))
                sel = {c for _, c in scores[:k]}
                hits += len(sel & truth.get(qid, set()))
                tot += len(truth.get(qid, set()))
            row[f"{fam}_recall"] = round(hits / tot, 3) if tot else None
            row[f"{fam}_s"] = round(wall, 1)
        emb_cache.unpersist()
        print(json.dumps(row), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1000000,4000000")
    ap.add_argument("--shortlist", type=int, default=100)
    ap.add_argument("--recall-scales", default=None,
                    help="run the fixed-shortlist recall sweep instead")
    ap.add_argument("--corpus", default="clustered",
                    choices=["clustered", "uniform"])
    args = ap.parse_args()
    if args.recall_scales:
        recall_sweep([int(s) for s in args.recall_scales.split(",")],
                     shortlist=50, corpus=args.corpus)
        return
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
