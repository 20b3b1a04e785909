"""Scaling sweep for the corpus-curation batch-4 operators.

Reuses the dedup_scaling synthetic corpora (boilerplate-heavy: 30% of
docs share an 8-word preamble — exactly the repeated "paragraph" the
segment dedup must collapse) and times:

  * paragraph_dedup_reassemble's pipeline, md5-keyed first-occurrence
    window vs the naive raw-string window key (the scale claim under
    test: a fixed 32-byte exchange key vs shipping arbitrary-length
    segment text through the shuffle);
  * curriculum_quantile_interleave's two two-phase ranks (the claim:
    no single-task sort — wall time stays near-linear in N);
  * ngram_novelty_score's md5-keyed reference join (the claim: linear
    in corpus trigram count).

Usage:  python tools/curation_scaling.py [--scales 250000,1000000]
Prints one JSON line per (op, N) with wall seconds + result invariants.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tools.dedup_scaling import gen_corpus  # same corpus, same seed


def _spark():
    from etl_pipe_spark.session import get_spark
    return get_spark("curation-scaling", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))


def para_pipeline(docs, key_md5: bool):
    from etl_pipe_spark.functions.text import ws_tokens
    from etl_pipe_spark.plans.corpus_plans4 import _SEG

    toks = ws_tokens(F.col("text"))
    n_segs = F.ceil(F.size(toks) / F.lit(float(_SEG))).cast("int")
    seg_arr = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * _SEG + 1, _SEG)),
    )
    segs = docs.select("doc_id", F.posexplode(seg_arr).alias("seg_no", "seg_text"))
    key = F.md5("seg_text") if key_md5 else F.col("seg_text")
    w = W.partitionBy(key).orderBy("doc_id", "seg_no")
    marked = segs.withColumn("rn", F.row_number().over(w))
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        )
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_segs").alias("segs"),
            F.sum("n_kept").alias("kept"),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="250000,1000000")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    spark = _spark()
    from etl_pipe_spark.functions.text import shingles, token_count, ws_tokens
    from etl_pipe_spark.operators.ordering import ranked_running_sum
    from etl_pipe_spark.plans.corpus_plans4 import _NB

    for n in scales:
        sf_dir = gen_corpus(n)
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        docs = docs.repartition(64).persist()
        docs.count()

        # -- paragraph dedup: md5 key vs raw-string key ----------------
        for key_md5 in (True, False):
            t0 = time.time()
            row = para_pipeline(docs, key_md5).collect()[0]
            wall = time.time() - t0
            print(json.dumps({
                "op": "paragraph_dedup", "n_docs": n,
                "key": "md5" if key_md5 else "raw",
                "wall_s": round(wall, 2),
                "segs": row["segs"], "kept": row["kept"],
            }), flush=True)

        # -- curriculum schedule ---------------------------------------
        t0 = time.time()
        base = docs.select(
            "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
        ).persist()
        n_row = F.broadcast(base.agg(F.count(F.lit(1)).cast("long").alias("n")))
        ranked = ranked_running_sum(
            base, [F.col("n_tokens"), F.col("doc_id")], None, rank_name="rnk"
        ).crossJoin(n_row)
        bucketed = ranked.select(
            "doc_id", "rnk", "n",
            F.expr(f"((rnk - 1) * {_NB}) DIV n").alias("bucket"),
        ).withColumn(
            "rank_in_bucket", F.expr(f"rnk - (bucket * n + {_NB} - 1) DIV {_NB}")
        ).persist()
        sched = ranked_running_sum(
            bucketed, [F.col("rank_in_bucket"), F.col("bucket")], None,
            rank_name="schedule_pos",
        )
        chk = sched.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("schedule_pos").alias("pos_sum"),
            F.countDistinct("bucket").alias("buckets"),
        ).collect()[0]
        wall = time.time() - t0
        base.unpersist(); bucketed.unpersist()
        assert chk["pos_sum"] == n * (n + 1) // 2, "schedule_pos not a permutation"
        print(json.dumps({
            "op": "curriculum", "n_docs": n, "wall_s": round(wall, 2),
            "rows": chk["rows"], "buckets": chk["buckets"],
        }), flush=True)

        # -- novelty ----------------------------------------------------
        t0 = time.time()
        tri = docs.select(
            "doc_id",
            F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("gram"),
        ).select("doc_id", F.md5("gram").alias("gkey"))
        ref = (tri.filter(F.col("doc_id") % 2 == 0).select("gkey").distinct()
               .withColumn("hit", F.lit(1)))
        tgt = tri.filter(F.col("doc_id") % 2 == 1)
        out = (tgt.join(ref, "gkey", "left")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_grams"),
                    F.sum(F.when(F.col("hit").isNull(), 1).otherwise(0))
                    .alias("n_novel")))
        chk = out.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_grams").alias("grams"),
            F.sum("n_novel").alias("novel"),
        ).collect()[0]
        wall = time.time() - t0
        print(json.dumps({
            "op": "novelty", "n_docs": n, "wall_s": round(wall, 2),
            "docs": chk["docs"], "grams": chk["grams"], "novel": chk["novel"],
        }), flush=True)

        docs.unpersist()


if __name__ == "__main__":
    main()
