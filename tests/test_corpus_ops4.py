"""Behavioral tests for corpus_plans4 (oracle parity for the
registered forms is covered by test_oracle_parity; these pin the
algorithmic invariants on adversarial micro-corpora the synthetic
documents table never produces)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipe_spark.plans import corpus_plans4 as CP4
from etl_pipe_spark.plans.catalog import REGISTRY, _load_all

_load_all()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _run_para(spark, rows):
    """Run the paragraph-dedup pipeline on an inline corpus by
    monkey-free substitution: rebuild the same plan the registered
    query builds, from the given frame."""
    docs = _docs(spark, rows)
    from pyspark.sql.window import Window as W

    from etl_pipe_spark.functions.text import ws_tokens

    toks = ws_tokens(F.col("text"))
    n_segs = F.ceil(F.size(toks) / F.lit(float(CP4._SEG))).cast("int")
    seg_arr = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * CP4._SEG + 1, CP4._SEG)),
    )
    segs = docs.select(
        "doc_id", F.posexplode(seg_arr).alias("seg_no", "seg_text")
    )
    w = W.partitionBy(F.md5("seg_text")).orderBy("doc_id", "seg_no")
    marked = segs.withColumn("rn", F.row_number().over(w))
    kept = F.when(F.col("rn") == 1, F.struct("seg_no", "seg_text"))
    out = (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list(kept)),
                            lambda s: s["seg_text"]), " ",
            ).alias("kept_text"),
        )
    )
    return {r["doc_id"]: r for r in out.collect()}


def test_paragraph_dedup_full_duplicate_doc_empties(spark):
    seg_a = " ".join(["tok%d" % i for i in range(CP4._SEG)])
    seg_b = " ".join(["other%d" % i for i in range(CP4._SEG)])
    rows = [
        (1, seg_a + " " + seg_b),   # owns both segments
        (2, seg_a + " " + seg_b),   # exact duplicate -> fully emptied
        (3, seg_b + " " + seg_a),   # same segments, reversed order -> emptied
    ]
    got = _run_para(spark, rows)
    assert got[1]["n_kept"] == 2 and got[1]["kept_text"] == seg_a + " " + seg_b
    assert got[2]["n_kept"] == 0 and got[2]["kept_text"] == ""
    assert got[3]["n_kept"] == 0 and got[3]["kept_text"] == ""


def test_paragraph_dedup_keeps_original_order_and_partial_tail(spark):
    seg_a = " ".join(["a%d" % i for i in range(CP4._SEG)])
    tail = "short tail"  # partial final segment, < _SEG tokens
    rows = [
        (5, seg_a),                      # owns seg_a first (doc_id 5 < 9)
        (9, seg_a + " " + tail),         # loses seg_a, keeps its tail
    ]
    got = _run_para(spark, rows)
    assert got[9]["n_segs"] == 2
    assert got[9]["n_kept"] == 1
    assert got[9]["kept_text"] == tail
    assert got[5]["n_kept"] == 1


def test_paragraph_dedup_first_occurrence_within_one_doc(spark):
    seg = " ".join(["x%d" % i for i in range(CP4._SEG)])
    rows = [(7, seg + " " + seg)]  # the SAME segment twice in one doc
    got = _run_para(spark, rows)
    assert got[7]["n_segs"] == 2
    assert got[7]["n_kept"] == 1
    assert got[7]["kept_text"] == seg


def test_curriculum_matches_sequential_ntile_semantics(spark, sf_dir):
    """The closed-form bucket/rib arithmetic must equal the sequential
    definition: rank rows, cut into _NB contiguous rank ranges of
    near-equal size (ntile), number within each range."""
    out = REGISTRY["curriculum_quantile_interleave"].fn(spark, sf_dir)
    rows = sorted((r["bucket"], r["rank_in_bucket"], r["doc_id"], r["n_tokens"])
                  for r in out.collect())
    n = len(rows)
    # reconstruct sequentially
    order = sorted(rows, key=lambda r: (r[3], r[2]))
    expect = {}
    for i, r in enumerate(order):
        rnk = i + 1
        b = (rnk - 1) * CP4._NB // n
        start = -((-b * n) // CP4._NB)  # ceil(b*n/NB)
        expect[r[2]] = (b, rnk - start)
    for b, rib, doc, _ in rows:
        assert expect[doc] == (b, rib), f"doc {doc}"
    # bucket sizes differ by at most one and cover everything
    sizes = {}
    for b, *_ in rows:
        sizes[b] = sizes.get(b, 0) + 1
    assert sum(sizes.values()) == n
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert set(sizes) == set(range(CP4._NB))


def test_curriculum_schedule_interleaves_buckets(spark, sf_dir):
    """schedule_pos order must visit rank-in-bucket levels in order,
    and within a level the buckets easiest-first."""
    out = REGISTRY["curriculum_quantile_interleave"].fn(spark, sf_dir)
    seq = [(r["schedule_pos"], r["rank_in_bucket"], r["bucket"])
           for r in out.collect()]
    seq.sort()
    assert [s[0] for s in seq] == list(range(1, len(seq) + 1))
    assert [(s[1], s[2]) for s in seq] == sorted((s[1], s[2]) for s in seq)
    # the first _NB scheduled docs are one from EACH bucket
    head = {s[2] for s in seq[:CP4._NB]}
    assert head == set(range(CP4._NB))


def test_novelty_bounds_and_reference_blindness(spark, sf_dir):
    """novelty in [0,1]; n_novel <= n_grams; only odd doc_ids scored."""
    out = REGISTRY["ngram_novelty_score"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows, "no scored docs"
    for r in rows:
        assert r["doc_id"] % 2 == 1
        assert 0 <= r["n_novel"] <= r["n_grams"]
        assert abs(r["novelty"] - r["n_novel"] / r["n_grams"]) < 1e-15


def test_novelty_exact_on_micro_corpus(spark):
    """Hand-checked novelty: target shares exactly one trigram with
    the reference."""
    from etl_pipe_spark.functions.text import shingles

    docs = _docs(spark, [
        (0, "a b c d"),        # reference: trigrams {a b c, b c d}
        (1, "a b c x y"),      # target: {a b c, b c x, c x y} -> 2/3 novel
    ])
    tri = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("gram"),
    ).select("doc_id", F.md5("gram").alias("gkey"))
    ref = (tri.filter(F.col("doc_id") % 2 == 0).select("gkey").distinct()
           .withColumn("hit", F.lit(1)))
    tgt = tri.filter(F.col("doc_id") % 2 == 1)
    got = (tgt.join(ref, "gkey", "left")
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_grams"),
                F.sum(F.when(F.col("hit").isNull(), 1).otherwise(0))
                .alias("n_novel"))).collect()
    assert len(got) == 1
    assert (got[0]["n_grams"], got[0]["n_novel"]) == (3, 2)
