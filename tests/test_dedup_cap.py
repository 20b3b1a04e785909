"""Hot-shingle document-frequency cap: candidate-count pinning.

A single corpus-wide stop phrase makes every doc pair a candidate
(O(N^2) through the inverted index); the df cap must cut exactly those
pairs while leaving genuine near-dup pairs — and their exact Jaccard
values — untouched.
"""

from pyspark.sql import functions as F

from etl_pipe_spark.operators import dedup as DD

# 8 docs all opening with the same 6-word boilerplate phrase (every
# shingle of it has df=8), each with a unique tail; docs 6 and 7 share
# a long genuine overlap beyond the boilerplate.
_BOILER = "all rights reserved by the corporation"
_DOCS = [
    (0, f"{_BOILER} alpha beta gamma"),
    (1, f"{_BOILER} delta epsilon zeta"),
    (2, f"{_BOILER} eta theta iota"),
    (3, f"{_BOILER} kappa lam mu"),
    (4, f"{_BOILER} nu xi omicron"),
    (5, f"{_BOILER} pi rho sigma"),
    (6, f"{_BOILER} shared tail text here tau"),
    (7, f"{_BOILER} shared tail text here phi"),
]


def _shingles(spark):
    docs = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    return DD.shingle_sets(docs, n=3)


def test_uncapped_index_is_quadratic_in_hot_bucket(spark):
    sh = _shingles(spark)
    # Boilerplate shingles put every pair in the candidate set: C(8,2).
    assert DD.index_candidates(sh).count() == 28


def test_cap_cuts_boilerplate_pairs_keeps_real_overlap(spark):
    sh = _shingles(spark)
    cand = DD.index_candidates(sh, max_df=4)
    rows = {(r.left_id, r.right_id) for r in cand.collect()}
    assert rows == {(6, 7)}, rows


def test_capped_postings_drops_exactly_hot_shingles(spark):
    sh = _shingles(spark)
    kept = DD.capped_postings(sh, max_df=4)
    hot = (
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 4).count()
    )
    assert hot > 0  # fixture really has hot shingles
    assert kept.select("shingle").distinct().count() == (
        sh.select("shingle").distinct().count() - hot
    )


def test_jaccard_value_exact_despite_cap(spark):
    sh = _shingles(spark)
    capped = {
        (r.left_id, r.right_id): r.jaccard
        for r in DD.jaccard_pairs(sh, threshold=0.0, max_df=4).collect()
    }
    full = {
        (r.left_id, r.right_id): r.jaccard
        for r in DD.jaccard_pairs(sh, threshold=0.0).collect()
    }
    # The surviving pair scores on FULL shingle sets: same value as the
    # uncapped computation, not the capped-index intersection.
    assert capped.keys() == {(6, 7)}
    assert capped[(6, 7)] == full[(6, 7)]


def test_pipeline_dedup_stage_is_capped(spark):
    """The composed curation pipeline must call the CAPPED dedup shape:
    a corpus-wide boilerplate shingle (df > MAX_DF) may not generate
    candidate pairs, while genuine near-dups still drop."""
    from etl_pipe_spark.operators.dedup import jaccard_pairs_capped, shingle_arrays

    sharr = shingle_arrays(spark.createDataFrame(_DOCS, ["doc_id", "text"]), n=3)
    pairs = jaccard_pairs_capped(sharr, threshold=0.0, max_df=4)
    assert {(r.left_id, r.right_id) for r in pairs.collect()} == {(6, 7)}
    # and the pipeline module composes exactly this operator
    import inspect

    from etl_pipe_spark.plans import curation_pipeline as CP

    src = inspect.getsource(CP.corpus_curation_pipeline)
    assert "jaccard_pairs_capped" in src and "max_df=DD.MAX_DF" in src
