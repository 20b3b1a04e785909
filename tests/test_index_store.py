"""Persisted IVFPQ index: build/search/append round trips.

The load-bearing property: searching the PERSISTED index returns
literally the same (query_id, neighbor_id, rnk) triples as running the
oracle-checked in-memory IVFADC pipeline with the same centroids and
codebooks — persistence must not be a second implementation.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_pipe_spark.operators import pq as PQ
from etl_pipe_spark.operators.ann import centroid_matrix, ivf_assign_vectorized
from etl_pipe_spark.operators.index_store import (
    append_to_ivfpq_index, build_ivfpq_index, load_index_meta,
    search_ivfpq_index)
from etl_pipe_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") % 100 == 0) \
              .withColumnRenamed("vec_id", "query_id")


def test_persisted_search_equals_in_memory_pipeline(spark, emb, queries,
                                                    tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    stats = build_ivfpq_index(spark, emb, path)
    assert stats["n_vectors"] == emb.count()

    got = sorted(
        tuple(r) for r in
        search_ivfpq_index(spark, path, queries, k=5, nprobe=2).collect())

    # reference: the oracle-checked in-memory path with the identical
    # deterministic centroids + codebooks
    cent_ids, cent_mat = centroid_matrix(emb, stats["k"])
    cb = PQ.pq_codebooks_deterministic(emb, m=stats["m"], ksub=stats["ksub"])
    enc = PQ.pq_encode(emb, cb)
    ranked = ivf_assign_vectorized(emb, cent_ids, cent_mat, nprobe=2)
    ref = sorted(
        tuple(r) for r in
        PQ.ivfpq_adc_topk(enc, ranked, queries, cb, k=5, nprobe=2).collect())
    assert got == ref and len(got) > 0


def test_search_prunes_codes_partitions(spark, emb, queries, tmp_path_factory):
    """The codes scan must carry a cell_bucket PartitionFilter — the
    mechanism that keeps a 10^9-vector search from listing every
    codes file."""
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    build_ivfpq_index(spark, emb, path)
    one_q = queries.limit(1)
    out = search_ivfpq_index(spark, path, one_q, k=5, nprobe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell_bucket" in plan
    # one query, nprobe=1 -> at most one bucket of files survives
    assert out.count() == 5


def test_append_is_incremental_and_searchable(spark, emb, tmp_path_factory):
    """Appending re-encodes ONLY the batch with the frozen quantizer;
    appended near-copies of a probe vector must dominate its top-k."""
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    build_ivfpq_index(spark, emb, path)
    n0 = load_index_meta(spark, path)["n_vectors"]

    base = emb.filter(F.col("vec_id") == 0).first()
    new_ids = [10_000_000 + i for i in range(3)]
    batch = spark.createDataFrame(
        [(i, list(base["v"])) for i in new_ids],
        "vec_id bigint, v array<double>")
    out = append_to_ivfpq_index(spark, batch, path)
    assert out == {"appended": 3, "n_vectors": n0 + 3}

    # frozen-quantizer contract: byte-identical vectors encode to the
    # SAME codes and land in the SAME cell as their original — the
    # saved centroids/codebooks, not re-derived ones, did the encoding
    codes = spark.read.parquet(f"{path}/codes")
    ref = codes.filter(F.col("vec_id") == 0).first()
    for r in codes.filter(F.col("vec_id").isin(new_ids)).collect():
        assert list(r["codes"]) == list(ref["codes"])
        assert r["cent_id"] == ref["cent_id"]

    # and the appended rows are immediately searchable
    q = spark.createDataFrame([(0, list(base["v"]))],
                              "query_id bigint, v array<double>")
    got = search_ivfpq_index(spark, path, q, k=5, nprobe=1).collect()
    assert len(got) == 5
    assert all(r["neighbor_id"] != 0 for r in got)  # self excluded


# ---------------------------------------------------------------------------
# SQ8 leg (round 7)
# ---------------------------------------------------------------------------

def test_sq8_persisted_search_equals_in_memory(spark, emb, queries,
                                               tmp_path_factory):
    """Search over the persisted SQ8 codes must equal the in-memory
    stats->encode->search pipeline row for row (same kernel, loaded
    decoder)."""
    from etl_pipe_spark.operators.index_store import (
        build_sq8_index, search_sq8_index)
    from etl_pipe_spark.operators.sq8 import (
        sq8_encode, sq8_search_topk, sq8_stats)

    path = str(tmp_path_factory.mktemp("sq8") / "idx")
    meta = build_sq8_index(spark, emb, path)
    assert meta["n_vectors"] == emb.count()

    q = queries.select("query_id", F.col("v").alias("qv"))
    got = sorted(
        tuple(r) for r in
        search_sq8_index(spark, path, q, k=7).collect()
    )
    lo, scale = sq8_stats(emb)
    want = sorted(
        tuple(r) for r in
        sq8_search_topk(sq8_encode(emb, lo, scale), q, lo, scale, k=7)
        .collect()
    )
    assert got == want


def test_sq8_append_frozen_quantizer(spark, emb, tmp_path_factory):
    """Append must encode ONLY the batch with the SAVED (lo, scale):
    byte-identical vectors get byte-identical codes, history bytes are
    untouched, out-of-range values clip to the code range ends, and
    appended rows are immediately searchable."""
    from etl_pipe_spark.operators.index_store import (
        append_to_sq8_index, build_sq8_index, search_sq8_index)

    path = str(tmp_path_factory.mktemp("sq8") / "idx")
    build_sq8_index(spark, emb, path)
    before = {r["vec_id"]: bytes(r["codes"])
              for r in spark.read.parquet(f"{path}/codes").collect()}

    base = emb.filter(F.col("vec_id") == 0).first()
    dim = len(base["v"])
    batch = spark.createDataFrame(
        [(10_000_000, list(base["v"])),
         (10_000_001, [1e9] * dim),     # far above every saved max
         (10_000_002, [-1e9] * dim)],   # far below every saved min
        "vec_id bigint, v array<double>")
    out = append_to_sq8_index(spark, batch, path)
    assert out["appended"] == 3

    after = {r["vec_id"]: bytes(r["codes"])
             for r in spark.read.parquet(f"{path}/codes").collect()}
    # history untouched, copy identical, extremes clipped
    assert {k: v for k, v in after.items() if k in before} == before
    assert after[10_000_000] == before[0]
    assert after[10_000_001] == bytes([255] * dim)
    assert after[10_000_002] == bytes([0] * dim)

    q = spark.createDataFrame([(0, list(base["v"]))],
                              "query_id bigint, qv array<double>")
    got = search_sq8_index(spark, path, q, k=5).collect()
    assert len(got) == 5
    assert all(r["neighbor_id"] != 0 for r in got)      # self excluded
    assert any(r["neighbor_id"] == 10_000_000 for r in got)  # copy found


# ---------------------------------------------------------------------------
# LSH leg (round 7)
# ---------------------------------------------------------------------------

def test_lsh_persisted_probe_equals_in_memory(spark, sf_dir, tmp_path_factory):
    """Probing the persisted band/shingle tables must produce the same
    verified pairs as the all-in-memory probe pipeline."""
    from etl_pipe_spark.operators.dedup import (
        jaccard_verify, lsh_probe_pairs, minhash_signatures_arrays,
        shingle_arrays)
    from etl_pipe_spark.operators.index_store import (
        build_lsh_index, probe_lsh_index)
    from etl_pipe_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)

    path = str(tmp_path_factory.mktemp("lsh") / "idx")
    meta = build_lsh_index(spark, hist, path)
    assert meta["n_docs"] == hist.count()

    got = sorted(
        (r["left_id"], r["right_id"], round(r["jaccard"], 12))
        for r in probe_lsh_index(spark, path, batch, threshold=0.5).collect()
    )
    sharr = shingle_arrays(docs, n=3)
    cand = lsh_probe_pairs(
        minhash_signatures_arrays(sharr.filter(F.col("doc_id") % 5 != 0)),
        minhash_signatures_arrays(sharr.filter(F.col("doc_id") % 5 == 0)))
    want = sorted(
        (r["left_id"], r["right_id"], round(r["jaccard"], 12))
        for r in jaccard_verify(sharr, cand, 0.5).collect()
    )
    assert got == want and len(got) > 0


def test_lsh_append_only_touches_batch(spark, sf_dir, tmp_path_factory):
    """Append must add ONLY the batch's band/shingle rows (frozen
    shingle_n, immutable history files) and make the appended docs
    immediately matchable: a verbatim copy of a history doc appended
    under a new id must probe back to jaccard 1.0 against it."""
    from etl_pipe_spark.operators.index_store import (
        append_to_lsh_index, build_lsh_index, probe_lsh_index)
    from etl_pipe_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    path = str(tmp_path_factory.mktemp("lsh") / "idx")
    build_lsh_index(spark, hist, path)
    bands_before = spark.read.parquet(f"{path}/bands").count()

    src = hist.orderBy("doc_id").first()
    copy = spark.createDataFrame(
        [(9_000_001, src["text"]), (9_000_002, "utterly novel words only")],
        "doc_id long, text string")
    out = append_to_lsh_index(spark, copy, path)
    assert out["appended"] == 2

    bands_after = spark.read.parquet(f"{path}/bands")
    assert bands_after.count() == bands_before + 2 * 4  # N_BANDS rows each
    assert bands_after.filter(F.col("doc_id") == 9_000_001).count() == 4

    probe = spark.createDataFrame(
        [(9_100_000, src["text"])], "doc_id long, text string")
    hits = {r["left_id"]: r["jaccard"]
            for r in probe_lsh_index(spark, path, probe).collect()}
    assert hits.get(src["doc_id"]) == 1.0     # original still matches
    assert hits.get(9_000_001) == 1.0          # appended copy matches too
