"""lsh_build_kernel: the one-pass Arrow index-build path must be
byte-identical to the expression route it replaces in the index store
(shingle_arrays -> minhash_signatures_arrays -> lsh_band_keys), which
stays the DuckDB-oracle surface of the in-memory queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipe_spark.operators.dedup import (
    N_BANDS, lsh_band_keys, lsh_build_kernel, minhash_signatures_arrays,
    shingle_arrays)
from etl_pipe_spark.sources.catalog import load_table


def _expr_bands(docs, n):
    return lsh_band_keys(
        minhash_signatures_arrays(shingle_arrays(docs, n=n)))


def _collect_bands(df):
    return sorted((r["doc_id"], r["band"], r["band_key"])
                  for r in df.collect())


def _collect_shingles(df):
    return {r["doc_id"]: list(r["shingles"]) for r in df.collect()}


def test_kernel_matches_expression_on_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rows = lsh_build_kernel(docs, n=3).persist()

    got_sh = _collect_shingles(rows.select("doc_id", "shingles"))
    want_sh = _collect_shingles(shingle_arrays(docs, n=3))
    assert got_sh == want_sh  # exact first-occurrence-distinct order

    got_b = _collect_bands(
        rows.select("doc_id",
                    F.posexplode("band_keys").alias("band", "band_key")))
    want_b = _collect_bands(_expr_bands(docs, 3))
    rows.unpersist()
    assert len(got_b) == len(want_sh) * N_BANDS
    assert got_b == want_b


def test_kernel_matches_expression_on_edge_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c"),                      # exactly n tokens: 1 gram
            (2, "a b"),                        # under n: dropped
            (3, ""),                           # empty: dropped
            (4, "x y z x y z x y z"),          # repeated grams: distinct
            (5, "  spaced   out\ttokens here "),  # whitespace runs + trim
            (6, "MiXeD Case TOKENS mixed case tokens"),  # lowercasing
        ],
        "doc_id long, text string")
    rows = lsh_build_kernel(docs, n=3).persist()

    got_sh = _collect_shingles(rows.select("doc_id", "shingles"))
    want_sh = _collect_shingles(shingle_arrays(docs, n=3))
    assert got_sh == want_sh
    assert set(got_sh) == {1, 4, 5, 6}
    assert len(got_sh[1]) == 1
    assert len(got_sh[4]) < 7                  # distinct collapsed repeats

    got_b = _collect_bands(
        rows.select("doc_id",
                    F.posexplode("band_keys").alias("band", "band_key")))
    want_b = _collect_bands(_expr_bands(docs, 3))
    rows.unpersist()
    assert got_b == want_b


def test_kernel_probe_pairs_match_expression_probe(spark, sf_dir):
    """The cross-set candidate join over kernel frames must produce
    the exact candidate set of the expression-route probe — the
    parity that lets incremental_neardup_lsh ride the kernel while
    keeping the expression-modeled DuckDB oracle (round 8)."""
    from etl_pipe_spark.operators.dedup import (
        lsh_probe_pairs, lsh_probe_pairs_kernel)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rows = lsh_build_kernel(docs, n=3).persist()
    got = sorted(
        tuple(r) for r in lsh_probe_pairs_kernel(
            rows.filter(F.col("doc_id") % 5 != 0),
            rows.filter(F.col("doc_id") % 5 == 0)).collect())

    sharr = shingle_arrays(docs, n=3)
    want = sorted(
        tuple(r) for r in lsh_probe_pairs(
            minhash_signatures_arrays(sharr.filter(F.col("doc_id") % 5 != 0)),
            minhash_signatures_arrays(sharr.filter(F.col("doc_id") % 5 == 0)),
        ).collect())
    rows.unpersist()
    assert got == want and len(got) > 0
