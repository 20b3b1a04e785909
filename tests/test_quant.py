"""Binary quantization (operators/bq.py + plans/quant_plans.py).

The cross-engine oracle (tests/test_oracle_parity.py) certifies the
full query; these tests pin the kernel invariants independently:

* pack parity — the Catalyst CASE-sum words equal a numpy bit-pack of
  the same thresholds, bit for bit;
* hamming parity — ``bit_count(xor)`` over the packed words equals the
  unpacked per-dimension disagreement count (the packed/unpacked
  differential the oracle relies on);
* word-range safety — every packed word is in [0, 2^32), so the
  CASE-sum can never overflow bigint under ANSI arithmetic;
* threshold determinism — midrange thresholds are reproducible across
  recomputation (min/max exact + one IEEE add/halving).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_pipe_spark.functions import vectors as VX
from etl_pipe_spark.operators import bq as BQ
from etl_pipe_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", VX.as_double(F.col("embedding")).alias("v"))
    )


def _np_pack(vecs: np.ndarray, thresholds: np.ndarray) -> np.ndarray:
    """Independent numpy model of bq_pack's word layout."""
    bits = (vecs > thresholds[None, :]).astype(np.uint64)
    dim = vecs.shape[1]
    words = np.zeros((vecs.shape[0], BQ.n_words(dim)), dtype=np.uint64)
    for d in range(dim):
        w, j = divmod(d, BQ.BITS_PER_WORD)
        words[:, w] |= bits[:, d] << np.uint64(j)
    return words.astype(np.int64)


def test_pack_matches_numpy_model(spark, emb):
    thresholds = BQ.bq_thresholds(emb)
    dim = len(thresholds)
    packed = (
        BQ.bq_pack(emb, thresholds, "v", prefix="code")
        .orderBy("vec_id")
        .collect()
    )
    vecs = np.array([r["v"] for r in packed], dtype=np.float64)
    model = _np_pack(vecs, np.array(thresholds))
    for i, row in enumerate(packed):
        got = [row[f"code{w}"] for w in range(BQ.n_words(dim))]
        assert got == list(model[i]), f"vec {row['vec_id']}: {got} != {list(model[i])}"


def test_words_fit_32_bits(spark, emb):
    thresholds = BQ.bq_thresholds(emb)
    dim = len(thresholds)
    packed = BQ.bq_pack(emb, thresholds, "v", prefix="code")
    conds = [
        (F.col(f"code{w}") < 0) | (F.col(f"code{w}") >= F.lit(1 << 32))
        for w in range(BQ.n_words(dim))
    ]
    bad = packed.filter(conds[0] if len(conds) == 1 else conds[0] | conds[1])
    assert bad.count() == 0


def test_hamming_equals_unpacked_disagreements(spark, emb):
    thresholds = BQ.bq_thresholds(emb)
    dim = len(thresholds)
    sample = BQ.bq_pack(emb, thresholds, "v", prefix="code").limit(40).collect()
    vecs = np.array([r["v"] for r in sample])
    bits = vecs > np.array(thresholds)[None, :]
    words = np.array(
        [[r[f"code{w}"] for w in range(BQ.n_words(dim))] for r in sample],
        dtype=np.int64,
    )
    # packed popcount-of-xor vs unpacked disagreement count, all pairs
    for i in range(len(sample)):
        for j in range(i + 1, len(sample)):
            unpacked = int((bits[i] != bits[j]).sum())
            packed_ham = sum(
                bin(int(words[i, w]) ^ int(words[j, w])).count("1")
                for w in range(BQ.n_words(dim))
            )
            assert packed_ham == unpacked


def test_thresholds_deterministic(spark, emb):
    assert BQ.bq_thresholds(emb) == BQ.bq_thresholds(emb)


def test_pack_kernel_byte_parity_with_expression(spark, emb):
    """The Arrow build kernel must emit byte-identical code words to
    the Catalyst expression route (the winnowing/lsh_build_kernel
    convention: expression = oracle surface, kernel = fast path)."""
    thresholds = BQ.bq_thresholds(emb)
    dim = len(thresholds)
    cols = ["vec_id"] + [f"code{w}" for w in range(BQ.n_words(dim))]
    expr = sorted(
        tuple(r) for r in
        BQ.bq_pack(emb, thresholds, "v", prefix="code")
        .select(*cols).collect())
    kern = sorted(
        tuple(r) for r in
        BQ.bq_pack_kernel(emb, thresholds).select(*cols).collect())
    assert kern == expr and len(kern) > 0


def test_search_kernel_exactly_equals_expression(spark, emb):
    """The Arrow Hamming search kernel must return literally the same
    (query_id, neighbor_id, hamming) triples as the Catalyst
    expression route — integer math, no ulp caveat.  Shortlist of 7
    forces boundary ties to be cut, exercising the kernel's exact
    tie-resolution path."""
    thresholds = BQ.bq_thresholds(emb)
    dim = len(thresholds)
    codes = BQ.bq_pack(emb, thresholds, "v", prefix="code")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    packed_q = BQ.bq_pack(q, thresholds, "qv", prefix="qcode").drop("qv")
    for shortlist in (7, 25):
        expr = sorted(tuple(r) for r in BQ.hamming_shortlist(
            codes, packed_q, dim, shortlist).collect())
        kern = sorted(tuple(r) for r in BQ.hamming_shortlist_kernel(
            codes, packed_q, dim, shortlist).collect())
        assert kern == expr and len(kern) > 0


def test_srp_sign_bits_are_integer_exact(spark, emb):
    """The SRP pack's sign bits must equal an independent PURE-PYTHON
    integer recomputation (no numpy, no floats after quantization) —
    the property that licenses hash-certifying a numpy matmul."""
    from etl_pipe_spark.operators.similarity import plane_weight

    n_bits = 64  # one word's worth is enough to pin the construction
    rows = (
        BQ.srp_pack_kernel(emb.limit(25), n_bits, prefix="code")
        .join(emb.limit(25), "vec_id").collect()
    )
    assert rows
    import math
    for r in rows:
        vq = [math.floor(x * BQ.SRP_SCALE + 0.5) for x in r["v"]]
        w0 = sum(1 << i for i in range(32) if sum(
            q * plane_weight(i, d) for d, q in enumerate(vq)) >= 0)
        w1 = sum(1 << (i - 32) for i in range(32, 64) if sum(
            q * plane_weight(i, d) for d, q in enumerate(vq)) >= 0)
        assert (r["code0"], r["code1"]) == (w0, w1)


def test_registered_query_shape(spark, sf_dir):
    from etl_pipe_spark.plans.quant_plans import BQ_TOPK, bq_hamming_rerank

    out = bq_hamming_rerank(spark, sf_dir)
    assert out.columns == [
        "query_id", "neighbor_id", "hamming", "rnk", "recall_ge_floor"]
    rows = out.collect()
    assert rows, "no output rows"
    per_q: dict[int, list[int]] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rnk"])
        assert 0 <= r["hamming"] <= 64
        assert r["recall_ge_floor"] is True  # floor holds at the test sf
    for q, rnks in per_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= BQ_TOPK


def test_ivfbq_registered_query_shape_and_cell_restriction(spark, sf_dir):
    """IVF x BQ composition (round 9): output shape, rank permutations,
    and the cell restriction — every returned neighbor must share a
    probed cell with its query (the IVF pruning is real, not a flat
    scan with extra steps)."""
    from etl_pipe_spark.plans.dedup_plans import _emb_with_norms, _ivf_ranked
    from etl_pipe_spark.plans.quant_plans import (
        BQ_TOPK, IVFBQ_NPROBE, ivfbq_ann_rerank)

    out = ivfbq_ann_rerank(spark, sf_dir)
    assert out.columns == [
        "query_id", "neighbor_id", "hamming", "rnk", "recall_ge_floor"]
    rows = out.collect()
    assert rows, "no output rows"
    per_q: dict[int, list[int]] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rnk"])
        assert 0 <= r["hamming"] <= 64
    for q, rnks in per_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= BQ_TOPK

    ranked = _ivf_ranked(_emb_with_norms(spark, sf_dir))
    cell = {(r["vec_id"], r["cent_id"])
            for r in ranked.filter(F.col("rn") == 1)
            .select("vec_id", "cent_id").collect()}
    probed: dict[int, set[int]] = {}
    for r in (ranked.filter(F.col("rn") <= IVFBQ_NPROBE)
              .select("vec_id", "cent_id").collect()):
        probed.setdefault(r["vec_id"], set()).add(r["cent_id"])
    for r in rows:
        n_cell = next(c for (v, c) in cell if v == r["neighbor_id"])
        assert n_cell in probed[r["query_id"]], (
            f"neighbor {r['neighbor_id']} outside query "
            f"{r['query_id']}'s probed cells")
