"""Product-quantization kernels: encode parity vs a numpy reference,
ADC top-k correctness incl. tie-stable pruning and chunked query
budgets, and the fused per-subspace Lloyd fit's invariants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_pipe_spark.operators import pq as PQ


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from etl_pipe_spark.plans.dedup_plans import _emb_with_norms

    return _emb_with_norms(spark, sf_dir).select("vec_id", "v")


@pytest.fixture(scope="module")
def ref(emb):
    """(ids, X, codebooks, codes) numpy reference computed once."""
    X = {r[0]: np.asarray(r[1], dtype=np.float64) for r in emb.collect()}
    ids = sorted(X)
    cb = PQ.pq_codebooks_deterministic(emb)
    xs = np.array([X[i] for i in ids]).reshape(len(ids), PQ.M_SUB, -1)
    d2 = PQ._subspace_d2(xs, cb)
    return ids, X, cb, d2.argmin(axis=2), d2


def test_encode_matches_numpy_reference(emb, ref):
    ids, _, cb, codes_ref, d2 = ref
    got = {r[0]: (np.array(r[1]), r[2]) for r in PQ.pq_encode(emb, cb).collect()}
    assert set(got) == set(ids)
    for j, i in enumerate(ids):
        assert (got[i][0] == codes_ref[j]).all()
        assert abs(got[i][1] - d2[j].min(axis=1).sum()) < 1e-9


def test_encode_partition_invariant(emb, ref):
    _, _, cb, _, _ = ref
    a = sorted(map(tuple, PQ.pq_encode(emb, cb)
                   .select("vec_id", "codes").collect()))
    b = sorted(map(tuple, PQ.pq_encode(emb.repartition(7), cb)
                   .select("vec_id", "codes").collect()))
    assert a == b


def _brute_adc(qid, ids, X, cb, codes_ref, k=5):
    lut = PQ._subspace_d2(X[qid].reshape(1, PQ.M_SUB, -1), cb)[0]
    sc = lut[np.arange(PQ.M_SUB)[None, :], codes_ref].sum(axis=1)
    sc = sc.astype(np.float64)
    sc[ids.index(qid)] = np.inf
    order = np.lexsort((np.array(ids), sc))[:k]
    return [ids[o] for o in order]


def test_adc_topk_matches_brute_lut(emb, ref):
    ids, X, cb, codes_ref, _ = ref
    enc = PQ.pq_encode(emb, cb)
    queries = emb.filter(F.col("vec_id") % 100 == 0) \
                 .withColumnRenamed("vec_id", "query_id")
    got = PQ.pq_adc_topk(enc, queries, cb, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rnk, r.neighbor_id))
    for qid, rows in by_q.items():
        assert [n for _, n in sorted(rows)] == _brute_adc(qid, ids, X, cb, codes_ref)


def test_adc_chunked_budget_identical(emb, ref):
    """A query-byte budget small enough to force multiple passes must
    return the identical ranking (per-query results are independent)."""
    ids, X, cb, codes_ref, _ = ref
    enc = PQ.pq_encode(emb, cb)
    queries = emb.filter(F.col("vec_id") % 100 == 0) \
                 .withColumnRenamed("vec_id", "query_id")
    wide = sorted(map(tuple, PQ.pq_adc_topk(enc, queries, cb, k=5).collect()))
    tight = sorted(map(tuple, PQ.pq_adc_topk(
        enc, queries, cb, k=5, max_query_bytes=len(X[ids[0]]) * 8).collect()))
    assert wide == tight and len(wide) > 0


def test_query_chunks_budget_the_lut_not_the_raw_matrix(ref):
    """The chunk budget must charge m*ksub*8 bytes per query (the ADC
    LUT each chunk materializes on the driver and ships in the task
    closure), not dim*8 (the raw query matrix, 32x smaller at the
    production m=8/ksub=256 defaults) — otherwise a 64 MB budget
    admits a multi-GB LUT."""
    ids, X, cb, _, _ = ref
    m, ksub, dsub = cb.shape
    dim = m * dsub
    assert m * ksub > dim, "fixture must exercise the LUT-dominant regime"
    q_rows = [(i, X[i].tolist()) for i in ids[:8]]
    lut_bytes = m * ksub * 8
    # budget = exactly 2 queries' worth of LUT -> ceil(8/ceil(8/4))=4 chunks
    chunks = list(PQ._query_chunks(q_rows, cb, max_query_bytes=2 * lut_bytes))
    assert len(chunks) == 4
    for qids, lut in chunks:
        assert lut.shape == (len(qids), m, ksub)
        # per-chunk LUT really is within budget
        assert lut.nbytes <= 2 * lut_bytes


def test_adc_tie_stable_across_batches(spark):
    """Duplicate vectors score identically; the survivor set must be
    the lowest neighbor_ids regardless of batch boundaries."""
    base = np.eye(4, 8)[0]
    rows = [(i, (base + (0.001 * (i // 10))).tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>") \
               .repartition(5)
    cb = PQ.pq_codebooks_deterministic(emb, m=2, ksub=4)
    enc = PQ.pq_encode(emb, cb)
    queries = emb.filter(F.col("vec_id") == 0) \
                 .withColumnRenamed("vec_id", "query_id")
    got = [r.neighbor_id for r in
           PQ.pq_adc_topk(enc, queries, cb, k=5).orderBy("rnk").collect()]
    # ids 1..9 share vec 0's codes (score ties) -> lowest ids win
    assert got == [1, 2, 3, 4, 5]


def test_fit_err_non_increasing_and_improves(emb):
    fit = PQ.pq_fit(emb, max_iters=5)
    assert fit.n_iters <= 5 and len(fit.errs) == fit.n_iters
    assert all(b <= a + 1e-9 for a, b in zip(fit.errs, fit.errs[1:]))
    cb0 = PQ.pq_codebooks_deterministic(emb)
    e0 = PQ.pq_encode(emb, cb0).agg(F.avg("qerr")).first()[0]
    e1 = PQ.pq_encode(emb, fit.codebooks).agg(F.avg("qerr")).first()[0]
    assert e1 <= e0 + 1e-9


def test_fit_partition_invariant(emb):
    """Quantized int64 partial sums commute: the fitted codebooks are
    bit-identical under any input partitioning."""
    a = PQ.pq_fit(emb, max_iters=2)
    b = PQ.pq_fit(emb.repartition(11), max_iters=2)
    assert a.n_iters == b.n_iters
    assert (a.codebooks == b.codebooks).all()
