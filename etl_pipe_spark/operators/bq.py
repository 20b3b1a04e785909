"""1-bit binary quantization (sign-bit codes) with Hamming search.

The third quantizer in the family (PQ -> SQ8 -> BQ), and the cheapest:
each dimension collapses to ONE bit — "is the value above this
dimension's threshold" — so a 64-dim float32 vector (256 bytes) packs
into two 32-bit words carried as bigints (32x shrink, 4x under SQ8).
This is the classic sign-bit / binary-hashing scheme (Charikar 2002
SRP is the random-projection cousin; modern engines ship it as "binary
quantization" with an exact-rerank stage, e.g. the BQ mode in FAISS's
IndexBinaryFlat and RaBitQ-style pipelines).

Distances become Hamming: ``bit_count(xor(a, b))`` summed over the
words — two JVM instructions per word inside whole-stage codegen, no
floats, no UDFs.  Because the distance is INTEGER math, the oracle can
hash-certify the shortlist distances exactly (the SQ8/PQ legs can only
certify ranks — their float scores differ from SQL folds at ulp
level).  The cross-engine contract is the unpacked form: packed-word
popcount here MUST equal DuckDB's per-dimension disagreement count,
which is what the registered oracle computes.

Threshold choice: per-dimension MIDRANGE ``(min+max)/2``.  Unlike a
mean (whose partial-sum order differs between engines at ulp level and
could flip a sign bit for values near the threshold), min/max are
exact, and one add + one halving is bit-deterministic in IEEE — so the
bit codes are identical across Spark and DuckDB by construction, the
same determinism argument as SQ8's min/max scale (operators/sq8.py).

Scale (100 TB): thresholds are a dim-row aggregate (bounded collect,
same convention as sq8_stats / kmeans centroids); packing is one
shuffle-free map pass; search scans 8 bytes/vector with the query side
broadcast.  Production composes the codes with the IVF cell index
(probe cells -> Hamming only within members), exactly as the PQ/SQ8
legs do; the flat scan registered in plans/quant_plans.py is the
exact-oracle surface.

Reference scope note: the reference engine (single-node psycopg2 ETL)
has no vector search; this is part of the driver-mandated extension
family (SURVEY §2.12).
"""

from __future__ import annotations

import math
import sys
from collections.abc import Iterator
from functools import reduce
from operator import add

import numpy as np
import pyarrow as pa
from pyspark.sql import Column, DataFrame, functions as F

try:  # same by-value pickling seam as operators/ann.py
    from pyspark import cloudpickle as _cp
except ImportError:  # pragma: no cover
    import cloudpickle as _cp
_cp.register_pickle_by_value(sys.modules[__name__])

# Bits packed per bigint word.  32 (not 64) so every word is a SUM of
# distinct non-negative powers of two < 2^32 — equivalent to bitwise OR
# because the powers are disjoint, and safely inside bigint under ANSI
# arithmetic (bit 63 of a 64-bit pack would be Long.MIN_VALUE and drag
# sign/overflow subtleties into both engines for nothing).
BITS_PER_WORD = 32


def n_words(dim: int) -> int:
    return (dim + BITS_PER_WORD - 1) // BITS_PER_WORD


def bq_thresholds(emb: DataFrame, vec_col: str = "v",
                  with_count: bool = False):
    """Per-dimension midrange thresholds, bit-deterministic across
    engines (min/max exact; one IEEE add + halving).

    One linear Arrow pass (operators/ann.column_minmax_count; round
    9).  A posexplode would shuffle N*dim rows (256M at a 4M x 64
    corpus, measured 3x the whole build) and the previous wide
    2*dim-expression agg paid ~2 s of plan/codegen constant per call
    (128 aggregate expressions at dim 64); the kernel's numpy
    column min/max per batch avoids both, and IEEE min/max is
    associative so the thresholds are bit-identical either way.
    Bounded driver state: dim rows.

    ``with_count=True`` additionally returns the corpus row count from
    the SAME pass, as (thresholds, n) — callers that size shortlists
    or file counts previously paid a separate count() scan (round 9).
    """
    from .ann import column_minmax_count

    lo, hi, n = column_minmax_count(emb, vec_col=vec_col)
    thresholds = [(l + h) / 2.0 for l, h in zip(lo.tolist(), hi.tolist())]
    if with_count:
        return thresholds, n
    return thresholds


def bq_pack(df: DataFrame, thresholds: list[float], vec_col: str,
            prefix: str = "code") -> DataFrame:
    """Append packed sign-bit code words ``{prefix}0..{prefix}{W-1}``.

    Pure Catalyst: per word, 32 CASE terms ``v[d] > t_d ? 1<<j : 0``
    summed (disjoint powers => sum == OR; max 2^32-1, no overflow).
    One shuffle-free map pass inside whole-stage codegen.

    Each word is built as ONE ``F.expr`` SQL string (round 9): the
    per-term Column construction cost ~500 py4j round trips per pack
    call — ~2 s of pure driver time per query invocation — for an
    expression tree the parser produces identically from text.
    Thresholds embed as string-to-double casts, which round-trip
    ``repr(float)`` exactly (Java Double.parseDouble), so the compared
    constants are bit-identical to the old ``F.lit`` form.
    """
    dim = len(thresholds)

    def _t_sql(v: float) -> str:
        # repr(float) round-trips exactly through Double.parseDouble for
        # finite values; 'inf'/'nan' would NULL out under the legacy
        # string cast (ADVICE r9), so spell those as SQL literals.
        if math.isinf(v):
            return "CAST('Infinity' AS DOUBLE)" if v > 0 \
                else "CAST('-Infinity' AS DOUBLE)"
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        return f"CAST('{v!r}' AS DOUBLE)"

    words = []
    for w in range(n_words(dim)):
        terms = []
        for j in range(BITS_PER_WORD):
            d = w * BITS_PER_WORD + j
            if d >= dim:
                break
            terms.append(
                f"(CASE WHEN {vec_col}[{d}] > {_t_sql(thresholds[d])}"
                f" THEN CAST({1 << j} AS BIGINT)"
                f" ELSE CAST(0 AS BIGINT) END)"
            )
        words.append(F.expr(" + ".join(terms)).alias(f"{prefix}{w}"))
    return df.select("*", *words)


def bq_pack_kernel(vecs: DataFrame, thresholds: list[float],
                   id_col: str = "vec_id",
                   vec_col: str = "v") -> DataFrame:
    """Arrow twin of :func:`bq_pack` for the index-store build path:
    one vectorized numpy pass (compare + weighted bit sum) per batch
    instead of 64 codegen'd CASE terms per row.

    Byte-parity with the expression route is pinned by
    tests/test_quant.py (the winnowing / lsh_build_kernel convention:
    the expression IS the oracle surface of the registered in-memory
    query; the kernel is the production build's fast path).
    """
    t = np.asarray(thresholds, dtype=np.float64)
    dim = len(t)
    words = n_words(dim)
    out_schema = ", ".join(
        [f"{id_col} bigint"] + [f"code{w} bigint" for w in range(words)])

    def pack(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0)
            col = batch.column(1)
            flat = col.flatten()
            n = len(col)
            mat = np.asarray(flat, dtype=np.float64).reshape(n, dim) \
                if n else np.zeros((0, dim))
            bits = (mat > t[None, :]).astype(np.uint64)
            arrays: dict = {id_col: ids}
            for w in range(words):
                seg = bits[:, w * BITS_PER_WORD:(w + 1) * BITS_PER_WORD]
                weights = np.uint64(1) << np.arange(
                    seg.shape[1], dtype=np.uint64)
                arrays[f"code{w}"] = pa.array(
                    (seg * weights[None, :]).sum(axis=1).astype(np.int64))
            yield pa.record_batch(arrays)

    return vecs.select(F.col(id_col), F.col(vec_col)).mapInArrow(
        pack, out_schema)


def hamming(left_prefix: str, right_prefix: str, dim: int) -> Column:
    """Hamming distance between two packed codes: popcount of xor,
    summed over words — integer math, exact across engines."""
    parts = [
        F.bit_count(F.col(f"{left_prefix}{w}")
                    .bitwiseXOR(F.col(f"{right_prefix}{w}")))
        .cast("long")
        for w in range(n_words(dim))
    ]
    return reduce(add, parts)


# byte-popcount lookup table for the Arrow search kernel
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)

# Fixed-point scale for the SRP sign projections: vq = floor(v*2^20 +
# 0.5).  Scaling by a power of two is EXACT in IEEE doubles, floor is
# exact, and the projected dot sums (|vq| <~ 2^21 x |w| <= 1000 x 64
# terms < 2^37) stay far under 2^53 — so the sign bits are identical
# across Spark, DuckDB, and numpy REGARDLESS of summation order or
# whether the engine sums in int64 or double.  This is what makes a
# numpy matmul hash-certifiable here, where a float-dot sign would be
# one ulp away from flipping across engines.
SRP_SCALE = 1 << 20


def srp_pack_kernel(vecs: DataFrame, n_bits: int,
                    id_col: str = "vec_id",
                    vec_col: str = "v",
                    prefix: str = "code") -> DataFrame:
    """Pack SRP sign bits into bigint words: bit i = sign of the
    fixed-point integer dot <floor(v*2^20+0.5), plane_i>, planes being
    the md5-derived integer hyperplanes of operators/similarity.py
    (identical constants in Python, Spark SQL, and DuckDB).

    This is the "more bits" scale path of the BQ family: code length
    grows with log(corpus) instead of being capped at dim by the
    midrange sign codes — 256-bit codes hold recall at a FIXED
    shortlist where 64-bit codes decay (measured in
    plans/quant_plans.py).  Integer math end to end: the oracle
    certifies the packed-word popcount against DuckDB's per-plane
    disagreement count exactly.
    """
    from .similarity import plane_weight

    first = vecs.select(vec_col).first()
    if first is None:
        raise ValueError("srp_pack_kernel: empty frame")
    dim = len(first[0])
    planes = np.array(
        [[plane_weight(i, d) for d in range(dim)] for i in range(n_bits)],
        dtype=np.int64,
    )
    words = n_words(n_bits)
    out_schema = ", ".join(
        [f"{id_col} bigint"] + [f"{prefix}{w} bigint" for w in range(words)])

    def pack(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0)
            col = batch.column(1)
            flat = col.flatten()
            n = len(col)
            mat = np.asarray(flat, dtype=np.float64).reshape(n, dim) \
                if n else np.zeros((0, dim))
            vq = np.floor(mat * SRP_SCALE + 0.5).astype(np.int64)
            bits = (vq @ planes.T >= 0).astype(np.uint64)  # (n, n_bits)
            arrays: dict = {id_col: ids}
            for w in range(words):
                seg = bits[:, w * BITS_PER_WORD:(w + 1) * BITS_PER_WORD]
                weights = np.uint64(1) << np.arange(
                    seg.shape[1], dtype=np.uint64)
                arrays[f"{prefix}{w}"] = pa.array(
                    (seg * weights[None, :]).sum(axis=1).astype(np.int64))
            yield pa.record_batch(arrays)

    return vecs.select(F.col(id_col), F.col(vec_col)).mapInArrow(
        pack, out_schema)


def hamming_shortlist_kernel(codes_df: DataFrame,
                             packed_queries: DataFrame,
                             dim: int, shortlist: int) -> DataFrame:
    """Arrow twin of :func:`hamming_shortlist` for the index-store
    search path: per Arrow batch of codes, numpy XOR + byte-table
    popcount against the (bounded, collected) query words, exact
    per-batch top-(shortlist+1) under the total order (hamming,
    neighbor_id), then a global per-query window merge over the
    batches x (shortlist+1) survivors — the sq8_search_topk shape.

    Because Hamming is INTEGER math, the kernel's results are exactly
    equal to the expression route's (no ulp caveat), so the persisted
    path stays certified by the registered query's oracle; equality is
    pinned by tests/test_quant.py and the store's literal-equality
    test.  Per-batch pruning is exact under ties: every row strictly
    under the boundary distance is taken, and boundary ties are
    resolved by ascending neighbor_id — the same total order the final
    window applies, so a batch-local cut can never drop a global
    top-shortlist member.
    """
    from pyspark.sql.window import Window as W

    words = n_words(dim)
    q_rows = packed_queries.collect()
    if not q_rows:
        return codes_df.sparkSession.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, hamming bigint")
    qids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    qw = np.array(
        [[r[f"qcode{w}"] for w in range(words)] for r in q_rows],
        dtype=np.int64,
    ).astype(np.uint64)
    take_n = shortlist + 1  # +1: the self row may occupy a slot

    def op(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = np.asarray(
                b.column(b.schema.get_field_index("vec_id")), dtype=np.int64)
            n = len(ids)
            if n == 0:
                continue
            wmat = np.stack(
                [np.asarray(b.column(b.schema.get_field_index(f"code{w}")),
                            dtype=np.int64) for w in range(words)],
                axis=1,
            ).astype(np.uint64)
            out_q, out_i, out_h = [], [], []
            for qi in range(len(qids)):
                x = wmat ^ qw[qi][None, :]
                ham = _POP8[x.view(np.uint8)].reshape(n, -1) \
                    .sum(axis=1).astype(np.int64)
                take = min(take_n, n)
                part = np.argpartition(ham, take - 1)[:take]
                h_star = int(ham[part].max())
                strict = np.nonzero(ham < h_star)[0]
                ties = np.nonzero(ham == h_star)[0]
                need = take - len(strict)
                tie_sel = ties[np.argsort(ids[ties], kind="stable")[:need]]
                idx = np.concatenate([strict, tie_sel])
                out_q.append(np.full(len(idx), qids[qi], dtype=np.int64))
                out_i.append(ids[idx])
                out_h.append(ham[idx])
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.concatenate(out_q), type=pa.int64()),
                 pa.array(np.concatenate(out_i), type=pa.int64()),
                 pa.array(np.concatenate(out_h), type=pa.int64())],
                ["query_id", "neighbor_id", "hamming"],
            )

    cand = codes_df.select(
        "vec_id", *[f"code{w}" for w in range(words)]
    ).mapInArrow(op, "query_id bigint, neighbor_id bigint, hamming bigint")
    sw = W.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc())
    return (
        cand.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("srnk", F.row_number().over(sw))
        .filter(F.col("srnk") <= shortlist)
        .drop("srnk")
    )


def hamming_shortlist(codes: DataFrame, packed_queries: DataFrame,
                      dim: int, shortlist: int) -> DataFrame:
    """Per-query Hamming top-``shortlist`` over packed code frames.

    ``codes``: (vec_id, code0..codeW-1); ``packed_queries``:
    (query_id, qcode0..qcodeW-1).  Returns (query_id, neighbor_id,
    hamming), self-pairs excluded, ties broken on neighbor_id.

    Shared by the in-memory registered query and the persisted-index
    search (operators/index_store.py) so the two paths cannot drift —
    the store-trilogy convention.  The plan Spark produces is the
    scale-correct one: WindowGroupLimit runs PARTIAL before the
    exchange, so each task forwards at most ``shortlist`` rows per
    query and the shuffle is queries x shortlist, never the corpus.
    """
    from pyspark.sql.window import Window as W

    cand = (
        codes.join(F.broadcast(packed_queries),
                   F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            hamming("code", "qcode", dim).alias("hamming"),
        )
    )
    sw = W.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("srnk", F.row_number().over(sw))
        .filter(F.col("srnk") <= shortlist)
        .drop("srnk")
    )
