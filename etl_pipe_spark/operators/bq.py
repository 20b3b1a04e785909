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

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame, functions as F

# Bits packed per bigint word.  32 (not 64) so every word is a SUM of
# distinct non-negative powers of two < 2^32 — equivalent to bitwise OR
# because the powers are disjoint, and safely inside bigint under ANSI
# arithmetic (bit 63 of a 64-bit pack would be Long.MIN_VALUE and drag
# sign/overflow subtleties into both engines for nothing).
BITS_PER_WORD = 32


def n_words(dim: int) -> int:
    return (dim + BITS_PER_WORD - 1) // BITS_PER_WORD


def bq_thresholds(emb: DataFrame, vec_col: str = "v") -> list[float]:
    """Per-dimension midrange thresholds, bit-deterministic across
    engines (min/max exact; one IEEE add + halving).

    Bounded driver state: dim rows (the sq8_stats convention).
    """
    rows = (
        emb.select(F.posexplode(F.col(vec_col)).alias("dimi", "x"))
        .groupBy("dimi")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .orderBy("dimi")
        .collect()
    )
    return [(r["lo"] + r["hi"]) / 2.0 for r in rows]


def bq_pack(df: DataFrame, thresholds: list[float], vec_col: str,
            prefix: str = "code") -> DataFrame:
    """Append packed sign-bit code words ``{prefix}0..{prefix}{W-1}``.

    Pure Catalyst: per word, 32 CASE terms ``v[d] > t_d ? 1<<j : 0``
    summed (disjoint powers => sum == OR; max 2^32-1, no overflow).
    One shuffle-free map pass inside whole-stage codegen.
    """
    dim = len(thresholds)
    words = []
    for w in range(n_words(dim)):
        terms = []
        for j in range(BITS_PER_WORD):
            d = w * BITS_PER_WORD + j
            if d >= dim:
                break
            terms.append(
                F.when(F.col(vec_col)[d] > F.lit(thresholds[d]),
                       F.lit(1 << j).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            )
        words.append(reduce(add, terms).alias(f"{prefix}{w}"))
    return df.select("*", *words)


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
