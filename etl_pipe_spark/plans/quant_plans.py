"""Binary-quantization (1-bit) ANN: Hamming shortlist + exact rerank.

Completes the quantizer family alongside PQ (operators/pq.py) and SQ8
(operators/sq8.py) with the cheapest member: sign-bit codes packed
into bigint words (operators/bq.py), searched by pure-integer Hamming
distance ``bit_count(xor)`` inside whole-stage codegen.

What makes this leg special in the registry: the shortlist metric is
INTEGER, so the oracle hash-certifies the DISTANCES themselves, not
just ranks — and it certifies them through a genuinely different
computation.  Spark packs bits into words and popcounts xors; DuckDB
counts per-dimension threshold disagreements directly.  Equality of
the two proves the pack/popcount machinery end to end (a differential
the float-scored PQ/SQ8 legs cannot offer, where matmul-vs-SQL-fold
ulp noise forces rank-only comparison).

Reference scope: the reference engine has no vector search; this is
the driver-mandated extension family (SURVEY §2.12, similarity
search).  Public technique: sign-bit binary hashing / binary
quantization with exact re-ranking (Charikar 2002 for the random-
projection cousin; FAISS IndexBinaryFlat; RaBitQ-style BQ+rerank
pipelines in modern vector stores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..functions import vectors as VX
from ..operators import bq as BQ
from ..sources.catalog import load_table
from .catalog import register

# The BQ shortlist must be CORPUS-RELATIVE: 64-bit sign codes have
# Hamming resolution 0..64, so a fixed-size shortlist saturates as the
# corpus grows (measured on the synthetic embeddings: recall@5 with a
# fixed 15-candidate shortlist is 0.44-0.60 on the 500-vector corpora
# but 0.31 on the 2000-vector one, while a 5%-of-corpus cut holds
# 0.56-0.68 everywhere and 12.5% reaches 0.80).  At real production
# scale the ratio is held by MORE BITS (code length must grow
# ~log(corpus): 128-256-bit codes via SRP expansion or multi-bit
# scalar codes), not by fraction-sized shortlists — dim=64 caps this
# corpus's sign codes at 64 bits, so the registered certificate pins
# the 5% regime explicitly.
BQ_SHORTLIST_MIN = 25
BQ_SHORTLIST_FRAC = 0.05
BQ_TOPK = 5
BQ_RECALL_FLOOR = 0.5  # measured 0.56 @ sf0.01 / 0.60 @ sf0.1 (deterministic)

_BQ_ANN_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), flat AS (
  SELECT vec_id, CAST(t.i AS INT) AS dimi,
         CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) AS x
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
), thr AS (
  SELECT dimi, (min(x) + max(x)) / 2 AS t FROM flat GROUP BY dimi
), bits AS (
  SELECT f.vec_id, f.dimi,
         CASE WHEN f.x > th.t THEN 1 ELSE 0 END AS b
  FROM flat f JOIN thr th USING (dimi)
), q AS (
  SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 100 = 0
), ham AS (
  SELECT q.query_id, b2.vec_id AS neighbor_id,
         CAST(SUM(CASE WHEN b1.b <> b2.b THEN 1 ELSE 0 END) AS BIGINT)
           AS hamming
  FROM q
  JOIN bits b1 ON b1.vec_id = q.query_id
  JOIN bits b2 ON b2.dimi = b1.dimi AND b2.vec_id <> q.query_id
  GROUP BY q.query_id, b2.vec_id
), short AS (
  SELECT query_id, neighbor_id, hamming,
         row_number() OVER (PARTITION BY query_id
           ORDER BY hamming, neighbor_id) AS srnk
  FROM ham
), cut AS (
  SELECT greatest({BQ_SHORTLIST_MIN},
                  CAST(ceil({BQ_SHORTLIST_FRAC} * count(*)) AS BIGINT)) AS c
  FROM embeddings
), rer AS (
  SELECT s.query_id, s.neighbor_id, s.hamming,
         row_number() OVER (PARTITION BY s.query_id
           ORDER BY list_dot_product(eq.v, en.v)
                  / (sqrt(list_dot_product(eq.v, eq.v))
                     * sqrt(list_dot_product(en.v, en.v))) DESC,
             s.neighbor_id) AS rnk
  FROM short s
  JOIN e eq ON eq.vec_id = s.query_id
  JOIN e en ON en.vec_id = s.neighbor_id
  WHERE s.srnk <= (SELECT c FROM cut)
)
SELECT query_id, neighbor_id, hamming, rnk, TRUE AS recall_ge_floor
FROM rer WHERE rnk <= {BQ_TOPK}
ORDER BY query_id, rnk
"""


@register("bq_hamming_rerank", oracle=_BQ_ANN_ORACLE)
def bq_hamming_rerank(spark: SparkSession, sf_dir: str,
                      checkpoint: bool = True) -> DataFrame:
    """Sign-bit BQ search: pack -> Hamming shortlist -> exact rerank.

    Pipeline: per-dim midrange thresholds (bit-deterministic across
    engines — min/max exact, one IEEE add + halving, the SQ8 stats
    argument); one map pass packs each vector into ceil(dim/32) bigint
    words; the broadcast query set scans the codes with
    ``bit_count(xor)`` Hamming (two JVM instructions per word, no
    floats); the corpus-relative shortlist (max(BQ_SHORTLIST_MIN,
    5% of corpus) — see the resolution note above) is re-ranked by the
    exact zip_with/fold cosine (functions/vectors.py — bits match
    DuckDB), keeping top-{BQ_TOPK}.

    Hash contract: `hamming` is integer math, certified EXACTLY
    against DuckDB's unpacked per-dimension disagreement count — the
    packed-words-popcount vs count-of-differing-bits differential is
    the point of the oracle.  Ties at both stages break on neighbor_id.

    Scale: codes are 8 bytes/vector at dim 64 (32x under float32);
    the scan is sequential 8-byte reads inside whole-stage codegen
    with the query side broadcast — no shuffle until the per-query
    shortlist window, which AQE sees as queries x corpus ->
    queries x shortlist rows.  Production composes with the IVF cell
    index (Hamming only within probed cells) exactly like the PQ/SQ8
    legs, and holds recall with LONGER codes (128-256-bit SRP
    expansion), not corpus-fraction shortlists; this flat scan is the
    exact-oracle surface.  The recall_ge_floor boolean re-certifies
    shortlist quality per round against the in-query brute-force
    answer (the sq8_ann_rerank convention).
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.as_double(F.col("embedding")).alias("v"))
    # one aggregate carries thresholds AND the corpus count the
    # shortlist sizing needs (round 9 — was a separate count() scan)
    thresholds, n_corpus = BQ.bq_thresholds(emb, with_count=True)
    shortlist = _bq_shortlist_size(n_corpus)
    dim = len(thresholds)
    codes = BQ.bq_pack(emb, thresholds, "v", prefix="code")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    packed_q = BQ.bq_pack(q, thresholds, "qv", prefix="qcode").drop("qv")
    short = BQ.hamming_shortlist(codes, packed_q, dim, shortlist)
    return _bq_rerank_tail(spark, sf_dir, emb, q, short,
                           checkpoint=checkpoint)


def _bq_shortlist_size(n_corpus: int) -> int:
    import math

    return max(BQ_SHORTLIST_MIN, math.ceil(BQ_SHORTLIST_FRAC * n_corpus))


def _bq_rerank_tail(spark: SparkSession, sf_dir: str, emb: DataFrame,
                    q: DataFrame, short: DataFrame,
                    floor: float = BQ_RECALL_FLOOR,
                    checkpoint: bool = True) -> DataFrame:
    """Exact-cosine rerank of a (query_id, neighbor_id, hamming)
    shortlist + the in-query recall certificate — shared by the
    in-memory form (bq_hamming_rerank), the SRP/IVF compositions, and
    the persisted-index form (bq_index_persisted), the
    _sq8_rerank_tail convention.

    ``checkpoint=True`` materializes the tiny reranked frame ONCE
    (queries x top-k rows) so the recall counts and the harness's
    later count/hash actions all read the checkpoint instead of
    re-running the shortlist pipeline per action (the ivfsq8
    convention); ``checkpoint=False`` is the plan-inspection seam for
    tools/dump_plans.py — it skips the eager recall counts entirely
    and emits a constant flag.
    """
    reranked = (
        short.join(emb.withColumnRenamed("vec_id", "neighbor_id"),
                   "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", "hamming",
                VX.cosine(F.col("qv"), F.col("v")).alias("cos"))
    )
    rw = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    out = (
        reranked.withColumn("rnk", F.row_number().over(rw).cast("bigint"))
        .filter(F.col("rnk") <= BQ_TOPK)
        .select("query_id", "neighbor_id", "hamming", "rnk")
    )
    if checkpoint:
        out = out.localCheckpoint(eager=True)
        from .extensions import similarity_topk_cosine

        # persist: the brute-force baseline feeds BOTH counts — without
        # the cache its corpus-scan pipeline executed twice per query
        # (guide §1; counts and results unchanged)
        brute = similarity_topk_cosine(spark, sf_dir).select(
            "query_id", "neighbor_id").persist()
        try:
            n_brute = brute.count()
            n_hit = out.join(brute, ["query_id", "neighbor_id"]).count()
        finally:
            brute.unpersist()
        recall_ok = n_brute > 0 and (n_hit / n_brute) >= floor
    else:
        recall_ok = True
    return out.withColumn(
        "recall_ge_floor", F.lit(bool(recall_ok))
    ).orderBy("query_id", "rnk")


# ---------------------------------------------------------------------------
# SRP-expanded codes: the "more bits" scale path, realized.
#
# The midrange sign codes above are capped at dim bits (64), which is
# why their shortlist must scale with the corpus.  Projecting onto
# md5-derived integer hyperplanes (operators/similarity.py — identical
# constants in Python, Spark, and DuckDB) lifts the code length to any
# budget; measured on the synthetic corpora at a FIXED 50-candidate
# shortlist, recall@5 is 0.48 for 64-bit midrange codes at 2000
# vectors but 0.96 / 0.82 (500 / 2000 vectors) for 256-bit SRP codes —
# the log(corpus)-bits rule the BQ docstrings promise.
#
# Everything is integer-exact end to end: vectors quantize to
# floor(v*2^20 + 0.5) bigints (power-of-two scaling and floor are
# exact in IEEE; the dot sums stay under 2^37 << 2^53), so the sign
# bits — and therefore every Hamming distance — are bit-identical
# across engines and summation orders.  No ulp caveat anywhere in the
# shortlist stage.
# ---------------------------------------------------------------------------

SRP_BQ_BITS = 256
SRP_BQ_SHORTLIST = 50
SRP_BQ_RECALL_FLOOR = 0.75  # measured 0.96 @ sf0.01 / 0.82 @ sf0.1
_SRP_DIM = 64  # testdata embedding dimension (operators/similarity.DIM)
_SRP_MOD = 2001  # weights in [-1000, 1000] (similarity._WEIGHT_MOD)

_SRP_BQ_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), eq AS (
  SELECT vec_id,
         list_transform(v, x ->
           CAST(floor(x * {float(1 << 20)} + 0.5) AS BIGINT)) AS vq
  FROM e
), planes AS (
  SELECT t.i,
         list_transform(range(0, {_SRP_DIM}), d ->
           CAST(concat('0x', substr(md5(CAST(t.i AS VARCHAR) || '_' ||
                CAST(d AS VARCHAR)), 1, 8)) AS BIGINT)
             % {_SRP_MOD} - {_SRP_MOD // 2}) AS w
  FROM (SELECT unnest(range(0, {SRP_BQ_BITS})) AS i) t
), bits AS (
  SELECT eq.vec_id, p.i,
         CASE WHEN list_dot_product(eq.vq, p.w) >= 0 THEN 1 ELSE 0 END AS b
  FROM eq CROSS JOIN planes p
), q AS (
  SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 100 = 0
), ham AS (
  SELECT q.query_id, b2.vec_id AS neighbor_id,
         CAST(SUM(CASE WHEN b1.b <> b2.b THEN 1 ELSE 0 END) AS BIGINT)
           AS hamming
  FROM q
  JOIN bits b1 ON b1.vec_id = q.query_id
  JOIN bits b2 ON b2.i = b1.i AND b2.vec_id <> q.query_id
  GROUP BY q.query_id, b2.vec_id
), short AS (
  SELECT query_id, neighbor_id, hamming,
         row_number() OVER (PARTITION BY query_id
           ORDER BY hamming, neighbor_id) AS srnk
  FROM ham
), rer AS (
  SELECT s.query_id, s.neighbor_id, s.hamming,
         row_number() OVER (PARTITION BY s.query_id
           ORDER BY list_dot_product(eq2.v, en.v)
                  / (sqrt(list_dot_product(eq2.v, eq2.v))
                     * sqrt(list_dot_product(en.v, en.v))) DESC,
             s.neighbor_id) AS rnk
  FROM short s
  JOIN e eq2 ON eq2.vec_id = s.query_id
  JOIN e en ON en.vec_id = s.neighbor_id
  WHERE s.srnk <= {SRP_BQ_SHORTLIST}
)
SELECT query_id, neighbor_id, hamming, rnk, TRUE AS recall_ge_floor
FROM rer WHERE rnk <= {BQ_TOPK}
ORDER BY query_id, rnk
"""


@register("srp_bq_hamming_rerank", oracle=_SRP_BQ_ORACLE)
def srp_bq_hamming_rerank(spark: SparkSession, sf_dir: str,
                          checkpoint: bool = True) -> DataFrame:
    """256-bit SRP binary codes: fixed-shortlist Hamming ANN.

    The production BQ shape: code length sized to the corpus
    (~log2(N) x a quality factor) instead of shortlists sized to the
    corpus.  Bits come from signed projections onto the md5-derived
    integer hyperplanes; vectors are fixed-point-quantized first so
    every sign bit is integer-exact across engines (see the block
    comment above).  Packing runs in the Arrow kernel
    (operators/bq.srp_pack_kernel — a numpy int64 matmul, safe to
    hash-certify precisely BECAUSE the math is integer); the shortlist
    is the same Catalyst ``bit_count(xor)`` surface as
    bq_hamming_rerank, certified by DuckDB's per-plane disagreement
    count; the rerank tail and recall certificate are shared with the
    other BQ forms.

    Scale: 256 bits = 32 bytes/vector (8x under float32); pack is one
    map pass whose per-row cost is a 64x256 integer matmul; search is
    8 xor+popcount pairs/row.  The recall floor pins the fixed-
    shortlist claim every round: recall@5 holds 0.96/0.82 at 500/2000
    vectors where the 64-bit leg decays to 0.68/0.48 (and the
    registered floor {SRP_BQ_RECALL_FLOOR} would catch a regression).
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.as_double(F.col("embedding")).alias("v"))
    codes = BQ.srp_pack_kernel(emb, SRP_BQ_BITS, prefix="code")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    packed_q = BQ.srp_pack_kernel(q, SRP_BQ_BITS, id_col="query_id",
                                  vec_col="qv", prefix="qcode")
    short = BQ.hamming_shortlist(codes, packed_q, SRP_BQ_BITS,
                                 SRP_BQ_SHORTLIST)
    return _srp_bq_tail(spark, sf_dir, emb, q, short,
                        checkpoint=checkpoint)


def _srp_bq_tail(spark: SparkSession, sf_dir: str, emb: DataFrame,
                 q: DataFrame, short: DataFrame,
                 checkpoint: bool = True) -> DataFrame:
    """The shared rerank tail with the SRP leg's recall floor."""
    out = _bq_rerank_tail(spark, sf_dir, emb, q, short,
                          floor=SRP_BQ_RECALL_FLOOR,
                          checkpoint=checkpoint)
    return out


@register("bq_index_persisted", oracle=_BQ_ANN_ORACLE)
def bq_index_persisted(spark: SparkSession, sf_dir: str,
                       checkpoint: bool = True) -> DataFrame:
    """The PERSISTED BQ index under the exact-distance hash check —
    completing the store's quantizer legs (IVFPQ / SQ8 / BQ, all on
    the epoch/CAS/pointer commit protocol of operators/index_store.py).

    Build writes the thresholds/codes tables (8 bytes per vector at
    dim 64) and publishes them with one pointer swap; search RELOADS
    them, packs the raw float queries with the SAVED thresholds, and
    ranks via the same ``bq.hamming_shortlist`` helper as
    bq_hamming_rerank — the identical _BQ_ANN_ORACLE certifies that
    the save/load round trip through packed bigint storage changes
    NOTHING about shortlist distances or reranked order.  Appends are
    frozen-quantizer increments (tests/test_index_store.py pins the
    contract: history bytes untouched, appended vectors searchable,
    torn appends invisible)."""
    from ..operators.index_store import build_bq_index, search_bq_index
    from .ingest_plans import _io_dir

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.as_double(F.col("embedding")).alias("v"))
    path = _io_dir(sf_dir, "bq_index")
    build_bq_index(spark, emb, path)
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    short = search_bq_index(spark, path, q,
                            shortlist=_bq_shortlist_size(emb.count()))
    return _bq_rerank_tail(spark, sf_dir, emb, q, short,
                           checkpoint=checkpoint)


# --------------------------------------------------------------------------
# IVF x SQ8 composition: coarse cells prune, int8 codes score, exact rerank.
# --------------------------------------------------------------------------

IVFSQ8_NPROBE = 2
IVFSQ8_SHORTLIST = 15
IVFSQ8_TOPK = 5
IVFSQ8_RECALL_FLOOR = 0.1  # pinned from measurement; see docstring

_SQ8_RECON_EXPR = (
    "CASE WHEN s.hi = s.lo THEN s.lo ELSE s.lo + ((s.hi - s.lo) / {q}) * "
    "least(greatest(floor((f.x - s.lo) / ((s.hi - s.lo) / {q}) + 0.5), 0), {q}) END"
)


def _ivfsq8_oracle() -> str:
    from .corpus_plans2 import Q_LEVELS
    from .dedup_plans import N_CENTROIDS, _ivf_assign_cte_sql

    recon = _SQ8_RECON_EXPR.format(q=Q_LEVELS)
    return f"""
WITH {_ivf_assign_cte_sql(str(N_CENTROIDS))},
flat AS (
  SELECT vec_id, CAST(t.i AS INT) AS dimi,
         CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) AS x
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
),
stats AS (
  SELECT dimi, min(x) AS lo, max(x) AS hi FROM flat GROUP BY dimi
),
recon AS (
  SELECT f.vec_id, list({recon} ORDER BY f.dimi) AS rv
  FROM flat f JOIN stats s USING (dimi) GROUP BY f.vec_id
),
q_cells AS (
  SELECT r.vec_id AS query_id, r.cent_id, e.v AS qv
  FROM ranked r JOIN e ON e.vec_id = r.vec_id
  WHERE r.vec_id % 100 = 0 AND r.rn <= {IVFSQ8_NPROBE}
),
short AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.query_id
           ORDER BY list_dot_product(q.qv, r.rv)
                  / (sqrt(list_dot_product(q.qv, q.qv))
                     * sqrt(list_dot_product(r.rv, r.rv))) DESC,
             a.vec_id) AS srnk
  FROM q_cells q
  JOIN assign a ON a.cent_id = q.cent_id AND a.vec_id <> q.query_id
  JOIN recon r ON r.vec_id = a.vec_id
),
rer AS (
  SELECT s.query_id, s.neighbor_id,
         row_number() OVER (PARTITION BY s.query_id
           ORDER BY list_dot_product(q.qv, e.v)
                  / (sqrt(list_dot_product(q.qv, q.qv))
                     * sqrt(list_dot_product(e.v, e.v))) DESC,
             s.neighbor_id) AS rnk
  FROM short s
  JOIN (SELECT DISTINCT query_id, qv FROM q_cells) q
    ON q.query_id = s.query_id
  JOIN e ON e.vec_id = s.neighbor_id
  WHERE s.srnk <= {IVFSQ8_SHORTLIST}
)
SELECT query_id, neighbor_id, rnk, TRUE AS recall_ge_floor
FROM rer WHERE rnk <= {IVFSQ8_TOPK}
ORDER BY query_id, rnk
"""


@register("ivfsq8_ann_rerank", oracle=_ivfsq8_oracle())
def ivfsq8_ann_rerank(spark: SparkSession, sf_dir: str,
                      checkpoint: bool = True) -> DataFrame:
    """IVF-pruned SQ8 search with exact rerank — the composition the
    SQ8 leg's docs promise ("pruning lives in the IVF leg; production
    composes").  Completes the quantizer x index matrix: IVF+flat
    (similarity_ann_ivf), IVF+PQ (ivfpq_ann_adc/rerank), and now
    IVF+SQ8 (FAISS IndexIVFScalarQuantizer with refine).

    Pipeline: the coarse quantizer assigns every vector its best of
    {N_CENTROIDS}=32 md5-sampled centroid cells (the shared
    _ivf_ranked plan); each query probes its nprobe=2 nearest cells;
    candidates are scored query-raw vs neighbor-SQ8-RECONSTRUCTED
    (per-dim corpus min/max, 0..255 linear codes — the
    sq8_embedding_quantization contract, decode folded into the same
    expression) with the bit-parity zip_with/fold cosine, so unlike
    the BLAS shortlist legs even the SHORTLIST stage hash-certifies
    against DuckDB; survivors re-rank by exact cosine on raw vectors.

    Parity: encode/decode is pure IEEE double arithmetic, identical
    both engines (the sq8 family argument); all ties break on
    neighbor_id.  `recall_ge_floor` re-certifies the pipeline stays
    functional each round against the in-query brute-force
    top-{IVFSQ8_TOPK} (measured 0.16 / 0.28 / 0.21 at
    sf0.001/0.01/0.1 — md5-SAMPLED coarse cells at nprobe=2 probe
    ~2/32 of the corpus, so cell coverage, not SQ8 distortion, bounds
    recall; ann_kmeans_recall_lift is the family's measured evidence
    that TRAINED centroids lift exactly this number, and the recall
    dial is nprobe as charted in tests/test_ivf_recall.py).  The
    floor is pinned LOW ({IVFSQ8_RECALL_FLOOR}) because this query's
    certified claim is the hash-exact SQ8 scoring inside the probed
    cells, not the coarse quantizer's coverage.

    Scale: cells bound candidate counts (nprobe x N/k per query); the
    reconstruction joins a dim-sized broadcast stats table and in
    production reads STORED codes (operators/index_store.py's SQ8 leg)
    instead of re-encoding — this registered form keeps the full
    derivation under one oracle.
    """
    from .corpus_plans2 import Q_LEVELS
    from .dedup_plans import _emb_with_norms, _ivf_ranked
    from .extensions import similarity_topk_cosine

    emb = _emb_with_norms(spark, sf_dir).persist()
    try:
        # per-dim stats -> broadcast; decode(encode(x)) folded into one
        # expression over the exploded narrow rows, array rebuilt in dim
        # order (the oracle's list(... ORDER BY dimi))
        flat = emb.select("vec_id", F.posexplode("v").alias("dim", "x"))
        stats = flat.groupBy("dim").agg(
            F.min("x").alias("lo"), F.max("x").alias("hi"))
        step = (F.col("hi") - F.col("lo")) / F.lit(float(Q_LEVELS))
        code = F.least(
            F.greatest(F.floor((F.col("x") - F.col("lo")) / step + 0.5), F.lit(0)),
            F.lit(Q_LEVELS))
        rv_val = F.when(F.col("hi") == F.col("lo"), F.col("lo")).otherwise(
            F.col("lo") + step * code)
        recon = (
            flat.join(F.broadcast(stats), "dim")
            .select("vec_id", F.struct(F.col("dim"), rv_val.alias("rv")).alias("s"))
            .groupBy("vec_id")
            .agg(F.transform(F.array_sort(F.collect_list("s")),
                             lambda s: s["rv"]).alias("rv"))
        )

        ranked = _ivf_ranked(emb)
        assign = ranked.filter(F.col("rn") == 1).select(
            F.col("vec_id").alias("neighbor_id"), "cent_id")
        q = emb.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
        q_cells = (
            ranked.filter((F.col("vec_id") % 100 == 0)
                          & (F.col("rn") <= IVFSQ8_NPROBE))
            .select(F.col("vec_id").alias("query_id"), "cent_id")
        )
        cand = (
            q_cells.join(assign, "cent_id")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id")
        )
        shortlisted = (
            cand.join(recon.withColumnRenamed("vec_id", "neighbor_id"),
                      "neighbor_id")
            .join(F.broadcast(q), "query_id")
            .select("query_id", "neighbor_id",
                    VX.cosine(F.col("qv"), F.col("rv")).alias("c_recon"))
        )
        w_short = W.partitionBy("query_id").orderBy(
            F.col("c_recon").desc(), F.col("neighbor_id"))
        short = (
            shortlisted.withColumn("srnk", F.row_number().over(w_short))
            .filter(F.col("srnk") <= IVFSQ8_SHORTLIST)
            .select("query_id", "neighbor_id")
        )
        rer = (
            short.join(emb.withColumnRenamed("vec_id", "neighbor_id"),
                       "neighbor_id")
            .join(F.broadcast(q), "query_id")
            .select("query_id", "neighbor_id",
                    VX.cosine(F.col("qv"), F.col("v")).alias("cos"))
        )
        w_rer = W.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id"))
        out = (
            rer.withColumn("rnk", F.row_number().over(w_rer).cast("bigint"))
            .filter(F.col("rnk") <= IVFSQ8_TOPK)
            .select("query_id", "neighbor_id", "rnk")
        )
        # Materialize ONCE (recon + both ranks + joins) into a tiny
        # checkpointed frame, then release the vector cache — the
        # ivfpq_rerank convention: the recall counts below and the
        # harness's later count/hash actions all read the checkpoint,
        # so nothing in the pipeline runs twice and no cache outlives
        # the query.  checkpoint=False is the plan-inspection seam
        # (tools/dump_plans.py dumps the lazy form).
        if checkpoint:
            out = out.localCheckpoint(eager=True)
            # persist: both counts read one brute-force execution
            # (guide §1 — the corpus-scan baseline ran twice before)
            brute = similarity_topk_cosine(spark, sf_dir).select(
                "query_id", "neighbor_id").persist()
            try:
                n_brute = brute.count()
                n_hit = out.join(brute, ["query_id", "neighbor_id"]).count()
            finally:
                brute.unpersist()
            recall_ok = n_brute > 0 and (n_hit / n_brute) >= IVFSQ8_RECALL_FLOOR
        else:
            # plan-inspection seam (tools/dump_plans.py): the recall
            # counts would eagerly materialize the full IVFxSQ8
            # pipeline PLUS a brute-force scan at dump time — emit a
            # constant flag instead; the certified value only ever
            # ships through the checkpoint=True registered form.
            recall_ok = True
        return out.withColumn(
            "recall_ge_floor", F.lit(bool(recall_ok))
        ).orderBy("query_id", "rnk")
    finally:
        emb.unpersist()


# --------------------------------------------------------------------------
# IVF x BQ composition: coarse cells prune, sign bits score, exact rerank.
# --------------------------------------------------------------------------

IVFBQ_NPROBE = 2
IVFBQ_SHORTLIST = 15
IVFBQ_RECALL_FLOOR = 0.1  # pinned from measurement; see docstring


def _ivfbq_oracle() -> str:
    from .dedup_plans import N_CENTROIDS, _ivf_assign_cte_sql

    return f"""
WITH {_ivf_assign_cte_sql(str(N_CENTROIDS))},
flat AS (
  SELECT vec_id, CAST(t.i AS INT) AS dimi,
         CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) AS x
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
),
thr AS (
  SELECT dimi, (min(x) + max(x)) / 2 AS t FROM flat GROUP BY dimi
),
bits AS (
  SELECT f.vec_id, f.dimi,
         CASE WHEN f.x > th.t THEN 1 ELSE 0 END AS b
  FROM flat f JOIN thr th USING (dimi)
),
q_cells AS (
  SELECT r.vec_id AS query_id, r.cent_id, e.v AS qv
  FROM ranked r JOIN e ON e.vec_id = r.vec_id
  WHERE r.vec_id % 100 = 0 AND r.rn <= {IVFBQ_NPROBE}
),
ham AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
         CAST(SUM(CASE WHEN b1.b <> b2.b THEN 1 ELSE 0 END) AS BIGINT)
           AS hamming
  FROM q_cells q
  JOIN assign a ON a.cent_id = q.cent_id AND a.vec_id <> q.query_id
  JOIN bits b1 ON b1.vec_id = q.query_id
  JOIN bits b2 ON b2.vec_id = a.vec_id AND b2.dimi = b1.dimi
  GROUP BY q.query_id, a.vec_id
),
short AS (
  SELECT query_id, neighbor_id, hamming,
         row_number() OVER (PARTITION BY query_id
           ORDER BY hamming, neighbor_id) AS srnk
  FROM ham
),
rer AS (
  SELECT s.query_id, s.neighbor_id, s.hamming,
         row_number() OVER (PARTITION BY s.query_id
           ORDER BY list_dot_product(eq.v, en.v)
                  / (sqrt(list_dot_product(eq.v, eq.v))
                     * sqrt(list_dot_product(en.v, en.v))) DESC,
             s.neighbor_id) AS rnk
  FROM short s
  JOIN e eq ON eq.vec_id = s.query_id
  JOIN e en ON en.vec_id = s.neighbor_id
  WHERE s.srnk <= {IVFBQ_SHORTLIST}
)
SELECT query_id, neighbor_id, hamming, rnk, TRUE AS recall_ge_floor
FROM rer WHERE rnk <= {BQ_TOPK}
ORDER BY query_id, rnk
"""


@register("ivfbq_ann_rerank", oracle=_ivfbq_oracle())
def ivfbq_ann_rerank(spark: SparkSession, sf_dir: str,
                     checkpoint: bool = True) -> DataFrame:
    """IVF-pruned Hamming search with exact rerank — the BQ column of
    the quantizer x index matrix, completing the row ivfsq8_ann_rerank
    opened: IVF+flat (similarity_ann_ivf), IVF+PQ (ivfpq_ann_adc),
    IVF+SQ8 (ivfsq8_ann_rerank), and now IVF+BQ (FAISS
    IndexBinaryIVF's shape: coarse cells bound the candidate count,
    sign-bit codes score candidates at 8 bytes/vector, survivors
    re-rank exactly).

    This is the composition the SRP bits-dial sweep named as the
    boundary ("within a dense cell the candidate count, not the bit
    budget, is what the cell probe bounds" — docs/BENCH_COMPARE.md):
    once cells prune the corpus, short 64-bit midrange codes suffice
    INSIDE a cell, so the corpus-fraction shortlist the flat BQ scan
    needs (bq_hamming_rerank's resolution note) drops back to a fixed
    {IVFBQ_SHORTLIST}-candidate cut.

    Pipeline: the shared coarse quantizer (_ivf_ranked — md5-sampled
    {{N_CENTROIDS}} cells) assigns every vector one cell; each query
    probes its nprobe={IVFBQ_NPROBE} nearest cells; candidates score
    by packed-word ``bit_count(xor)`` Hamming against the broadcast
    packed queries — INTEGER math, so the oracle hash-certifies the
    distances themselves through DuckDB's unpacked per-dimension
    disagreement count (the BQ family's differential); the
    (hamming, neighbor_id)-ranked shortlist re-ranks by exact cosine.

    Recall floor pinned LOW ({IVFBQ_RECALL_FLOOR}) for the same
    reason as ivfsq8: md5-SAMPLED cells at nprobe={IVFBQ_NPROBE}
    probe ~2/32 of the corpus, so cell coverage — not code distortion
    — bounds recall; the certified claim is the hash-exact Hamming
    scoring inside the probed cells.  The flat-vs-IVF recall delta at
    1M vectors is measured in the round-9 sweep (docs/BENCH_COMPARE).

    Scale: cells bound candidates (nprobe x N/k per query); codes are
    8 bytes/vector; production reads STORED codes + assignments
    (operators/index_store.py's BQ leg) instead of re-deriving — this
    registered form keeps the full derivation under one oracle.
    """
    from .dedup_plans import _emb_with_norms, _ivf_ranked

    emb = _emb_with_norms(spark, sf_dir).persist()
    try:
        base = emb.select("vec_id", "v")
        thresholds = BQ.bq_thresholds(base)
        dim = len(thresholds)
        code_cols = [f"code{w}" for w in range(BQ.n_words(dim))]
        codes = BQ.bq_pack(base, thresholds, "v").select("vec_id", *code_cols)
        ranked = _ivf_ranked(emb)
        assign = ranked.filter(F.col("rn") == 1).select(
            F.col("vec_id").alias("neighbor_id"), "cent_id")
        q = emb.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
        q_cells = (
            ranked.filter((F.col("vec_id") % 100 == 0)
                          & (F.col("rn") <= IVFBQ_NPROBE))
            .select(F.col("vec_id").alias("query_id"), "cent_id")
        )
        cand = (
            q_cells.join(assign, "cent_id")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id")
        )
        packed_q = BQ.bq_pack(q, thresholds, "qv", prefix="qcode").drop("qv")
        scored = (
            cand.join(codes.withColumnRenamed("vec_id", "neighbor_id"),
                      "neighbor_id")
            .join(F.broadcast(packed_q), "query_id")
            .select("query_id", "neighbor_id",
                    BQ.hamming("code", "qcode", dim).alias("hamming"))
        )
        sw = W.partitionBy("query_id").orderBy(
            F.col("hamming").asc(), F.col("neighbor_id").asc())
        short = (
            scored.withColumn("srnk", F.row_number().over(sw))
            .filter(F.col("srnk") <= IVFBQ_SHORTLIST)
            .drop("srnk")
        )
        return _bq_rerank_tail(spark, sf_dir, base, q, short,
                               floor=IVFBQ_RECALL_FLOOR,
                               checkpoint=checkpoint)
    finally:
        emb.unpersist()
