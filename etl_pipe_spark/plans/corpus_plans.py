"""Corpus-construction operators round 5: deterministic global
shuffle + shard assignment, vocabulary coverage, unigram language-model
quality scoring, and the distributed Gram matrix (the PCA kernel).

Four operations a 100 TB pretraining pipeline runs after curation that
the registry still lacked (SURVEY §2.12 north-star family):

* **Global shuffle + sharding** — training data must be served in a
  pseudorandom order, packed into fixed-token-budget shards.  The
  permutation key is an arithmetic hash BOTH engines evaluate
  identically (so even the permutation is oracle-checked); the global
  position and running token count come from the two-phase
  range-partition rank in ``operators/ordering.py`` — never a
  no-partition window.

* **Vocabulary coverage** — token frequency table with global rank and
  cumulative corpus coverage: the pre-BPE vocabulary audit ("how many
  types cover 90% of tokens").  At web scale the vocabulary itself is
  hundreds of millions of types, so the rank/prefix-sum ALSO goes
  through the distributed decomposition, not a driver sort.

* **Unigram log-prob quality score** — the CCNet-style fluency proxy:
  score each document by its mean negative log-probability under the
  corpus's own unigram distribution (KenLM's 5-gram model is the
  published version; the unigram reduction keeps the same plan shape —
  count model, join scores, per-doc mean — with no external model
  artifact).  High NLL = rare-token gibberish; low = repetitive
  boilerplate.

* **Gram matrix** — G = X^T X over the embedding corpus via map-side
  BLAS partials (``operators/linalg.py``): the covariance route to
  distributed PCA.  Shuffle volume is batches x dim^2, independent of
  corpus size.

Cross-engine determinism notes: hash keys and shard math are pure
64-bit integer arithmetic (no engine-native hash — Spark xxhash64 has
no DuckDB twin); coverage fractions are single bigint/bigint IEEE
divisions (bit-identical); the Gram matrix is exact fixed-point int64;
only the unigram score carries a float sum, rounded to 4 decimals
(error budget ~1e-13 vs rounding grain 1e-4 — the same absorption
argument as the TPC-H revenue aggregates).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.linalg import gram_matrix
from ..operators.ordering import ranked_running_sum
from ..sources.catalog import load_table
from .catalog import register
from ..functions.frames import local_frame

# Shuffle-key LCG: (doc_id mod P) spreads via the Knuth multiplier,
# the + doc_id * 97 term breaks ties between ids equal mod P.  Both
# terms stay far below 2^63 for any doc_id < ~9.5e16, so the checked
# arithmetic is overflow-free in BOTH engines at any realistic id
# range (production would swap in xxhash64 over a content fingerprint
# — same plan, engine-native key; the arithmetic form exists so the
# permutation itself is oracle-checkable).
_SHUF_P = 1000003
_SHUF_MULT = 2654435761
_SHUF_TIE = 97
_SHUF_MOD = 4294967296        # 2^32
_SHARD_TOKENS = 2048          # tokens per training shard

_SHUFFLE_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(((doc_id % {_SHUF_P}) * {_SHUF_MULT} + doc_id * {_SHUF_TIE})
              % {_SHUF_MOD} AS BIGINT) AS shuffle_key
  FROM documents
)
SELECT doc_id, shuffle_key,
       CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos,
       CAST(coalesce(sum(n_tokens) OVER (
         ORDER BY shuffle_key, doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS tokens_before,
       CAST(coalesce(sum(n_tokens) OVER (
         ORDER BY shuffle_key, doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         // {_SHARD_TOKENS} AS BIGINT) AS shard_id
FROM keyed
ORDER BY pos
"""


@register("corpus_shuffle_shards", oracle=_SHUFFLE_ORACLE)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudorandom corpus order + fixed-token-budget
    shard assignment — the final serving step of a training pipeline.

    The permutation key is the overflow-safe arithmetic LCG above;
    global position and exclusive running token count come from
    ``ranked_running_sum`` (range partition on the key, per-partition
    windows, p-row offset scan — partition-count independent, so the
    output is safe to hash-check).  ``shard_id`` is the exclusive
    prefix DIV the shard budget: every shard except the last holds at
    least the budget once its boundary-crossing doc is counted — the
    same fill-until-full convention as token_budget_selection.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    keyed = docs.withColumn(
        "shuffle_key",
        (
            (F.col("doc_id") % _SHUF_P) * F.lit(_SHUF_MULT)
            + F.col("doc_id") * _SHUF_TIE
        ) % F.lit(_SHUF_MOD),
    )
    ranked = ranked_running_sum(
        keyed, [F.col("shuffle_key"), F.col("doc_id")], "n_tokens",
        rank_name="pos", before_name="tokens_before",
    )
    return (
        ranked.select(
            "doc_id", "shuffle_key", "pos", "tokens_before",
            F.expr(f"CAST(tokens_before DIV {_SHARD_TOKENS} AS BIGINT)")
            .alias("shard_id"),
        )
        .orderBy("pos")
    )


_VOCAB_TOP = 200

_VOCAB_ORACLE = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), vocab AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token
), ranked AS (
  SELECT token, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rnk,
         CAST(coalesce(sum(cnt) OVER (
           ORDER BY cnt DESC, token
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM vocab
)
SELECT token, cnt, rnk,
       (cum_before + cnt) / (SELECT CAST(sum(cnt) AS DOUBLE) FROM vocab)
         AS coverage
FROM ranked
WHERE rnk <= {_VOCAB_TOP}
ORDER BY rnk
"""


@register("vocab_top_coverage", oracle=_VOCAB_ORACLE)
def vocab_top_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-200 vocabulary with cumulative corpus coverage — the
    pre-tokenizer audit (what fraction of running text the top types
    explain).

    The frequency table is one groupBy; the global (rank, prefix sum)
    over it goes through ``ranked_running_sum`` because a web-scale
    vocabulary is itself a big table (~10^8 types) — a no-partition
    window here would drag the whole vocabulary into one task.
    ``coverage`` is a single bigint/bigint IEEE division, so both
    engines produce identical bits.
    """
    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    vocab = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # descending count == ascending negated count (bigint, exact) —
    # ranked_running_sum takes plain ascending value expressions
    ranked = ranked_running_sum(
        vocab, [(-F.col("cnt")), F.col("token")], "cnt",
        rank_name="rnk", before_name="cum_before",
    )
    # total tokens == sum over vocab of cnt, but computable as a
    # NARROW scan-agg (sum of per-doc token counts) — no second
    # explode, no second token shuffle
    total = (
        load_table(spark, sf_dir, "documents")
        .agg(F.sum(F.size(F.split("text", " ")))
             .cast("double").alias("__total"))
    )
    return (
        ranked.filter(F.col("rnk") <= _VOCAB_TOP)
        .crossJoin(F.broadcast(total))
        .select(
            "token", "cnt", "rnk",
            ((F.col("cum_before") + F.col("cnt")) / F.col("__total"))
            .alias("coverage"),
        )
        .orderBy("rnk")
    )


_UNIGRAM_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), freq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token
), total AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM tok
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(-sum(ln(f.cnt / total.n)) / count(*), 4) AS avg_nll
FROM tok t JOIN freq f ON f.token = t.token, total
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


@register("unigram_logprob_quality", oracle=_UNIGRAM_ORACLE)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean per-token negative log-probability under the corpus's own
    unigram model — the CCNet fluency-scoring shape with the language
    model reduced to counts the pipeline already owns.

    Plan: one groupBy builds the frequency table, the token stream
    joins it back on the token key (ordinary shuffle join — the model
    table is vocabulary-sized, NOT assumed broadcastable; a production
    run over a skewed vocabulary leans on AQE's skew-join split for
    the stop-word keys), and a per-doc aggregate takes the mean.  The
    probability is an exact bigint/bigint division; only the final
    float sum is engine-order dependent, absorbed by rounding to 4
    decimals (~1e-13 error vs 1e-4 grain).
    """
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    freq = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # corpus token count as a narrow scan-agg (no explode; see
    # vocab_top_coverage)
    total = (
        load_table(spark, sf_dir, "documents")
        .agg(F.sum(F.size(F.split("text", " ")))
             .cast("double").alias("__n"))
    )
    return (
        tok.join(freq, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(
                -F.sum(F.log(F.col("cnt") / F.col("__n")))
                / F.count(F.lit(1)), 4
            ).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


_GRAM_ORACLE = """
WITH q AS (
  SELECT list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1024 + 0.5)
                                  AS BIGINT)) AS qv
  FROM embeddings
), pairs AS (
  SELECT CAST(t.i AS INTEGER) AS i, CAST(u.j AS INTEGER) AS j,
         qv[t.i + 1] * qv[u.j + 1] AS p
  FROM q,
       unnest(range(len(qv))) AS t(i),
       unnest(range(len(qv))) AS u(j)
  WHERE t.i <= u.j
)
SELECT i, j, CAST(sum(p) AS BIGINT) AS gram
FROM pairs
GROUP BY i, j
ORDER BY i, j
"""


@register("embedding_gram_matrix", oracle=_GRAM_ORACLE)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangular Gram matrix G = Q^T Q over the quantized
    embedding corpus — the one-pass covariance kernel behind
    distributed PCA (``operators/linalg.py`` documents the exactness
    contract and the batches x dim^2 shuffle bound).

    The DuckDB twin unrolls the same quantized products sequentially;
    because every partial is an exact integer, the comparison is a
    hash match, not a tolerance check — the matmul itself is under the
    differential harness.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    return gram_matrix(emb, vec_col="v").orderBy("i", "j")


# Distributed PCA: gram partials -> driver-side dim x dim eigh ->
# projection pass.  An eigendecomposition has no ANSI twin, so the
# oracle certifies the INVARIANTS (the kmeans_fit_clusters recipe):
# DuckDB recomputes the exact corpus count and the exact integer trace
# of the quantized Gram matrix (trace(Q^T Q) = sum of squared lattice
# values — no gram needed) and asserts the four booleans TRUE that the
# Spark side derives from the actual fit.
_PCA_K = 4  # components certified; one Gram + one projection pass at any k

_PCA_ORACLE = f"""
WITH q AS (
  SELECT list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1024 + 0.5)
                                  AS BIGINT)) AS qv
  FROM embeddings
)
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(list_sum(list_transform(qv, v -> v * v))) AS BIGINT)
         AS trace_q,
       {_PCA_K} AS k,
       TRUE AS components_orthonormal,
       TRUE AS rayleigh_ge_max_diag,
       TRUE AS eigenvalues_nonincreasing,
       TRUE AS topk_explained_le_trace,
       TRUE AS projections_match_rayleigh
FROM q
"""


@register("pca_top_component", oracle=_PCA_ORACLE)
def pca_top_component_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end distributed PCA — top-K principal components (round
    6: lifted from top-1, the r5 verdict's optional item) as a
    hash-checked query: one Gram pass, a driver-side 64 x 64
    eigendecomposition, one K-wide projection pass — then the fit's
    invariants as one row of exact stats + booleans.

    What the row certifies: ``n_vectors`` and ``trace_q`` are exact
    integers BOTH engines recompute independently (DuckDB never sees
    the eigenvectors — trace(Q^T Q) is just the lattice sum of
    squares); ``components_orthonormal`` pins V^T V = I_k (eigh
    output scale AND mutual orthogonality — a duplicated or
    contaminated component fails it); ``rayleigh_ge_max_diag`` is the
    spectral floor lambda_1 >= max_ii G_ii every true top eigenvector
    satisfies; ``eigenvalues_nonincreasing`` pins the descending
    component order; ``topk_explained_le_trace`` is PSD sanity
    (sum_k lambda_k <= trace); and ``projections_match_rayleigh``
    ties the DISTRIBUTED second pass to the driver-side algebra
    per component: Sigma (q . v_c)^2 over the corpus must equal
    v_c^T G v_c to float tolerance for EVERY c — a wrong projection
    kernel, a stale component, or a lattice mismatch all break it.
    """
    from ..operators.linalg import pca_top_k

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    res = pca_top_k(emb, k=_PCA_K)
    V = res.components
    ortho = float(np.abs(V.T @ V - np.eye(_PCA_K)).max())
    rels = np.abs(res.proj_sumsq - res.lams) / np.maximum(np.abs(res.lams), 1.0)
    row = (
        res.n,
        res.trace,
        _PCA_K,
        bool(ortho < 1e-9),
        bool(res.lams[0] >= res.max_diag * (1.0 - 1e-9) - 1e-6),
        bool(np.all(res.lams[:-1] >= res.lams[1:] * (1.0 - 1e-12) - 1e-6)),
        bool(res.lams.sum() <= res.trace * (1.0 + 1e-12) + 1e-6),
        bool(np.all(rels < 1e-9)),
    )
    return local_frame(
        spark, [row],
        "n_vectors bigint, trace_q bigint, k int, "
        "components_orthonormal boolean, rayleigh_ge_max_diag boolean, "
        "eigenvalues_nonincreasing boolean, topk_explained_le_trace boolean, "
        "projections_match_rayleigh boolean",
    )


# Bloom incremental filter: the batch-vs-historical split is by doc id
# residue (every 5th doc is "new"); membership unit is the 3-gram word
# shingle (same definition as the Jaccard dedup family), because the
# driver corpus has no exact full-text duplicates — shingles give the
# invariant real members to certify.
_BLOOM_M = 1 << 19        # bits; ~13 per historical shingle here (fp << 1%)
_BLOOM_FP_BOUND = 0.05    # asserted ceiling, ~10x the theoretical rate

_BLOOM_ORACLE = """
WITH words AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(ws[t.i : t.i + 2], ' ') AS shingle
  FROM words, UNNEST(range(1, greatest(len(ws) - 1, 1))) AS t(i)
), hist AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 5 != 0
), batch AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 5 = 0
)
SELECT CAST(count(*) AS BIGINT) AS n_batch_shingles,
       CAST(sum(CASE WHEN h.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact_members,
       TRUE AS no_false_negatives,
       TRUE AS fp_rate_below_bound
FROM batch b LEFT JOIN hist h ON h.shingle = b.shingle
"""


@register("bloom_incremental_filter", oracle=_BLOOM_ORACLE)
def bloom_incremental_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership of a new batch against the historical
    corpus — the incremental-dedup index that never re-reads history
    (``operators/bloom.py`` documents the build/probe mechanics and
    the 100 TB role).

    The oracle can't see inside an engine-specific bit array, so the
    query certifies the filter's CONTRACT instead, the
    approx_aggregates recipe: exact batch/member counts (DuckDB
    recomputes them via a real join) plus two booleans — every exact
    member was a bloom hit (false negatives are impossible when build
    and probe agree on hashes; a red here means broken plumbing), and
    the false-positive rate among true non-members sits under a bound
    ~10x the theoretical sizing.  The in-query exact join exists only
    to grade the filter — a production consumer runs just the probe.
    """
    from ..operators.bloom import bloom_build, bloom_probe
    from ..operators.dedup import shingle_sets

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_sets(docs).filter(F.col("shingle").isNotNull())
    hist = (sh.filter(F.col("doc_id") % 5 != 0)
            .select("shingle").distinct())
    batch = (sh.filter(F.col("doc_id") % 5 == 0)
             .select("shingle").distinct())

    words = bloom_build(hist, "shingle", _BLOOM_M)
    probed = bloom_probe(batch, "shingle", words, _BLOOM_M)
    graded = probed.join(
        hist.withColumn("__member", F.lit(True)), "shingle", "left"
    )
    member = F.col("__member").isNotNull()
    return graded.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_batch_shingles"),
        F.sum(F.when(member, 1).otherwise(0)).cast("bigint")
        .alias("n_exact_members"),
        F.bool_and(F.when(member, F.col("bloom_hit")).otherwise(F.lit(True)))
        .alias("no_false_negatives"),
        (
            F.sum(F.when(~member & F.col("bloom_hit"), 1).otherwise(0))
            / F.greatest(F.sum(F.when(~member, 1).otherwise(0)), F.lit(1))
            <= F.lit(_BLOOM_FP_BOUND)
        ).alias("fp_rate_below_bound"),
    )
