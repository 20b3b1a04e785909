"""Training-corpus construction operators round 3: sequence packing,
train/eval contamination screening, repetition-based quality filtering.

The last mile of an LLM data pipeline after dedup + quality scoring:
pack documents into fixed-token training windows, verify the corpus
does not leak the eval benchmark (n-gram decontamination, the
standard published recipe: exact n-gram collision against the eval
set), and drop degenerate repetitive documents (type-token ratio /
top-token share / duplicate-n-gram share — the repetition family of
published web-corpus quality heuristics).  All native expressions,
every query oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.text import shingles, ws_tokens
from ..operators.layout import spread_for_compute
from ..sources.catalog import load_table
from .catalog import register

# --------------------------------------------------------------------------
# Sequence packing: concatenate docs into fixed-token training windows.
# --------------------------------------------------------------------------

_BIN_TOKENS = 512  # tokens per training window

_PACKING_ORACLE = f"""
WITH sized AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
packed AS (
  -- CAST the window sum: DuckDB's sum(BIGINT) OVER returns HUGEINT,
  -- whose pandas conversion changed across DuckDB versions (int64 vs
  -- float64) and breaks value-hash comparison in the harness.
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS UNBOUNDED PRECEDING
         ) - n_tokens AS BIGINT) AS stream_offset
  FROM sized
)
SELECT doc_id, source, n_tokens, stream_offset,
       CAST(stream_offset // {_BIN_TOKENS} AS BIGINT) AS first_bin,
       CAST((stream_offset + n_tokens - 1) // {_BIN_TOKENS} AS BIGINT)
         AS last_bin
FROM packed
"""


@register("sequence_packing", oracle=_PACKING_ORACLE)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-stream packing: each doc's offset and window span in a
    per-source concatenated training stream cut into 512-token bins.

    The pre-training batching primitive: docs are concatenated in
    deterministic (doc_id) order within their source shard and the
    stream is cut every 512 tokens, so a doc knows exactly which
    training windows it lands in (first_bin..last_bin).  Partitioning
    by source keeps the prefix-sum window parallel — one shuffle on
    source, each shard's running sum independent, which is how the
    packing run stays distributed at 100 TB (shards ~ sources; a
    single global stream would serialize the scan).
    """
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", "source",
        F.size(ws_tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    packed = sized.withColumn(
        "stream_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    # Pure integer division (offsets are non-negative) — no float
    # intermediate exists on either engine, so the bins hash stably.
    return packed.select(
        "doc_id", "source", "n_tokens", "stream_offset",
        F.expr(f"CAST(stream_offset DIV {_BIN_TOKENS} AS BIGINT)")
        .alias("first_bin"),
        F.expr(f"CAST((stream_offset + n_tokens - 1) DIV {_BIN_TOKENS} AS BIGINT)")
        .alias("last_bin"),
    )


# --------------------------------------------------------------------------
# Benchmark contamination screening: exact n-gram collision rate.
# --------------------------------------------------------------------------

_CONTAM_THRESHOLD = 0.5  # fraction of a doc's shingles found in the benchmark

_CONTAMINATION_ORACLE = f"""
WITH words AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(ws[t.i : t.i + 2], ' ') AS shingle
  FROM words, UNNEST(range(1, greatest(len(ws) - 1, 1))) AS t(i)
),
bench AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0
),
per AS (
  SELECT t.doc_id,
         count(*) AS n_shingles,
         count(b.shingle) AS n_hits
  FROM sh t LEFT JOIN bench b ON b.shingle = t.shingle
  WHERE t.doc_id % 50 <> 0
  GROUP BY t.doc_id
)
SELECT doc_id, n_shingles, n_hits,
       CAST(n_hits AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS contamination_rate,
       CAST(n_hits AS DOUBLE) / CAST(n_shingles AS DOUBLE) >= {_CONTAM_THRESHOLD}
         AS is_contaminated
FROM per
"""


@register("contamination_check", oracle=_CONTAMINATION_ORACLE)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: per training doc, the fraction of
    its distinct 3-gram shingles that collide with the benchmark set
    (docs with doc_id % 50 == 0 stand in for the eval suite).

    The published decontamination recipe: exact n-gram collision
    against the eval set, flag documents above a rate threshold.  The
    benchmark's distinct-shingle set is tiny relative to the corpus
    (eval suites are fixed-size), so it broadcasts and the screen is
    one map-side hash-join pass over the training shingles — no
    all-pairs stage, linear at 100 TB.
    """
    docs = spread_for_compute(spark, load_table(spark, sf_dir, "documents"))
    # shingles() let-binds the token array so the window lambda does
    # not re-split the text per window (round 10 — this inline copy of
    # the shingle expression predated the shared helper's fix)
    arr = shingles(F.col("text"), n=3)
    sh = docs.select("doc_id", F.explode(F.array_distinct(arr)).alias("shingle"))
    bench = (
        sh.filter(F.col("doc_id") % 50 == 0)
        .select("shingle").distinct()
        .withColumn("hit", F.lit(1))
    )
    train = sh.filter(F.col("doc_id") % 50 != 0)
    rate = F.col("n_hits").cast("double") / F.col("n_shingles").cast("double")
    return (
        train.join(F.broadcast(bench), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_hits"),
        )
        .select(
            "doc_id", "n_shingles", "n_hits",
            rate.alias("contamination_rate"),
            (rate >= _CONTAM_THRESHOLD).alias("is_contaminated"),
        )
    )


# --------------------------------------------------------------------------
# Repetition quality filter: TTR / top-token share / duplicate n-grams.
# --------------------------------------------------------------------------

_MIN_TTR = 0.30        # distinct tokens / tokens
_MAX_TOP_FRAC = 0.18   # most frequent token's share
_MAX_DUP3_FRAC = 0.50  # 1 - distinct 3-grams / 3-grams

_REPETITION_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents
),
grp AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
),
tok_stats AS (
  SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct, max(c) AS top_c
  FROM grp GROUP BY 1
),
grams AS (
  SELECT doc_id,
         greatest(len(ws) - 2, 0) AS n_grams,
         CASE WHEN len(ws) >= 3 THEN len(list_distinct(
           list_transform(range(1, len(ws) - 1),
                          i -> array_to_string(ws[i : i + 2], ' '))))
              ELSE 0 END AS n_distinct_grams
  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
        FROM documents)
)
SELECT t.doc_id,
       CAST(t.n_tokens AS BIGINT) AS n_tokens,
       CAST(t.n_distinct AS DOUBLE) / CAST(t.n_tokens AS DOUBLE) AS ttr,
       CAST(t.top_c AS DOUBLE) / CAST(t.n_tokens AS DOUBLE) AS top_token_frac,
       CASE WHEN g.n_grams > 0
            THEN 1.0 - CAST(g.n_distinct_grams AS DOUBLE) / CAST(g.n_grams AS DOUBLE)
            ELSE 0.0 END AS dup_3gram_frac,
       (CAST(t.n_distinct AS DOUBLE) / CAST(t.n_tokens AS DOUBLE) >= {_MIN_TTR}
        AND CAST(t.top_c AS DOUBLE) / CAST(t.n_tokens AS DOUBLE) <= {_MAX_TOP_FRAC}
        AND (CASE WHEN g.n_grams > 0
             THEN 1.0 - CAST(g.n_distinct_grams AS DOUBLE) / CAST(g.n_grams AS DOUBLE)
             ELSE 0.0 END) <= {_MAX_DUP3_FRAC}) AS keep
FROM tok_stats t JOIN grams g ON g.doc_id = t.doc_id
"""


@register("quality_repetition_filter", oracle=_REPETITION_ORACLE)
def quality_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality gate: type-token ratio, top-token
    share, duplicate-3-gram share, combined into a keep flag.

    The repetition family of web-corpus quality heuristics: degenerate
    docs (keyword stuffing, boilerplate loops, template spam) show a
    collapsed vocabulary long before a language model sees them.  The
    token stats need one explode + two-level aggregation (the map-side
    partial combine absorbs most of the exploded volume); the n-gram
    stats are pure array expressions on the un-exploded doc — no extra
    shuffle, so the whole filter is one aggregation pass at any scale.
    """
    docs = spread_for_compute(spark, load_table(spark, sf_dir, "documents"))
    tok_stats = (
        docs.select("doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_c"),
        )
    )
    arr = shingles(F.col("text"), n=3)
    grams = docs.select(
        "doc_id",
        F.greatest(F.size(ws_tokens(F.col("text"))) - 2, F.lit(0)).alias("n_grams"),
        F.size(F.array_distinct(arr)).alias("n_distinct_grams"),
    )
    ttr = F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double")
    top_frac = F.col("top_c").cast("double") / F.col("n_tokens").cast("double")
    dup3 = F.when(
        F.col("n_grams") > 0,
        F.lit(1.0) - F.col("n_distinct_grams").cast("double") / F.col("n_grams").cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        tok_stats.join(grams, "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            ttr.alias("ttr"),
            top_frac.alias("top_token_frac"),
            dup3.alias("dup_3gram_frac"),
            ((ttr >= _MIN_TTR) & (top_frac <= _MAX_TOP_FRAC)
             & (dup3 <= _MAX_DUP3_FRAC)).alias("keep"),
        )
    )
