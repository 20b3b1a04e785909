"""The composed corpus-curation pipeline: mixture sample -> near-dup
drop -> chunk -> per-source stats, as ONE oracled declarative plan.

This is the end-to-end shape a 100 TB pre-training data build runs
(the driver north star's operators composed, not just demonstrated
individually): every stage reuses the already-verified operators
(mixture hash-bucketing, shingle/Jaccard dedup, token chunking) and
the whole chain still hash-matches DuckDB exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import DUCK_HASH60, hash60
from ..operators import dedup as DD
from ..operators.dedup import jaccard_pairs_capped, shingle_arrays
from ..sources.catalog import load_table
from .catalog import register
from .text_plans2 import _MIX, _DEFAULT_RATE, chunk_documents

_DUP_TAU = 0.8  # strong near-dups only

_mix_cases = " ".join(f"WHEN '{s}' THEN {r}" for s, r in _MIX.items())

# The dedup stage composes the CAPPED operator (hot-shingle document
# frequency <= MAX_DF for candidate generation, exact Jaccard on full
# sets for scoring) — same dfreq/cold/cand shape as the standalone
# _NGRAM_JACCARD_ORACLE in dedup_plans.py, over the sampled `kept` set.
_PIPELINE_ORACLE = f"""
WITH kept AS (
  SELECT * FROM documents
  WHERE {DUCK_HASH60.format(col="CAST(doc_id AS VARCHAR)")} % 100
        < CASE source {_mix_cases} ELSE {_DEFAULT_RATE} END
),
words AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws FROM kept
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(ws[t.i : t.i + 2], ' ') AS shingle
  FROM words, UNNEST(range(1, greatest(len(ws) - 1, 1))) AS t(i)
),
dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
cold AS (
  SELECT s.doc_id, s.shingle
  FROM sh s JOIN dfreq d ON d.shingle = s.shingle
  WHERE d.df <= {DD.MAX_DF}
),
cand AS (
  SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id
  FROM cold a JOIN cold b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS left_id, b.doc_id AS right_id, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
dropped AS (
  SELECT DISTINCT i.right_id AS doc_id
  FROM inter i
  JOIN cand c ON c.left_id = i.left_id AND c.right_id = i.right_id
  JOIN sizes sa ON sa.doc_id = i.left_id
  JOIN sizes sb ON sb.doc_id = i.right_id
  WHERE CAST(i.n_common AS DOUBLE)
        / CAST(sa.n_shingles + sb.n_shingles - i.n_common AS DOUBLE) >= {_DUP_TAU}
),
survivors AS (
  SELECT k.* FROM kept k WHERE k.doc_id NOT IN (SELECT doc_id FROM dropped)
),
swords AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS ws FROM survivors
),
chunks AS (
  SELECT doc_id, source,
         least(len(ws) - t.i * 24, 32) AS n_tokens
  FROM swords,
       UNNEST(range(0, greatest((len(ws) - 32 + 23) // 24, 0) + 1)) AS t(i)
  WHERE t.i * 24 < len(ws)
)
SELECT s.source,
       count(DISTINCT s.doc_id) AS n_docs_kept,
       (SELECT count(*) FROM kept k2 WHERE k2.source = s.source)
         - count(DISTINCT s.doc_id) AS n_docs_dropped_dup,
       (SELECT count(*) FROM chunks c WHERE c.source = s.source) AS n_chunks,
       (SELECT CAST(coalesce(sum(n_tokens), 0) AS BIGINT)
        FROM chunks c WHERE c.source = s.source) AS total_chunk_tokens
FROM survivors s
GROUP BY s.source
"""


@register("corpus_curation_pipeline", oracle=_PIPELINE_ORACLE)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-sample -> drop near-dups (3-gram Jaccard >= 0.8, higher
    doc_id loses) -> chunk survivors -> per-source corpus stats.

    One lazy plan end to end; at scale each stage keeps its bucketed
    shape: hash sampling is a scan filter, dedup is the CAPPED
    inverted-index join (hot shingles with df > MAX_DF excluded from
    candidate generation, so one boilerplate phrase can't cost O(N^2)
    pairs — scoring still uses full shingle sets), chunking a single
    explode.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash60(F.col("doc_id").cast("string")) % 100
    rate = F.when(F.col("source") == "src0", _MIX["src0"]) \
        .when(F.col("source") == "src1", _MIX["src1"]) \
        .when(F.col("source") == "src2", _MIX["src2"]) \
        .otherwise(_DEFAULT_RATE)
    kept = docs.filter(bucket < rate)

    # spread the sampled docs across the shuffle width: the shingle
    # pipeline is narrow and would otherwise run at the scan's (single
    # row-group) parallelism — see dedup_plans._spread
    from .dedup_plans import _spread

    pairs = jaccard_pairs_capped(
        shingle_arrays(_spread(spark, kept), n=3),
        threshold=_DUP_TAU,
        max_df=DD.MAX_DF,
    )
    dropped = pairs.select(F.col("right_id").alias("doc_id")).distinct()
    survivors = kept.join(dropped, "doc_id", "left_anti")

    chunks = chunk_documents(survivors).join(
        survivors.select("doc_id", "source"), "doc_id"
    )
    kept_per_source = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept_raw"))
    chunk_stats = chunks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("total_chunk_tokens"),
    )
    return (
        survivors.groupBy("source")
        .agg(F.count_distinct("doc_id").alias("n_docs_kept"))
        .join(kept_per_source, "source")
        .withColumn("n_docs_dropped_dup", F.col("n_kept_raw") - F.col("n_docs_kept"))
        .drop("n_kept_raw")
        .join(chunk_stats, "source", "left")
        .select(
            "source",
            "n_docs_kept",
            "n_docs_dropped_dup",
            F.coalesce(F.col("n_chunks"), F.lit(0)).alias("n_chunks"),
            F.coalesce(F.col("total_chunk_tokens"), F.lit(0)).cast("long")
            .alias("total_chunk_tokens"),
        )
    )
