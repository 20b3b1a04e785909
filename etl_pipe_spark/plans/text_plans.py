"""Additional text-analysis queries: TF-IDF term statistics and
approximate aggregates (the sketch family).

TF-IDF parity note: ln() is not guaranteed identically rounded across
libms, so the oracle-checked query surfaces the exact integer
statistics (tf, df, N) and the pure-ratio score tf/df — the idf-log
composition is kept Spark-side in the rows-only variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.text import ws_tokens
from ..sources.catalog import load_table
from .catalog import register

_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
),
df AS (
  SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1
),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df, n.n_docs,
         CAST(tf.tf AS DOUBLE) / CAST(df.df AS DOUBLE) AS tf_over_df,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) / CAST(df.df AS DOUBLE) DESC, tf.term) AS rnk
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, n_docs, tf_over_df, rnk
FROM scored WHERE rnk <= 3
"""


@register("tfidf_top_terms", oracle=_TFIDF_ORACLE)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf/df ratio.

    Classic two-aggregation TF-IDF shape: term frequencies per doc,
    document frequencies per term (broadcast — the vocabulary is small
    relative to the corpus), rank per doc.  The exact-integer stats
    make it oracle-checkable; the log-idf variant is tfidf_log below.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # fully lazy N: a broadcast cross join of the 1-row count aggregate
    # keeps the whole query one plan (no eager driver-side docs.count()
    # job per invocation)
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    ratio = F.col("tf").cast("double") / F.col("df").cast("double")
    w = W.partitionBy("doc_id").orderBy(F.col("tf_over_df").desc(), F.col("term"))
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("tf_over_df", ratio)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "n_docs", "tf_over_df", "rnk")
    )


@register("approx_aggregates")  # no oracle: sketch outputs are engine-specific
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approximate-aggregate family (HLL distinct, quantile sketch).

    Sketch results are engine-specific by design (Spark HLL++ vs
    DuckDB's HLL differ), so the driver records a rows-only check;
    the test suite bounds the HLL error against the exact count
    instead (tests/test_text_extras.py).
    """
    li = load_table(spark, sf_dir, "lineitem")
    # The distinct count is computed in its own two-level aggregation
    # rather than as COUNT(DISTINCT ...) inside the sketch agg: a
    # distinct aggregate mixed with other aggregates forces Spark's
    # Expand-based multi-phase plan, which duplicates every input row
    # per aggregate group and drags the accuracy-10000 QuantileSummaries
    # sketch through the expanded rows (measured 26 s combined vs
    # 2.7 s + 0.4 s separately at sf0.1 — and Expand doubles shuffled
    # bytes, which is a scale-killer at 100 TB).  Pre-aggregating on
    # (flag, orderkey) gets map-side combine on both shuffles.
    exact = (
        li.groupBy("l_returnflag", "l_orderkey")
        .agg(F.lit(1))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    sketches = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_exact_rows"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        # sketch over double, not decimal: QuantileSummaries compares
        # boxed Decimals ~50x slower than primitive doubles, and an
        # approximate quantile gains nothing from exact decimal
        # arithmetic.  to_json at the output boundary: the harness
        # canonicalizer hashes cells and cannot hash raw arrays.
        F.to_json(
            F.percentile_approx(
                F.col("l_extendedprice").cast("double"), [0.5, 0.95, 0.99], 10000
            )
        ).alias("price_quantiles"),
    )
    return sketches.join(F.broadcast(exact), "l_returnflag").select(
        "l_returnflag",
        "n_exact_rows",
        "exact_orders",
        "approx_orders",
        "price_quantiles",
    )
