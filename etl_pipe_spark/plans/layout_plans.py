"""Storage-layout operators round 5: Z-order clustering effectiveness
and length-bucketed batching.

Two layout decisions a 100 TB pipeline makes BEFORE any query runs,
both graded under the exact differential harness:

* **Z-order layout** — interleave (customer, order-day) bits into a
  Morton code, range-sort, bin into files, and measure what min/max
  stats can prune.  The registered query emits the per-bin bounding
  boxes for BOTH layouts (z-order vs linear key sort) plus a
  prunability flag for a fixed predicate box, so the artifact itself
  shows z-order bins pruning where linear bins cannot.  All integer
  bit arithmetic — the layout decision is hash-checked, not asserted.

* **Length-bucketed batching** — group documents into 8 global
  token-length quantile buckets and account the padding waste
  (batch serving pads every sequence to its batch max; sorting by
  length first is the standard fix — public practice from batching in
  Flash-style training stacks).  Exact global quantiles via the
  two-phase distributed rank (``operators/ordering.py``), never a
  no-partition window.

Cross-engine determinism: every column is bigint/boolean except
``waste_frac``, a single IEEE division of two exact bigints —
bit-identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.ordering import ranked_running_sum
from ..operators.zorder import morton32, spread16_sql
from ..sources.catalog import load_table
from .catalog import register

_GRID = 65535       # 16-bit grid per dimension
_NBINS = 32         # "files" per layout
_BOX_LO = 19660     # fixed predicate box in grid space, both dims:
_BOX_HI = 26214     # the 30%..40% band of each dimension's range

_ZORDER_ORACLE = f"""
WITH dims AS (
  SELECT o_orderkey,
         CAST(o_custkey AS BIGINT) AS ck,
         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS ed
  FROM orders
), mm AS (
  SELECT min(ck) AS ck_lo, max(ck) AS ck_hi,
         min(ed) AS ed_lo, max(ed) AS ed_hi,
         CAST(count(*) AS BIGINT) AS n
  FROM dims
), grid AS (
  SELECT o_orderkey, n,
         (ck - ck_lo) * {_GRID} // greatest(ck_hi - ck_lo, 1) AS gx,
         (ed - ed_lo) * {_GRID} // greatest(ed_hi - ed_lo, 1) AS gy
  FROM dims, mm
), sp AS (
  SELECT o_orderkey, n, gx, gy,
         {spread16_sql("gx", "sx")},
         {spread16_sql("gy", "sy")}
  FROM grid
), ranked AS (
  SELECT 'zorder' AS layout, gx, gy, n,
         row_number() OVER (ORDER BY (sx3 | (sy3 << 1)), o_orderkey) AS rn
  FROM sp
  UNION ALL
  SELECT 'linear' AS layout, gx, gy, n,
         row_number() OVER (ORDER BY o_orderkey) AS rn
  FROM sp
)
SELECT layout,
       CAST((rn - 1) * {_NBINS} // n AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(min(gx) AS BIGINT) AS min_gx, CAST(max(gx) AS BIGINT) AS max_gx,
       CAST(min(gy) AS BIGINT) AS min_gy, CAST(max(gy) AS BIGINT) AS max_gy,
       (max(gx) < {_BOX_LO} OR min(gx) > {_BOX_HI}
        OR max(gy) < {_BOX_LO} OR min(gy) > {_BOX_HI}) AS prunable
FROM ranked
GROUP BY layout, bin
ORDER BY layout, bin
"""


@register("zorder_layout_skipping", oracle=_ZORDER_ORACLE)
def zorder_layout_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file bounding boxes + prunability under a Z-order layout vs
    a linear key sort — the data-skipping audit for a two-dimensional
    predicate workload.

    Plan: one narrow scan computes both grid coordinates; exact
    min/max/count come from a broadcast 1-row aggregate (the
    broadcast-dim pattern); the Morton code is pure bit arithmetic
    (``operators/zorder.py``); bin assignment is the two-phase
    distributed rank DIV'd into 32 equal files; the final
    groupBy is 2x32 cells.  Production writes the layout
    instead of grading it: ``repartitionByRange("z")`` +
    ``sortWithinPartitions`` + parquet — after which ANY engine's
    footer-stats pruning benefits; here the ``prunable`` flag shows
    z-order bins pruned by a box predicate that prunes almost no
    linear bins.  Both engines interleave the same bits, so the
    layout decision itself is hash-checked.
    """
    dims = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").cast("bigint").alias("ck"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("bigint").alias("ed"),
    )
    mm = dims.agg(
        F.min("ck").alias("ck_lo"), F.max("ck").alias("ck_hi"),
        F.min("ed").alias("ed_lo"), F.max("ed").alias("ed_hi"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    grid = dims.crossJoin(F.broadcast(mm)).select(
        "o_orderkey", "n",
        F.expr(f"CAST((ck - ck_lo) * {_GRID} DIV greatest(ck_hi - ck_lo, 1)"
               " AS BIGINT)").alias("gx"),
        F.expr(f"CAST((ed - ed_lo) * {_GRID} DIV greatest(ed_hi - ed_lo, 1)"
               " AS BIGINT)").alias("gy"),
    )
    z = grid.withColumn("zval", morton32(F.col("gx"), F.col("gy")))
    # ONE two-phase rank for both layouts (round 9, guide §2.4): the
    # two global ranks differ only in order key, so ranking the
    # 2x-exploded frame by (layout, layout's-own-key, o_orderkey) and
    # subtracting the layout offset gives per-layout ranks identical
    # to two separate calls — 'linear' sorts before 'zorder' and each
    # layout holds exactly n rows, so rn = rn_global for linear and
    # rn_global - n for zorder.  Halves the rank machinery: one
    # boundary-sample pass, one window exchange, one offsets
    # aggregate instead of two of each.
    both = z.withColumn(
        "layout", F.explode(F.array(F.lit("linear"), F.lit("zorder"))))
    ranked = ranked_running_sum(
        both,
        [F.col("layout"),
         F.when(F.col("layout") == "zorder", F.col("zval"))
         .otherwise(F.col("o_orderkey")),
         F.col("o_orderkey")],
        None, rank_name="rn_g",
    ).withColumn(
        "rn",
        F.when(F.col("layout") == "zorder", F.col("rn_g") - F.col("n"))
        .otherwise(F.col("rn_g")),
    ).select("layout", "gx", "gy", "n", "rn")
    return (
        ranked.withColumn(
            "bin", F.expr(f"CAST((rn - 1) * {_NBINS} DIV n AS BIGINT)")
        )
        .groupBy("layout", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.min("gx").alias("min_gx"), F.max("gx").alias("max_gx"),
            F.min("gy").alias("min_gy"), F.max("gy").alias("max_gy"),
        )
        .withColumn(
            "prunable",
            (F.col("max_gx") < _BOX_LO) | (F.col("min_gx") > _BOX_HI)
            | (F.col("max_gy") < _BOX_LO) | (F.col("min_gy") > _BOX_HI),
        )
        .orderBy("layout", "bin")
    )


_NBUCKETS = 8

_LENGTH_BUCKET_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT)
           AS n_tokens
  FROM documents
), t AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM d
), r AS (
  SELECT n_tokens, n,
         row_number() OVER (ORDER BY n_tokens, doc_id) AS rn
  FROM d, t
)
SELECT CAST((rn - 1) * {_NBUCKETS} // n AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(min(n_tokens) AS BIGINT) AS min_tokens,
       CAST(max(n_tokens) AS BIGINT) AS max_tokens,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) AS pad_waste,
       CAST(count(*) * max(n_tokens) - sum(n_tokens) AS DOUBLE)
         / CAST(count(*) * max(n_tokens) AS DOUBLE) AS waste_frac
FROM r
GROUP BY bucket
ORDER BY bucket
"""


@register("length_bucket_batching", oracle=_LENGTH_BUCKET_ORACLE)
def length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length quantile buckets with exact padding-waste
    accounting — the batch-serving layout decision (pad-to-batch-max
    wastes ``cnt*max - sum`` token slots; length-sorted buckets shrink
    it by an order of magnitude vs one global bucket).

    Exact global quantiles come from the two-phase distributed rank
    (``ranked_running_sum`` in rank-only mode — range partition,
    per-partition windows, p-row offset scan), so bucket boundaries
    are identical at any partition count and the whole table is
    hash-checked.  ``n_tokens`` coalesces to 0 for NULL text so both
    engines order NULL-text docs identically (Spark sorts NULLs
    first, DuckDB last — a raw NULL would shift every rank).  Every
    output column is bigint except ``waste_frac``, one IEEE division
    of two exact bigints.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(F.size(F.split("text", " ")), F.lit(0))
        .cast("bigint").alias("n_tokens"),
    )
    t = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    r = ranked_running_sum(
        d.crossJoin(F.broadcast(t)),
        [F.col("n_tokens"), F.col("doc_id")], None, rank_name="rn",
    )
    padded = F.col("cnt") * F.col("max_tokens")
    return (
        r.withColumn(
            "bucket", F.expr(f"CAST((rn - 1) * {_NBUCKETS} DIV n AS BIGINT)")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        )
        .select(
            "bucket", "cnt", "min_tokens", "max_tokens", "sum_tokens",
            (padded - F.col("sum_tokens")).cast("bigint").alias("pad_waste"),
            (
                (padded - F.col("sum_tokens")).cast("double")
                / padded.cast("double")
            ).alias("waste_frac"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Hive-partitioned write + partition-pruned read
# ---------------------------------------------------------------------------

_PRUNE_DATE = "2024-01-15"

_PRUNE_ORACLE = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
         AS total_value
FROM events
WHERE CAST(ts AS DATE) = DATE '{_PRUNE_DATE}'
GROUP BY event_type
ORDER BY event_type
"""


@register("hive_partition_pruning", oracle=_PRUNE_ORACLE)
def hive_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-partitioned write + single-partition read — THE 100 TB
    lever: a day query against a month of events must list one
    directory, not scan thirty.

    The write lays events out hive-style (``partitionBy("event_date")``,
    one directory per day); the read filters on the partition column,
    which Spark resolves at PLANNING time against the directory
    listing — the scan's PartitionFilters prune 29/30 days before a
    single row is read (pinned by tests/test_physical_plans.py; the
    zorder op is the complementary WITHIN-file skipping story).  The
    DuckDB twin computes the same day straight from the truth table,
    so a hash match proves the partition round trip loses and
    duplicates nothing at the boundary (midnight rows land on the
    right side — both engines derive the date from the same UTC
    timestamp).

    Scale: the write shuffles by partition value only via the dynamic
    partition insert; the read is listing + one partition's files.
    value goes through the money/dsum recipe for bit-stable sums.
    """
    from ..functions.parity import dsum, money
    from .ingest_plans import _io_dir

    out_dir = _io_dir(sf_dir, "hive_events")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.to_date("ts").alias("event_date"),
    )
    (
        ev.repartition("event_date")
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(out_dir)
    )
    day = (
        spark.read.parquet(out_dir)
        .filter(F.col("event_date") == F.lit(_PRUNE_DATE).cast("date"))
    )
    return (
        day.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            dsum(money(F.col("value"))).alias("total_value"),
        )
        .orderBy("event_type")
    )
