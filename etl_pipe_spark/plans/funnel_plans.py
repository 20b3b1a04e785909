"""Ordered-sequence analytics: funnel conversion over the event stream.

The product-analytics primitive the registry still lacked: how many
users progressed view -> click -> purchase IN THAT ORDER, and how long
each hop took.  Order matters (a purchase before the first view must
not count), which is what separates a funnel from three independent
COUNT(DISTINCT) columns.

Plan shape — the conditional-aggregation cascade, one stage per hop:

  stage 1: groupBy(user) of min(ts) over 'view' rows;
  stage k: join the stage-(k-1) table back to the stream and take the
           earliest stage-k event STRICTLY AFTER the user's previous
           stage timestamp.

Every per-user aggregate shuffles on user_id, so after the first
exchange the joins are co-partitioned (the join key never changes);
the alternative single-window formulation (sort each user's events,
scan statefully) drags the whole stream through per-user sorts and
cannot push partial aggregation — measured slower and strictly less
scalable than the cascade, whose map-side partial min() collapses
each partition to one row per user before any shuffle.

Exactness: hop latencies are integer microsecond differences
(unix_micros in Spark, date_diff('microsecond') in DuckDB) summed as
bigints; the mean is one int/int IEEE division — bit-identical
cross-engine, no rounding anywhere.

Scale (100 TB): the event stream is read once per stage with only
(user_id, ts) surviving the scan projection; each stage's output is
user-sized, not event-sized.  A k-stage funnel is k-1 co-partitioned
joins — at cluster scale the stream would be bucketed by user_id and
the exchanges vanish entirely.

Reference parity: the reference engine computes run summaries and
event rollups (transform.py) but has no ordered-sequence operator;
this extends the windowed family (plans/windows.py) the way
timeseries_plans extends resampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table
from .catalog import register

_FUNNEL_STAGES = ("view", "click", "purchase")

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
), hops AS (
  SELECT 1 AS stage_no, 'view' AS stage,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(NULL AS BIGINT) AS sum_hop_micros
  FROM s1
  UNION ALL
  SELECT 2, 'click', CAST(count(*) AS BIGINT),
         CAST(sum(date_diff('microsecond', s1.t1, s2.t2)) AS BIGINT)
  FROM s2 JOIN s1 ON s1.user_id = s2.user_id
  UNION ALL
  SELECT 3, 'purchase', CAST(count(*) AS BIGINT),
         CAST(sum(date_diff('microsecond', s2.t2, s3.t3)) AS BIGINT)
  FROM s3 JOIN s2 ON s2.user_id = s3.user_id
)
SELECT stage_no, stage, n_users,
       CASE WHEN stage_no > 1 AND n_users > 0
            THEN CAST(sum_hop_micros AS DOUBLE) / CAST(n_users AS DOUBLE)
       END AS mean_hop_micros
FROM hops
ORDER BY stage_no
"""


@register("event_funnel_conversion", oracle=_FUNNEL_ORACLE)
def event_funnel_conversion(spark: SparkSession, sf_dir: str,
                            stages: tuple[str, ...] = _FUNNEL_STAGES,
                            ) -> DataFrame:
    """Ordered k-stage funnel: users surviving each hop, and the exact
    mean hop latency in microseconds.

    ``stages`` parameterizes the chain (any length >= 1, any event
    types); the registered default is the view -> click -> purchase
    trio the oracle mirrors.  Each extra stage adds one co-partitioned
    join + partial-min aggregate — cost is linear in chain length.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def first_after(prev: DataFrame, prev_col: str, etype: str,
                    out_col: str) -> DataFrame:
        # F.first(prev_col) is safe: prev_col is constant per user
        # (joined from the previous stage's one-row-per-user table)
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_col))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_col), F.first(prev_col).alias(prev_col))
        )

    stage_tables = [(
        ev.filter(F.col("event_type") == stages[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )]
    for i, etype in enumerate(stages[1:], start=2):
        prev = stage_tables[-1].select("user_id", f"t{i - 1}")
        stage_tables.append(first_after(prev, f"t{i - 1}", etype, f"t{i}"))

    def hop_row(df: DataFrame, stage_no: int, stage: str,
                lo: str | None, hi: str | None) -> DataFrame:
        agg = [F.count(F.lit(1)).cast("bigint").alias("n_users")]
        if lo is None:
            agg.append(F.lit(None).cast("bigint").alias("sum_hop_micros"))
        else:
            # ts is TIMESTAMP_NTZ off the reader; the session timezone
            # is pinned UTC, so the cast to TIMESTAMP is the identity
            # instant and unix_micros stays exact.
            micros = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
            agg.append(
                F.sum(micros(hi) - micros(lo))
                .cast("bigint").alias("sum_hop_micros")
            )
        return df.agg(*agg).select(
            F.lit(stage_no).cast("int").alias("stage_no"),
            F.lit(stage).alias("stage"),
            "n_users",
            "sum_hop_micros",
        )

    hops = hop_row(stage_tables[0], 1, stages[0], None, None)
    for i, etype in enumerate(stages[1:], start=2):
        hops = hops.unionByName(
            hop_row(stage_tables[i - 1], i, etype, f"t{i - 1}", f"t{i}")
        )
    return (
        hops.select(
            "stage_no",
            "stage",
            "n_users",
            F.when(
                (F.col("stage_no") > 1) & (F.col("n_users") > 0),
                F.col("sum_hop_micros").cast("double")
                / F.col("n_users").cast("double"),
            ).alias("mean_hop_micros"),
        )
        .orderBy("stage_no")
    )
