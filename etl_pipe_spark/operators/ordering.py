"""Distributed global ordering: rank + running sum without the
single-task window.

A window with ``orderBy`` and no ``partitionBy`` is the classic
100 TB trap: Spark moves EVERY row into one task to satisfy the
global frame.  The scalable equivalent is the textbook two-phase
prefix sum:

1. ``repartitionByRange`` on the order key — each partition holds a
   contiguous key range, sorted relative to the others;
2. rank / running-sum WITHIN each partition (ordinary partitioned
   window — parallel);
3. aggregate one (count, sum) row per partition, prefix-scan that
   tiny table (p rows for p partitions — driver-scale by
   construction, like the centroid tables in operators/ann.py), and
   broadcast the per-partition offsets back.

The result is identical to the global window for any TOTAL order
(make the last order key a tiebreaker-unique column): every row's
rank/prefix is (rows before my partition) + (my rank within it), and
that decomposition does not depend on where the range boundaries
fall, so the output is partition-count independent and safe to
hash-check against a sequential oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

# Correctness caches created by ranked_running_sum (and fellow
# travellers like curriculum's phase frames) that a lazy result keeps
# alive.  One entry per call; release_rank_caches() drains the list.
_LIVE_RANK_CACHES: list[DataFrame] = []


def track_rank_cache(df: DataFrame) -> DataFrame:
    """Register an already-persisted frame for release_rank_caches()."""
    _LIVE_RANK_CACHES.append(df)
    return df


def release_rank_caches(blocking: bool = False) -> int:
    """Unpersist every tracked rank cache; returns how many.

    Call ONLY between fully-materialized queries (after every action
    on a rank-derived result has completed): releasing earlier forces
    a re-evaluation of the un-cached range exchange, which reopens the
    duplicate-rank divergence the cache exists to close.  The bench
    and differential harnesses call this after each query's final
    hash/count; a production pipeline calls it between jobs."""
    n = 0
    while _LIVE_RANK_CACHES:
        df = _LIVE_RANK_CACHES.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:
            pass
    return n


def ranked_running_sum(
    df: DataFrame,
    order: list[Column],
    sum_col: str | None,
    rank_name: str = "rnk",
    before_name: str = "sum_before",
) -> DataFrame:
    """Attach global ``rank_name`` (row_number over ``order``) and
    ``before_name`` (exclusive running sum of ``sum_col`` in that
    order) — distributed via range partitioning + offset merge.

    ``order`` must define a TOTAL order (include a unique tiebreaker);
    otherwise ranks are partition-dependent.  ``sum_col`` should be an
    exact type (integer/decimal) so the partial sums are
    order-insensitive; its type is preserved in ``before_name`` (no
    silent integer cast).  NULLs in ``sum_col`` contribute 0 to the
    running sum — the global window instead PROPAGATES null into the
    prefix of later rows only if every prior value is null; callers
    needing window-exact null semantics should pre-``coalesce`` the
    column (the repo's callers have non-null counts).

    Pass ``sum_col=None`` for RANK-ONLY mode: the per-row prefix
    window, the per-partition sum aggregate, and the offset merge for
    the sum all drop out of the plan (callers that discard the prefix
    column would otherwise pay a full running-sum pass for nothing).
    """
    ranged = df.repartitionByRange(*order).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_in = W.partitionBy("__pid").orderBy(*order)
    within = ranged.withColumn("__rn_in", F.row_number().over(w_in))
    if sum_col is not None:
        within = within.withColumn(
            "__sum_in",
            F.sum(sum_col).over(w_in.rowsBetween(W.unboundedPreceding, 0)),
        )
    # MATERIALIZATION POINT — load-bearing for correctness, not a perf
    # cache.  `within` feeds two consumers (the row output and the
    # per-partition offsets aggregate).  Without a cache each consumer
    # re-evaluates the range exchange, and the two evaluations need
    # not agree on `spark_partition_id`: AQE gives every read stage
    # its OWN coalesced shuffle reader (identical map output, different
    # reducer grouping), and a duplicated exchange re-samples range
    # boundaries with an RDD-id-derived seed.  Either way the offsets
    # join mis-keys and ranks collide — observed at 1M rows/local[32]
    # as 989,558 distinct ranks out of 1,000,000 (sub-window scales
    # coalesce both branches identically, which is why sf0.01 parity
    # never caught it; tests/test_ordering_scale.py now does — and an
    # explicit repartitionByRange(N, ...) was tested and does NOT fix
    # it, so the cache is the only correct form).  At cluster scale
    # this is the standard disk-backed materialization a global total
    # order costs.  The cache is corpus-sized and the result is lazy,
    # so the operator cannot release it itself; it is TRACKED, and
    # long-lived sessions (benches, differential harnesses) call
    # release_rank_caches() between fully-materialized queries.
    within = track_rank_cache(within.persist())
    # one row per partition; prefix-scan this p-row table (p = shuffle
    # width, never data-scale) and broadcast the offsets back.  The
    # single-partition window is INTENTIONAL here — correct precisely
    # because the input is p rows.  The partition key must be a
    # non-foldable constant: Catalyst folds `lit(0)` into an EMPTY
    # partition spec (Spark 4 fires its "No Partition Defined" warning
    # on every run), while `__pid - __pid` survives optimization as a
    # real single-valued key, keeping the plan self-documenting and
    # the runtime log clean.
    w_parts = (
        W.partitionBy(F.col("__pid") - F.col("__pid"))
        .orderBy("__pid")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    part_aggs = [F.count(F.lit(1)).alias("__cnt")]
    off_cols = ["__pid",
                F.coalesce(F.sum("__cnt").over(w_parts), F.lit(0))
                .alias("__cnt_off")]
    if sum_col is not None:
        part_aggs.append(F.sum(sum_col).alias("__sum"))
        off_cols.append(
            F.coalesce(F.sum("__sum").over(w_parts), F.lit(0))
            .alias("__sum_off"))
    offsets = within.groupBy("__pid").agg(*part_aggs).select(*off_cols)
    out = (
        within.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_name, (F.col("__cnt_off") + F.col("__rn_in")).cast("bigint"))
    )
    if sum_col is not None:
        out = out.withColumn(
            before_name,
            F.col("__sum_off") + F.coalesce(F.col("__sum_in"), F.lit(0))
            - F.coalesce(F.col(sum_col), F.lit(0)),
        ).drop("__sum_in", "__sum_off")
    return out.drop("__pid", "__rn_in", "__cnt_off")
