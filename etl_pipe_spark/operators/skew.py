"""Skew-mitigation operators for hot keys at cluster scale.

AQE's skew-join handling (enabled in session.py) covers sort-merge
joins; these helpers cover the cases AQE doesn't: skewed aggregations
(two-phase salted rollup) and broadcast-infeasible skewed joins
(salt + replicate).  Results are exactly equal to their unsalted
forms — pinned in tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation through a salted pre-shuffle.

    ``aggs`` maps output name -> (partial_expr, merge_expr_builder)
    where partial_expr aggregates raw rows and merge_expr re-aggregates
    the partials.  A hot grouping key is spread over ``n_salts``
    reducers in phase 1, then the tiny partial set merges in phase 2 —
    the manual image of Spark's partial aggregation, needed when a UDAF
    or exact-distinct breaks map-side combining.
    """
    # the salt must vary WITHIN a key (a key-derived salt would land a
    # hot key back on one reducer); partition id is deterministic and
    # spreads each key over at most n_salts reducers
    salt = F.pmod(F.spark_partition_id(), F.lit(n_salts))
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(f"__p_{name}") for name, (expr, _) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[merge(F.col(f"__p_{name}")).alias(name) for name, (_, merge) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the big side, replicate the small side.

    For when the small side is too large to broadcast but the big
    side's key distribution is skewed: each big row picks one of
    ``n_salts`` buckets; the small side is replicated across all of
    them, so a hot key's rows spread over n_salts tasks instead of one.

    Only inner/left/semi shapes are valid: an outer join preserving
    the replicated small side would emit n_salts copies of every
    unmatched small row.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "cross"):
        raise ValueError(
            f"salted_join cannot preserve the replicated small side for how={how!r}; "
            "use inner/left/left_semi"
        )
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    big_salted = big.withColumn(
        "__salt", F.pmod(F.spark_partition_id(), F.lit(n_salts))
    )
    small_replicated = small.withColumn("__salt", F.explode(salts))
    out = big_salted.join(small_replicated, [key, "__salt"], how)
    return out.drop("__salt")
