"""Selection-family ops: DSIR importance resampling, count-min heavy
hitters, and cluster-balanced sampling.

DuckDB hash parity for all three is covered by
tests/test_oracle_parity.py (registered queries); these tests pin the
properties the oracle can't see — the sequential-reference exactness
of the CMS cells, the DSIR model's preference for the target slice,
partition-count independence of the two-phase rank, and the hard cap
contract of the cluster sample.
"""

from __future__ import annotations

import collections
import hashlib

from pyspark.sql import functions as F

from etl_pipe_spark.plans.selection_plans import (
    CELL_CAP,
    CMS_DEPTH,
    CMS_WIDTH,
    DSIR_KEEP_FRAC,
    DSIR_TARGET_LANG,
    cluster_balanced_sample,
    cms_heavy_hitters,
    dsir_importance_select,
)
from etl_pipe_spark.sources.catalog import load_table


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# cms_heavy_hitters
# ---------------------------------------------------------------------------

def test_cms_matches_sequential_reference(spark, sf_dir):
    """Every (exact, estimate) pair equals a sequential Python CMS
    built over the same stream with the same hash family."""
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    cells = collections.Counter()
    exact = collections.Counter()
    for row in docs:
        for t in row.text.split(" "):
            exact[t] += 1
            for r in range(CMS_DEPTH):
                cells[(r, _md5_32(f"{r}:{t}") % CMS_WIDTH)] += 1

    out = {
        r.token: (r.exact_cnt, r.cms_est, r.contract_ok)
        for r in cms_heavy_hitters(spark, sf_dir).collect()
    }
    assert set(out) == set(exact)
    for t, cnt in exact.items():
        est = min(
            cells[(r, _md5_32(f"{r}:{t}") % CMS_WIDTH)]
            for r in range(CMS_DEPTH)
        )
        assert out[t] == (cnt, est, 1), t
    # the deliberately narrow sketch must produce at least one REAL
    # overestimate on this vocabulary, or the contract row is vacuous
    assert any(est > cnt for cnt, est, _ in out.values())


# ---------------------------------------------------------------------------
# dsir_importance_select
# ---------------------------------------------------------------------------

def test_dsir_prefers_target_slice(spark, sf_dir):
    """Selection rate on the target-language slice must exceed the
    rate on the rest — the entire point of importance resampling."""
    res = dsir_importance_select(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    joined = res.join(docs, "doc_id").groupBy(
        (F.col("lang") == DSIR_TARGET_LANG).alias("is_target")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("selected").alias("sel"),
    ).collect()
    rates = {r.is_target: r.sel / r.n for r in joined}
    assert rates[True] > 2 * rates[False]


def test_dsir_selected_count_and_rank_consistency(spark, sf_dir):
    import math

    rows = dsir_importance_select(spark, sf_dir).collect()
    n = len(rows)
    k = math.ceil(n * DSIR_KEEP_FRAC)
    assert sum(r.selected for r in rows) == k
    # selected set == top-k by (weight desc, doc_id) recomputed here
    ranked = sorted(rows, key=lambda r: (-r.weight_fp, r.doc_id))
    expect = {r.doc_id for r in ranked[:k]}
    assert {r.doc_id for r in rows if r.selected} == expect


def test_dsir_partition_count_independent(spark, sf_dir):
    """The two-phase rank must give identical output whatever the
    shuffle width (total order => partition-independent)."""
    base = {
        (r.doc_id, r.weight_fp, r.selected)
        for r in dsir_importance_select(spark, sf_dir).collect()
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = {
            (r.doc_id, r.weight_fp, r.selected)
            for r in dsir_importance_select(spark, sf_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == alt


# ---------------------------------------------------------------------------
# cluster_balanced_sample
# ---------------------------------------------------------------------------

def test_cluster_sample_respects_cap_and_covers_cells(spark, sf_dir):
    rows = cluster_balanced_sample(spark, sf_dir).collect()
    per_cell = collections.Counter(r.cent_id for r in rows)
    assert max(per_cell.values()) <= CELL_CAP
    # every nonempty cell contributes: cells with >= CAP members give
    # exactly CAP; ranks are 1..k contiguous within each cell
    by_cell = collections.defaultdict(list)
    for r in rows:
        by_cell[r.cent_id].append(r.rnk)
    for cell, rnks in by_cell.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), cell
    # sample must be a strict subset that still touches many cells
    assert len(per_cell) >= 8
