"""IVF ANN quality: probed recall vs the brute-force baseline.

The plan-shape docstring (plans/dedup_plans.py similarity_ann_ivf)
names probed recall as the quality dial; this pins it.  Everything is
deterministic (md5-sampled centroids, tie-broken rankings), so the
recall values are exact per scale factor, and the floors below sit
under the measured values (0.16 @ nprobe=2, 0.68 @ nprobe=8 at
sf0.001; 0.28 / 0.48 at sf0.01).
"""

from __future__ import annotations

import pytest

from etl_pipe_spark.plans.catalog import queries
from etl_pipe_spark.plans.dedup_plans import N_CENTROIDS, ann_ivf


@pytest.fixture(scope="module")
def brute_top5(spark, sf_dir):
    df = (
        queries()["similarity_topk_cosine"](spark, sf_dir)
        .select("query_id", "neighbor_id")
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


def _recall(spark, sf_dir, brute, nprobe: int) -> float:
    ivf = ann_ivf(spark, sf_dir, nprobe=nprobe).select("query_id", "neighbor_id")
    return brute.join(ivf, ["query_id", "neighbor_id"]).count() / brute.count()


def test_recall_floor_at_default_nprobe(spark, sf_dir, brute_top5):
    assert _recall(spark, sf_dir, brute_top5, nprobe=2) >= 0.15


def test_recall_monotonic_in_nprobe(spark, sf_dir, brute_top5):
    r2 = _recall(spark, sf_dir, brute_top5, nprobe=2)
    r8 = _recall(spark, sf_dir, brute_top5, nprobe=8)
    assert r2 <= r8
    assert r8 >= 0.6


def test_probing_all_cells_is_exact(spark, sf_dir, brute_top5):
    # nprobe = N_CENTROIDS degenerates IVF to exhaustive search: the
    # top-5 must equal the brute-force top-5 exactly (both use the
    # same bit-parity cosine and neighbor_id tie-break).
    assert _recall(spark, sf_dir, brute_top5, nprobe=N_CENTROIDS) == 1.0


def test_kmeans_centroids_beat_sampled_seed(spark, sf_dir, brute_top5):
    # Fitted cells track the corpus structure: at the same nprobe the
    # learned quantizer's probed recall must dominate (or at worst
    # match) the md5-sampled seed's.
    from etl_pipe_spark.plans.dedup_plans import ann_ivf_kmeans

    sampled = _recall(spark, sf_dir, brute_top5, nprobe=2)
    fitted = (
        ann_ivf_kmeans(spark, sf_dir, nprobe=2, n_centroids=N_CENTROIDS)
        .select("query_id", "neighbor_id")
    )
    km = brute_top5.join(fitted, ["query_id", "neighbor_id"]).count() / brute_top5.count()
    assert km >= sampled
