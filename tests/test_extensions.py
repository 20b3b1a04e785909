"""Winnowing fingerprints: the Arrow kernel vs its all-Catalyst twin.

The registered query computes the rightmost-minimal window selection in
an Arrow kernel (numpy sliding_window_view); the expression formulation
(nested higher-order folds) is kept as `winnowing_fingerprints_expr`.
Both must produce identical integers — on the real corpus AND on a
constructed table that forces the boundary conventions (short docs,
all-equal hashes, strictly increasing/decreasing runs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipe_spark.plans.extensions import (
    WINNOW_K, WINNOW_W, _winnow_batches, winnowing_fingerprints,
    winnowing_fingerprints_expr)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_winnow_kernel_matches_expression_on_corpus(spark, sf_dir):
    got = _rows(winnowing_fingerprints(spark, sf_dir))
    want = _rows(winnowing_fingerprints_expr(spark, sf_dir))
    assert len(got) > 0
    assert got == want


def test_winnow_kernel_matches_expression_on_edge_docs(spark, tmp_path):
    w = " ".join  # readability below
    docs = [
        # exactly K tokens -> one gram, one window
        (1, w(f"t{i}" for i in range(WINNOW_K))),
        # K+W-1 tokens -> exactly W grams, one full window
        (2, w(f"a{i}" for i in range(WINNOW_K + WINNOW_W - 1))),
        # fewer grams than W (K+1 tokens -> 2 grams) -> single short window
        (3, w(f"b{i}" for i in range(WINNOW_K + 1))),
        # all-identical tokens -> all-equal hashes, rightmost must win
        (4, w("same" for _ in range(WINNOW_K + 3 * WINNOW_W))),
        # long mixed doc with repeated spans (duplicated phrase)
        (5, w(["x1 x2 x3 x4 x5"] * 6)),
        # under K tokens -> excluded from BOTH outputs
        (6, w(f"u{i}" for i in range(WINNOW_K - 1))),
        (7, "solo"),
    ]
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(docs, "doc_id long, text string") \
         .write.mode("overwrite").parquet(path)

    import os
    import shutil
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    shutil.move(path, os.path.join(sf, "documents.parquet"))

    got = _rows(winnowing_fingerprints(spark, sf))
    want = _rows(winnowing_fingerprints_expr(spark, sf))
    assert got == want
    ids = {r[0] for r in got}
    assert ids == {1, 2, 3, 4, 5}          # 6 and 7 excluded (no grams)
    by_id = {r[0]: r for r in got}
    assert by_id[1][1] == 1 and by_id[1][2] == 1   # one gram, one fp
    # all-equal hashes: every window selects its rightmost element ->
    # selections are consecutive distinct positions, one per window
    n_grams4 = by_id[4][1]
    assert by_id[4][2] == n_grams4 - WINNOW_W + 1
    assert by_id[4][4] == by_id[4][5]              # min == max hash
