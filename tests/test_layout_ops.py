"""Unit tests for the late-round-5 additions: Z-order layout,
length-bucket batching, distributed PCA, the incremental LSH probe,
and size-targeted file compaction.  The registered queries' full
differential checks live in test_oracle_parity.py; these tests pin
the operator-level contracts the oracle can't see (bit-level Morton
correctness, pruning DOMINANCE over the linear layout, eigen
invariants, probe-vs-batch agreement, footer-range disjointness and
hive-tree survival across compaction)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from etl_pipe_spark.operators import dedup as DD
from etl_pipe_spark.operators.linalg import pca_top_component
from etl_pipe_spark.operators.zorder import morton32
from etl_pipe_spark.plans.dedup_plans import _spread
from etl_pipe_spark.plans.layout_plans import (
    _BOX_HI, _BOX_LO, zorder_layout_skipping,
)
from etl_pipe_spark.sources.catalog import load_table


def _py_morton(x: int, y: int) -> int:
    """Sequential reference: interleave bits, x even, y odd."""
    z = 0
    for bit in range(16):
        z |= ((x >> bit) & 1) << (2 * bit)
        z |= ((y >> bit) & 1) << (2 * bit + 1)
    return z


def test_morton32_matches_bitwise_reference(spark):
    pts = [(0, 0), (1, 0), (0, 1), (65535, 65535), (43690, 21845),
           (12345, 54321), (1, 65535), (32768, 32767)]
    df = spark.createDataFrame(pts, "x bigint, y bigint")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y",
                           morton32(F.col("x"), F.col("y")).alias("z"))
        .collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _py_morton(x, y), (x, y)


def test_zorder_prunes_strictly_more_bins_than_linear(spark, sf_dir):
    out = zorder_layout_skipping(spark, sf_dir).collect()
    pruned = {"zorder": 0, "linear": 0}
    boxes = {"zorder": [], "linear": []}
    for r in out:
        pruned[r["layout"]] += int(r["prunable"])
        boxes[r["layout"]].append(r)
    # every non-prunable bin really does intersect the box
    for r in out:
        if not r["prunable"]:
            assert r["max_gx"] >= _BOX_LO and r["min_gx"] <= _BOX_HI
            assert r["max_gy"] >= _BOX_LO and r["min_gy"] <= _BOX_HI
    # the point of the layout: the z-order bins dominate
    assert pruned["zorder"] > pruned["linear"]
    assert pruned["zorder"] >= len(boxes["zorder"]) // 2


def test_pca_component_invariants(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v"))
    res = pca_top_component(emb)
    v = res.component
    assert abs(float(v @ v) - 1.0) < 1e-9
    assert res.lam1 >= res.max_diag * (1 - 1e-9) - 1e-6
    assert res.lam1 <= res.trace * (1 + 1e-12) + 1e-6
    assert abs(res.proj_sumsq - res.lam1) / max(res.lam1, 1.0) < 1e-9
    assert res.n == emb.count()
    # deterministic sign pin: first non-tiny coordinate is positive
    nz = np.flatnonzero(np.abs(v) > 1e-12)
    assert v[nz[0]] > 0


def test_pca_top_k_invariants_and_numpy_agreement(spark, sf_dir):
    """Top-K fit: orthonormal descending components whose distributed
    projections match the Rayleigh quotients, and — the exactness
    teeth — component-by-component agreement with a sequential numpy
    PCA over the same quantized lattice."""
    from etl_pipe_spark.operators.linalg import GRAM_Q, pca_top_k

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v"))
    k = 4
    res = pca_top_k(emb, k=k)
    V, lams = res.components, res.lams
    assert V.shape[1] == k and len(lams) == k and len(res.proj_sumsq) == k
    assert np.abs(V.T @ V - np.eye(k)).max() < 1e-9
    assert np.all(lams[:-1] >= lams[1:] - 1e-6)
    assert lams.sum() <= res.trace * (1 + 1e-12) + 1e-6
    rel = np.abs(res.proj_sumsq - lams) / np.maximum(np.abs(lams), 1.0)
    assert np.all(rel < 1e-9)
    # k=1 specialization equals the top column
    top1 = pca_top_k(emb, k=1)
    assert np.allclose(top1.components[:, 0], V[:, 0])
    # sequential numpy reference on the identical lattice
    X = np.array([r.v for r in emb.collect()])
    Q = np.floor(X * GRAM_Q + 0.5)
    g_ref = Q.T @ Q
    w_ref = np.linalg.eigh(g_ref)[0][::-1][:k]
    assert np.allclose(np.sort(w_ref), np.sort(lams), rtol=1e-9)


def test_lsh_probe_agrees_with_batch_candidates(spark, sf_dir):
    """Probing batch-vs-history buckets must find exactly the
    candidate pairs the batch-mode self-join finds between the two
    sets (the incremental path adds or loses nothing)."""
    docs = _spread(spark, load_table(spark, sf_dir, "documents"))
    sharr = DD.shingle_arrays(docs, n=3)
    sig = DD.minhash_signatures_arrays(sharr)
    hist = sig.filter(F.col("doc_id") % 5 != 0)
    batch = sig.filter(F.col("doc_id") % 5 == 0)

    probe = {
        (r["left_id"], r["right_id"])
        for r in DD.lsh_probe_pairs(hist, batch).collect()
    }
    cross = set()
    for r in DD.lsh_candidate_pairs(sig).collect():
        a, b = r["left_id"], r["right_id"]  # a < b
        if (a % 5 != 0) and (b % 5 == 0):
            cross.add((a, b))
        elif (a % 5 == 0) and (b % 5 != 0):
            cross.add((b, a))
    assert probe == cross


def _file_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-parquet-file min/max from the REAL footers via pyarrow."""
    import glob

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        stats = {c: [None, None] for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in stats and col.statistics is not None:
                    s = col.statistics
                    lo, hi = stats[name]
                    stats[name] = [
                        s.min if lo is None else min(lo, s.min),
                        s.max if hi is None else max(hi, s.max),
                    ]
        out.append(stats)
    return out


def test_write_zordered_footer_stats_prune(spark, sf_dir, tmp_path):
    """The z-ordered WRITE must leave real parquet footers whose
    per-file (custkey, orderdate-day) bounding boxes prune a
    two-dimensional box predicate that a linear sort's footers
    cannot — the engine-agnostic data-skipping claim, checked against
    actual file metadata, not a simulation."""
    from etl_pipe_spark.operators.zorder import write_zordered

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("bigint").alias("o_day"),
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    write_zordered(orders, zpath, "o_custkey", "o_day", n_files=16)
    (orders.repartitionByRange(16, "o_orderkey")
     .sortWithinPartitions("o_orderkey").write.parquet(lpath))

    assert spark.read.parquet(zpath).count() == orders.count()

    # box predicate: middle ~tenth of each dimension's range
    mm = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_day"), F.max("o_day")).first()
    cklo = mm[0] + (mm[1] - mm[0]) * 45 // 100
    ckhi = mm[0] + (mm[1] - mm[0]) * 55 // 100
    dlo = mm[2] + (mm[3] - mm[2]) * 45 // 100
    dhi = mm[2] + (mm[3] - mm[2]) * 55 // 100

    def pruned(path: str) -> tuple[int, int]:
        stats = _file_stats(path, ["o_custkey", "o_day"])
        n_prune = sum(
            1 for s in stats
            if s["o_custkey"][1] < cklo or s["o_custkey"][0] > ckhi
            or s["o_day"][1] < dlo or s["o_day"][0] > dhi)
        return n_prune, len(stats)

    zp, zn = pruned(zpath)
    lp, ln = pruned(lpath)
    assert zn >= 8 and ln >= 8
    assert zp > lp, f"z-order pruned {zp}/{zn}, linear {lp}/{ln}"
    assert zp >= zn // 2


def test_lsh_probe_excludes_reingested_self_pairs(spark, sf_dir):
    """A doc present on BOTH sides (re-ingest) must never pair with
    itself — it would otherwise win best-match with jaccard 1.0."""
    docs = _spread(spark, load_table(spark, sf_dir, "documents"))
    sig = DD.minhash_signatures_arrays(DD.shingle_arrays(docs, n=3))
    batch = sig.filter(F.col("doc_id") % 5 == 0)
    pairs = DD.lsh_probe_pairs(sig, batch).collect()  # history ⊇ batch
    assert pairs, "re-ingested docs should still find cross candidates"
    assert all(r["left_id"] != r["right_id"] for r in pairs)


def test_compact_to_size_rejects_in_place(spark, tmp_path):
    import pytest

    from etl_pipe_spark.operators.layout import compact_to_size

    p = str(tmp_path / "same")
    spark.range(10).write.parquet(p)
    with pytest.raises(ValueError, match="never-in-place"):
        compact_to_size(spark, p, p + "/../same")


def test_compact_to_size_preserves_hive_partitions(spark, tmp_path):
    """partition_cols must re-emit the directory tree — a flat rewrite
    would silently destroy partition pruning."""
    import glob as _glob

    from etl_pipe_spark.operators.layout import compact_to_size

    src, dst = str(tmp_path / "part_src"), str(tmp_path / "part_dst")
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("p"))
    df.repartition(8).write.partitionBy("p").parquet(src)

    stats = compact_to_size(spark, src, dst, target_bytes=1 << 20,
                            partition_cols=["p"])
    assert sorted(_os_basename(d) for d in _glob.glob(f"{dst}/p=*")) == [
        "p=0", "p=1", "p=2", "p=3"]
    assert stats["files_after"] <= stats["files_before"]
    a = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    assert a == b


def _os_basename(p: str) -> str:
    import os

    return os.path.basename(p)


def test_listed_total_bytes_matches_os_sizes(spark, tmp_path):
    """The listing-based size sum must equal the on-disk byte total of
    exactly the scan's input files — including across a partitioned
    tree's many directories — with NO row scan (it is the sizing input
    for maintenance jobs scheduled against 100 TB sinks)."""
    import os

    from etl_pipe_spark.operators.layout import _listed_total_bytes

    p = str(tmp_path / "sized")
    spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("p")
    ).repartition(4).write.partitionBy("p").parquet(p)
    src = spark.read.parquet(p)
    files = src.inputFiles()
    expected = sum(
        os.path.getsize(f.removeprefix("file:")) for f in files)
    assert _listed_total_bytes(spark, files) == expected > 0


def test_compact_to_size_preserves_clustering(spark, tmp_path):
    """Size-targeted compaction: 32 tiny sorted files -> few files near
    the byte target, with DISJOINT per-file key ranges when sort_cols
    is given (pruning survives), and row-level content identical."""
    from etl_pipe_spark.operators.layout import compact_to_size

    src = str(tmp_path / "small")
    dst = str(tmp_path / "big")
    df = spark.range(0, 20000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("payload"),
    )
    # 32 small sorted files, ~totaling a few hundred KB
    df.repartitionByRange(32, "k").sortWithinPartitions("k") \
        .write.mode("overwrite").parquet(src)

    stats = compact_to_size(spark, src, dst,
                            target_bytes=96 << 10, sort_cols=["k"])
    assert stats["files_before"] == 32
    assert 1 <= stats["files_after"] < 32
    expected = max(1, -(-stats["total_bytes"] // (96 << 10)))
    assert stats["files_after"] == expected

    # content parity
    a = sorted(r["k"] for r in spark.read.parquet(src).collect())
    b = sorted(r["k"] for r in spark.read.parquet(dst).collect())
    assert a == b

    # clustering preserved: footer key ranges must not overlap
    ranges = sorted((s["k"][0], s["k"][1]) for s in _file_stats(dst, ["k"]))
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, "compacted files overlap in key space"
