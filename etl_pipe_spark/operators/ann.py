"""Vectorized IVF assignment: the numeric-kernel scale path.

The expression-tree IVF quantizer (plans/dedup_plans._ivf_ranked) is
the oracle-parity surface — a per-element fold whose cost is
N x k x dim scalar ops inside codegen.  That is the right shape for
correctness checking, but the assignment is a dense matmul, and at
corpus scale a dense matmul belongs in a BLAS kernel: this module
runs it as Arrow-batched ``mapInPandas`` — each batch of embeddings
multiplies against the broadcast centroid matrix with numpy
(batch x dim @ dim x k), then top-``nprobe`` cells per vector come
from one ``argpartition``.  Measured on the 250k-vector sweep corpus:
the N x k assignment drops from minutes (expression fold, k=500) to
seconds, and the whole pipeline stays linear when k follows
``ivf_centroids_for_corpus`` (~sqrt(N)).

The two paths agree on assignments except at cosine near-ties
(float64 matmul sums in a different order than the sequential fold);
tests/test_ann_vectorized.py pins the agreement rate.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_ASSIGN_SCHEMA = "vec_id bigint, cent_id bigint, rn int"


def centroid_matrix(emb: DataFrame, n_centroids: int,
                    id_col: str = "vec_id", vec_col: str = "v") -> tuple:
    """Deterministic centroid seed as numpy: first ``n_centroids``
    vectors by md5(id) — the same sample rule as the expression path,
    so both quantizers pick identical centroid sets.  The collect is
    a k-row dimension table (k ~ sqrt(N)); it ships to executors via
    closure broadcast exactly like a broadcast dim join's build side.
    """
    rows = (
        emb.orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(n_centroids)
        .select(id_col, vec_col)
        .collect()
    )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)  # k x dim
    return ids, mat


_KMEANS_Q = 16777216.0  # 2^24 fixed-point scale, see plans/dedup_plans._KMEANS_Q


def _seed_farthest_point(emb: DataFrame, k: int,
                         id_col: str = "vec_id", vec_col: str = "v") -> np.ndarray:
    """Deterministic farthest-point seeds over a bounded sample.

    A uniform md5 sample can drop two seeds into one cluster and leave
    another unclaimed (the classic collapse).  Greedy max-min seeding
    on the md5-ordered first max(8k, 256) vectors fixes that while
    keeping driver data bounded by the sample, not the corpus — the
    sample-based cousin of k-means|| initialization.
    """
    n_sample = max(8 * k, 256)
    ids, sample = centroid_matrix(emb, n_sample, id_col=id_col, vec_col=vec_col)
    norms = np.linalg.norm(sample, axis=1)
    norms[norms == 0.0] = 1.0
    unit = sample / norms[:, None]
    chosen = [0]
    # running max cosine of every sample vector to the chosen set
    best = unit @ unit[0]
    for _ in range(1, min(k, len(sample))):
        nxt = int(np.argmin(best))
        chosen.append(nxt)
        best = np.maximum(best, unit @ unit[nxt])
    return sample[chosen].copy()


def kmeans_fit(
    emb: DataFrame,
    k: int,
    max_iters: int = 10,
    tol: float = 1e-3,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> tuple:
    """Full spherical-k-means Lloyd loop (the iterative-algorithm shape).

    Per iteration: one vectorized cosine-argmax assignment pass
    (numpy matmul over Arrow batches) + one exact fixed-point mean
    update (coordinates quantized to 2^-24 and summed in int64, so
    the means — and therefore the whole fit — are bit-deterministic
    under any partitioning).  The ONLY driver-side data per round is
    the k x dim mean table (same footprint as the broadcast centroid
    matrix), never the corpus: the same driver-sees-scalars stance as
    operators/clusters.connected_components.  Cosine assignment makes
    mean updates coherent without normalizing (cosine is
    scale-invariant in the centroid), i.e. spherical k-means.

    Returns (centroids ndarray k x dim, assignment DataFrame
    (vec_id, cent_id), n_iters_run).  Seeds from deterministic
    farthest-point selection over a bounded md5-ordered sample, so
    fits are reproducible run to run.
    """
    cent = _seed_farthest_point(emb, k, id_col=id_col, vec_col=vec_col)
    ids = np.arange(len(cent), dtype=np.int64)
    assign = None
    iters = 0
    for iters in range(1, max_iters + 1):
        assign = ivf_assign_vectorized(
            emb, ids, cent, nprobe=1, id_col=id_col, vec_col=vec_col
        ).select(id_col, "cent_id")
        member = assign.join(emb.select(id_col, vec_col), id_col)
        means = (
            member.select("cent_id", F.posexplode(vec_col).alias("dim", "x"))
            .select(
                "cent_id", "dim",
                F.round(F.col("x") * _KMEANS_Q).cast("bigint").alias("xq"),
            )
            .groupBy("cent_id", "dim")
            .agg(
                (F.sum("xq").cast("double")
                 / (F.count(F.lit(1)).cast("double") * _KMEANS_Q)).alias("m")
            )
            .collect()
        )
        new_cent = cent.copy()
        touched = set()
        for r in means:
            new_cent[r["cent_id"], r["dim"]] = r["m"]
            touched.add(r["cent_id"])
        # empty cells keep their previous centroid
        shift = float(np.abs(new_cent - cent).max()) if touched else 0.0
        cent = new_cent
        if shift < tol:
            break
    return cent, assign, iters


def ivf_assign_vectorized(
    emb: DataFrame,
    cent_ids: np.ndarray,
    cent_mat: np.ndarray,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """(vec_id, cent_id, rn) for rn = 1..nprobe by cosine, via one
    numpy matmul per Arrow batch.  rn = 1 is the cell assignment;
    ties break on centroid id ascending, mirroring the expression
    path's (cosine DESC, cent_id ASC) window order.
    """
    # Pre-normalize the centroid matrix once per executor closure:
    # cosine argmax == dot argmax against unit centroids / unit rows.
    cnorm = np.linalg.norm(cent_mat, axis=1)
    cnorm[cnorm == 0.0] = 1.0
    cunit = (cent_mat / cnorm[:, None]).T  # dim x k
    k = cent_mat.shape[0]
    n_take = min(nprobe, k)

    # Order centroid columns by id so numpy's "first index wins" on
    # equal scores matches the cent_id ASC tiebreak.
    order = np.argsort(cent_ids, kind="stable")
    cunit_sorted = cunit[:, order]
    ids_sorted = cent_ids[order]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            x = np.array(list(b[vec_col]), dtype=np.float64)  # B x dim
            xn = np.linalg.norm(x, axis=1)
            xn[xn == 0.0] = 1.0
            scores = (x / xn[:, None]) @ cunit_sorted  # B x k
            if n_take < k:
                part = np.argpartition(-scores, n_take - 1, axis=1)[:, :n_take]
            else:
                part = np.tile(np.arange(k), (len(b), 1))
            row_idx = np.arange(len(b))[:, None]
            # exact order within the probe set: score desc, cent id asc
            sub = scores[row_idx, part]
            inner = np.lexsort((part, -sub), axis=1)
            top = part[row_idx, inner]
            out = pd.DataFrame(
                {
                    "vec_id": np.repeat(b[id_col].to_numpy(np.int64), n_take),
                    "cent_id": ids_sorted[top].ravel(),
                    "rn": np.tile(np.arange(1, n_take + 1, dtype=np.int32), len(b)),
                }
            )
            yield out

    return emb.select(id_col, vec_col).mapInPandas(op, schema=_ASSIGN_SCHEMA)
