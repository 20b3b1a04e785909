"""Distributed dense linear algebra: the Gram / covariance kernel.

The classic way to run PCA (or any spectral method) over a corpus too
large to fit anywhere is the covariance route: compute G = X^T X with
one map-side pass — each Arrow batch contributes a dim x dim partial
product — then eigendecompose the tiny dim x dim result wherever you
like.  The shuffle volume is (#batches x dim^2) REGARDLESS of corpus
row count, which is what makes the op viable at 100 TB: a
1000-executor scan streams the vectors once, and the reduce moves a
few thousand rows per batch, never a row per vector.

Exactness contract: inputs are fixed-point quantized FIRST
(q = floor(x * 2^10 + 0.5), the same HALF-UP-towards-+inf lattice both
engines evaluate identically), so every partial product is an integer
that float64 represents exactly (|q| ~ 2^11 for unit-scale embeddings
=> |q_i * q_j| ~ 2^22; 2^53 / 2^22 = 2^31 rows per batch before the
BLAS float64 accumulator could round — batches are ~10^4 rows).  The
per-(i, j) global sum is then an exact int64 SUM in Spark, making the
result partition-order independent and hash-checkable against a
sequential DuckDB oracle — the same fixed-point trick as the k-means
fit kernel (operators/ann.py), applied to a matmul instead of a mean.

Reference stake: SURVEY §2.12's similarity/embedding family — the
reference engine (row-at-a-time psycopg2 loops, reference
``transform.py``) has no linear algebra at all; this is a
driver-mandated extension operator.
"""

from __future__ import annotations

import sys
from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

# Same by-value pickling seam as operators/ann.py: worker closures
# reference module-level helpers, and the driver may have imported us
# via an explicit path the workers don't have on sys.path.
try:
    from pyspark import cloudpickle as _cp
except ImportError:  # pragma: no cover
    import cloudpickle as _cp
_cp.register_pickle_by_value(sys.modules[__name__])

GRAM_Q = 1024.0  # 2^10 fixed-point input scale; see module docstring


def _batch_matrix(batch: pa.RecordBatch, vec_col: str) -> np.ndarray:
    """Arrow list column -> (n, dim) float64 matrix, no per-row boxing
    (the flatten-and-reshape fast path measured in operators/ann.py)."""
    col = batch.column(batch.schema.get_field_index(vec_col))
    return (
        col.flatten().to_numpy(zero_copy_only=False)
        .astype(np.float64, copy=False)
        .reshape(len(col), -1)
    )


def gram_matrix(emb: DataFrame, vec_col: str = "v") -> DataFrame:
    """Upper-triangular G = Q^T Q over the quantized embedding matrix.

    One ``mapInArrow`` pass: per batch, quantize (exact lattice, see
    module docstring), one BLAS syrk-shaped matmul (numpy ``Q.T @ Q``),
    emit the dim*(dim+1)/2 upper-triangle entries as int64 partials;
    one groupBy reduces the partials.  Output: (i, j, gram) with
    0 <= i <= j < dim — 2,080 rows for dim=64 at ANY corpus size.

    The map-side combine means executor memory holds one dim x dim
    float64 accumulator per in-flight batch (32 KiB at dim=64) — no
    vector survives past its batch.
    """

    def op(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if not len(b):
                continue
            x = _batch_matrix(b, vec_col)
            q = np.floor(x * GRAM_Q + 0.5)  # exact ints in float64
            g = q.T @ q                      # exact: see module docstring
            iu, ju = np.triu_indices(g.shape[0])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(iu.astype(np.int32), pa.int32()),
                    pa.array(ju.astype(np.int32), pa.int32()),
                    pa.array(g[iu, ju].astype(np.int64), pa.int64()),
                ],
                ["i", "j", "partial"],
            )

    partial = emb.select(vec_col).mapInArrow(
        op, "i int, j int, partial bigint")
    return (
        partial.groupBy("i", "j")
        .agg(F.sum("partial").cast("bigint").alias("gram"))
    )
