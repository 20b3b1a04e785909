"""Distributed full-batch logistic regression — the GPT-3-style
corpus quality classifier's training loop.

Binary logreg fit by full-batch gradient descent: each iteration is
ONE aggregation over the feature frame (per-row gradient
contributions, quantized to 2^-24 fixed point exactly like the
k-means mean trace in operators/ann.py, then summed as exact bigints
— so the gradient, loss trace, and therefore the whole fit are
bit-deterministic under any partitioning).  The driver holds only the
(d+2)-value aggregate row and the weight vector (d doubles) —
bounded like the centroid tables; the corpus is touched once per
iteration through whole-stage-codegen expressions (sigmoid is
exp/division on JVM columns, no UDF).

At 100 TB each iteration is one map-side partial aggregate + one
d-sized reduce: the classic distributed-GD shuffle profile (gradient
size is model-sized, never data-sized).  Mini-batching or L-BFGS
drop into the same frame-agg seam.

References: the quality-filter setup follows the published GPT-3 /
CCNet corpus-filtering recipe (a linear classifier over cheap text
features deciding keep/drop); the fixed-point determinism trick is
this repo's kmeans_fit precedent.
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import DataFrame, functions as F

_Q = 1 << 24  # fixed-point quantum (same as the k-means trace)


class LogregFit(NamedTuple):
    weights: list[float]
    losses: list[float]      # mean log-loss per iteration (incl. initial)
    n_rows: int
    accuracy: float


def standardize(df: DataFrame, cols: list[str]) -> DataFrame:
    """Z-score the given feature columns with BIT-DETERMINISTIC corpus
    stats: per-column sum and sum-of-squares are accumulated as 2^-24
    fixed-point bigints (partition-order independent), so mean/std —
    and therefore every standardized value — are identical under any
    partitioning.  Constant columns (std 0) pass through centered.

    GD on raw, badly-scaled features needs many more iterations when
    the decision boundary sits in a dense region (measured: the
    1M-doc sweep corpus fails a 0.85 accuracy floor in 8 raw-feature
    steps but converges immediately standardized) — this is the
    conditioning step every production linear-model pipeline runs.
    """
    aggs = []
    for c in cols:
        aggs.append(F.sum(F.round(F.col(c) * _Q).cast("bigint")).alias(f"s_{c}"))
        aggs.append(F.sum(F.round(F.col(c) * F.col(c) * _Q).cast("bigint"))
                    .alias(f"q_{c}"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    row = df.agg(*aggs).first()
    n = row["n"]
    out = df
    for c in cols:
        mean = row[f"s_{c}"] / _Q / n
        var = max(0.0, row[f"q_{c}"] / _Q / n - mean * mean)
        std = math.sqrt(var)
        if std == 0.0:
            out = out.withColumn(c, F.col(c) - F.lit(mean))
        else:
            out = out.withColumn(c, (F.col(c) - F.lit(mean)) / F.lit(std))
    return out


def _dot_w(feat_cols: list[str], w: list[float]):
    expr = F.lit(float(w[0])) * F.col(feat_cols[0])
    for c, wi in zip(feat_cols[1:], w[1:]):
        expr = expr + F.lit(float(wi)) * F.col(c)
    return expr


def logreg_fit_gd(
    df: DataFrame,
    feat_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    n_iters: int = 8,
) -> LogregFit:
    """Fit w by n_iters full-batch GD steps; returns the weight vector,
    the per-iteration mean-log-loss trace (length n_iters + 1 — the
    loss BEFORE each step plus the final loss), and final training
    accuracy.  ``df`` is cached by the caller if it is expensive."""
    d = len(feat_cols)
    w = [0.0] * d
    losses: list[float] = []
    n_rows = df.count()
    if n_rows == 0:
        return LogregFit(w, [], 0, 0.0)

    for _ in range(n_iters):
        z = _dot_w(feat_cols, w)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - F.col(label_col).cast("double")
        aggs = [
            F.sum(F.round(err * F.col(c) * _Q).cast("bigint")).alias(f"g{i}")
            for i, c in enumerate(feat_cols)
        ]
        # log-loss, numerically via softplus(|z|)-form: -y*z + log(1+e^z)
        # = softplus(z) - y*z; softplus computed stably from |z|.
        softplus = F.when(z > 30.0, z).otherwise(F.log(F.lit(1.0) + F.exp(z)))
        loss_row = F.round(
            (softplus - F.col(label_col).cast("double") * z) * _Q
        ).cast("bigint")
        row = df.agg(*aggs, F.sum(loss_row).alias("lq")).first()
        losses.append(row["lq"] / _Q / n_rows)
        w = [wi - lr * (row[f"g{i}"] / _Q) / n_rows for i, wi in enumerate(w)]

    # final loss + accuracy in one pass
    z = _dot_w(feat_cols, w)
    softplus = F.when(z > 30.0, z).otherwise(F.log(F.lit(1.0) + F.exp(z)))
    y = F.col(label_col).cast("double")
    final = df.agg(
        F.sum(F.round((softplus - y * z) * _Q).cast("bigint")).alias("lq"),
        F.sum(F.when((z >= 0) == (y >= 0.5), 1).otherwise(0)).alias("ok"),
    ).first()
    losses.append(final["lq"] / _Q / n_rows)
    if not all(math.isfinite(wi) for wi in w):
        raise ArithmeticError(f"diverged: {w}")
    return LogregFit(w, losses, n_rows, final["ok"] / n_rows)
