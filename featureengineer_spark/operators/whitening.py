"""PCA whitening + length normalization (F7 graft, ``jyh/Utils.py:369-404``).

The reference whitens i-vectors with an SVD of the (small) covariance and
length-normalizes before scoring. Distributed split: the covariance is a
partial+final aggregate over the vector column (one pass, map-side
combinable via outer-product sums); the eigendecomposition is driver-side
numpy on the tiny d×d matrix; application is a broadcast matmul inside an
Arrow kernel.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def fit_whitener(
    df: DataFrame, vec_col: str = "feature_vec", eps: float = 1e-8
) -> tuple[np.ndarray, np.ndarray]:
    """One distributed pass → (mean, whitening matrix W).

    Aggregates Σx and Σxxᵀ as flattened array columns (element-wise
    ``zip_with`` sums — partial+final, no collect of rows), then numpy
    eigh on the driver. ``y = W @ (x - mean)`` has identity covariance.
    """
    d = len(df.select(vec_col).first()[0])
    # per-task numpy partials (count, Σx, ΣxxT) via mapInArrow —
    # accumulated across the task's Arrow batches, combined on the driver
    # — the reference's local-accumulator + Reduce(SUM) pattern
    # (mpiIV.py:165-214). Output is ONE tiny row per task; nothing
    # row-shaped ever shuffles.
    import pyarrow as pa
    from pyspark.sql import types as T2

    def partials(batches):
        n_rows = 0.0
        sx_acc = np.zeros(d)
        sxx_acc = np.zeros((d, d))
        seen = False
        for batch in batches:
            col = batch.column(0)
            flat = col.flatten().to_numpy(zero_copy_only=False)
            x = flat.reshape(-1, d)
            n_rows += float(x.shape[0])
            sx_acc += x.sum(axis=0)
            sxx_acc += x.T @ x
            seen = True
        if not seen:
            return
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([n_rows]),
                pa.array([sx_acc.tolist()], type=pa.list_(pa.float64())),
                pa.array([sxx_acc.ravel().tolist()], type=pa.list_(pa.float64())),
            ],
            names=["n", "sx", "sxx"],
        )

    part_schema = T2.StructType(
        [
            T2.StructField("n", T2.DoubleType()),
            T2.StructField("sx", T2.ArrayType(T2.DoubleType())),
            T2.StructField("sxx", T2.ArrayType(T2.DoubleType())),
        ]
    )
    from featureengineer_spark.operators.em import reduce_partials

    parts = reduce_partials(
        df.select(vec_col).mapInArrow(partials, schema=part_schema),
        {"n": None, "sx": d, "sxx": d * d},
    )
    n = parts["n"]
    sx = parts["sx"]
    sxx = parts["sxx"].reshape(d, d)
    mean = sx / n
    cov = sxx / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    w = vecs @ np.diag(1.0 / np.sqrt(np.maximum(vals, eps))) @ vecs.T
    return mean, w


def fit_sphnorm(
    df: DataFrame, vec_col: str = "feature_vec", n_iter: int = 2, eps: float = 1e-8
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Spherical nuisance normalization (the reference's sphnorm /
    ``estimate_spectral_norm``, ``IVector.py:1404-1408``): iteratively
    fit (mean, whitener) on the CURRENT embedding of the data, apply
    whiten + length-norm, refit — each round pushes the population closer
    to zero-mean, identity-covariance on the unit sphere, which is the
    geometry PLDA's Gaussian assumptions want.

    Returns the list of per-iteration (mean, W); apply in order with
    :func:`apply_sphnorm`. Each iteration is one distributed covariance
    pass (in-cluster reduced) — no data is collected."""
    params: list[tuple[np.ndarray, np.ndarray]] = []
    cur = df.select(F.col(vec_col).alias(vec_col))
    for _ in range(n_iter):
        mean, w = fit_whitener(cur, vec_col=vec_col, eps=eps)
        params.append((mean, w))
        cur = apply_whitening(
            cur, mean, w, vec_col=vec_col, out_col=vec_col, length_norm=True
        )
    return params


def apply_sphnorm(
    df: DataFrame,
    params: list[tuple[np.ndarray, np.ndarray]],
    vec_col: str = "feature_vec",
    out_col: str | None = None,
) -> DataFrame:
    """Apply the sphnorm iterations in training order (whiten +
    length-norm per step)."""
    out_col = out_col or vec_col
    cur = df
    src = vec_col
    for mean, w in params:
        cur = apply_whitening(
            cur, mean, w, vec_col=src, out_col=out_col, length_norm=True
        )
        src = out_col
    return cur


def apply_whitening(
    df: DataFrame,
    mean: np.ndarray,
    w: np.ndarray,
    vec_col: str = "feature_vec",
    out_col: str = "whitened",
    length_norm: bool = True,
) -> DataFrame:
    """Broadcast (mean, W); apply y = W(x-mean) (+ unit-length norm, the
    reference's ``lengthNorm``) via an Arrow-batched kernel."""
    import pandas as pd

    sc = df.sparkSession.sparkContext
    b = sc.broadcast((mean, w))

    def _whiten_fn(v):
        m, ww = b.value
        x = np.vstack(v.to_numpy())
        y = (x - m) @ ww.T
        if length_norm:
            norms = np.linalg.norm(y, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            y = y / norms
        return pd.Series(list(y))

    _whiten = F.pandas_udf(_whiten_fn, T.ArrayType(T.DoubleType()))
    return df.withColumn(out_col, _whiten(F.col(vec_col)))
