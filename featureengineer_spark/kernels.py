"""Per-conversation vectorized feature kernel (grouped-map, Arrow).

Graft of the reference's per-segment numpy kernels — posterior+stat0/stat1
per segment with the UBM broadcast to every worker (``IVector.py:806-815``,
``mpiIV.py:241,400``): here a per-conversation grouped-map pandas UDF that
turns each turn into a fixed-dim ``feature_vec``, with the (small, dense)
projection model held in a Spark broadcast variable, never a DataFrame.

The kernel is leakage-safe: normalization is *expanding* (statistics over
rows at-or-before the current turn only, under stable ``(ts, turn_idx)``
ordering) — the transcript analog of the reference's ``cep[start:stop]``
bound (``IVector.py:796-800``). Everything inside the kernel is whole-group
numpy — zero per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

FEATURIZE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("feature_vec", T.ArrayType(T.DoubleType()), False),
    ]
)


@dataclass
class FeatureModel:
    """Small dense model state, broadcast to executors (X4 graft).

    ``proj`` plays the role of the reference's TV matrix — a fixed dense
    projection applied to every per-turn statistics vector.
    """

    proj: np.ndarray = field(
        default_factory=lambda: np.random.default_rng(0).standard_normal(
            (FEATURE_DIM, FEATURE_DIM)
        )
    )


def raw_turn_stats(pdf: pd.DataFrame) -> np.ndarray:
    """Per-turn raw statistics matrix (n_turns × 8), vectorized.

    Columns: text_len, n_words, role one-hot (user/assistant/system/tool),
    tool_notnull, inter_turn_gap_s. The transcript analog of the 39-dim
    MFCC+Δ+ΔΔ frame vector (``IVector.py:928``).
    """
    text = pdf["text"].fillna("")
    text_len = text.str.len().to_numpy(dtype=np.float64)
    n_words = text.str.split().str.len().fillna(0).to_numpy(dtype=np.float64)
    role = pdf["role"].to_numpy()
    tool_notnull = pdf["tool"].notna().to_numpy(dtype=np.float64)
    ts_us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    gap = np.diff(ts_us, prepend=ts_us[0] if len(ts_us) else 0) / 1e6
    if len(gap):
        gap[0] = 0.0
    return np.column_stack(
        [
            text_len,
            n_words,
            (role == "user").astype(np.float64),
            (role == "assistant").astype(np.float64),
            (role == "system").astype(np.float64),
            tool_notnull,
            gap,
            np.log1p(text_len),
        ]
    )


def expanding_standardize(x: np.ndarray) -> np.ndarray:
    """Expanding (leakage-safe) per-column standardization via cumsums.

    Row t is normalized with mean/std over rows 0..t (ddof=1); columns
    with zero variance (or t=0) map to 0. Pure cumulative numpy — O(n·d).
    """
    n = x.shape[0]
    if n == 0:
        return x.copy()
    # shift by the first row before the cumulative moments: the expanding
    # std is shift-invariant and this kills most cancellation error when a
    # column sits at a large offset with small variance
    x0 = x[0:1, :]
    x = x - x0
    counts = np.arange(1, n + 1, dtype=np.float64)[:, None]
    csum = np.cumsum(x, axis=0)
    csum2 = np.cumsum(x * x, axis=0)
    mean = csum / counts
    with np.errstate(invalid="ignore", divide="ignore"):
        var = (csum2 - counts * mean * mean) / np.maximum(counts - 1.0, 1.0)
        var = np.maximum(var, 0.0)
        std = np.sqrt(var)
        z = (x - mean) / std
    z[~np.isfinite(z)] = 0.0
    z[0, :] = 0.0
    return z


def _featurize_group(pdf: pd.DataFrame, proj: np.ndarray) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
    stats = raw_turn_stats(pdf)
    z = expanding_standardize(stats)
    vecs = z @ proj.T
    return pd.DataFrame(
        {
            "conv_id": pdf["conv_id"].to_numpy(),
            "turn_idx": pdf["turn_idx"].to_numpy(),
            "ts": pdf["ts"].to_numpy(),
            "feature_vec": list(vecs),
        }
    )


def featurize(df: DataFrame, model: FeatureModel | None = None) -> DataFrame:
    """conv → per-turn ``feature_vec`` (grouped map + broadcast model).

    One shuffle on ``conv_id``; each group is one Arrow batch stream.
    For mega-conversations route through chunked salting first
    (``operators.skew``) — expanding stats are scan-composable.
    """
    model = model or FeatureModel()
    sc = df.sparkSession.sparkContext
    b_proj = sc.broadcast(model.proj)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _featurize_group(pdf, b_proj.value)

    return df.groupBy("conv_id").applyInPandas(fn, schema=FEATURIZE_SCHEMA)
