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


class _Carry:
    """Running expanding-stat state for a conversation that spans Arrow
    batches: row count, shifted sums/sumsq, the conv's first-row stats
    (shift base), and the previous row's timestamp (gap continuation)."""

    __slots__ = ("conv", "count", "s", "q", "x0", "last_ts")

    def __init__(self, conv, count, s, q, x0, last_ts):
        self.conv, self.count, self.s, self.q = conv, count, s, q
        self.x0, self.last_ts = x0, last_ts


def _featurize_batch(
    pdf: pd.DataFrame, proj: np.ndarray, carry: _Carry | None
) -> tuple[pd.DataFrame, _Carry]:
    """Vectorized segmented expanding-standardize + project for one Arrow
    batch (rows sorted by (conv_id, ts, turn_idx); convs contiguous)."""
    conv = pdf["conv_id"].to_numpy()
    n = len(conv)
    ts_us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)

    is_start = np.empty(n, dtype=bool)
    is_start[0] = True
    is_start[1:] = conv[1:] != conv[:-1]
    seg_id = np.cumsum(is_start) - 1
    starts = np.flatnonzero(is_start)
    continuing = carry is not None and conv[0] == carry.conv

    # raw stats with segmented gap
    text = pdf["text"].fillna("")
    text_len = text.str.len().to_numpy(dtype=np.float64)
    n_words = text.str.split().str.len().fillna(0).to_numpy(dtype=np.float64)
    role = pdf["role"].to_numpy()
    tool_notnull = pdf["tool"].notna().to_numpy(dtype=np.float64)
    gap = np.diff(ts_us, prepend=ts_us[0]) / 1e6
    gap[starts] = 0.0
    if continuing:
        gap[0] = (ts_us[0] - carry.last_ts) / 1e6
    x = np.column_stack(
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

    # per-segment shift base (conv's first row; carried for continuations)
    x0_seg = x[starts].copy()
    if continuing:
        x0_seg[0] = carry.x0
    xs = x - x0_seg[seg_id]

    # segmented cumulative moments with carry-in on segment 0
    c1 = np.cumsum(xs, axis=0)
    c2 = np.cumsum(xs * xs, axis=0)
    base1 = np.zeros_like(x0_seg)
    base2 = np.zeros_like(x0_seg)
    base1[1:] = c1[starts[1:] - 1]
    base2[1:] = c2[starts[1:] - 1]
    cums = c1 - base1[seg_id]
    cumq = c2 - base2[seg_id]
    pos_in_seg = np.arange(n, dtype=np.float64) - starts[seg_id] + 1.0
    counts = pos_in_seg.copy()
    if continuing:
        first_len = starts[1] if len(starts) > 1 else n
        cums[:first_len] += carry.s
        cumq[:first_len] += carry.q
        counts[:first_len] += carry.count

    cnt = counts[:, None]
    mean = cums / cnt
    with np.errstate(invalid="ignore", divide="ignore"):
        var = (cumq - cnt * mean * mean) / np.maximum(cnt - 1.0, 1.0)
        z = (xs - mean) / np.sqrt(np.maximum(var, 0.0))
    z[~np.isfinite(z)] = 0.0
    z[counts == 1.0, :] = 0.0

    vecs = z @ proj.T
    out = pd.DataFrame(
        {
            "conv_id": conv,
            "turn_idx": pdf["turn_idx"].to_numpy(),
            "ts": pdf["ts"].to_numpy(),
            "feature_vec": list(vecs),
        }
    )
    new_carry = _Carry(
        conv[-1], counts[-1], cums[-1].copy(), cumq[-1].copy(), x0_seg[-1].copy(), ts_us[-1]
    )
    return out, new_carry


def featurize_fast(
    df: DataFrame,
    model: FeatureModel | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Scale-path featurizer: repartition by conv hash, sort within
    partitions, stream Arrow batches through the segmented kernel.

    Identical semantics to :func:`featurize` but parallelism = #partitions
    instead of #groups: no per-conversation pandas overhead (the grouped
    path pays ~1 ms per group — fatal with 10^7 short conversations), and
    conversations longer than one Arrow batch stream through carry state
    instead of materializing whole-group. This is the ``array_split`` +
    running-accumulator pattern of the reference's MPI path
    (``mpiIV.py:160-214``) expressed as a Spark partition scan.
    """
    model = model or FeatureModel()
    sc = df.sparkSession.sparkContext
    b_proj = sc.broadcast(model.proj)
    parts = partitions or sc.defaultParallelism * 2
    prepped = df.repartition(parts, "conv_id").sortWithinPartitions(
        "conv_id", "ts", "turn_idx"
    )

    def fn(batches):
        proj = b_proj.value
        carry: _Carry | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out, carry = _featurize_batch(pdf, proj, carry)
            yield out

    return prepped.mapInPandas(fn, schema=FEATURIZE_SCHEMA)


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
