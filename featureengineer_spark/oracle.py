"""Single-node pandas oracle — the golden reference implementation.

Role-equivalent of the reference's numpy kernels serving as ground truth
(SURVEY.md §5): computes the full expected-features frame (FIXTURES.md §3)
on a pandas transcript fixture. Spark output must match with
``numpy.allclose`` at each ``(conv_id, ts)`` key.

Deliberately written with pandas idioms (groupby/rolling/expanding/
merge_asof-free loops) rather than sharing code with the Spark kernels,
so agreement is evidence, not tautology.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from featureengineer_spark.kernels import FeatureModel


def oracle_features(
    t: pd.DataFrame,
    idle_timeout_s: float = 1800.0,
    rolling_window: int = 10,
    model: FeatureModel | None = None,
) -> pd.DataFrame:
    """Golden per-turn feature frame (FIXTURES.md §3)."""
    model = model or FeatureModel()
    t = t.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort").reset_index(drop=True)
    g = t.groupby("conv_id", sort=False)

    out = t[["conv_id", "ts", "turn_idx"]].copy()
    out["lag1_role"] = g["role"].shift(1)
    out["lead1_role"] = g["role"].shift(-1)
    gap = (t["ts"] - g["ts"].shift(1)).dt.total_seconds()
    out["inter_turn_latency_s"] = gap

    new_sess = (gap > idle_timeout_s).fillna(False).astype("int64")
    out["session_id"] = new_sess.groupby(t["conv_id"]).cumsum()

    for name, mask in (
        (f"rolling_user_turns_{rolling_window}", t["role"] == "user"),
        (f"rolling_assistant_turns_{rolling_window}", t["role"] == "assistant"),
        (f"rolling_tool_calls_{rolling_window}", t["tool"].notna()),
    ):
        out[name] = (
            mask.astype("float64")
            .groupby(t["conv_id"])
            .rolling(rolling_window, min_periods=1)
            .sum()
            .reset_index(level=0, drop=True)
            .astype("int64")
        )

    out["tool_backfilled"] = g["tool"].ffill()
    out["text_len"] = t["text"].fillna("").str.len().astype("int64")
    out["cum_text_len"] = out.groupby(t["conv_id"])["text_len"].cumsum()

    # feature_vec: expanding-standardized raw stats @ proj (pandas path)
    raw = pd.DataFrame(
        {
            "text_len": out["text_len"].astype("float64"),
            "n_words": t["text"].fillna("").str.split().str.len().astype("float64"),
            "is_user": (t["role"] == "user").astype("float64"),
            "is_assistant": (t["role"] == "assistant").astype("float64"),
            "is_system": (t["role"] == "system").astype("float64"),
            "tool_notnull": t["tool"].notna().astype("float64"),
            "gap": out["inter_turn_latency_s"].fillna(0.0),
            "log_len": np.log1p(out["text_len"].astype("float64")),
        }
    )
    gg = raw.groupby(t["conv_id"], sort=False)
    mean = gg.expanding(1).mean().reset_index(level=0, drop=True)
    std = gg.expanding(1).std(ddof=1).reset_index(level=0, drop=True)
    z = (raw - mean) / std
    z = z.replace([np.inf, -np.inf], np.nan).fillna(0.0)
    vecs = z.to_numpy() @ model.proj.T
    out["feature_vec"] = list(vecs)
    return out


def oracle_asof(
    t: pd.DataFrame,
    anchors: pd.DataFrame,
    value_cols: list[str] | None = None,
    inclusive: bool = True,
) -> pd.DataFrame:
    """Golden as-of join: per (conv_id, anchor_ts), the latest turn with
    ts <= anchor_ts (tie-break max turn_idx) — naive per-row loop, the
    trivially-correct spec implementation."""
    value_cols = value_cols or ["turn_idx", "role", "text", "tool"]
    t = t.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
    by_conv = {k: v for k, v in t.groupby("conv_id", sort=False)}
    rows = []
    for _, a in anchors.iterrows():
        g = by_conv.get(a["conv_id"])
        rec = {"conv_id": a["conv_id"], "anchor_ts": a["anchor_ts"], "matched_ts": pd.NaT}
        for c in value_cols:
            rec[c] = None
        if g is not None:
            mask = g["ts"] <= a["anchor_ts"] if inclusive else g["ts"] < a["anchor_ts"]
            m = g[mask]
            if len(m):
                last = m.iloc[-1]
                rec["matched_ts"] = last["ts"]
                for c in value_cols:
                    rec[c] = last[c]
        rows.append(rec)
    return pd.DataFrame(rows)
