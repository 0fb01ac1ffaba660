"""Hypothesis property tests (SURVEY.md §5: the reference has none; we
add them for the invariants that matter most at scale).

Each property runs on small generated tables (Spark jobs per example are
expensive — examples are capped), but the properties themselves are the
scale-critical ones: zero temporal leakage for ANY anchor placement, and
salted/chunked operators exactly equivalent to their plain forms for ANY
chunk size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from featureengineer_spark.operators import asof_join
from featureengineer_spark.operators.asof import salted_asof_join

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@st.composite
def event_table(draw):
    """(features, anchors) pandas frames over a handful of entities with
    adversarial ts patterns: duplicates, bursts, gaps."""
    n_ent = draw(st.integers(1, 4))
    rows = []
    base = pd.Timestamp("2025-06-01")
    for e in range(n_ent):
        n = draw(st.integers(1, 25))
        # non-decreasing with duplicate-able gaps (0 allowed → ts ties)
        gaps = draw(st.lists(st.integers(0, 3600), min_size=n, max_size=n))
        t = base
        for i, g in enumerate(gaps):
            t = t + pd.Timedelta(seconds=g)
            rows.append((f"e{e}", i, t))
    feats = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts"])
    n_anchor = draw(st.integers(1, 12))
    anchor_rows = []
    for _ in range(n_anchor):
        e = draw(st.integers(0, n_ent - 1))
        off = draw(st.integers(-3600, 90000))
        anchor_rows.append((f"e{e}", base + pd.Timedelta(seconds=off)))
    anchors = pd.DataFrame(anchor_rows, columns=["conv_id", "anchor_ts"])
    return feats, anchors


@given(data=event_table(), inclusive=st.booleans())
@settings(**SETTINGS)
def test_asof_never_leaks_and_matches_pandas(spark, data, inclusive):
    feats_pdf, anchors_pdf = data
    feats = spark.createDataFrame(feats_pdf)
    anchors = spark.createDataFrame(anchors_pdf)
    out = asof_join(
        feats, anchors, value_cols=["turn_idx"], inclusive=inclusive
    ).toPandas()

    # 1. row-per-anchor, 2. zero temporal leakage, 3. equals merge_asof
    assert len(out) == len(anchors_pdf)
    matched = out[out["matched_ts"].notna()]
    if inclusive:
        assert (matched["matched_ts"] <= matched["anchor_ts"]).all()
    else:
        assert (matched["matched_ts"] < matched["anchor_ts"]).all()

    exp = pd.merge_asof(
        anchors_pdf.sort_values("anchor_ts", kind="mergesort"),
        feats_pdf.sort_values(["ts", "turn_idx"], kind="mergesort").rename(
            columns={"ts": "matched_ts"}
        ),
        left_on="anchor_ts",
        right_on="matched_ts",
        by="conv_id",
        direction="backward",
        allow_exact_matches=inclusive,
    )
    key = ["conv_id", "anchor_ts"]
    a = out.sort_values(key + ["turn_idx"], kind="mergesort").reset_index(drop=True)
    b = exp.sort_values(key + ["turn_idx"], kind="mergesort").reset_index(drop=True)
    np.testing.assert_array_equal(
        a["turn_idx"].astype("float64").to_numpy(),
        b["turn_idx"].astype("float64").to_numpy(),
    )


@given(data=event_table(), chunk_seconds=st.sampled_from([1.0, 61.0, 3600.0]))
@settings(**SETTINGS)
def test_salted_asof_equivalence_any_chunking(spark, data, chunk_seconds):
    """The time-chunked mega-entity path must equal the plain join for
    EVERY chunk width, including widths smaller than every gap."""
    feats_pdf, anchors_pdf = data
    feats = spark.createDataFrame(feats_pdf)
    anchors = spark.createDataFrame(anchors_pdf)
    kw = dict(value_cols=["turn_idx"])
    key = ["conv_id", "anchor_ts", "turn_idx"]
    plain = (
        asof_join(feats, anchors, **kw)
        .toPandas()
        .sort_values(key, kind="mergesort")
        .reset_index(drop=True)
    )
    salted = (
        salted_asof_join(feats, anchors, chunk_seconds=chunk_seconds, **kw)
        .toPandas()
        .sort_values(key, kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted)


@given(
    n=st.integers(5, 60),
    timeout=st.integers(1, 7200),
    chunk=st.sampled_from([4, 16, 64]),
)
@settings(**SETTINGS)
def test_sessionize_salted_equivalence(spark, n, timeout, chunk):
    """Salted sessionization == plain for any idle timeout / chunking."""
    from featureengineer_spark.operators import with_session_ids
    from featureengineer_spark.operators.skew import salted_session_ids

    rng = np.random.default_rng(n * 31 + timeout)
    base = pd.Timestamp("2025-06-01")
    ts, t = [], base
    for _ in range(n):
        t = t + pd.Timedelta(seconds=int(rng.integers(0, 5000)))
        ts.append(t)
    pdf = pd.DataFrame(
        {"conv_id": ["e0"] * n, "turn_idx": range(n), "ts": ts}
    )
    df = spark.createDataFrame(pdf)
    key = ["conv_id", "turn_idx"]
    plain = (
        with_session_ids(df, idle_timeout_s=float(timeout))
        .toPandas()
        .sort_values(key)["session_id"]
        .to_numpy()
    )
    salted = (
        salted_session_ids(df, idle_timeout_s=float(timeout), chunk_size=chunk)
        .toPandas()
        .sort_values(key)["session_id"]
        .to_numpy()
    )
    np.testing.assert_array_equal(plain, salted)
