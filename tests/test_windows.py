"""Window operators vs the pandas oracle (FIXTURES.md §3 columns)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from featureengineer_spark.operators import (
    with_backfill,
    with_cumulative,
    with_inter_turn_latency,
    with_lags,
    with_rolling_counts,
    with_session_ids,
)
from featureengineer_spark.operators.windows import default_rolling_predicates
from featureengineer_spark.oracle import oracle_features

KEY = ["conv_id", "ts", "turn_idx"]


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(KEY, kind="mergesort").reset_index(drop=True)


def build_expected(transcripts_pdf):
    return _sorted(oracle_features(transcripts_pdf))


def test_full_window_stack_matches_oracle(spark, transcripts, transcripts_pdf):
    exp = build_expected(transcripts_pdf)

    df = with_lags(transcripts, ["role"], offsets=(1,))
    df = with_inter_turn_latency(df)
    df = with_session_ids(df, idle_timeout_s=1800.0)
    df = with_rolling_counts(df, default_rolling_predicates(), window=10)
    df = with_backfill(df, "tool")
    df = df.withColumn("text_len", F.coalesce(F.length("text"), F.lit(0)).cast("long"))
    df = with_cumulative(df, {"cum_text_len": F.col("text_len")})

    got = _sorted(df.toPandas())
    assert len(got) == len(exp)

    pd.testing.assert_series_equal(got["lag1_role"], exp["lag1_role"], check_names=False)
    pd.testing.assert_series_equal(got["lead1_role"], exp["lead1_role"], check_names=False)
    np.testing.assert_allclose(
        got["inter_turn_latency_s"].to_numpy(dtype=float),
        exp["inter_turn_latency_s"].to_numpy(dtype=float),
        rtol=1e-9, atol=1e-9, equal_nan=True,
    )
    np.testing.assert_array_equal(got["session_id"].to_numpy(), exp["session_id"].to_numpy())
    for c in ["rolling_user_turns_10", "rolling_assistant_turns_10", "rolling_tool_calls_10"]:
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy(), err_msg=c)
    pd.testing.assert_series_equal(
        got["tool_backfilled"], exp["tool_backfilled"], check_names=False
    )
    np.testing.assert_array_equal(got["text_len"].to_numpy(), exp["text_len"].to_numpy())
    np.testing.assert_array_equal(
        got["cum_text_len"].to_numpy(), exp["cum_text_len"].to_numpy()
    )


def test_short_conversation_edge(spark, transcripts, transcripts_pdf):
    # conv_1 has exactly 2 turns (< every window length used) — rolling
    # counts and backfill must still be defined on every row.
    df = with_rolling_counts(
        transcripts.filter(F.col("conv_id") == "conv_1"),
        default_rolling_predicates(),
        window=10,
    )
    got = df.toPandas()
    assert len(got) == len(transcripts_pdf[transcripts_pdf.conv_id == "conv_1"])
    assert got["rolling_user_turns_10"].notna().all()


def test_rolling_counts_never_exceed_window(transcripts):
    df = with_rolling_counts(transcripts, default_rolling_predicates(), window=10)
    tot = (
        F.col("rolling_user_turns_10")
        + F.col("rolling_assistant_turns_10")
    )
    assert df.filter(tot > 10).count() == 0


def test_ewma_matches_pandas(spark, transcripts, transcripts_pdf):
    from featureengineer_spark.operators.windows import with_ewma

    t = transcripts.withColumn("text_len", F.coalesce(F.length("text"), F.lit(0)).cast("double"))
    got = with_ewma(t, "text_len", alpha=0.3).toPandas()
    got = got.sort_values(KEY, kind="mergesort").reset_index(drop=True)
    p = transcripts_pdf.copy()
    p["text_len"] = p["text"].fillna("").str.len().astype(float)
    p = p.sort_values(KEY, kind="mergesort")
    exp = (
        p.groupby("conv_id", sort=False)["text_len"]
        .apply(lambda s: s.ewm(alpha=0.3, adjust=False).mean())
        .reset_index(drop=True)
    )
    p = p.reset_index(drop=True)
    np.testing.assert_allclose(
        got["text_len_ewma"].to_numpy(), exp.to_numpy(), rtol=1e-9
    )


def test_deterministic_crop(spark, transcripts):
    from featureengineer_spark.operators.windows import with_deterministic_crop

    crop = with_deterministic_crop(transcripts, length=8)
    sizes = crop.groupBy("conv_id").count().toPandas()
    orig = transcripts.groupBy("conv_id").count().toPandas().set_index("conv_id")["count"]
    for _, r in sizes.iterrows():
        expected = min(8, orig[r["conv_id"]])
        assert r["count"] == expected, r
    # deterministic across partitionings
    a = crop.toPandas().sort_values(KEY).reset_index(drop=True)
    b = (
        with_deterministic_crop(transcripts.repartition(13), length=8)
        .toPandas().sort_values(KEY).reset_index(drop=True)
    )
    assert a[["conv_id", "turn_idx"]].equals(b[["conv_id", "turn_idx"]])


def test_deterministic_crop_tiling(spark):
    """tile=True must emit EXACTLY `length` rows per entity: long
    entities get the hash-offset crop, short ones repeat cyclically
    (DataInteger.py:417-428 graft)."""
    import pandas as pd

    from featureengineer_spark.operators.windows import with_deterministic_crop

    rows = []
    for e, n in [("a", 3), ("b", 10), ("c", 7), ("d", 1)]:
        for i in range(n):
            rows.append((e, i, pd.Timestamp("2025-01-01") + pd.Timedelta(seconds=i)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts"])
    )
    length = 7
    out = with_deterministic_crop(df, length, tile=True).toPandas()
    for e, n in [("a", 3), ("b", 10), ("c", 7), ("d", 1)]:
        sub = out[out["conv_id"] == e].sort_values("crop_pos")
        assert len(sub) == length, (e, len(sub))
        assert list(sub["crop_pos"]) == list(range(length))
        if n <= length:
            # cyclic repetition of the original sequence
            assert list(sub["turn_idx"]) == [p % n for p in range(length)]
        else:
            # contiguous slice, same rows as the untiled crop
            plain = with_deterministic_crop(
                df.filter(df.conv_id == e), length
            ).toPandas()
            assert sorted(sub["turn_idx"]) == sorted(plain["turn_idx"])


def test_with_iir_matches_naive_recursion(transcripts):
    """with_iir (truncated-impulse-response convolution) must equal a
    literal per-sample lfilter recursion, per entity, zero initial state
    — the full W5 ARMA graft (RASTA band-pass, FeaGet.py:52)."""
    import numpy as np

    from featureengineer_spark.operators import RASTA_A, RASTA_B, with_iir

    t = transcripts.withColumn(
        "val", F.length(F.coalesce(F.col("text"), F.lit(""))).cast("double")
    )
    got = (
        with_iir(t, "val", RASTA_B, RASTA_A)
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"])
    )

    def lfilter_ref(b, a, x):
        b = np.asarray(b) / a[0]
        a = np.asarray(a) / a[0]
        y = np.zeros(len(x))
        for t_ in range(len(x)):
            acc = 0.0
            for i in range(len(b)):
                if t_ - i >= 0:
                    acc += b[i] * x[t_ - i]
            for j in range(1, len(a)):
                if t_ - j >= 0:
                    acc -= a[j] * y[t_ - j]
            y[t_] = acc
        return y

    for conv_id, grp in got.groupby("conv_id"):
        exp = lfilter_ref(RASTA_B, RASTA_A, grp["val"].to_numpy())
        np.testing.assert_allclose(
            grp["val_iir"].to_numpy(), exp, rtol=1e-9, atol=1e-9, err_msg=conv_id
        )


def test_with_iir_pure_fir_and_unstable_raises(spark):
    import numpy as np
    import pytest

    from featureengineer_spark.operators import iir_impulse_response, with_iir

    # pure FIR: impulse response == b
    np.testing.assert_array_equal(
        iir_impulse_response([0.5, 0.25]), np.array([0.5, 0.25])
    )
    # unstable pole must be rejected, not silently truncated
    with pytest.raises(ValueError, match="unstable"):
        iir_impulse_response([1.0], [1.0, -1.01], max_len=4096)


def test_with_time_features_matches_python(spark):
    """Calendar/cyclic encodings vs a literal python datetime oracle,
    including the weekday convention (0=Monday) and cyclic wraparound
    (23:00 adjacent to 00:00 in (sin,cos) space)."""
    import datetime as dt
    import math

    from featureengineer_spark.operators.windows import with_time_features

    stamps = [
        dt.datetime(2024, 3, 1, 0, 0),    # Friday
        dt.datetime(2024, 3, 2, 23, 59),  # Saturday
        dt.datetime(2024, 3, 4, 12, 30),  # Monday
        dt.datetime(2024, 3, 3, 6, 0),    # Sunday
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(stamps)], "i long, ts timestamp")
    got = {r.i: r for r in with_time_features(df).collect()}
    for i, t in enumerate(stamps):
        r = got[i]
        assert r.hour == t.hour and r.weekday == t.weekday()
        assert r.is_weekend == (1 if t.weekday() >= 5 else 0)
        assert abs(r.sin_hour - math.sin(2 * math.pi * t.hour / 24)) < 1e-12
        assert abs(r.cos_weekday - math.cos(2 * math.pi * t.weekday() / 7)) < 1e-12
    # cyclic adjacency: hour 23 is closer to hour 0 than to hour 12
    import numpy as np
    def vec(r): return np.array([r.sin_hour, r.cos_hour])
    d_230 = np.linalg.norm(vec(got[1]) - vec(got[0]))   # 23:59 vs 00:00
    d_2312 = np.linalg.norm(vec(got[1]) - vec(got[2]))  # 23:59 vs 12:30
    assert d_230 < d_2312
