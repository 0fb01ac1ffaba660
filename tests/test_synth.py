"""Distributed generator determinism (scale-invariance, SURVEY.md §5.5)."""

from __future__ import annotations

import pandas as pd
from featureengineer_spark.data import synth_transcripts_spark

KEY = ["conv_id", "turn_idx"]


def test_synth_spark_deterministic_across_parallelism(spark):
    a = (
        synth_transcripts_spark(spark, n_convs=300, mega=1, mega_len=500, seed=7, partitions=3)
        .toPandas().sort_values(KEY, kind="mergesort").reset_index(drop=True)
    )
    b = (
        synth_transcripts_spark(spark, n_convs=300, mega=1, mega_len=500, seed=7, partitions=17)
        .toPandas().sort_values(KEY, kind="mergesort").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_synth_spark_shape(spark):
    t = synth_transcripts_spark(spark, n_convs=200, mega=1, mega_len=400, seed=7)
    pdf = t.toPandas()
    assert set(pdf.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    g = pdf.groupby("conv_id")
    # ts strictly non-decreasing within conv in turn order
    for _, grp in g:
        grp = grp.sort_values("turn_idx")
        assert (grp["ts"].diff().dropna() >= pd.Timedelta(0)).all()
    assert (g.size().loc["conv_0"]) == 400  # mega conv
    assert pdf["tool"].isna().mean() > 0.7  # sparse
