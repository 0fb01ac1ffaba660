"""Streaming sessionization equals batch segmentation (SURVEY.md §2.9)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from featureengineer_spark.data import TRANSCRIPT_SCHEMA
from featureengineer_spark.operators import with_session_ids
from featureengineer_spark.streaming import stream_sessionize_to_sink


def test_stream_sessions_match_batch(spark, transcripts, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # sentinel turn far in the future advances the watermark past every
    # real session's end, so append mode emits them all before the
    # availableNow drain stops (real deployments simply keep running)
    sentinel = transcripts.groupBy("conv_id").agg(
        (F.max("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts")
    ).select(
        "conv_id",
        F.lit(10_000_000).alias("turn_idx"),
        F.lit("system").alias("role"),
        F.lit("").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        "ts",
    )
    transcripts.unionByName(sentinel).repartition(6).write.parquet(src)

    q = stream_sessionize_to_sink(
        spark, src, out, ckpt, schema=TRANSCRIPT_SCHEMA, gap="30 minutes"
    )
    q.awaitTermination(120)

    max_real_ts = transcripts.agg(F.max("ts")).collect()[0][0]
    got = (
        spark.read.parquet(out)
        .filter(F.col("first_ts") <= F.lit(max_real_ts))  # drop sentinel sessions
        .select("conv_id", "n_turns", "first_ts", "last_ts")
        .toPandas()
        .sort_values(["conv_id", "first_ts"], kind="mergesort")
        .reset_index(drop=True)
    )

    batch = with_session_ids(transcripts, idle_timeout_s=1800.0)
    exp = (
        batch.groupBy("conv_id", "session_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select("conv_id", "n_turns", "first_ts", "last_ts")
        .toPandas()
        .sort_values(["conv_id", "first_ts"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_stream_restart_is_exactly_once(spark, transcripts, tmp_path):
    """Re-running with the same checkpoint adds no duplicate output."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    transcripts.repartition(4).write.parquet(src)

    q = stream_sessionize_to_sink(spark, src, out, ckpt, schema=TRANSCRIPT_SCHEMA)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()

    q2 = stream_sessionize_to_sink(spark, src, out, ckpt, schema=TRANSCRIPT_SCHEMA)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2
