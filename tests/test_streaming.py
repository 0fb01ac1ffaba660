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


def test_stateful_running_profile(spark, transcripts, tmp_path):
    from featureengineer_spark.streaming.sessions import stream_running_profile

    src = str(tmp_path / "in")
    transcripts.repartition(6).write.parquet(src)
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 2)  # several micro-batches → state spans batches
        .parquet(src)
    )
    out = stream_running_profile(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("profiles")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    prof = spark.sql(
        "SELECT * FROM profiles a WHERE n_turns = "
        "(SELECT max(n_turns) FROM profiles b WHERE b.conv_id = a.conv_id)"
    ).toPandas().set_index("conv_id")

    exp_counts = transcripts.groupBy("conv_id").count().toPandas().set_index("conv_id")
    from featureengineer_spark.operators import with_backfill
    from pyspark.sql import functions as F2
    last = (
        with_backfill(transcripts, "tool")
        .withColumn(
            "rn",
            F2.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("conv_id").orderBy(F2.col("ts").desc(), F2.col("turn_idx").desc())
            ),
        )
        .filter("rn = 1")
        .select("conv_id", "tool_backfilled")
        .toPandas()
        .set_index("conv_id")
    )
    for conv, row in exp_counts.iterrows():
        assert prof.loc[conv, "n_turns"] == row["count"], conv
        exp_tool = last.loc[conv, "tool_backfilled"]
        got_tool = prof.loc[conv, "last_tool"]
        assert (got_tool == exp_tool) or (got_tool is None and exp_tool is None) or (
            pd.isna(got_tool) and pd.isna(exp_tool)
        ), (conv, got_tool, exp_tool)


def test_stream_asof_matches_batch(spark, transcripts, tmp_path):
    """Streaming PIT attach (foreachBatch over anchor micro-batches) must
    produce exactly the batch as-of join's rows, with zero leakage."""
    import pandas as pd
    from pyspark.sql import functions as F

    from featureengineer_spark.operators import asof_join
    from featureengineer_spark.streaming.sessions import stream_asof_attach

    anchors = transcripts.groupBy("conv_id").agg(
        F.max("ts").alias("anchor_ts")
    )
    anchors_dir = str(tmp_path / "anchors")
    # several files → several micro-batches
    anchors.repartition(8).write.mode("overwrite").parquet(anchors_dir)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    q = stream_asof_attach(
        spark,
        transcripts,
        anchors_dir,
        out_dir,
        ckpt,
        anchor_schema="conv_id string, anchor_ts timestamp",
        value_cols=["turn_idx", "role"],
    )
    q.awaitTermination(120)

    key = ["conv_id", "anchor_ts"]
    got = (
        spark.read.parquet(out_dir)
        .toPandas()
        .sort_values(key, kind="mergesort")
        .reset_index(drop=True)
    )
    exp = (
        asof_join(transcripts, anchors, value_cols=["turn_idx", "role"])
        .toPandas()
        .sort_values(key, kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    assert (got["matched_ts"] <= got["anchor_ts"]).all()


def test_stream_asof_restart_no_duplicates(spark, transcripts, tmp_path):
    """Three-restart sequence against one checkpoint: a no-op restart, a
    restart with NEW anchor files (must process only the new ones), and
    a final no-op restart — zero duplicates throughout, and the feature
    side joins from the cache rather than rescanning per micro-batch."""
    from pyspark.sql import functions as F

    from featureengineer_spark.operators import asof_join
    from featureengineer_spark.streaming.sessions import stream_asof_attach

    anchors = transcripts.groupBy("conv_id").agg(F.max("ts").alias("anchor_ts"))
    first = anchors.filter(F.crc32(F.col("conv_id")) % 2 == 0).cache()
    second = anchors.filter(F.crc32(F.col("conv_id")) % 2 == 1).cache()
    anchors_dir = str(tmp_path / "anchors")
    first.repartition(4).write.mode("overwrite").parquet(anchors_dir)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    kw = dict(
        anchor_schema="conv_id string, anchor_ts timestamp",
        value_cols=["turn_idx"],
    )
    feats = transcripts.select("conv_id", "turn_idx", "ts")
    stream_asof_attach(spark, feats, anchors_dir, out_dir, ckpt, **kw).awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == first.count()

    # restart 1: nothing new → nothing written
    stream_asof_attach(spark, feats, anchors_dir, out_dir, ckpt, **kw).awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == n1

    # restart 2: new anchor files land → exactly those get attached
    second.repartition(4).write.mode("append").parquet(anchors_dir)
    stream_asof_attach(spark, feats, anchors_dir, out_dir, ckpt, **kw).awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == anchors.count()
    assert got.groupBy("conv_id", "anchor_ts").count().filter("count > 1").count() == 0

    # restart 3: no-op again
    stream_asof_attach(spark, feats, anchors_dir, out_dir, ckpt, **kw).awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == anchors.count()

    # feature side must be served from the cache inside each micro-batch
    assert feats.is_cached
    plan = asof_join(feats, first, value_cols=["turn_idx"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan
    feats.unpersist()
    first.unpersist()
    second.unpersist()


def test_stream_sliding_windows_match_batch(spark, transcripts, tmp_path):
    """Sliding streaming windows (drained with availableNow) must equal
    the identical batch window aggregation."""
    from pyspark.sql import functions as F

    from featureengineer_spark.streaming.sessions import stream_sliding_activity

    src = str(tmp_path / "src")
    transcripts.write.mode("overwrite").parquet(src)
    schema = transcripts.schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 4).parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        stream_sliding_activity(stream, window="10 minutes", slide="5 minutes")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    exp = (
        transcripts.groupBy(
            "conv_id", F.window(F.col("ts"), "10 minutes", "5 minutes").alias("w")
        )
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias(
                "assistant_turns"
            ),
        )
        .select(
            "conv_id",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_turns",
            "assistant_turns",
        )
    )
    key = ["conv_id", "window_start"]
    import pandas as pd

    a = got.toPandas().sort_values(key).reset_index(drop=True)
    b = exp.toPandas().sort_values(key).reset_index(drop=True)
    # the final watermark may hold back windows newer than max_ts - delay;
    # availableNow emits everything whose end <= watermark at shutdown —
    # compare on the emitted subset and require substantial coverage
    merged = a.merge(b, on=key, suffixes=("", "_exp"))
    assert len(merged) == len(a) and len(a) >= 0.5 * len(b)
    pd.testing.assert_series_equal(
        merged["n_turns"], merged["n_turns_exp"], check_names=False
    )
    pd.testing.assert_series_equal(
        merged["assistant_turns"], merged["assistant_turns_exp"], check_names=False
    )
