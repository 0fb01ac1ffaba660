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


def test_stream_stream_asof_matches_batch(spark, transcripts, tmp_path):
    """Both sides streaming: the bounded-lookback PIT join (stream-stream
    join + max_by aggregation, two chained stateful operators) must equal
    the batch formulation of the same semantics, with zero leakage."""
    import pandas as pd
    from pyspark.sql import functions as F

    from featureengineer_spark.streaming.sessions import stream_stream_asof

    feat_dir = str(tmp_path / "feat")
    anch_dir = str(tmp_path / "anch")
    # sentinels 30 days ahead advance BOTH watermarks past every real
    # event so append mode emits all groups before the availableNow
    # drain stops; the sentinel entity has no anchors and the sentinel
    # anchor no nearby features, so neither produces output rows
    far = transcripts.agg((F.max("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"))
    sent_feat = far.select(
        F.lit("__sentinel").alias("conv_id"), F.lit(0).alias("turn_idx"),
        F.lit("system").alias("role"), F.lit("").alias("text"),
        F.lit(None).cast("string").alias("tool"), "ts",
    )
    transcripts.unionByName(sent_feat).repartition(6).write.mode("overwrite").parquet(feat_dir)
    anchors = transcripts.groupBy("conv_id").agg(F.max("ts").alias("anchor_ts"))
    sent_anch = far.select(
        F.lit("__sentinel_a").alias("conv_id"), F.col("ts").alias("anchor_ts")
    )
    anchors.unionByName(sent_anch).repartition(4).write.mode("overwrite").parquet(anch_dir)

    f_schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    f_stream = spark.readStream.schema(f_schema).option("maxFilesPerTrigger", 3).parquet(feat_dir)
    a_stream = spark.readStream.schema("conv_id string, anchor_ts timestamp").parquet(anch_dir)

    out = stream_stream_asof(
        f_stream, a_stream, lookback="2 hours", watermark="10 minutes",
        value_cols=("turn_idx", "role"), how="inner",
    )
    q = (
        out.writeStream.format("memory").queryName("ss_asof")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = (
        spark.table("ss_asof").toPandas()
        .sort_values(["conv_id", "anchor_ts"]).reset_index(drop=True)
    )

    # batch formulation of the identical bounded-lookback semantics
    exp = spark.sql(f"""
        SELECT conv_id, anchor_ts, m.* FROM (
          SELECT a.conv_id, a.anchor_ts,
                 max_by(struct(f.ts AS matched_ts, f.turn_idx, f.role),
                        struct(f.ts, f.turn_idx)) AS m
          FROM parquet.`{anch_dir}` a
          JOIN parquet.`{feat_dir}` f
            ON f.conv_id = a.conv_id
           AND f.ts <= a.anchor_ts
           AND f.ts >= a.anchor_ts - INTERVAL 2 HOURS
          GROUP BY a.conv_id, a.anchor_ts
        )
    """).toPandas().sort_values(["conv_id", "anchor_ts"]).reset_index(drop=True)
    # name the struct-expanded columns consistently
    exp.columns = ["conv_id", "anchor_ts", "matched_ts", "turn_idx", "role"]

    assert len(got) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    assert (got["matched_ts"] <= got["anchor_ts"]).all()  # zero leakage


def test_stream_stream_asof_left_outer_keeps_unmatched_anchors(spark, tmp_path):
    """Batch-parity for the left-outer variant: anchors with NO feature
    inside the lookback window must still emit (null matched_ts/values)
    once the watermark closes their state — the batch asof_join contract.
    Fixture places several anchors >1h after their entity's last feature
    so the 1-hour lookback window is empty for them."""
    import pandas as pd
    from pyspark.sql import functions as F

    from featureengineer_spark.streaming.sessions import stream_stream_asof

    feat_dir = str(tmp_path / "feat_lo")
    anch_dir = str(tmp_path / "anch_lo")
    base = "2024-03-01 12:00:00"
    feats = spark.createDataFrame(
        [
            # c1: features at t, t+10m  → anchor at t+20m matches t+10m
            ("c1", 0, f"{base}"),
            ("c1", 1, "2024-03-01 12:10:00"),
            # c2: single feature at t → anchor at t+3h is OUT of lookback
            ("c2", 0, f"{base}"),
            # c3: anchors only, no features at all
        ],
        "conv_id string, turn_idx int, ts_s string",
    ).select("conv_id", "turn_idx", F.col("ts_s").cast("timestamp").alias("ts"))
    anchors = spark.createDataFrame(
        [
            ("c1", "2024-03-01 12:20:00"),
            ("c2", "2024-03-01 15:00:00"),  # unmatched: 3h gap > 1h lookback
            ("c3", "2024-03-01 13:00:00"),  # unmatched: entity has no features
        ],
        "conv_id string, anchor_ts_s string",
    ).select("conv_id", F.col("anchor_ts_s").cast("timestamp").alias("anchor_ts"))
    # watermark sentinels far in the future on BOTH streams so append
    # mode emits every group (incl. expired unmatched-anchor state)
    sent_t = "2024-04-01 00:00:00"
    feats = feats.unionByName(
        spark.createDataFrame([("__sent", 0, sent_t)], "conv_id string, turn_idx int, ts_s string")
        .select("conv_id", "turn_idx", F.col("ts_s").cast("timestamp").alias("ts"))
    )
    anchors = anchors.unionByName(
        spark.createDataFrame([("__sent_a", sent_t)], "conv_id string, anchor_ts_s string")
        .select("conv_id", F.col("anchor_ts_s").cast("timestamp").alias("anchor_ts"))
    )
    feats.repartition(2).write.mode("overwrite").parquet(feat_dir)
    anchors.repartition(2).write.mode("overwrite").parquet(anch_dir)

    f_stream = spark.readStream.schema("conv_id string, turn_idx int, ts timestamp").parquet(feat_dir)
    a_stream = spark.readStream.schema("conv_id string, anchor_ts timestamp").parquet(anch_dir)
    out = stream_stream_asof(
        f_stream, a_stream, lookback="1 hour", watermark="5 minutes",
        value_cols=("turn_idx",), how="left_outer",
    )
    q = (
        out.writeStream.format("memory").queryName("ss_asof_lo")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = (
        spark.table("ss_asof_lo").toPandas()
        .sort_values(["conv_id", "anchor_ts"]).reset_index(drop=True)
    )

    # batch formulation: LEFT join + same lookback + max_by
    exp = spark.sql(f"""
        SELECT conv_id, anchor_ts, m.* FROM (
          SELECT a.conv_id, a.anchor_ts,
                 max_by(struct(f.ts AS matched_ts, f.turn_idx),
                        struct(f.ts, f.turn_idx)) AS m
          FROM parquet.`{anch_dir}` a
          LEFT JOIN parquet.`{feat_dir}` f
            ON f.conv_id = a.conv_id
           AND f.ts <= a.anchor_ts
           AND f.ts >= a.anchor_ts - INTERVAL 1 HOUR
          GROUP BY a.conv_id, a.anchor_ts
        )
    """).toPandas().sort_values(["conv_id", "anchor_ts"]).reset_index(drop=True)
    exp.columns = ["conv_id", "anchor_ts", "matched_ts", "turn_idx"]

    # the sentinel anchor itself matches the sentinel feature; drop both
    got = got[~got["conv_id"].str.startswith("__sent")].reset_index(drop=True)
    exp = exp[~exp["conv_id"].str.startswith("__sent")].reset_index(drop=True)
    assert set(got["conv_id"]) == {"c1", "c2", "c3"}  # unmatched anchors kept
    assert got.loc[got.conv_id == "c2", "matched_ts"].isna().all()
    assert got.loc[got.conv_id == "c3", "matched_ts"].isna().all()
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_stream_dedup_exact_matches_batch_distinct(spark, tmp_path):
    """Streaming exact dedup must emit exactly one row per distinct
    normalized text (all dups inside the watermark horizon here), same
    distinct-text set as the batch dedup."""
    from pyspark.sql import functions as F

    from featureengineer_spark.operators.dedup import normalize_text
    from featureengineer_spark.streaming.sessions import stream_dedup_exact

    src = str(tmp_path / "dedup_in")
    rows = [
        (i, f"Doc body number {i % 7}!", f"2024-03-01 10:{i:02d}:00")
        for i in range(40)
    ]
    (
        spark.createDataFrame(rows, "doc_id long, text string, ts_s string")
        .select("doc_id", "text", F.col("ts_s").cast("timestamp").alias("ts"))
        .repartition(4)
        .write.mode("overwrite").parquet(src)
    )
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # all arrivals lie inside one watermark horizon → exact global dedup;
    # (a dup arriving later than the horizon after its original would
    # pass — the documented streaming trade-off)
    q = (
        stream_dedup_exact(stream, watermark="2 hours")
        .writeStream.format("memory").queryName("dedup_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_stream").toPandas()
    assert len(got) == 7  # one per distinct text
    batch_texts = {
        r[0]
        for r in spark.read.parquet(src)
        .select(normalize_text(F.col("text")))
        .distinct()
        .collect()
    }
    got_norm = {
        r[0]
        for r in spark.createDataFrame(got[["text"]])
        .select(normalize_text(F.col("text")))
        .collect()
    }
    assert got_norm == batch_texts


def test_stream_dedup_neardup_matches_batch_first_seen(spark, tmp_path):
    """Streaming near-dup gate == batch near_dedup_first_seen on the same
    corpus when arrival order follows ts order: files arrive one per
    micro-batch in ts order, and the kept id set must be identical to the
    single-pass batch twin (first arrival per LSH band bucket wins,
    within-batch and across the persistent band store alike)."""
    import os
    import time

    from pyspark.sql import functions as F

    from featureengineer_spark.operators.dedup import near_dedup_first_seen
    from featureengineer_spark.streaming.sessions import stream_dedup_neardup

    base = [
        "the quick brown fox jumps over the lazy dog near the old river bank",
        "spark structured streaming processes unbounded data in incremental micro batches",
        "minhash signatures estimate jaccard similarity between shingled documents quickly",
        "training data pipelines deduplicate documents before tokenization and packing",
        "a completely unrelated sentence about alpine weather patterns in early spring",
    ]
    rows = []
    for i in range(30):
        b = base[i % 5]
        if i >= 10 and i % 3 == 0:
            # near-dup: same text with a one-word tweak (shares most shingles)
            b = b.replace("the", "a", 1) + " extra"
        rows.append((i, b, f"2024-03-01 10:{i:02d}:00"))
    schema = "doc_id long, text string, ts timestamp"
    pdf = (
        spark.createDataFrame(rows, "doc_id long, text string, ts_s string")
        .select("doc_id", "text", F.col("ts_s").cast("timestamp").alias("ts"))
    )
    src = str(tmp_path / "nd_in")
    os.makedirs(src)
    # one file per 10 docs, mtimes strictly increasing so the file source
    # processes them in ts order
    for part, lo in enumerate(range(0, 30, 10)):
        chunk = pdf.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 10))
        tmp_dir = str(tmp_path / f"nd_chunk{part}")
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp_dir)
        data_file = [f for f in os.listdir(tmp_dir) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"part-{part:03d}.parquet")
        os.rename(os.path.join(tmp_dir, data_file), dst)
        os.utime(dst, (time.time() + part, time.time() + part))

    out = str(tmp_path / "nd_out")
    q = stream_dedup_neardup(
        spark,
        src,
        out,
        str(tmp_path / "nd_ckpt"),
        str(tmp_path / "nd_store"),
        schema,
        num_perm=16,
        bands=8,
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    got = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    exp = {
        r.doc_id
        for r in near_dedup_first_seen(
            pdf, order_col="ts", num_perm=16, bands=8
        ).select("doc_id").collect()
    }
    assert got == exp
    # sanity: the gate actually suppressed something and kept something
    assert 0 < len(got) < 30
    # store is bounded: bands rows per arriving doc
    store_rows = spark.read.parquet(str(tmp_path / "nd_store")).count()
    assert store_rows == 30 * 8


def test_stream_dedup_neardup_restart_and_new_data(spark, tmp_path):
    """Restart with the same checkpoint must be a no-op (no duplicate
    output, no duplicate store rows), and NEW files arriving after a
    restart must still be gated against the store built before it."""
    import os
    import time

    from pyspark.sql import functions as F

    from featureengineer_spark.streaming.sessions import stream_dedup_neardup

    schema = "doc_id long, text string, ts timestamp"
    src = str(tmp_path / "r_in")
    os.makedirs(src)

    def write_file(part, rows):
        pdf = (
            spark.createDataFrame(rows, "doc_id long, text string, ts_s string")
            .select("doc_id", "text", F.col("ts_s").cast("timestamp").alias("ts"))
        )
        td = str(tmp_path / f"r_chunk{part}")
        pdf.coalesce(1).write.mode("overwrite").parquet(td)
        f = [x for x in os.listdir(td) if x.endswith(".parquet")][0]
        dst = os.path.join(src, f"part-{part:03d}.parquet")
        os.rename(os.path.join(td, f), dst)
        os.utime(dst, (time.time() + part, time.time() + part))

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
    ]
    write_file(0, [(i, texts[i % 2], f"2024-04-01 09:{i:02d}:00") for i in range(6)])

    args = (spark, src, str(tmp_path / "r_out"), str(tmp_path / "r_ckpt"),
            str(tmp_path / "r_store"), schema)
    kw = dict(num_perm=16, bands=8, max_files_per_trigger=1)
    q = stream_dedup_neardup(*args, **kw)
    q.awaitTermination(120)
    out1 = spark.read.parquet(str(tmp_path / "r_out")).count()
    store1 = spark.read.parquet(str(tmp_path / "r_store")).count()
    assert out1 == 2 and store1 == 6 * 8  # one survivor per distinct text

    # restart, nothing new: exactly-once (no growth anywhere)
    q2 = stream_dedup_neardup(*args, **kw)
    q2.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "r_out")).count() == out1
    assert spark.read.parquet(str(tmp_path / "r_store")).count() == store1

    # new file after restart: exact copies of batch-0 texts + one fresh
    write_file(1, [
        (10, texts[0], "2024-04-01 10:00:00"),
        (11, "a wholly new document about volcanic rock formations today", "2024-04-01 10:01:00"),
    ])
    q3 = stream_dedup_neardup(*args, **kw)
    q3.awaitTermination(120)
    kept = {r.doc_id for r in
            spark.read.parquet(str(tmp_path / "r_out")).select("doc_id").collect()}
    assert 10 not in kept        # suppressed by the pre-restart store
    assert 11 in kept            # fresh doc passes
    assert spark.read.parquet(str(tmp_path / "r_store")).count() == 8 * 8


def test_stream_dedup_neardup_replay_after_store_append(spark, tmp_path):
    """Crash-replay safety: if a batch crashes AFTER its band-store append
    but BEFORE the checkpoint commit, the replay sees its own prior
    attempt's band rows in the store. The store read must exclude the
    current __batch_id partition, so the replayed batch keeps exactly the
    same survivors instead of self-colliding and overwriting its output
    partition with an emptied kept set."""
    import os
    import time

    from pyspark.sql import functions as F

    from featureengineer_spark.streaming.sessions import stream_dedup_neardup

    schema = "doc_id long, text string, ts timestamp"
    src = str(tmp_path / "cr_in")
    os.makedirs(src)
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "2024-05-01 09:00:00"),
        (1, "one two three four five six seven eight nine ten eleven", "2024-05-01 09:01:00"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "2024-05-01 09:02:00"),
    ]
    pdf = (
        spark.createDataFrame(rows, "doc_id long, text string, ts_s string")
        .select("doc_id", "text", F.col("ts_s").cast("timestamp").alias("ts"))
    )
    td = str(tmp_path / "cr_chunk")
    pdf.coalesce(1).write.mode("overwrite").parquet(td)
    f = [x for x in os.listdir(td) if x.endswith(".parquet")][0]
    os.rename(os.path.join(td, f), os.path.join(src, "part-000.parquet"))

    args = (spark, src, str(tmp_path / "cr_out"), str(tmp_path / "cr_ckpt"),
            str(tmp_path / "cr_store"), schema)
    kw = dict(num_perm=16, bands=8, max_files_per_trigger=1)
    q = stream_dedup_neardup(*args, **kw)
    q.awaitTermination(120)
    kept1 = {r.doc_id for r in
             spark.read.parquet(str(tmp_path / "cr_out")).select("doc_id").collect()}
    assert kept1 == {0, 1}  # doc 2 is an exact near-dup of doc 0

    # simulate the crash window: the store append for batch 0 is durable
    # but the checkpoint commit is not — delete the commit marker so the
    # restart replays batch 0 against a store that already holds its bands
    commit0 = os.path.join(str(tmp_path / "cr_ckpt"), "commits", "0")
    assert os.path.exists(commit0)
    os.remove(commit0)
    # the local checksum FS keeps a .crc sidecar a real crash would never
    # have written; leaving it breaks the rename-based atomic commit write
    crc0 = os.path.join(str(tmp_path / "cr_ckpt"), "commits", ".0.crc")
    if os.path.exists(crc0):
        os.remove(crc0)
    q2 = stream_dedup_neardup(*args, **kw)
    q2.awaitTermination(120)
    kept2 = {r.doc_id for r in
             spark.read.parquet(str(tmp_path / "cr_out")).select("doc_id").collect()}
    assert kept2 == kept1  # replay is idempotent, no self-collision
    # store still holds exactly one batch's bands (dynamic overwrite)
    assert spark.read.parquet(str(tmp_path / "cr_store")).count() == 3 * 8


def test_stream_dedup_neardup_corrupt_store_fails_batch(spark, tmp_path):
    """A store read failure that is NOT missing-path (e.g. a corrupt
    store directory) must fail the micro-batch so the checkpoint retries
    it — never be silently treated as an empty store (which would let
    duplicates through the gate permanently)."""
    import os

    import pytest

    from pyspark.sql import functions as F

    from featureengineer_spark.streaming.sessions import stream_dedup_neardup

    schema = "doc_id long, text string, ts timestamp"
    src = str(tmp_path / "cs_in")
    os.makedirs(src)
    pdf = (
        spark.createDataFrame(
            [(0, "alpha beta gamma delta epsilon zeta eta theta", "2024-05-01 09:00:00")],
            "doc_id long, text string, ts_s string",
        ).select("doc_id", "text", F.col("ts_s").cast("timestamp").alias("ts"))
    )
    td = str(tmp_path / "cs_chunk")
    pdf.coalesce(1).write.mode("overwrite").parquet(td)
    f = [x for x in os.listdir(td) if x.endswith(".parquet")][0]
    os.rename(os.path.join(td, f), os.path.join(src, "part-000.parquet"))

    # a store path that EXISTS but cannot be read as parquet
    store = str(tmp_path / "cs_store")
    os.makedirs(store)
    with open(os.path.join(store, "junk.parquet"), "w") as fh:
        fh.write("this is not parquet")

    q = stream_dedup_neardup(
        spark, src, str(tmp_path / "cs_out"), str(tmp_path / "cs_ckpt"),
        store, schema, num_perm=16, bands=8, max_files_per_trigger=1,
    )
    with pytest.raises(Exception):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()
    assert q.exception() is not None


def test_compact_band_store_preserves_in_horizon_gating(spark, tmp_path):
    """Horizon-driven band-store compaction (partition delete + optional
    rewrite of mixed partitions) must leave gating behavior INSIDE the
    horizon unchanged: a twin run without compaction keeps exactly the
    same documents, and the store shrinks to the in-horizon bound."""
    import os
    import time

    from pyspark.sql import functions as F

    from featureengineer_spark.streaming.sessions import (
        compact_band_store,
        stream_dedup_neardup,
    )

    A = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    B = "one two three four five six seven eight nine ten eleven twelve"
    C = "volcanic rock formations develop slowly under sustained pressure below"
    D = "maritime navigation charts require frequent updates for shifting sandbars"
    batches = [
        [(0, A, "2024-06-01 09:00:00"), (1, B, "2024-06-01 09:01:00")],
        # mixed-age partition: doc 11 sits below the eventual cutoff
        [(10, C, "2024-06-01 11:00:00"),
         (11, A.replace("alpha", "omega", 1), "2024-06-01 09:30:00")],
        [(20, C.replace("slowly", "fast", 1), "2024-06-01 11:30:00"),
         (21, B.replace("one", "zero", 1), "2024-06-01 11:31:00"),
         (22, D, "2024-06-01 11:32:00")],
    ]
    schema = "doc_id long, text string, ts timestamp"

    def run(tag, compact_after_batch1):
        src = str(tmp_path / f"{tag}_in")
        os.makedirs(src)
        stats = None
        for part, rows in enumerate(batches):
            pdf = (
                spark.createDataFrame(rows, "doc_id long, text string, ts_s string")
                .select("doc_id", "text", F.col("ts_s").cast("timestamp").alias("ts"))
            )
            td = str(tmp_path / f"{tag}_chunk{part}")
            pdf.coalesce(1).write.mode("overwrite").parquet(td)
            f = [x for x in os.listdir(td) if x.endswith(".parquet")][0]
            dst = os.path.join(src, f"part-{part:03d}.parquet")
            os.rename(os.path.join(td, f), dst)
            os.utime(dst, (time.time() + part, time.time() + part))
            q = stream_dedup_neardup(
                spark, src, str(tmp_path / f"{tag}_out"),
                str(tmp_path / f"{tag}_ckpt"), str(tmp_path / f"{tag}_store"),
                schema, num_perm=16, bands=8, max_files_per_trigger=1,
                horizon_s=3600.0,
            )
            q.awaitTermination(120)
            if part == 1 and compact_after_batch1:
                stats = compact_band_store(
                    spark, str(tmp_path / f"{tag}_store"), horizon_s=3600.0,
                    rewrite=True,
                )
        kept = {r.doc_id for r in
                spark.read.parquet(str(tmp_path / f"{tag}_out"))
                .select("doc_id").collect()}
        return kept, stats

    kept_plain, _ = run("nc", compact_after_batch1=False)
    kept_compacted, stats = run("cc", compact_after_batch1=True)
    # 11 passes (A expired out of horizon at 11:00), 20 suppressed (C in
    # horizon), 21 passes (B expired), 22 fresh
    assert kept_plain == {0, 1, 10, 11, 21, 22}
    assert kept_compacted == kept_plain
    # batch-0 partition fully expired → deleted; batch-1 partition is
    # mixed-age → rewritten without its expired rows
    assert stats["deleted_batches"] == [0]
    assert stats["rewritten_batches"] == [1]
    assert stats["rows_before"] == 4 * 8
    assert stats["rows_after"] == 1 * 8
    store_rows = spark.read.parquet(str(tmp_path / "cc_store")).count()
    # post-batch-2 store: the 8 surviving batch-1 rows + batch-2's 3 docs
    assert store_rows == (1 + 3) * 8


def test_stream_render_sessions_matches_batch_composition(spark, transcripts, tmp_path):
    """Streaming conversation render at session close == the batch
    sessionize+render composition: same session boundaries, same
    rendered text per (conv, session)."""
    from featureengineer_spark.streaming.sessions import stream_render_sessions

    src = str(tmp_path / "rr_in")
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

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(src)
    )
    q = (
        stream_render_sessions(stream, gap="30 minutes")
        .writeStream.format("memory").queryName("rendered_sessions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    max_real_ts = transcripts.agg(F.max("ts")).collect()[0][0]
    got = {
        (r.conv_id, r.session_start): (r.rendered, r.n_turns)
        for r in spark.table("rendered_sessions")
        .filter(F.col("session_start") <= F.lit(max_real_ts))
        .collect()
    }

    batch = with_session_ids(transcripts, idle_timeout_s=1800.0)
    line = F.struct(
        F.col("turn_idx").cast("long").alias("i"),
        F.concat(
            F.coalesce(F.col("role"), F.lit("")), F.lit(": "),
            F.coalesce(F.col("text"), F.lit("")),
        ).alias("s"),
    )
    exp = {
        (r.conv_id, r.session_start): (r.rendered, r.n_turns)
        for r in batch.groupBy("conv_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.array_sort(F.collect_list(line)).alias("__lines"),
        )
        .select(
            "conv_id", "session_start",
            F.array_join(F.transform("__lines", lambda x: x["s"]), "\n").alias("rendered"),
            F.size("__lines").cast("long").alias("n_turns"),
        )
        .collect()
    }
    assert got == exp
    assert len(got) > 0
