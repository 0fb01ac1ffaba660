"""Structured Streaming operators (phase-2 of SURVEY.md §2.9).

The reference is batch-only, but its incremental chunk loop over
unbounded-ish signals (``FeaGet.py:211-217``) and VAD gap segmentation
(``FeaGet.py:292-297``) prefigure streaming micro-batches and
``session_window``. Late/failed re-run ledgers (``FeaGet.py:127-144``)
map to watermarks + checkpointed exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_session_stats(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    entity_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(entity, session) aggregates over a streaming transcript feed:
    gap-based ``session_window`` sessionization with watermarked late-data
    handling. Equivalent segmentation to the batch ``with_session_ids``
    (a session closes when no turn arrives within ``gap``)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(entity_col, F.session_window(F.col(ts_col), gap).alias("session"))
        .agg(
            F.count("*").alias("n_turns"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
            F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias(
                "assistant_turns"
            ),
            F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).alias("tool_calls"),
        )
        .select(
            entity_col,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_turns",
            "first_ts",
            "last_ts",
            "assistant_turns",
            "tool_calls",
        )
    )


def stream_sessionize_to_sink(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    schema,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """End-to-end streaming job: parquet source → session aggregation →
    exactly-once parquet sink with checkpointed progress (restart resumes
    from the checkpoint — the streaming analog of the batch pipeline's
    manifest resume). ``available_now`` drains existing input then stops
    (used by tests and backfills); production runs pass False."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_path)
    )
    out = stream_session_stats(stream, gap=gap, watermark=watermark)
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
