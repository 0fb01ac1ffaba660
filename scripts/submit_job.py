"""spark-submit entry point: end-to-end feature pipeline.

Usage:
    python -m featureengineer_spark.zip_package  # or use session._package_zip
    spark-submit --master local[8] --py-files /tmp/featureengineer_spark_pkg.zip \
        scripts/submit_job.py <input_parquet> <output_parquet> [idle_timeout_s]

Reads a transcript table, runs sessionization + rolling counts + backfill +
featurize, writes features to parquet. The package arrives on executors via
--py-files (get_spark's addPyFile covers interactive use; this script is the
cluster-submission path the north rule names).
"""

import sys

from pyspark.sql import SparkSession

from featureengineer_spark.kernels import featurize_fast
from featureengineer_spark.operators import (
    with_backfill,
    with_inter_turn_latency,
    with_lags,
    with_rolling_counts,
    with_session_ids,
)
from featureengineer_spark.operators.windows import default_rolling_predicates


def main() -> None:
    inp, out = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 1800.0
    spark = SparkSession.builder.appName("fe-submit").getOrCreate()
    t = spark.read.parquet(inp)
    df = with_lags(t, ["role"], offsets=(1,))
    df = with_inter_turn_latency(df)
    df = with_session_ids(df, idle_timeout_s=timeout)
    df = with_rolling_counts(df, default_rolling_predicates(), window=10)
    df = with_backfill(df, "tool")
    df.select(
        "conv_id", "turn_idx", "ts", "session_id", "lag1_role",
        "inter_turn_latency_s", "rolling_user_turns_10",
        "rolling_assistant_turns_10", "rolling_tool_calls_10", "tool_backfilled",
    ).write.mode("overwrite").parquet(out + "/windows")
    featurize_fast(t).write.mode("overwrite").parquet(out + "/features")
    print("WROTE", spark.read.parquet(out + "/features").count())
    spark.stop()


if __name__ == "__main__":
    main()
