"""Decompose featurize wall time at a pinned core count: (a) JVM-only
stat projection + local sort (no Python), (b) full featurize (Arrow
boundary + numpy kernel), (c) a hashed-key variant that shrinks the
string column crossing the Arrow boundary.

Usage: taskset -c 0-31 python scripts/profile_featurize.py 32
Input: the bucketed table from scripts/bench_scaling.py (built on
first use). Findings are recorded in BENCH/BASELINE.md.
"""
import sys, time, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scaling import register_bucketed, data_path
from featureengineer_spark import get_spark
from featureengineer_spark.kernels import featurize_fast, FeatureModel

cores = int(sys.argv[1])
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores*2,
                  app_name="fe-profile", extra_conf={"spark.local.dir": "/dev/shm/spark-tmp"})
spark.sparkContext.setLogLevel("ERROR")
t = register_bucketed(spark)
n = t.count()

def timed(name, df, reps=2):
    df.write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"job": name, "sec": round(best,3), "turns_per_sec": round(n/best,1)}), flush=True)
    return best

# (a) JVM-only: the pre-kernel projection + local sort, no Python at all
text = F.coalesce(F.col("text"), F.lit(""))
trimmed = F.trim(text)
pre = t.select(
    "conv_id","turn_idx","ts",
    F.length(text).cast("double").alias("__text_len"),
    F.when(F.length(trimmed)==0, F.lit(0)).otherwise(F.regexp_count(trimmed, F.lit(r"\s+"))+1).cast("double").alias("__n_words"),
    (F.col("role")=="user").cast("double").alias("__is_user"),
    (F.col("role")=="assistant").cast("double").alias("__is_assistant"),
    (F.col("role")=="system").cast("double").alias("__is_system"),
    F.col("tool").isNotNull().cast("double").alias("__tool_notnull"),
).sortWithinPartitions("conv_id","ts","turn_idx")
timed("jvm_scan_sort_only", pre)

# (b) full featurize (string conv_id through Arrow)
timed("featurize_full", featurize_fast(t, clustered=True))

# (c) string-free variant: conv_id replaced by xxhash64 BEFORE the kernel
t_hashed = t.withColumn("conv_id", F.xxhash64("conv_id").cast("string"))
# cast to string keeps kernel contract; to isolate STRING size vs presence:
t_hashed2 = t.withColumn("conv_id", F.xxhash64("conv_id"))
timed("featurize_short_string_key", featurize_fast(t_hashed, clustered=True))
spark.stop()
