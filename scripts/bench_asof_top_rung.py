"""Forward as-of at the 491M-turn top ladder rung: anchors = 2% hash
sample of all turns; auto-router (megas are 400k turns < 1M threshold,
so this measures the plain forward path at full width)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from featureengineer_spark import get_spark
from featureengineer_spark.operators.asof import asof_join_auto
from pyspark.sql import functions as F

path = "/tmp/fe_ladder_c21600000_m12x400000.parquet"
spark = get_spark(master="local[32]", shuffle_partitions=256,
                  app_name="asof-top-rung",
                  extra_conf={"spark.local.dir": "/dev/shm/spark-tmp"})
spark.sparkContext.setLogLevel("ERROR")
t = spark.read.parquet(path)
anchors = (t.filter(F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(3)), F.lit(50)) == 0)
             .select("conv_id", F.col("ts").alias("anchor_ts")))
out = asof_join_auto(t, anchors, value_cols=["turn_idx", "role"], direction="forward")
t0 = time.perf_counter()
out.write.format("noop").mode("overwrite").save()
w1 = time.perf_counter() - t0
t0 = time.perf_counter()
out.write.format("noop").mode("overwrite").save()
w2 = time.perf_counter() - t0
n_anchors = anchors.count()
print(f"RESULT n_turns=490711640 n_anchors={n_anchors} warm={w1:.1f}s best={min(w1,w2):.1f}s")
spark.stop()
