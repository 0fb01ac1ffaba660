"""Data-size scaling ladder: the same two jobs (featurize, window stack)
at three input sizes on local[32]. At 100 TB what matters is that
per-turn cost stays flat as the data grows (linear scaling in DATA SIZE,
complementing bench_scaling.py's scaling in CORES) — a flat turns/s
column here means the plans have no super-linear term (no growing
shuffle, no driver-side accumulation).

Each size is a bucketed table (the production layout); each measurement
is a fresh JVM (subprocess) with warm + best-of-2, noop sink.

Usage:
    python scripts/bench_scale_ladder.py            # orchestrate
    python scripts/bench_scale_ladder.py --run N    # child
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (n_convs, mega, mega_len, n_buckets, driver_mem) —
# ~1.6M / ~14.7M / ~55M / ~110M / ~250M / ~534M turns.
# Bucket count rises with the rung so per-bucket (= per-task, since
# bucketed scans never split a file mid-conversation) row counts stay
# bounded — on a real cluster this is "more files per partition", not a
# plan change; in one local JVM it is what keeps 32 concurrent tasks'
# columnar batches inside the heap (see the 246M-rung note in LADDER.md).
SIZES = [
    (60_000, 3, 100_000, 256, "100g"),
    (600_000, 6, 200_000, 256, "100g"),
    (2_400_000, 6, 200_000, 256, "100g"),
    (4_800_000, 8, 250_000, 256, "100g"),
    (10_800_000, 10, 300_000, 256, "100g"),
    (21_600_000, 12, 400_000, 1024, "64g"),
]
REPS = 2


def data_path(n_convs: int, mega: int, mega_len: int) -> str:
    return f"/tmp/fe_ladder_c{n_convs}_m{mega}x{mega_len}.parquet"


def ensure_input(n_convs: int, mega: int, mega_len: int, n_buckets: int, _mem: str) -> None:
    path = data_path(n_convs, mega, mega_len)
    if os.path.exists(path + "/_SUCCESS"):
        return
    from featureengineer_spark import get_spark
    from featureengineer_spark.data import synth_transcripts_spark

    spark = get_spark(master="local[32]", shuffle_partitions=n_buckets, app_name="ladder-gen")
    spark.sparkContext.setLogLevel("ERROR")
    (
        # partitions=n_buckets keeps each generation task's explode+shuffle
        # buffers bounded as the rung grows (32 source partitions at the
        # 534M rung put ~17M generated rows in one shuffle-write task).
        synth_transcripts_spark(
            spark, n_convs=n_convs, mega=mega, mega_len=mega_len, seed=7,
            partitions=n_buckets,
        )
        .repartition(n_buckets, "conv_id")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "conv_id")
        .sortBy("conv_id", "ts", "turn_idx")
        .option("path", path)
        .saveAsTable(f"ladder_build_{n_convs}")
    )
    spark.stop()


def child(idx: int) -> None:
    n_convs, mega, mega_len, n_buckets, _mem = SIZES[idx]
    path = data_path(n_convs, mega, mega_len)
    from bench import feature_pipeline
    from featureengineer_spark import get_spark
    from featureengineer_spark.kernels import featurize_fast

    spark = get_spark(
        master="local[32]",
        shuffle_partitions=64,
        app_name=f"ladder-{n_convs}",
        extra_conf={"spark.local.dir": "/dev/shm/spark-tmp"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in spark.read.parquet(path).schema.fields
    )
    spark.sql("DROP TABLE IF EXISTS ladder_t")
    spark.sql(
        f"CREATE TABLE ladder_t ({ddl}) USING parquet "
        f"CLUSTERED BY (conv_id) SORTED BY (conv_id, ts, turn_idx) "
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )
    t = spark.table("ladder_t")
    n = t.count()
    results = {}
    for name, job in (
        ("featurize", lambda: featurize_fast(t, clustered=True)),
        ("window_stack", lambda: feature_pipeline(t)),
    ):
        job().write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            job().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        results[name] = {"sec": round(best, 3), "turns_per_sec": round(n / best, 1)}
    print("CHILD_JSON:" + json.dumps({"n_turns": n, "jobs": results}))
    spark.stop()


def orchestrate(only: list[int] | None = None) -> None:
    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    idxs = only if only is not None else list(range(len(SIZES)))
    for idx in idxs:
        ensure_input(*SIZES[idx])
    out = []
    for idx in idxs:
        env = dict(os.environ)
        env.setdefault("SPARK_GRAFT_DRIVER_MEM", SIZES[idx][4])
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", str(idx)],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("CHILD_JSON:")]
        if not line:
            sys.stderr.write(p.stdout + p.stderr)
            raise RuntimeError(f"ladder child {idx} failed")
        out.append(json.loads(line[-1][len("CHILD_JSON:"):]))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        child(int(sys.argv[2]))
    elif len(sys.argv) > 2 and sys.argv[1] == "--only":
        orchestrate([int(x) for x in sys.argv[2].split(",")])
    else:
        orchestrate()
