"""Skewed-anchor as-of bench: plain ``asof_join`` vs ``salted_asof_join``
as mega-conversation size grows, with AQE (incl. skewJoin) enabled.

AQE's skew handling splits skewed SHUFFLE JOIN partitions, but the as-of
join's hot stage is a per-entity WINDOW (union-tag + last(ignorenulls)) —
AQE cannot split a window partition, so one mega-conversation serializes
the stage no matter what AQE does. The salted path chunks each entity by
time range and carries chunk summaries, trading two extra (cheap) passes
for per-chunk parallelism. This script measures both on the same inputs
across mega sizes and documents the crossing point in BENCH/LADDER.md.

Fixture: 200k normal conversations (~4.6M turns) + 4 mega conversations
of ``mega_len`` turns each; anchors = a deterministic 10% hash sample of
all turns (so the megas also carry ~10% of the anchors — the skewed-
anchor shape). Fresh JVM per mega size; warm + best-of-2; noop sink.

Usage:
    python scripts/bench_asof_skew.py          # orchestrate all sizes
    python scripts/bench_asof_skew.py --run N  # child
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEGA_LENS = [50_000, 200_000, 1_000_000, 3_000_000, 10_000_000]
N_CONVS = 200_000
N_MEGA = 4
REPS = 2


def data_path(mega_len: int) -> str:
    return f"/tmp/fe_asof_skew_c{N_CONVS}_m{N_MEGA}x{mega_len}.parquet"


def ensure_input(mega_len: int) -> None:
    path = data_path(mega_len)
    if os.path.exists(path + "/_SUCCESS"):
        return
    from featureengineer_spark import get_spark
    from featureengineer_spark.data import synth_transcripts_spark

    spark = get_spark(master="local[32]", shuffle_partitions=64, app_name="skew-gen")
    spark.sparkContext.setLogLevel("ERROR")
    (
        synth_transcripts_spark(
            spark, n_convs=N_CONVS, mega=N_MEGA, mega_len=mega_len, seed=13
        )
        .repartition(64, "conv_id")
        .write.mode("overwrite")
        .parquet(path)
    )
    spark.stop()


def child(idx: int) -> None:
    from pyspark.sql import functions as F

    from featureengineer_spark import get_spark
    from featureengineer_spark.operators import asof_join
    from featureengineer_spark.operators.asof import salted_asof_join

    mega_len = MEGA_LENS[idx]
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=64,
        app_name=f"skew-{mega_len}",
        extra_conf={"spark.local.dir": "/dev/shm/spark-tmp"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = spark.read.parquet(data_path(mega_len)).select(
        "conv_id", "turn_idx", "ts", "role"
    )
    anchors = t.filter(
        F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(10)) == 0
    ).select("conv_id", F.col("ts").alias("anchor_ts"))
    n_turns, n_anchors = t.count(), anchors.count()

    def timed(job) -> float:
        job().write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            job().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    res = {
        "mega_len": mega_len,
        "n_turns": n_turns,
        "n_anchors": n_anchors,
        "plain_sec": timed(
            lambda: asof_join(t, anchors, value_cols=["turn_idx", "role"])
        ),
        "salted_sec": timed(
            lambda: salted_asof_join(t, anchors, value_cols=["turn_idx", "role"])
        ),
        "plain_fwd_sec": timed(
            lambda: asof_join(
                t, anchors, value_cols=["turn_idx", "role"], direction="forward"
            )
        ),
        "salted_fwd_sec": timed(
            lambda: salted_asof_join(
                t, anchors, value_cols=["turn_idx", "role"], direction="forward"
            )
        ),
    }
    print("CHILD_JSON:" + json.dumps(res))
    spark.stop()


def orchestrate() -> None:
    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    out = []
    for idx, ml in enumerate(MEGA_LENS):
        ensure_input(ml)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", str(idx)],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("CHILD_JSON:")]
        if not line:
            sys.stderr.write(p.stdout + p.stderr)
            raise RuntimeError(f"skew child {idx} failed")
        out.append(json.loads(line[-1][len("CHILD_JSON:"):]))
        print(json.dumps(out[-1]))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        child(int(sys.argv[2]))
    else:
        orchestrate()
