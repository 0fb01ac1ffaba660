"""Two-cluster-size scaling with REAL multi-executor topology.

``bench_scaling.py`` evidences N vs 4N with taskset-pinned local[k]
(threads in one JVM). This script runs the same jobs on Spark's
``local-cluster[execs, cores, mem]`` master — separate WORKER JVMs with
their own executors, real serialized shuffle over sockets, the package
zip shipped via addPyFile exactly as ``spark-submit --py-files`` would —
which is the closest a single box gets to the north rule's "N and 4N
executors" criterion:

* N  = local-cluster[1,2,6144]  (1 executor x 2 cores), pinned to 2 CPUs
* 4N = local-cluster[4,2,6144]  (4 executors x 2 cores), pinned to 8 CPUs

Cores per level match bench_scaling.py's primary pair (2 vs 8): this
box's memory bandwidth saturates at ~8 concurrent streams (measured
there), so a 4N level past 8 total cores measures the hardware knee,
not the engine — on a real cluster each extra node brings its own
memory buses.

Same bucketed 14.7M-turn input as bench_scaling.py; fresh driver+workers
per level; warm + best-of-REPS; noop sink. Output appended to
BENCH/BASELINE.md by hand (one JSON line here).

Usage:
    python scripts/bench_cluster_scaling.py            # orchestrate
    python scripts/bench_cluster_scaling.py --run E C  # child: E execs x C cores
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPS = 3
LEVELS = ((1, 2), (4, 2))  # (executors, cores_per_executor): N and 4N
EXEC_MEM_MB = 6144


def child(execs: int, cores: int) -> None:
    from bench import feature_pipeline
    from bench_scaling import register_bucketed

    from featureengineer_spark import get_spark
    from featureengineer_spark.kernels import featurize_fast

    spark = get_spark(
        master=f"local-cluster[{execs},{cores},{EXEC_MEM_MB}]",
        shuffle_partitions=execs * cores * 2,
        app_name=f"fe-cluster-{execs}x{cores}",
        extra_conf={
            "spark.local.dir": "/dev/shm/spark-tmp",
            "spark.executor.memory": f"{EXEC_MEM_MB}m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = register_bucketed(spark)
    n = t.count()

    results = {}
    for name, job in (
        ("featurize", lambda: featurize_fast(t, clustered=True)),
        ("window_stack", lambda: feature_pipeline(t)),
    ):
        job().write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            job().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        results[name] = {"sec": round(best, 3), "turns_per_sec": round(n / best, 1)}
    print(
        "CHILD_JSON:"
        + json.dumps(
            {"executors": execs, "cores_per_exec": cores, "n_turns": n, "jobs": results}
        )
    )
    spark.stop()


def orchestrate() -> None:
    from bench_scaling import ensure_input

    ensure_input()
    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    out = []
    for execs, cores in LEVELS:
        total = execs * cores
        p = subprocess.run(
            ["taskset", "-c", f"0-{total - 1}", sys.executable,
             os.path.abspath(__file__), "--run", str(execs), str(cores)],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("CHILD_JSON:")]
        if not line:
            sys.stderr.write(p.stdout[-4000:] + p.stderr[-4000:])
            raise RuntimeError(f"cluster child {execs}x{cores} failed")
        out.append(json.loads(line[-1][len("CHILD_JSON:"):]))

    lo, hi = out[0], out[-1]
    ratio = hi["executors"] / lo["executors"]
    effs = {
        j: (lo["jobs"][j]["sec"] / hi["jobs"][j]["sec"]) / ratio
        for j in lo["jobs"]
    }
    print(json.dumps({"efficiency_n_to_4n_executors": effs, "detail": out}, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[1] == "--run":
        child(int(sys.argv[2]), int(sys.argv[3]))
    else:
        orchestrate()
