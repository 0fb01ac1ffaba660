"""Extra benchmarks for optimization work (guide §1.4): isolates each
expensive operator with the noop sink, times sub-stages, and dumps
``.explain("formatted")`` plans under ``plans/r07/``.

This file is NOT part of the driver's measurement contract (``bench.py``
is frozen); it exists so optimization claims in OPTIMIZATION_r07.md are
reproducible.

Usage:
    python bench_extra.py dedup      # dedup_minhash sub-stage timings
    python bench_extra.py stream     # streaming near-dup gate timings
    python bench_extra.py headline   # per-query noop timings (bench.py set)
    python bench_extra.py plans      # dump explain(formatted) for headline set
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from featureengineer_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _t(spark, label, df, reps=2) -> float:
    spark.sparkContext.setJobDescription(label)
    _noop(df)  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _noop(df)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:45s} {best:8.3f} s")
    spark.sparkContext.setJobDescription(None)
    return best


def big_docs_frame(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return (
        docs.crossJoin(spark.range(4).select(F.col("id").alias("variant")))
        .select(
            (F.col("doc_id") * 4 + F.col("variant")).alias("doc_id"),
            F.when(F.col("variant") == 0, F.col("text"))
            .otherwise(F.concat_ws(" ", "text", F.format_string("v%d", "variant")))
            .alias("text"),
        )
        .repartition(int(CPUS), "doc_id")
        .persist()
    )


def run_dedup(spark):
    from featureengineer_spark.operators.dedup import (
        _banded_rows,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    big_docs = big_docs_frame(spark)
    n = big_docs.count()
    print(f"docs: {n}")
    sig = minhash_signatures(big_docs, num_perm=64)
    _t(spark, "dedup: signatures only", sig)
    banded = _banded_rows(sig, "doc_id", 64, 16, "xxhash64")
    _t(spark, "dedup: banded rows (no minhash col)", banded)
    banded_heavy = _banded_rows(sig, "doc_id", 64, 16, "xxhash64", extra_cols=("minhash",))
    _t(spark, "dedup: banded rows (carrying minhash)", banded_heavy)
    cand = minhash_lsh_candidates(big_docs, num_perm=64, bands=16)
    full = _t(spark, "dedup: full candidates", cand)
    print(f"candidate rows: {cand.count()}")
    big_docs.unpersist()
    return full


def run_stream(spark):
    import shutil
    import tempfile

    from featureengineer_spark.streaming.sessions import stream_dedup_neardup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fix_dir = f"/tmp/fe_bench_neardup_fixture_v1_{SF_DIR.replace('/', '_')}"
    n_stream_files = 4
    if not os.path.exists(fix_dir + "/.done"):
        shutil.rmtree(fix_dir, ignore_errors=True)
        os.makedirs(fix_dir)
        for v in range(n_stream_files):
            (
                docs.select(
                    (F.col("doc_id") * n_stream_files + v).alias("doc_id"),
                    F.when(F.lit(v) == 0, F.col("text"))
                    .otherwise(F.concat_ws(" ", "text", F.lit(f"v{v}")))
                    .alias("text"),
                    (
                        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                        + F.make_interval(mins=F.lit(v), secs=F.col("doc_id") % 60)
                    ).alias("ts"),
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(f"{fix_dir}/b{v}")
            )
            part = [f for f in os.listdir(f"{fix_dir}/b{v}") if f.endswith(".parquet")][0]
            os.rename(f"{fix_dir}/b{v}/{part}", f"{fix_dir}/part-{v:03d}.parquet")
            shutil.rmtree(f"{fix_dir}/b{v}")
            os.utime(f"{fix_dir}/part-{v:03d}.parquet", (1700000000 + v, 1700000000 + v))
        open(fix_dir + "/.done", "w").close()

    def drain() -> float:
        work = tempfile.mkdtemp(prefix="fe_bx_neardup_")
        try:
            t0 = time.perf_counter()
            q = stream_dedup_neardup(
                spark, fix_dir, f"{work}/out", f"{work}/ckpt", f"{work}/store",
                "doc_id long, text string, ts timestamp",
                num_perm=64, bands=16, max_files_per_trigger=1,
            )
            q.awaitTermination(600)
            return time.perf_counter() - t0
        finally:
            shutil.rmtree(work, ignore_errors=True)

    drain()
    best = min(drain(), drain()) / n_stream_files
    print(f"{'stream: per-batch wall':45s} {best:8.3f} s")
    return best


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "dedup"
    spark = get_spark(master=f"local[{CPUS}]", app_name="fe-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    if what == "dedup":
        run_dedup(spark)
    elif what == "stream":
        run_stream(spark)
    else:
        print(f"unknown: {what}")
    spark.stop()


if __name__ == "__main__":
    main()
