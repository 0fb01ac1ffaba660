"""Incremental near-dup ingest gate at ladder scale: N sequential
batches of synthetic documents (deterministic variant expansion — ~25%
of each batch collides with earlier content), gated against a growing
band store. The 100 TB property under test: per-batch wall stays FLAT
as the store grows, because the gate's cost is banding the NEW batch +
one bucket-equi semi join — never |new| x |seen|.

Each batch runs in the SAME session (the store accumulates as a
persisted frame, as a nightly ingest pipeline would hold it as a
partitioned table). Prints one JSON line per batch and a summary.

Usage: python scripts/bench_neardup_incremental.py [docs_per_batch] [n_batches]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    docs_per_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from pyspark.sql import functions as F

    from featureengineer_spark import get_spark
    from featureengineer_spark.operators.dedup import (
        band_store,
        near_dedup_incremental,
    )

    spark = get_spark(
        master="local[32]", shuffle_partitions=128,
        app_name="neardup-incremental-ladder",
        extra_conf={"spark.local.dir": "/dev/shm/spark-tmp"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def make_batch(b: int):
        """docs_per_batch synthetic docs; 25% are near-variants of docs
        from batch b-1 (suffix-perturbed repeats of the same base text),
        the rest fresh. Pure function of (b, i)."""
        base = spark.range(docs_per_batch).select(
            (F.lit(b) * docs_per_batch + F.col("id")).alias("doc_id"),
            F.col("id").alias("i"),
        )
        is_dup = (F.col("i") % 4 == 0) & (F.lit(b) > 0)
        # a dup row copies the base text of the PREVIOUS batch's doc at
        # i+1 (i+1 % 4 == 1 -> that doc was fresh there, so its words
        # really exist in the store)
        src_batch = F.when(is_dup, F.lit(b) - 1).otherwise(F.lit(b))
        src_i = F.when(is_dup, F.col("i") + 1).otherwise(F.col("i"))
        words = F.transform(
            F.sequence(F.lit(0), F.lit(39)),
            lambda j: F.concat(
                F.lit("w"),
                F.pmod(
                    F.xxhash64(src_batch, src_i, j, F.lit(11)),
                    F.lit(50_000),
                ).cast("string"),
            ),
        )
        text = F.concat(
            F.array_join(words, " "),
            # variants differ only in a short suffix -> near-dup, not exact
            F.when(is_dup, F.concat(F.lit(" tail"), F.col("i").cast("string")))
            .otherwise(F.lit("")),
        )
        return base.select("doc_id", text.alias("text"))

    store = None
    results = []
    for b in range(n_batches):
        batch = make_batch(b).persist()
        batch.count()  # materialize outside the timed region
        t0 = time.perf_counter()
        if store is None:
            empty = spark.createDataFrame(
                [], "doc_id long, band_idx int, band_hash long"
            )
            kept = near_dedup_incremental(batch, empty)
        else:
            kept = near_dedup_incremental(batch, store)
        n_kept = kept.count()
        new_bands = band_store(batch).persist()
        n_store_rows = new_bands.count()
        store = (
            new_bands
            if store is None
            else store.unionByName(new_bands).persist()
        )
        total_store = store.count()
        wall = time.perf_counter() - t0
        batch.unpersist()
        row = {
            "batch": b,
            "docs": docs_per_batch,
            "kept": n_kept,
            "store_rows_total": total_store,
            "wall_sec": round(wall, 3),
            "docs_per_sec": round(docs_per_batch / wall, 1),
        }
        results.append(row)
        print("BATCH_JSON:" + json.dumps(row))
    print(
        "SUMMARY_JSON:"
        + json.dumps(
            {
                "docs_per_batch": docs_per_batch,
                "n_batches": n_batches,
                "walls": [r["wall_sec"] for r in results],
                "flat_ratio_last_vs_first_gated": (
                    round(results[-1]["wall_sec"] / results[1]["wall_sec"], 3)
                    if n_batches > 1
                    else None
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
