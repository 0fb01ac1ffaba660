"""End-to-end web-curation pipeline ladder: the full
`plans.webcurate.web_curation_pipeline` chain (Gopher -> exact dedup ->
paragraph dedup -> MinHash near-dup -> shuffle shards) over synthetic
corpora at growing sizes. The 100 TB property: end-to-end docs/s holds
flat as the corpus grows — every stage is hash-agg / bucket-join
shaped, so there is no super-linear term to surface.

Corpus: deterministic 60-word documents; 20% exact dups, 10% near
variants, 10% share a boilerplate paragraph, 5% fail Gopher — so every
stage does real work at every size.

Usage: python scripts/bench_webcurate.py [sizes_csv]   (default 50000,200000,800000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_docs(spark, n: int):
    from pyspark.sql import functions as F

    base = spark.range(n).select(F.col("id").alias("doc_id"))
    # roles by residue: 0-1 of 10 -> exact dup of doc_id+2; 2 -> near
    # variant of doc_id+1; 3 -> boilerplate carrier; 4 (every 20) ->
    # gopher-fail; else fresh
    r = F.col("doc_id") % 10
    src = (
        F.when(r.isin(0, 1), F.col("doc_id") + 2)
        .otherwise(F.col("doc_id"))
    )
    words = F.transform(
        F.sequence(F.lit(0), F.lit(53)),
        lambda j: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(src, j, F.lit(17)), F.lit(80_000)).cast("string"),
        ),
    )
    body = F.concat(
        F.lit("the and for with this "), F.array_join(words, " ")
    )
    text = (
        F.when(F.col("doc_id") % 20 == 4, F.lit("too short now"))
        .when(r == 2, F.concat(body, F.lit(" tail"), F.col("doc_id").cast("string")))
        .when(
            r == 3,
            F.concat(
                body,
                F.lit("\n\nplease subscribe to our newsletter today thanks"),
            ),
        )
        .otherwise(body)
    )
    return base.select("doc_id", text.alias("text"))


def main() -> None:
    sizes = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [50_000, 200_000, 800_000]
    )
    from featureengineer_spark import get_spark
    from featureengineer_spark.plans.webcurate import (
        WebCurationConfig,
        web_curation_pipeline,
    )

    spark = get_spark(
        master="local[32]", shuffle_partitions=128,
        app_name="webcurate-ladder",
        extra_conf={"spark.local.dir": "/dev/shm/spark-tmp"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = WebCurationConfig(
        gopher=True, paragraph_dedup=True, near_dup=True, shuffle_shards=64
    )
    out = []
    for n in sizes:
        root = f"/tmp/fe_webcurate_ladder_{n}"
        shutil.rmtree(root, ignore_errors=True)
        docs = make_docs(spark, n).persist()
        docs.count()  # materialize the input outside the timed region
        t0 = time.perf_counter()
        kept = web_curation_pipeline(spark, docs, root, cfg).run().count()
        wall = time.perf_counter() - t0
        docs.unpersist()
        row = {
            "docs": n,
            "kept": kept,
            "wall_sec": round(wall, 3),
            "docs_per_sec": round(n / wall, 1),
        }
        out.append(row)
        print("RUNG_JSON:" + json.dumps(row))
    print("LADDER_JSON:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
