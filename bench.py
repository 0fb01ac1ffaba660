"""Benchmark harness — one JSON line for the driver.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``, plus the flagship
transcript feature pipeline (window stack + grouped-map featurizer) on a
deterministic synthetic transcript table, reporting end-to-end throughput
in turns/sec (the BASELINE.json metric).

Each query is forced through the noop sink so every column is actually
computed (a bare count() would let Catalyst prune the window projects).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from featureengineer_spark import get_spark  # noqa: E402
from featureengineer_spark.data import synth_transcripts_spark  # noqa: E402
from featureengineer_spark.kernels import featurize_fast  # noqa: E402
from featureengineer_spark.operators import (  # noqa: E402
    with_backfill,
    with_inter_turn_latency,
    with_lags,
    with_rolling_counts,
    with_session_ids,
)
from featureengineer_spark.operators.windows import default_rolling_predicates  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "join_rollup",
    "sessionize",
    "session_stats",
    "rolling_counts",
    "backfill",
    "sliding_norm",
    "asof_purchase_click",
    "cumulative",
]

BENCH_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "60000"))
BENCH_MEGA = 3
BENCH_MEGA_LEN = 100_000


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _best_of(df, reps: int = 2) -> float:
    """Warm once, then best-of-``reps`` wall time — single runs on this
    VM vary 2-3x with outside load; min-of-2 is the cheap stabilizer."""
    _noop(df)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _noop(df)
        best = min(best, time.perf_counter() - t0)
    return best


def _best_of_thunk(fn, reps: int = 2) -> float:
    """_best_of for operators whose CONSTRUCTION does eager work (e.g.
    search_ivf_index's one-job probe assignment): each timed rep rebuilds
    the plan so the honest per-call cost is measured, not just the final
    execute."""
    _noop(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _noop(fn())
        best = min(best, time.perf_counter() - t0)
    return best


BENCH_BUCKETS = 64


def transcripts_path(tmp: str = "/tmp") -> str:
    return f"{tmp}/fe_bench_transcripts_v3b_{BENCH_CONVS}_m{BENCH_MEGA}x{BENCH_MEGA_LEN}.parquet"


def ensure_transcripts(spark) -> tuple[str, int]:
    """Materialize the bench table in the engine's production layout:
    a BUCKETED table (``CLUSTERED BY (conv_id) SORTED BY (conv_id, ts,
    turn_idx) INTO 64 BUCKETS`` — the Iceberg ``bucket(N, conv_id)``
    physical layout). A bucketed scan reports hash partitioning to
    Catalyst, so the whole per-conversation window stack runs with ZERO
    exchanges (only an in-partition sort), and bucket files are never
    split mid-conversation — the invariant ``featurize_fast(
    clustered=True)`` relies on. The files are written once (bucketBy
    writer); each run re-registers the external table (the in-memory
    catalog forgets between sessions)."""
    path = transcripts_path()
    if not os.path.exists(path + "/_SUCCESS"):
        t = synth_transcripts_spark(
            spark, n_convs=BENCH_CONVS, mega=BENCH_MEGA, mega_len=BENCH_MEGA_LEN, seed=7
        )
        (
            t.repartition(BENCH_BUCKETS, "conv_id")
            .write.mode("overwrite")
            .bucketBy(BENCH_BUCKETS, "conv_id")
            .sortBy("conv_id", "ts", "turn_idx")
            .option("path", path)
            .saveAsTable("fe_bench_transcripts_build")
        )
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in spark.read.parquet(path).schema.fields
    )
    spark.sql("DROP TABLE IF EXISTS fe_bench_transcripts")
    spark.sql(
        f"CREATE TABLE fe_bench_transcripts ({ddl}) USING parquet "
        f"CLUSTERED BY (conv_id) SORTED BY (conv_id, ts, turn_idx) "
        f"INTO {BENCH_BUCKETS} BUCKETS LOCATION '{path}'"
    )
    n = spark.table("fe_bench_transcripts").count()
    return path, n


def feature_pipeline(df):
    """The flagship point-in-time window stack (north-rule operators).

    Ends with an explicit projection of the feature columns so Catalyst
    prunes ``text`` out of both the parquet scan and the entity shuffle —
    at 100 TB the raw text never moves unless a downstream consumer asks
    for it.
    """
    df = with_lags(df, ["role"], offsets=(1,))
    df = with_inter_turn_latency(df)
    df = with_session_ids(df, idle_timeout_s=1800.0)
    df = with_rolling_counts(df, default_rolling_predicates(), window=10)
    df = with_backfill(df, "tool")
    return df.select(
        "conv_id", "turn_idx", "ts", "role", "tool",
        "lag1_role", "lead1_role", "inter_turn_latency_s", "session_id",
        "rolling_user_turns_10", "rolling_assistant_turns_10",
        "rolling_tool_calls_10", "tool_backfilled",
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", app_name="fe-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(_best_of(queries[name](spark, sf_dir)), 4)

    # flagship transcript pipeline at bench scale — the bucketed table
    # scan makes the window stack exchange-free (plan-guarded in
    # tests/test_plans.py)
    path, n_turns = ensure_transcripts(spark)
    t = spark.table("fe_bench_transcripts")
    windows_s = _best_of(feature_pipeline(t))
    timings["transcript_window_stack"] = round(windows_s, 4)

    feat_s = _best_of(featurize_fast(t, clustered=True))
    timings["transcript_featurize"] = round(feat_s, 4)

    # flagship as-of join: PIT-attach latest turn features to per-conv
    # anchors (10% of turns sampled deterministically as probes). The
    # feature side is persisted so the timed pass measures the JOIN, not
    # a re-run of featurize (featurize is timed separately above).
    from featureengineer_spark.operators import asof_join

    anchors = t.filter(F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(10)) == 0).select(
        "conv_id", F.col("ts").alias("anchor_ts")
    )
    feats = featurize_fast(t, clustered=True).persist()
    feats.count()  # materialize outside the timed region
    aj = asof_join(feats, anchors, value_cols=["turn_idx", "feature_vec"])
    asof_s = _best_of(aj)
    timings["transcript_asof_join"] = round(asof_s, 4)
    feats.unpersist()

    # model back end: latent-factor extraction throughput (the analog of
    # the reference's i-vector extraction stage, log.txt:648 — 40k+
    # segments in 12,092 s ≈ 3.3 segments/s on the 2018 2-node rig).
    # Stats synthesized JVM-side (deterministic hash arithmetic).
    import numpy as np

    from featureengineer_spark.operators.em import GMM
    from featureengineer_spark.operators.tv import TVModel, extract_latent_factors

    K_MIX, DIM, RANK, N_ENT = 64, 16, 50, 50_000
    rng = np.random.default_rng(11)
    ubm = GMM(
        weights=np.full(K_MIX, 1.0 / K_MIX),
        means=rng.standard_normal((K_MIX, DIM)),
        variances=rng.uniform(0.5, 2.0, (K_MIX, DIM)),
    )
    tv = TVModel(F_mat=rng.standard_normal((K_MIX * DIM, RANK)) * 0.1, ubm=ubm)
    ent = spark.range(N_ENT).select(F.col("id").cast("string").alias("conv_id"))
    stats = ent.select(
        "conv_id",
        F.transform(
            F.sequence(F.lit(1), F.lit(K_MIX)),
            lambda i: (F.pmod(F.xxhash64(F.col("conv_id"), i), F.lit(1000)) / 100.0 + 1.0),
        ).alias("stat0"),
        F.transform(
            F.sequence(F.lit(1), F.lit(K_MIX * DIM)),
            lambda i: (F.pmod(F.xxhash64(i, F.col("conv_id")), F.lit(2000)) / 500.0 - 2.0),
        ).alias("stat1"),
    ).repartition(int(cpus) * 2).persist()
    stats.count()  # materialize the synthetic stats OUTSIDE the timed region
    lat = extract_latent_factors(stats, tv)
    lat_s = _best_of(lat)
    timings["latent_extraction"] = round(lat_s, 4)
    stats.unpersist()

    # LLM-pipeline ops: MinHash-LSH near-dup candidates and IVF ANN search
    # (the dedup/similarity scale paths — a regression here was invisible
    # to the bench before round 4). Inputs synthesized deterministically
    # well past sf0.1's table sizes; corpus materialized OUTSIDE the
    # timed region so the timing is the operator, not the generator.
    from featureengineer_spark.operators.dedup import minhash_lsh_candidates
    from featureengineer_spark.operators.similarity import ann_topk_ivf, train_kmeans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    big_docs = (
        docs.crossJoin(spark.range(4).select(F.col("id").alias("variant")))
        .select(
            (F.col("doc_id") * 4 + F.col("variant")).alias("doc_id"),
            # variant 0 keeps the original text (exact/near dups survive);
            # others perturb the tail so shingle sets drift apart
            F.when(F.col("variant") == 0, F.col("text"))
            .otherwise(F.concat_ws(" ", "text", F.format_string("v%d", "variant")))
            .alias("text"),
        )
        # a single-file read crossJoined with range() yields ONE input
        # partition — which would serialize the whole shingle explode on
        # one core; spread it like any production table layout would
        .repartition(int(cpus), "doc_id")
        .persist()
    )
    n_docs = big_docs.count()
    dedup_s = _best_of(minhash_lsh_candidates(big_docs, num_perm=64, bands=16))
    timings["dedup_minhash"] = round(dedup_s, 4)
    big_docs.unpersist()

    ANN_CORPUS, ANN_QUERIES, ANN_DIM = 100_000, 2_000, 64
    corpus = (
        spark.range(ANN_CORPUS)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(ANN_DIM)),
                lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(2000)) / 500.0 - 2.0),
            ).alias("embedding"),
        )
        .repartition(int(cpus))
        .persist()
    )
    corpus.count()
    qs = corpus.filter(F.col("vec_id") < ANN_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = train_kmeans(
        corpus.select("embedding"), k=64, n_iter=2, vec_col="embedding", seed=5
    )  # quantizer trained once, outside the timed search
    ann = ann_topk_ivf(
        corpus, qs, k=10, n_lists=64, n_probe=3, centroids=cents,
        broadcast_queries=True,
    )
    ann_s = _best_of(ann)
    timings["ann_ivf"] = round(ann_s, 4)

    # persisted-index search (round-6 addition, additive like round 4's):
    # the repeated-search path — index built ONCE on disk (outside the
    # timed region, like any production index build), each timed rep
    # pays the honest per-call cost: the single probe-assignment job plus
    # the partition-pruned store scan + in-list GEMM re-rank.
    from featureengineer_spark.operators.similarity import (
        build_ivf_index,
        search_ivf_index,
    )

    idx_path = f"/tmp/fe_bench_ivf_idx_v1_{ANN_CORPUS}x{ANN_DIM}"
    if not os.path.exists(idx_path + "/_SUCCESS"):
        build_ivf_index(corpus, idx_path, n_lists=64, centroids=cents)
    idx_s = _best_of_thunk(
        lambda: search_ivf_index(spark, idx_path, qs, k=10, n_probe=3)
    )
    timings["ivf_index_search"] = round(idx_s, 4)

    # compressed-domain search (round-6 addition): IVF-PQ index — the
    # store holds m-byte codes instead of d*4-byte floats, search pays
    # the pruned-scan + ADC gather cost. Index built once outside the
    # timed region; same query block and probe budget as the raw-vector
    # paths above so the three ANN rows are directly comparable.
    from featureengineer_spark.operators.pq import (
        build_ivfpq_index,
        search_ivfpq_index,
    )

    pq_path = f"/tmp/fe_bench_ivfpq_idx_v1_{ANN_CORPUS}x{ANN_DIM}"
    if not os.path.exists(pq_path + "/_SUCCESS"):
        build_ivfpq_index(
            corpus, pq_path, n_lists=64, m=8, k=64, kmeans_iter=2,
            pq_iter=3, seed=5,
        )
    pq_s = _best_of_thunk(
        lambda: search_ivfpq_index(spark, pq_path, qs, k_top=10, n_probe=3)
    )
    timings["ivfpq_search"] = round(pq_s, 4)
    corpus.unpersist()

    # streaming near-dup gate (round-6 addition): per-batch wall of the
    # MinHash-band ingest gate on a fixed 4-file fixture (5k docs/file,
    # variant-expanded from the sf documents table). Each timed drain
    # runs 4 micro-batches against fresh checkpoint/output/store dirs;
    # reported value is wall per micro-batch.
    import shutil
    import tempfile

    from featureengineer_spark.streaming.sessions import stream_dedup_neardup

    fix_dir = f"/tmp/fe_bench_neardup_fixture_v1_{sf_dir.replace('/', '_')}"
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

    def drain_neardup() -> float:
        work = tempfile.mkdtemp(prefix="fe_bench_neardup_run_")
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

    drain_neardup()  # warm
    stream_s = min(drain_neardup(), drain_neardup()) / n_stream_files
    timings["stream_neardup_batch"] = round(stream_s, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "cpus": int(cpus),
                "n_turns": n_turns,
                "turns_per_sec_window_stack": round(n_turns / windows_s, 1),
                "turns_per_sec_featurize": round(n_turns / feat_s, 1),
                "entities_per_sec_latent_extraction": round(N_ENT / lat_s, 1),
                "docs_per_sec_dedup_minhash": round(n_docs / dedup_s, 1),
                "ann_queries_per_sec_ivf": round(ANN_QUERIES / ann_s, 1),
                "ann_queries_per_sec_ivf_index": round(ANN_QUERIES / idx_s, 1),
                "ann_queries_per_sec_ivfpq": round(ANN_QUERIES / pq_s, 1),
                "stream_docs_per_sec_neardup": round(n_docs / n_stream_files / stream_s, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
