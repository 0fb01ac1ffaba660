"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
over the driver's deterministic tables; ``oracle_sql()`` holds the ANSI-SQL
equivalent DuckDB runs on the same parquet. Column names are aliased
identically on both sides (the driver hashes values under sorted column
names). Float-valued aggregates are rounded to 6 dp on BOTH sides so
engine-order summation noise cannot flip the value hash.

The transcript engine's operators are generic over (entity, ts, idx); here
``events(user_id, ts, event_id, event_type, value, props)`` stands in for
the transcript shape (user_id≈conv_id, event_type≈role, event_id≈turn_idx).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from featureengineer_spark.functions.scalars import epoch_seconds
from featureengineer_spark.operators import (
    asof_join,
    with_backfill,
    with_cumulative,
    with_deltas,
    with_group_norm,
    with_inter_turn_latency,
    with_lags,
    with_rolling_counts,
    with_session_ids,
    with_sliding_norm,
)

E = dict(entity_col="user_id", order_cols=("ts", "event_id"))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _r(c, n=6):
    return F.round(c, n)


# ---------------------------------------------------------------- events —
# window / sequence operators (SURVEY.md §2.5)

def q_lag_lead(spark, sf):
    df = with_lags(_t(spark, sf, "events"), ["event_type"], offsets=(1,), **E)
    return df.select("user_id", "event_id", "lag1_event_type", "lead1_event_type")


def q_inter_event_latency(spark, sf):
    df = with_inter_turn_latency(_t(spark, sf, "events"), ts_col="ts", **E)
    return df.select(
        "user_id", "event_id", _r(F.col("inter_turn_latency_s")).alias("latency_s")
    )


def q_rolling_counts(spark, sf):
    df = with_rolling_counts(
        _t(spark, sf, "events"),
        {
            "rolling_purchases_10": F.col("event_type") == "purchase",
            "rolling_errors_10": F.col("event_type") == "error",
        },
        window=10,
        **E,
    )
    return df.select("user_id", "event_id", "rolling_purchases_10", "rolling_errors_10")


def q_sessionize(spark, sf):
    df = with_session_ids(_t(spark, sf, "events"), idle_timeout_s=1800.0, ts_col="ts", **E)
    return df.select("user_id", "event_id", "session_id")


def q_session_stats(spark, sf):
    df = with_session_ids(_t(spark, sf, "events"), idle_timeout_s=1800.0, ts_col="ts", **E)
    return df.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        _r(F.sum("value")).alias("sum_value"),
        _r(epoch_seconds(F.max("ts")) - epoch_seconds(F.min("ts"))).alias("duration_s"),
    )


def q_backfill(spark, sf):
    ev = _t(spark, sf, "events").withColumn(
        "purchase_props",
        F.when(F.col("event_type") == "purchase", F.col("props")),
    )
    df = with_backfill(ev, "purchase_props", out_col="last_purchase_props", **E)
    return df.select("user_id", "event_id", "last_purchase_props")


def q_cumulative(spark, sf):
    df = with_cumulative(
        _t(spark, sf, "events"), {"cum_value": F.col("value")}, **E
    )
    return df.select("user_id", "event_id", _r(F.col("cum_value")).alias("cum_value"))


def q_delta(spark, sf):
    df = with_deltas(_t(spark, sf, "events"), "value", **E)
    return df.select(
        "user_id",
        "event_id",
        _r(F.col("value_delta")).alias("value_delta"),
        _r(F.col("value_delta2")).alias("value_delta2"),
    )


def q_sliding_norm(spark, sf):
    df = with_sliding_norm(_t(spark, sf, "events"), "value", win=21, **E)
    return df.select(
        "user_id", "event_id", _r(F.col("value_slidnorm")).alias("value_norm")
    )


def q_group_norm(spark, sf):
    df = with_group_norm(_t(spark, sf, "events"), ["value"], entity_col="user_id")
    return df.select("user_id", "event_id", _r(F.col("value_cmvn")).alias("value_cmvn"))


def q_group_norm_scaled(spark, sf):
    """The mega-entity form of per-group CMVN (agg + join back, A3) —
    same oracle as group_norm, proving the scale path value-equivalent."""
    from featureengineer_spark.operators.skew import salted_group_norm

    df = salted_group_norm(_t(spark, sf, "events"), ["value"], entity_col="user_id")
    return df.select("user_id", "event_id", _r(F.col("value_cmvn")).alias("value_cmvn"))


def q_asof_purchase_click(spark, sf):
    ev = _t(spark, sf, "events")
    anchors = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("anchor_ts"), F.col("event_id").alias("purchase_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        clicks,
        anchors,
        entity_col="user_id",
        tie_col="event_id",
        value_cols=["event_id", "value"],
        inclusive=False,
    )
    return out.select(
        "user_id",
        "purchase_id",
        F.col("event_id").alias("click_id"),
        _r(F.col("value")).alias("click_value"),
    )


def q_asof_next_purchase(spark, sf):
    """FORWARD as-of (next-event label join): for each click anchor, the
    EARLIEST purchase with ts >= click ts (ties by lowest event_id) — the
    label-construction mirror of asof_purchase_click. DuckDB replays it
    as a ranked forward join."""
    ev = _t(spark, sf, "events")
    anchors = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("anchor_ts"), F.col("event_id").alias("click_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        purchases,
        anchors,
        entity_col="user_id",
        tie_col="event_id",
        value_cols=["event_id", "value"],
        direction="forward",
    )
    return out.select(
        "user_id",
        "click_id",
        F.col("event_id").alias("purchase_id"),
        _r(F.col("value")).alias("purchase_value"),
    )


def q_topk_events(spark, sf):
    ev = _t(spark, sf, "events")
    return (
        ev.orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(20)
        .select("event_id", "user_id", _r(F.col("value")).alias("value"))
    )


# ------------------------------------------------------- lineitem/orders —
# relational operators (SURVEY.md §2.2-2.4, 2.6-2.7)

def q_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity")).alias("sum_qty"),
            _r(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_price"),
            _r(F.avg("l_quantity")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_join_rollup(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .groupBy("n_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            _r(F.sum("o_totalprice")).alias("total_price"),
        )
    )


def q_anti_join(spark, sf):
    # customers with no high-value order — the expected-vs-produced audit
    # pattern (FeaGet.py:116-131): expected list anti-joined on results
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def q_dedup_keep_min(spark, sf):
    o = _t(spark, sf, "orders")
    return o.groupBy("o_custkey").agg(F.min("o_orderkey").alias("first_orderkey"))


def q_union_distinct(spark, sf):
    o = _t(spark, sf, "orders")
    hi = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return hi.unionByName(urgent).distinct()


def q_filters(spark, sf):
    p = _t(spark, sf, "part")
    return (
        p.filter(F.col("p_type").rlike("ECONOMY|PROMO"))
        .filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .filter(F.col("p_size") >= 10)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"), _r(F.avg("p_retailprice")).alias("avg_price"))
    )


def q_left_join(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer").filter(F.col("c_acctbal") > 5000)
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_custkey", "c_name",
        _r(F.col("c_acctbal")).alias("c_acctbal"),
    )


def q_except_all(spark, sf):
    o = _t(spark, sf, "orders")
    hi = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return hi.exceptAll(urgent)


def q_count_distinct(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


def q_top1_per_user(spark, sf):
    from pyspark.sql.window import Window

    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", _r(F.col("value")).alias("value"))
    )


def q_deterministic_crop(spark, sf):
    from featureengineer_spark.operators.windows import with_deterministic_crop

    # W7 graft with an arithmetic offset both engines can compute:
    # offset = (user_id * 2654435761) % (n - k + 1)
    from pyspark.sql.window import Window

    ev = _t(spark, sf, "events")
    k = 5
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wc = Window.partitionBy("user_id")
    rn = F.row_number().over(w)
    n = F.count("*").over(wc)
    span = F.greatest(n - k + 1, F.lit(1)).cast("long")
    off = F.pmod(F.col("user_id") * F.lit(2654435761), span)
    return (
        ev.withColumn("__rn", rn)
        .withColumn("__off", off)
        .filter((F.col("__rn") > F.col("__off")) & (F.col("__rn") <= F.col("__off") + k))
        .select("user_id", "event_id")
    )


# ------------------------------------------------- documents/embeddings —
# training-data pipeline operators (dedup / similarity / text analysis)

def q_doc_token_stats(spark, sf):
    from featureengineer_spark.operators.textstats import with_token_counts

    return with_token_counts(_t(spark, sf, "documents")).select(
        "doc_id", "n_chars_computed", "n_ws_tokens", "n_bpe_tokens"
    )


def q_doc_quality(spark, sf):
    from featureengineer_spark.operators.textstats import with_quality_score

    return with_quality_score(_t(spark, sf, "documents")).select(
        "doc_id", "alpha_ratio", "punct_ratio", "mean_word_len", "quality_score"
    )


def q_doc_lang_id(spark, sf):
    from featureengineer_spark.operators.textstats import with_lang_id

    return with_lang_id(_t(spark, sf, "documents")).select(
        "doc_id", "lang_pred", "lang_hits"
    )


def q_doc_fingerprint(spark, sf):
    from featureengineer_spark.operators.textstats import with_fingerprint

    return with_fingerprint(_t(spark, sf, "documents")).select(
        "doc_id", "fingerprint_md5"
    )


def q_dedup_groups(spark, sf):
    from featureengineer_spark.operators.dedup import normalize_text

    d = _t(spark, sf, "documents")
    return (
        d.select(F.md5(normalize_text(F.col("text"))).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("min_doc_id"))
    )


def q_ngram_jaccard(spark, sf):
    from featureengineer_spark.operators.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(_t(spark, sf, "documents"), n=3, threshold=0.4)
    return out.select("id_a", "id_b", _r(F.col("jaccard")).alias("jaccard"))


def q_ngram_containment(spark, sf):
    """Asymmetric n-gram containment (|A∩B|/|A| per direction) — the
    quote/subset detector Jaccard misses. Same inverted-index + df-cap
    machinery as ngram_jaccard; gate = larger directional containment ≥
    0.6, with both directions and jaccard emitted."""
    from featureengineer_spark.operators.dedup import ngram_containment_pairs

    out = ngram_containment_pairs(
        _t(spark, sf, "documents"), n=3, threshold=0.6
    )
    return out.select(
        "id_a", "id_b",
        _r(F.col("containment_a")).alias("containment_a"),
        _r(F.col("containment_b")).alias("containment_b"),
        _r(F.col("jaccard")).alias("jaccard"),
    )


def q_conv_dedup_convs(spark, sf):
    """Conversation-level exact dedup mapped onto the events stream:
    users whose RENDERED event transcript (event_type: props lines in
    event_id order) is byte-identical dedup to the min user_id; the
    survivors' full turn rows pass. DuckDB replays render→md5→min→semi."""
    from featureengineer_spark.operators.dedup import dedup_conversations

    out = dedup_conversations(
        _t(spark, sf, "events"),
        entity_col="user_id",
        idx_col="event_id",
        role_col="event_type",
        text_col="props",
    )
    return out.select("user_id", "event_id", "event_type")


def q_knn_cosine(spark, sf):
    from featureengineer_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk(emb, q, k=5)
    return out.select(
        "query_id", "neighbor_id", "rank", _r(F.col("cosine")).alias("cosine")
    )


def q_interval_session_lookup(spark, sf):
    # interval form of the PIT join: which session contains each purchase
    from featureengineer_spark.operators.asof import interval_join

    ev = _t(spark, sf, "events")
    sess = with_session_ids(ev, idle_timeout_s=1800.0, ts_col="ts", **E)
    intervals = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("valid_from"),
        (F.max("ts") + F.expr("INTERVAL 1 MICROSECOND")).alias("valid_to"),
    )
    anchors = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("anchor_ts"), F.col("event_id").alias("purchase_id")
    )
    out = interval_join(intervals, anchors, entity_col="user_id")
    return out.select("user_id", "purchase_id", "session_id")


def q_holdout_split(spark, sf):
    from featureengineer_spark.operators.windows import holdout_split

    ev = _t(spark, sf, "events")
    out = holdout_split(ev, entity_col="user_id", order_cols=("ts", "event_id"))
    return out.select("user_id", "event_id", "split")


def q_tumbling_windows(spark, sf):
    # W1 time-window form: 6-hour tumbling aggregation per user (maps to
    # streaming F.window; epoch-aligned in both engines)
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy("user_id", F.window("ts", "6 hours").alias("w"))
        .agg(F.count("*").alias("n_events"), _r(F.sum("value")).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def q_multikey_join(spark, sf):
    li = _t(spark, sf, "lineitem")
    agg = li.groupBy("l_orderkey", "l_suppkey").agg(
        _r(F.sum("l_quantity")).alias("qty")
    )
    return (
        li.join(agg, on=["l_orderkey", "l_suppkey"], how="inner")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"), _r(F.sum("qty")).alias("total_qty"))
    )


def q_right_join(spark, sf):
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 150000)
    c = _t(spark, sf, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "o_orderkey", _r(F.col("o_totalprice")).alias("o_totalprice")
    )


def q_map_lookup(spark, sf):
    # J5/F10 graft: literal map lookup instead of a join
    o = _t(spark, sf, "orders")
    m = F.create_map(
        F.lit("1-URGENT"), F.lit(1), F.lit("2-HIGH"), F.lit(2),
        F.lit("3-MEDIUM"), F.lit(3), F.lit("4-NOT SPECIFIED"), F.lit(4),
        F.lit("5-LOW"), F.lit(5),
    )
    return o.select(
        "o_orderkey", F.coalesce(m[F.col("o_orderpriority")], F.lit(0)).alias("prio_rank")
    )


def q_unpivot_stack(spark, sf):
    # J10 graft: stack two measure columns into long form
    p = _t(spark, sf, "part")
    return p.selectExpr(
        "p_partkey",
        "stack(2, 'size', cast(p_size as double), 'price', p_retailprice) as (metric, value)",
    ).select("p_partkey", "metric", _r(F.col("value")).alias("value"))


def q_global_stats(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.agg(
        _r(F.avg("value")).alias("mean_value"),
        _r(F.var_samp("value")).alias("var_value"),
        F.count("*").alias("n"),
    )


def q_conv_embedding(spark, sf):
    # W9 graft: sequence -> one row per entity (per-conv feature vector)
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        _r(F.avg("value")).alias("mean_value"),
        _r(F.stddev_samp("value")).alias("std_value"),
        _r(F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0))).alias("purchase_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def q_regex_extract(spark, sf):
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", r"^(\d+)-", 1).cast("int").alias("prio_num"),
    )


def q_string_funcs(spark, sf):
    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.upper(F.col("c_name")).alias("name_upper"),
        F.substring(F.col("c_name"), 1, 8).alias("name_prefix"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_nationkey").cast("string")).alias("seg_key"),
        F.length("c_name").alias("name_len"),
    )


def q_null_drop(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer").filter(F.col("c_acctbal") > 5000)
    joined = o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "c_name"
    )
    return joined.na.drop()


def _trial_frames(spark, sf):
    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    )
    enroll = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("enroll_id"), "embedding", F.col("label").alias("e_label")
    )
    test = emb.filter(F.col("vec_id") >= 20).select(
        F.col("vec_id").alias("test_id"), "embedding", F.col("label").alias("t_label")
    )
    trials = (
        enroll.select("enroll_id", "e_label")
        .crossJoin(test.select("test_id", "t_label"))
        .filter((F.col("enroll_id") * 7 + F.col("test_id")) % 5 == 0)
        .select(
            "enroll_id",
            "test_id",
            (F.col("e_label") == F.col("t_label")).alias("is_target"),
        )
    )
    return enroll.drop("e_label"), test.drop("t_label"), trials


def q_trial_scores(spark, sf):
    from featureengineer_spark.operators.scoring import score_trials

    enroll, test, trials = _trial_frames(spark, sf)
    out = score_trials(enroll, test, trials)
    return out.select(
        "enroll_id", "test_id", "is_target", _r(F.col("score")).alias("score")
    )


def q_det_curve(spark, sf):
    from featureengineer_spark.operators.scoring import det_curve, score_trials

    enroll, test, trials = _trial_frames(spark, sf)
    det = det_curve(score_trials(enroll, test, trials))
    return det.select(
        _r(F.col("threshold")).alias("threshold"),
        _r(F.col("miss_rate")).alias("miss_rate"),
        _r(F.col("fa_rate")).alias("fa_rate"),
    )


def _deterministic_emb(spark, sf):
    """Embeddings input under the bit-determinism contract: explicit
    ``repartition(4, conv_id)`` (hash assignment is a pure function of the
    key; the explicit numPartitions blocks AQE coalescing) + a local sort
    on a unique key fixes per-task row order, so every per-task float
    accumulation in the training chain folds in the same order regardless
    of the session's shuffle/parallelism config. Combined with the
    pid-sorted reduce in ``em._stable_sum``, the trained model becomes a
    pure function of (input file, seed) — which is what lets
    trained-model outputs be value-checked against literals captured once
    by ``scripts/capture_trained_models.py``."""
    return (
        _t(spark, sf, "embeddings")
        .select(
            F.col("vec_id"),
            F.col("label").cast("string").alias("conv_id"),
            F.col("embedding").cast("array<double>").alias("feature_vec"),
        )
        .repartition(4, "conv_id")
        .sortWithinPartitions("conv_id", "vec_id")
        .drop("vec_id")
    )


def q_gmm_suff_stats(spark, sf):
    """Distributed GMM EM + per-entity sufficient statistics (UBM graft).

    The training chain is bit-deterministic (``_deterministic_emb`` +
    pid-sorted partial reduce), so the TRAINED model is reproducible and
    the DuckDB oracle re-derives the E-step from literal trained-model
    coefficients captured by ``scripts/capture_trained_models.py`` —
    value-level check of the full train→stats pipeline. Long-form output
    like ``gmm_suff_stats_fixed``."""
    from featureengineer_spark.operators.em import sufficient_stats, train_gmm

    emb = _deterministic_emb(spark, sf)
    model = train_gmm(emb, n_components=3, n_iter=2, seed=3)
    d = model.means.shape[1]
    stats = sufficient_stats(emb, model)
    comp = (F.col("idx") / d).cast("int")
    return stats.select(
        "conv_id", "stat0", F.posexplode("stat1").alias("idx", "s1")
    ).select(
        "conv_id",
        comp.alias("comp"),
        F.pmod(F.col("idx"), F.lit(d)).cast("int").alias("dim0"),
        _r(F.element_at("stat0", comp + 1)).alias("stat0"),
        _r(F.col("s1")).alias("s1"),
    )


def _fixed_gmm_params(k: int = 3, d: int = 64, seed: int = 5):
    """Deterministic seed-derived diagonal GMM shared by
    ``q_gmm_suff_stats_fixed`` and its oracle builder — no EM, so the
    E-step arithmetic itself becomes SQL-expressible."""
    import numpy as np

    rng = np.random.default_rng(seed)
    w = np.full(k, 1.0 / k)
    means = rng.standard_normal((k, d)) * 0.5
    variances = rng.uniform(0.5, 2.0, (k, d))
    return w, means, variances


def q_gmm_suff_stats_fixed(spark, sf):
    """Per-entity sufficient statistics under a FIXED seed-derived GMM:
    verifies the distributed E-step kernel (responsibilities → stat0 /
    stat1 with in-batch per-entity reduceat pre-aggregation) at value
    level — the DuckDB oracle recomputes the softmax responsibilities
    from literal model coefficients. (EM *training* stays pytest-gated;
    `gmm_suff_stats` keeps the trained-model rows-only variant.)
    Long-form output: one row per (entity, component, dimension)."""
    from featureengineer_spark.operators.em import GMM, sufficient_stats

    w, mu, var = _fixed_gmm_params()
    model = GMM(weights=w, means=mu, variances=var)
    d = mu.shape[1]
    emb = _t(spark, sf, "embeddings").select(
        F.col("label").cast("string").alias("conv_id"),
        F.col("embedding").cast("array<double>").alias("feature_vec"),
    )
    stats = sufficient_stats(emb, model)
    comp = (F.col("idx") / d).cast("int")
    return stats.select(
        "conv_id", "stat0", F.posexplode("stat1").alias("idx", "s1")
    ).select(
        "conv_id",
        comp.alias("comp"),
        F.pmod(F.col("idx"), F.lit(d)).cast("int").alias("dim0"),
        _r(F.element_at("stat0", comp + 1)).alias("stat0"),
        _r(F.col("s1")).alias("s1"),
    )


def q_latent_factors_fixed(spark, sf):
    """Per-entity latent factor under a FIXED seed-derived rank-1 TV
    matrix over the fixed GMM's sufficient stats: at rank 1 the posterior
    solve Λw = Tᵀs̃₁ is scalar division, so the whole extraction kernel
    (fused whitening + batched posterior) is re-derived in DuckDB at
    value level. (Rank>1 training/extraction stays pytest- and
    rows-only-gated in `latent_factors`.)"""
    import numpy as np

    from featureengineer_spark.operators.em import GMM, sufficient_stats
    from featureengineer_spark.operators.tv import TVModel, extract_latent_factors

    w, mu, var = _fixed_gmm_params()
    model = GMM(weights=w, means=mu, variances=var)
    emb = _t(spark, sf, "embeddings").select(
        F.col("label").cast("string").alias("conv_id"),
        F.col("embedding").cast("array<double>").alias("feature_vec"),
    )
    stats = sufficient_stats(emb, model)
    rng = np.random.default_rng(9)
    f_mat = rng.standard_normal((mu.size, 1)) * 0.3
    tv = TVModel(F_mat=f_mat, ubm=model)
    lat = extract_latent_factors(stats, tv)
    return lat.select("conv_id", _r(F.element_at("latent", 1)).alias("w0"))


def q_latent_factors(spark, sf):
    """Full model-training pipeline: UBM EM → per-entity sufficient stats
    → TV-matrix EM → per-entity latent factor (the reference's 5-stage
    i-vector front end, IVector.py:131-244 + mpiIV.py:248-343).

    The chain is bit-deterministic (``_deterministic_emb`` + pid-sorted
    partial reduce + deterministic stats layout before the TV EM), so the
    DuckDB oracle replays the rank-4 extraction from literal trained
    UBM + TV coefficients — the 4×4 posterior solve runs as a generated
    Cramer's-rule expansion. Value-level check of the full five-stage
    train→extract pipeline."""
    from featureengineer_spark.operators.em import sufficient_stats, train_gmm
    from featureengineer_spark.operators.tv import (
        extract_latent_factors,
        train_total_variability,
    )

    emb = _deterministic_emb(spark, sf)
    ubm = train_gmm(emb, n_components=3, n_iter=2, seed=3)
    stats = (
        sufficient_stats(emb, ubm)
        .repartition(2, "conv_id")
        .sortWithinPartitions("conv_id")
    )
    tv = train_total_variability(stats, ubm, rank=4, n_iter=2, seed=7)
    lat = extract_latent_factors(stats, tv)
    return lat.select(
        "conv_id",
        *[_r(F.element_at("latent", i + 1)).alias(f"w{i}") for i in range(4)],
    )


def q_media_features(spark, sf):
    """Multimodal plumbing through the gate: documents' text bytes stand
    in for opaque media payloads (binary column + typed metadata); the
    Arrow-batched decode kernel (deterministic stub: 14 array_split byte-
    chunk means + length + modality code) emits fixed-dim feature
    vectors, flattened to scalar columns so a DuckDB oracle can verify
    every value (payloads are ASCII, so byte == codepoint)."""
    from featureengineer_spark.operators.multimodal import extract_media_features

    docs = _t(spark, sf, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            (F.col("doc_id") % 100 + 1).cast("int").alias("n_frames"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )
    out = extract_media_features(media)
    return out.select(
        "media_id",
        "modality",
        "n_bytes",
        *[
            F.round(F.element_at("feature_vec", i + 1), 6).alias(f"c{i}")
            for i in range(14)
        ],
        F.element_at("feature_vec", 16).alias("mod_code"),
    )


def q_media_features_real(spark, sf):
    """REAL media decode through the gate: deterministic WAV-PCM16
    (doc_id%3==1), binary PGM (doc_id%3==2), and 24-bit bottom-up BMP
    (doc_id%3==0) payloads are synthesized per doc_id, then decoded by
    the pure-numpy RIFF/netpbm/BMP parsers (``real_decode_features``)
    and reduced to the 14 chunk means over the DECODED sample/pixel
    values. The sample formulas are SQL-re-derivable, so the DuckDB
    oracle regenerates the decoded values directly — if any container
    writer↔parser roundtrip were wrong anywhere (including BMP's
    bottom-up row flip and 4-byte stride padding), every chunk mean
    would mismatch. Closes SURVEY §2 S3 for the full pure-numpy
    public-format set."""
    import pandas as pd

    from featureengineer_spark.operators.multimodal import (
        extract_media_features,
        real_decode_features,
        synth_bmp,
        synth_pgm,
        synth_wav_pcm16,
    )

    def _gen(mid):
        out = []
        for m in mid:
            m = int(m)
            if m % 3 == 1:
                out.append(synth_wav_pcm16(m, m % 977 + 10))
            elif m % 3 == 2:
                out.append(synth_pgm(m, m % 37 + 1, m % 23 + 1))
            else:
                out.append(synth_bmp(m, m % 29 + 1, m % 19 + 1))
        return pd.Series(out)

    gen_payload = F.pandas_udf(_gen, "binary")

    media = _t(spark, sf, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("image"))
        .alias("modality"),
        gen_payload(F.col("doc_id")).alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("string").alias("mime"),
        ).alias("meta"),
    )
    out = extract_media_features(media, decode_fn=real_decode_features)
    return out.select(
        "media_id",
        "modality",
        F.element_at("feature_vec", 15).alias("n_values"),
        *[
            F.round(F.element_at("feature_vec", i + 1), 6).alias(f"c{i}")
            for i in range(14)
        ],
        F.element_at("feature_vec", 16).alias("mod_code"),
    )


def q_dedup_clusters(spark, sf):
    """Near-duplicate clusters: connected components (min-label
    propagation) over the n-gram Jaccard pair graph — the step that turns
    pairwise near-dups into canonical groups. DuckDB verifies via a
    recursive-CTE transitive closure."""
    from featureengineer_spark.operators.dedup import (
        near_dup_clusters,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(_t(spark, sf, "documents"), n=3, threshold=0.4)
    return near_dup_clusters(pairs)




def q_doc_redaction(spark, sf):
    """PII-style redaction counts + redacted-text digest: the per-class
    regexp chain (email → URL → IP → long number) replayed in DuckDB
    (RE2 semantics match Java's for these patterns; 'g' flag = Spark's
    replace-all)."""
    from featureengineer_spark.operators.textstats import with_redaction

    out = with_redaction(_t(spark, sf, "documents"))
    return out.select(
        "doc_id",
        "n_redacted_email", "n_redacted_url", "n_redacted_ip", "n_redacted_number",
        F.md5(F.col("text_redacted")).alias("redacted_md5"),
    )


def q_doc_repetition(spark, sf):
    """Intra-document repetition fractions (Gopher-style rep signal):
    1 − distinct/total over word 3-grams and words — list arithmetic
    replayed exactly in DuckDB."""
    from featureengineer_spark.operators.textstats import with_repetition_stats

    out = with_repetition_stats(_t(spark, sf, "documents"), n=3)
    return out.select(
        "doc_id",
        _r(F.col("rep_3gram_frac")).alias("rep_3gram_frac"),
        _r(F.col("rep_word_frac")).alias("rep_word_frac"),
    )


def q_doc_contamination(spark, sf):
    """Benchmark decontamination: corpus docs sharing ≥3 word 8-grams
    with any doc of a held-out "benchmark" slice (doc_id % 17 == 0),
    self-pairs excluded — one shingle equi join, df-capped. DuckDB
    replays the exploded-shingle join."""
    from featureengineer_spark.operators.textstats import contamination_overlap

    docs = _t(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 17 == 0).select(
        F.col("doc_id").alias("bench_doc_id"), "text"
    )
    out = contamination_overlap(
        docs, bench, bench_id_col="bench_doc_id", n=8, min_shared=3
    )
    return out.filter(F.col("corpus_id") != F.col("bench_id")).select(
        "corpus_id", "bench_id", "n_shared_ngrams"
    )



def q_doc_unigram_logprob(spark, sf):
    """Per-document mean unigram log-probability (KenLM-proxy quality
    signal), self-scored against the corpus model — explode, vocab count,
    smoothed log, per-doc mean all replayed in DuckDB."""
    from featureengineer_spark.operators.textstats import with_unigram_logprob

    out = with_unigram_logprob(_t(spark, sf, "documents"))
    return out.select(
        "doc_id",
        _r(F.col("mean_word_logprob")).alias("mean_word_logprob"),
        "n_scored_words",
    )



def q_doc_sample_stratified(spark, sf):
    """Deterministic per-language stratified sample (md5-hash variant so
    DuckDB replays the identical keep set): hash-threshold selection is a
    pure function of (seed, doc_id) — partitioning/rerun invariant."""
    from featureengineer_spark.operators.curation import stratified_sample

    out = stratified_sample(
        _t(spark, sf, "documents"),
        {"en": 0.5, "es": 0.2, "fr": 0.1},
        strata_col="lang",
        seed=7,
        hash_fn="md5",
    )
    return out.select("doc_id", "lang")


def q_doc_pack_sequences(spark, sf):
    """Greedy contiguous sequence packing at a 512-token budget over
    whitespace token counts, deterministic doc_id order — the window
    cumulative sum replayed in DuckDB."""
    from featureengineer_spark.operators.curation import pack_sequences
    from featureengineer_spark.operators.textstats import with_token_counts

    docs = with_token_counts(_t(spark, sf, "documents")).select(
        "doc_id", F.col("n_ws_tokens").alias("n_tokens")
    )
    out = pack_sequences(docs, budget=512)
    return out.select("doc_id", "n_tokens", "seq_idx", "seq_offset")



def q_session_quality(spark, sf):
    """Conversation-quality profile mapped onto the events stream (the
    gate tables' transcript analog): entity=user, turn order=event_id,
    'user'/'assistant' roles = click/purchase — every aggregate (counts,
    alternation violations in the click/purchase subsequence, empty-props
    fraction, mean props length, first-role flag) replayed in DuckDB."""
    from featureengineer_spark.operators.curation import conversation_quality

    out = conversation_quality(
        _t(spark, sf, "events"),
        entity_col="user_id",
        idx_col="event_id",
        role_col="event_type",
        text_col="props",
        user_role="click",
        assistant_role="purchase",
    )
    return out.select(
        "user_id", "n_turns", "n_user_turns", "n_assistant_turns",
        "alternation_violations",
        _r(F.col("empty_text_frac")).alias("empty_text_frac"),
        _r(F.col("mean_turn_chars")).alias("mean_turn_chars"),
        "starts_with_user",
    )


def q_doc_shuffle_shards(spark, sf):
    """Deterministic training shuffle (md5 variant): every document gets
    a shard = pmod(hash(seed,id), 8) and a rank inside the shard by
    (hash, id) — the dataloader permutation as a pure function of
    (seed, id). DuckDB replays the identical hash, shard, and
    row_number."""
    from featureengineer_spark.operators.curation import shuffle_shards

    out = shuffle_shards(
        _t(spark, sf, "documents"), n_shards=8, seed=3, hash_fn="md5"
    )
    return out.select("doc_id", "shard", "shard_pos")


def q_doc_token_mix(spark, sf):
    """Domain-mixture curation by TOKEN budget (md5 variant): per-lang
    char totals → keep fraction min(1, target/total) applied as the
    deterministic hash threshold. DuckDB replays totals, thresholds, and
    the keep predicate exactly (floor on both sides)."""
    from featureengineer_spark.operators.curation import token_budget_mix

    out = token_budget_mix(
        _t(spark, sf, "documents"),
        {"en": 200_000, "es": 80_000},
        domain_col="lang",
        token_col="n_chars",
        seed=11,
        hash_fn="md5",
    )
    return out.select("doc_id", "lang", "n_chars")


def q_doc_quality_quantiles(spark, sf):
    """Per-language exact quantile thresholds of document length — the
    cutoff table a quality-filtering pass consumes. Spark's interpolated
    ``percentile`` is bit-identical to DuckDB's ``quantile_cont``
    (probed: all groups match to the last ulp at sf0.01), so the oracle
    is a direct replay."""
    from featureengineer_spark.operators.textstats import quantile_thresholds

    out = quantile_thresholds(
        _t(spark, sf, "documents"), "n_chars", "lang", qs=(0.1, 0.5, 0.9, 0.99)
    )
    return out.select(
        "lang",
        _r(F.col("q10")).alias("q10"),
        _r(F.col("q50")).alias("q50"),
        _r(F.col("q90")).alias("q90"),
        _r(F.col("q99")).alias("q99"),
    )


def q_doc_chunks(spark, sf):
    """Overlapping context-window chunking (RAG / long-doc prep): chunk i
    covers chars [i·step, i·step+256), step = 256−32; every doc emits at
    least one chunk. DuckDB replays via a lateral generate_series with the
    identical substr arithmetic."""
    from featureengineer_spark.operators.curation import with_chunks

    out = with_chunks(
        _t(spark, sf, "documents"), chunk_chars=256, overlap=32
    )
    return out.select(
        "doc_id", "chunk_idx", "n_chunks", F.md5(F.col("chunk_text")).alias("chunk_md5")
    )


def q_dup_span_extents(spark, sf):
    """ExactSubstr detection (Lee et al. 2022 graft, word-5-gram
    granularity): merged extents of every corpus-duplicated word span —
    one corpus-wide l-gram count agg, per-doc run merge over only the
    duplicated positions, never pairwise. DuckDB replays the identical
    md5 l-gram keys, count filter, lag-based run merge, and slice."""
    from featureengineer_spark.operators.spans import duplicated_span_extents

    out = duplicated_span_extents(_t(spark, sf, "documents"), l=5)
    return out.select(
        "doc_id", "span_start", "span_end", "span_words",
        F.md5(F.col("span_text")).alias("span_md5"),
    )


def q_dup_span_clean(spark, sf):
    """ExactSubstr removal: every word covered by a duplicated 5-gram
    span is dropped from every occurrence (paper semantics — no
    canonical copy kept); the unique remainder is reassembled in order.
    DuckDB replays coverage with a per-word NOT EXISTS over the same
    extents."""
    from featureengineer_spark.operators.spans import drop_duplicated_spans

    out = drop_duplicated_spans(_t(spark, sf, "documents"), l=5)
    return out.select(
        "doc_id", F.md5(F.col("clean_text")).alias("clean_md5"), "removed_words"
    )


def q_html_extract(spark, sf):
    """HTML visible-text extraction + boilerplate stats over a
    deterministically CONSTRUCTED page per document (title from doc_id,
    body from text, one nav anchor from lang, plus script/style/comment
    blocks and entities that must vanish) — the oracle constructs the
    identical page and replays the same regex chain, so the parser is
    checked against an independent reconstruction, the url_canonical
    pattern."""
    from featureengineer_spark.operators.weburl import with_html_stats, with_html_text

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit('<html><head><title>Doc '),
            F.col("doc_id").cast("string"),
            F.lit('</title><style>p{color:red}</style>'
                  '<script>var a = "<b>hi</b>";</script></head>'
                  '<body><!-- boilerplate --><p>'),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit('</p><a href="/nav">'),
            F.coalesce(F.col("lang"), F.lit("xx")),
            F.lit(' link</a>&amp; tail</body></html>'),
        ).alias("html"),
    )
    out = with_html_stats(with_html_text(docs))
    return out.select(
        "doc_id",
        F.md5(F.col("extracted_text")).alias("extracted_md5"),
        _r(F.col("link_density")).alias("link_density"),
        "tag_count",
        _r(F.col("text_ratio")).alias("text_ratio"),
    )


def q_temp_mix(spark, sf):
    """Temperature-based domain mixture (mT5/XLM-R sampler, alpha=0.5)
    over the documents table with n_chars as the token weight: per-lang
    share ∝ share^alpha, capped at one epoch, applied as the md5
    hash-threshold keep — fully replayed in DuckDB including the pow
    normalization."""
    from featureengineer_spark.operators.curation import temperature_mix

    out = temperature_mix(
        _t(spark, sf, "documents"),
        total_tokens=120_000,
        alpha=0.5,
        domain_col="lang",
        token_col="n_chars",
        seed=11,
        hash_fn="md5",
    )
    return out.select("doc_id", "lang", "n_chars")


def q_ppl_buckets(spark, sf):
    """CCNet perplexity bucketing: corpus bigram-LM pseudo-perplexity
    per document, per-lang head/middle/tail split at the (0.33, 0.67)
    perplexity quantiles (exact interpolated percentile — bit-identical
    to DuckDB quantile_cont). Unscorable docs (<2 tokens) get a null
    bucket."""
    from featureengineer_spark.operators.textstats import with_perplexity_buckets

    out = with_perplexity_buckets(_t(spark, sf, "documents"))
    return out.select(
        "doc_id", "lang",
        _r(F.col("perplexity")).alias("perplexity"),
        "ppl_bucket",
    )


def _quality_clf_literals():
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "quality_clf_sf001.json")
    with open(path) as fh:
        return json.load(fh)


def q_quality_clf_scores(spark, sf):
    """fastText-style hashed-ngram logistic quality classifier (the
    discriminative web filter of the published GPT-3/LLaMA/RedPajama
    pipelines), TRAINED AT QUERY TIME — 25 full-batch GD iterations
    whose per-task gradient partials fold bit-deterministically in pid
    order (classifier.py; same contract as the GMM/TV chain) — to
    separate the curated sources src0-src3 from the rest, then scored
    over all documents as a pure expression plan (explode ->
    broadcast weight dim -> per-doc mean -> sigmoid). The oracle
    replays SCORING with the captured literal weights
    (scripts/capture_quality_clf.py), certifying both that training
    reproduces the committed model and that the scoring plan is exact.
    Weights are rounded to 12 decimals on both sides so sub-1e-12
    drift cannot desync them."""
    import numpy as np

    from featureengineer_spark.operators.classifier import (
        score_quality,
        train_quality_classifier,
    )

    docs = _t(spark, sf, "documents")
    labeled = docs.withColumn(
        "__lab",
        F.col("source").isin("src0", "src1", "src2", "src3").cast("int"),
    )
    model = train_quality_classifier(
        labeled, label_col="__lab", n_buckets=512, n_iter=25,
        lr=1.0, l2=1e-4,
    )
    model.weights = np.round(model.weights, 12)
    model.bias = round(float(model.bias), 12)
    out = score_quality(docs, model)
    return out.select(
        "doc_id", "source", _r(F.col("quality_prob")).alias("quality_prob")
    )


def q_pagerank_hosts(spark, sf):
    """Host-graph PageRank quality prior (Common Crawl publishes
    host-level PageRank / harmonic-centrality rankings used as web
    curation signals): a deterministic 997-host multigraph derived
    from event ids (src = id mod 997, dst = (31*id+7) mod 997), 5
    damped power iterations with dangling-mass redistribution. The
    oracle replays the identical iteration UNROLLED as a DuckDB CTE
    chain — the per-round-materialization single-node plan whose
    distribution is the point of the operator."""
    from featureengineer_spark.operators.graphrank import pagerank

    ev = _t(spark, sf, "events")
    edges = ev.select(
        (F.col("event_id") % 997).alias("src"),
        ((F.col("event_id") * 31 + 7) % 997).alias("dst"),
    )
    out = pagerank(edges, n_iter=5)
    return out.select("node", _r(F.col("rank")).alias("rank"))


def _pq_literals():
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "pq_sf001.json")
    with open(path) as fh:
        return json.load(fh)


def q_pq_topk(spark, sf):
    """Product-quantized ANN (Jégou et al. 2011; the FAISS IVF-PQ code
    layout): PQ codebooks TRAINED AT QUERY TIME (m=4 subspaces, k=8
    centroids, 5 distributed Lloyd iterations with pid-sorted
    bit-deterministic partial folds), corpus encoded to 4 small codes
    per vector in one map-only Arrow pass, and the 8 lowest-id
    embeddings searched against the coded corpus by asymmetric distance
    computation (per-partition running top-k, exact global merge). The
    oracle replays encoding + ADC + ranking from codebook literals
    captured by scripts/capture_pq.py (12-dp rounded on both sides)."""
    import numpy as np

    from featureengineer_spark.operators.pq import (
        encode_pq,
        search_pq,
        train_pq,
    )

    emb = _t(spark, sf, "embeddings")
    model = train_pq(emb, vec_col="embedding", m=4, k=8, n_iter=5, seed=0)
    model.centroids = np.round(model.centroids, 12)
    codes = encode_pq(emb, model)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = search_pq(codes, queries, model, k_top=5)
    return out.select(
        "query_id", "rank", "vec_id", _r(F.col("adc_dist")).alias("adc_dist")
    )


def _bpe_literals():
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "trained_bpe_sf001.json")
    with open(path) as fh:
        return json.load(fh)


def q_bpe_pair_counts(spark, sf):
    """BPE trainer round-0 pair statistics (Sennrich et al. 2016): word
    frequencies from ONE corpus agg, then adjacent character-pair counts
    (chars + terminal </w>) weighted by word frequency over the VOCAB
    table — the quantity every merge round argmaxes. DuckDB replays the
    char split + pair explode + weighted sum."""
    from featureengineer_spark.operators.tokenize import (
        pair_counts,
        symbolize,
        word_counts,
    )

    out = pair_counts(symbolize(word_counts(_t(spark, sf, "documents"))))
    return out.select("a", "b", F.col("pcount").cast("long").alias("pcount"))


def q_bpe_encode(spark, sf):
    """BPE encode against the TRAINED tokenizer (24 merges captured as
    literals by scripts/capture_bpe.py — train_bpe is deterministic:
    argmax pair = (max count, lexicographically smallest)). Encoding is
    the broadcast word->segmentation join with character fallback; the
    oracle replays the same literal dimension table."""
    from featureengineer_spark.operators.tokenize import encode_words

    blob = _bpe_literals()
    wt = spark.createDataFrame(
        [(w, s) for w, s in blob["segs"].items()], ["word", "syms"]
    )
    out = encode_words(_t(spark, sf, "documents"), wt)
    return out.select(
        "doc_id",
        F.col("word_idx").cast("int").alias("word_idx"),
        "word",
        F.array_join("tokens", " ").alias("tokens_str"),
        "n_tokens",
    )


def _bpe_encode_oracle_sql() -> str:
    """DuckDB replay of q_bpe_encode: the captured word->segmentation
    dimension as literal VALUES, joined to per-doc word positions, with
    the same char+</w> fallback for words outside the dimension."""
    blob = _bpe_literals()
    rows = ",\n              ".join(
        "('{}', '{}', {})".format(
            w.replace("'", "''"),
            " ".join(s).replace("'", "''"),
            len(s),
        )
        for w, s in blob["segs"].items()
    )
    return rf"""
        WITH seg(word, toks, nt) AS (VALUES
              {rows}),
        w AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS ws
          FROM documents
        ), wp AS (
          SELECT doc_id, g.j - 1 AS word_idx, ws[g.j] AS word
          FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS j) g
          WHERE ws[g.j] != ''
        )
        SELECT wp.doc_id, CAST(wp.word_idx AS INT) AS word_idx, wp.word,
               coalesce(seg.toks,
                        array_to_string(string_split(wp.word, '') || ['</w>'], ' ')) AS tokens_str,
               CAST(coalesce(seg.nt, length(wp.word) + 1) AS INT) AS n_tokens
        FROM wp LEFT JOIN seg USING (word)
    """


def q_conv_render(spark, sf):
    """Conversation → training-text render mapped onto the events stream
    (entity=user, order=event_id, role=event_type, text=props): turns
    concatenated as 'role: text' joined by newline. DuckDB replays it with
    string_agg(... ORDER BY event_id)."""
    from featureengineer_spark.operators.curation import render_conversations

    out = render_conversations(
        _t(spark, sf, "events"),
        entity_col="user_id",
        idx_col="event_id",
        role_col="event_type",
        text_col="props",
    )
    return out.select(
        "user_id", F.md5(F.col("rendered")).alias("rendered_md5"),
        "n_turns", "n_chars",
    )


def q_doc_bigram_logprob(spark, sf):
    """Per-document mean bigram conditional log-probability (the
    conditional KenLM-proxy upgrade of doc_unigram_logprob): add-one
    smoothing over prev-totals + vocab, OOV floors for unseen
    pair/unseen prev, null for sub-2-token docs — the full pair-count /
    prev-total / vocab chain replayed in DuckDB."""
    from featureengineer_spark.operators.textstats import with_bigram_logprob

    out = with_bigram_logprob(_t(spark, sf, "documents"))
    return out.select(
        "doc_id",
        _r(F.col("mean_bigram_logprob")).alias("mean_bigram_logprob"),
        "n_scored_pairs",
    )


def q_time_features(spark, sf):
    """Calendar/cyclic timestamp encodings over the events stream —
    hour/weekday/is_weekend plus (sin, cos) cyclic pairs; weekday pinned
    to the Monday=0 convention in both engines (Spark weekday == DuckDB
    isodow−1)."""
    from featureengineer_spark.operators.windows import with_time_features

    def _rz(c):
        # Signed-zero parity with the frozen oracle: DuckDB's round()
        # keeps the IEEE sign when a tiny negative rounds to zero
        # (cos(18*2pi/24) -> -0.0) while Spark's round() goes through
        # BigDecimal HALF_UP, which has no signed zero and yields +0.0.
        # The driver's value hash distinguishes the two even though they
        # compare numerically equal (the round-6 red driver row), so
        # re-attach the operand's sign on a rounded-to-zero result.
        r = _r(c)
        return F.when((r == 0.0) & (c < 0.0), F.lit(-0.0)).otherwise(r)

    out = with_time_features(_t(spark, sf, "events"))
    return out.select(
        "event_id", "hour", "weekday", "is_weekend",
        _rz(F.col("sin_hour")).alias("sin_hour"),
        _rz(F.col("cos_hour")).alias("cos_hour"),
        _rz(F.col("sin_weekday")).alias("sin_weekday"),
        _rz(F.col("cos_weekday")).alias("cos_weekday"),
    )


def q_conv_dedup_turns(spark, sf):
    """Consecutive-repeat turn cleaning mapped onto the events stream: an
    event drops iff the immediately preceding event of the same user (by
    event_id) has the same type and the same normalized props text — the
    retry/resend artifact filter. DuckDB replays the lag-window
    predicate with the identical normalization chain."""
    from featureengineer_spark.operators.curation import drop_repeated_turns

    out = drop_repeated_turns(
        _t(spark, sf, "events"),
        entity_col="user_id",
        idx_col="event_id",
        role_col="event_type",
        text_col="props",
    )
    return out.select("user_id", "event_id", "event_type")


def q_near_dedup_docs(spark, sf):
    """Terminal near-dup REMOVAL: candidate pairs (n-gram Jaccard) →
    connected components → keep the min-id canonical doc per cluster plus
    all unpaired docs. DuckDB verifies via the recursive-CTE closure +
    anti-join."""
    from featureengineer_spark.operators.dedup import (
        near_dedup_filter,
        ngram_jaccard_pairs,
    )

    docs = _t(spark, sf, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.4)
    kept = near_dedup_filter(docs, pairs)
    return kept.select(
        "doc_id", F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars")
    )


def q_trial_scores_maha_diag(spark, sf):
    """Diagonal-Mahalanobis trial scoring (IVector.py:1345 graft):
    score = −Σⱼ (eⱼ−tⱼ)²/varⱼ with per-dimension population variances —
    every step plain arithmetic, so DuckDB verifies it end to end."""
    import numpy as np

    from featureengineer_spark.operators.scoring import score_trials_mahalanobis

    emb = _t(spark, sf, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("embedding")
    )
    d = 64
    var_row = emb.agg(
        *[F.var_pop(F.col("embedding")[i]).alias(f"v{i}") for i in range(d)]
    ).collect()[0]
    precision = np.diag([1.0 / var_row[f"v{i}"] for i in range(d)])
    enroll, test, trials = _trial_frames(spark, sf)
    out = score_trials_mahalanobis(enroll, test, trials, precision)
    return out.select(
        "enroll_id", "test_id", "is_target", _r(F.col("score")).alias("score")
    )



def _deterministic_labeled_emb(spark, sf):
    """Labeled embeddings under the bit-determinism contract (same idea
    as ``_deterministic_emb``): explicit hash repartition on the label +
    local sort on a unique key, so every per-task float accumulation in
    the LDA/WCCN/PLDA/sphnorm training chain folds in the same order
    under any session config. With ``em._stable_sum``'s pid-sorted
    reduce and ``plda._stable_class_layout``'s pinned class frames, the
    trained models become pure functions of (input file, seed) — so
    their converged parameters can be captured once and embedded as
    DuckDB oracle literals."""
    return (
        _t(spark, sf, "embeddings")
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
            "label",
        )
        .repartition(4, "label")
        .sortWithinPartitions("label", "vec_id")
    )


def q_sphnorm_plda_scores(spark, sf):
    """The reference's PLDA_Score chain (IVector.py:1398-1455): spherical
    nuisance normalization (sphnorm, :1404-1408) then PLDA scoring over
    the normalized vectors. Bit-deterministic training chain → the DuckDB
    oracle replays sphnorm + the pair-LLR quadratic form from captured
    trained-model literals (scripts/capture_trained_models.py)."""
    from featureengineer_spark.operators.scoring import score_trials_plda

    normed, params, model = _trained_sphnorm_plda(spark, sf)
    enroll = normed.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("enroll_id"), "embedding"
    )
    test = normed.filter(F.col("vec_id") >= 20).select(
        F.col("vec_id").alias("test_id"), "embedding"
    )
    _, _, trials = _trial_frames(spark, sf)
    out = score_trials_plda(enroll, test, trials, model)
    return out.select(
        "enroll_id", "test_id", "is_target", _r(F.col("score"), 4).alias("score")
    )



def _trained_plda(spark, sf):
    """Bit-deterministic PLDA training over the contract layout — shared
    by the gate query and the literal-capture script."""
    from featureengineer_spark.operators.plda import train_plda

    emb = _deterministic_labeled_emb(spark, sf)
    return train_plda(
        emb, label_col="label", vec_col="embedding", rank=4, n_iter=3, seed=5
    )


def _trained_sphnorm_plda(spark, sf):
    """sphnorm fit + apply + PLDA training over the normalized vectors —
    shared by the gate query and the literal-capture script. Returns
    (normalized frame, sphnorm params, plda model)."""
    from featureengineer_spark.operators.plda import train_plda
    from featureengineer_spark.operators.whitening import apply_sphnorm, fit_sphnorm

    emb = _deterministic_labeled_emb(spark, sf)
    params = fit_sphnorm(emb, vec_col="embedding", n_iter=2)
    normed = apply_sphnorm(emb, params, vec_col="embedding", out_col="embedding")
    model = train_plda(
        normed, label_col="label", vec_col="embedding", rank=4, n_iter=3, seed=5
    )
    return normed, params, model


def _trained_lda_wccn(spark, sf):
    """LDA + WCCN fits over the contract layout. Returns (mu, proj, L)."""
    from featureengineer_spark.operators.plda import apply_projection, fit_lda, fit_wccn

    emb = _deterministic_labeled_emb(spark, sf)
    mu, proj = fit_lda(emb, label_col="label", vec_col="embedding", n_components=8)
    lda_df = apply_projection(emb, proj, mu, out_col="lda_vec")
    wccn_l = fit_wccn(
        lda_df.select("label", "lda_vec"), label_col="label", vec_col="lda_vec"
    )
    return emb, mu, proj, wccn_l


def _trained_lda_wccn_vectors(spark, sf):
    from featureengineer_spark.operators.plda import apply_projection

    emb, mu, proj, wccn_l = _trained_lda_wccn(spark, sf)
    lda_df = apply_projection(emb, proj, mu, out_col="lda_vec")
    return apply_projection(
        lda_df.select("vec_id", "lda_vec"), wccn_l, vec_col="lda_vec", out_col="embedding"
    ).select("vec_id", "embedding")


def q_min_dcf(spark, sf):
    """Minimum normalized detection cost over the cosine trial scores —
    the reference's cost-weighted operating point (jyh/result.py family).
    Fully SQL-expressible: the DuckDB oracle re-derives the DET frame and
    minimizes the same cost."""
    from featureengineer_spark.operators.scoring import min_dcf, score_trials

    enroll, test, trials = _trial_frames(spark, sf)
    out = min_dcf(
        score_trials(enroll, test, trials), p_target=0.05, c_miss=1.0, c_fa=2.0
    )
    return out.select(_r(F.col("min_dcf")).alias("min_dcf"))


def q_crop_tiled(spark, sf):
    """W7 with short-sequence tiling (DataInteger.py:417-428 graft):
    every user yields exactly `length` rows; users with fewer events
    repeat cyclically. Arithmetic offset (user_id·salt mod span) so the
    oracle can replay it."""
    from featureengineer_spark.operators.windows import with_deterministic_crop

    ev = _t(spark, sf, "events")
    out = with_deterministic_crop(
        ev,
        80,
        entity_col="user_id",
        order_cols=("ts", "event_id"),
        tile=True,
        entity_key=F.col("user_id"),
    )
    return out.select("user_id", "event_id", "crop_pos")


def q_trial_scores_2cov(spark, sf):
    """Two-covariance trial scoring (IVector.py:1371-1394 graft), diagonal
    variant: per-dimension within/between variances estimated from the
    labeled embeddings, pair-LLR quadratic form — every step is plain
    per-dimension arithmetic, so DuckDB can verify it end to end."""
    from featureengineer_spark.operators.plda import fit_two_cov
    from featureengineer_spark.operators.scoring import score_trials_two_cov

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    )
    mu, b_cov, w_cov = fit_two_cov(emb, label_col="label", vec_col="embedding", diag=True)
    enroll, test, trials = _trial_frames(spark, sf)
    out = score_trials_two_cov(enroll, test, trials, mu, b_cov, w_cov)
    return out.select(
        "enroll_id", "test_id", "is_target", _r(F.col("score")).alias("score")
    )


def q_trial_scores_plda(spark, sf):
    """PLDA trial scoring (IVector.py:1398-1455 graft). The EM chain is
    bit-deterministic, so the trained model's (A, B, const) pair-LLR
    coefficients are captured as literals and the oracle re-derives every
    score from the joint-Gaussian block formulation."""
    from featureengineer_spark.operators.scoring import score_trials_plda

    model = _trained_plda(spark, sf)
    enroll, test, trials = _trial_frames(spark, sf)
    out = score_trials_plda(enroll, test, trials, model)
    return out.select(
        "enroll_id", "test_id", "is_target", _r(F.col("score"), 4).alias("score")
    )


def q_lda_wccn_scores(spark, sf):
    """The reference's cosine+LDA+WCCN scoring chain (log.txt:656-660;
    IVector.py:1336-1339, 1508-1511). The scatter/eigensolve chain is
    bit-deterministic, so the effective projection (proj·L)ᵀ is captured
    as literals and the oracle replays projection + cosine per trial."""
    from featureengineer_spark.operators.scoring import score_trials

    final = _trained_lda_wccn_vectors(spark, sf)
    enroll = final.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("enroll_id"), "embedding"
    )
    test = final.filter(F.col("vec_id") >= 20).select(
        F.col("vec_id").alias("test_id"), "embedding"
    )
    _, _, trials = _trial_frames(spark, sf)
    out = score_trials(enroll, test, trials)
    return out.select(
        "enroll_id", "test_id", "is_target", _r(F.col("score"), 4).alias("score")
    )


# rows-only checks (LSH internals use xxhash64 — not reproducible in DuckDB)

def q_minhash_lsh(spark, sf):
    """Banded MinHash-LSH near-dup candidates, md5-hash variant: the md5
    prefix is bit-identical in DuckDB, so the entire shingle → minhash →
    band → bucket-join → jaccard-estimate chain is oracle-checked."""
    from featureengineer_spark.operators.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(
        _t(spark, sf, "documents"), num_perm=64, bands=16, hash_fn="md5"
    ).filter(F.col("est_jaccard") >= 0.5)


def q_simhash_near_dups(spark, sf):
    """SimHash near-dup pairs, md5-hash variant: word hashes, per-bit
    majorities, signature assembly, and the hamming filter are all
    replayed in DuckDB (brute-force pair scan stands in for the engine's
    pigeonhole blocking — identical pair set by construction)."""
    from featureengineer_spark.operators.dedup import simhash_near_dups

    return simhash_near_dups(_t(spark, sf, "documents"), max_hamming=8, hash_fn="md5")


def _fixed_ivf_centroids(n_lists: int = 8, d: int = 64, seed: int = 21):
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_lists, d)) * 0.8


def _fixed_plda_model(d: int = 64, rank: int = 4, seed: int = 33):
    """Seed-derived PLDA model (mean 0, random V, SPD Σ) shared by the
    fixed-model scoring query and its oracle builder."""
    import numpy as np

    rng = np.random.default_rng(seed)
    v = rng.standard_normal((d, rank)) * 0.3
    l_mat = rng.standard_normal((d, d)) * 0.05
    sigma = 0.5 * np.eye(d) + l_mat @ l_mat.T
    return np.zeros(d), v, sigma


def q_plda_scores_fixed(spark, sf):
    """Full-matrix PLDA pair-LLR trial scoring under a FIXED seed-derived
    model: the oracle re-derives the bilinear form INDEPENDENTLY from the
    joint-Gaussian formulation (block inverses + slogdets), so both the
    engine's Schur-based ``llr_matrices`` algebra and the distributed
    bilinear kernel are value-checked. (EM-trained PLDA stays rows-only
    in `trial_scores_plda`.)"""
    import numpy as np

    from featureengineer_spark.operators.plda import PLDAModel
    from featureengineer_spark.operators.scoring import score_trials_plda

    mean, v, sigma = _fixed_plda_model()
    model = PLDAModel(mean=mean, v_mat=v, sigma=sigma)
    enroll, test, trials = _trial_frames(spark, sf)
    out = score_trials_plda(enroll, test, trials, model)
    return out.select(
        "enroll_id", "test_id", "is_target", _r(F.col("score")).alias("score")
    )


def _plda_fixed_oracle_sql(d: int = 64) -> str:
    """Independent DuckDB derivation of the fixed-model PLDA pair LLR:
    score = 0.5·zᵀ(S₀⁻¹−S₁⁻¹)z + 0.5·ln(|S₀|/|S₁|) with
    S₁ = [[Σt,Σb],[Σb,Σt]], S₀ = blockdiag(Σt,Σt) — direct block
    inverses and slogdets in numpy (no reuse of the engine's Schur
    algebra), quadratic forms evaluated long-form in SQL."""
    import numpy as np

    _, v, sigma = _fixed_plda_model(d)
    s_b = v @ v.T
    s_t = s_b + sigma
    s1 = np.block([[s_t, s_b], [s_b, s_t]])
    s0 = np.block([[s_t, np.zeros_like(s_t)], [np.zeros_like(s_t), s_t]])
    w_full = 0.5 * (np.linalg.inv(s0) - np.linalg.inv(s1))
    a_mat = w_full[:d, :d]  # e'Ae + t'At coefficient (symmetric by structure)
    b_mat = w_full[:d, d:]  # cross-term; score adds 2·e'Bt
    const = 0.5 * (np.linalg.slogdet(s0)[1] - np.linalg.slogdet(s1)[1])
    return f"""
            WITH consts AS (
              SELECT {_sql_list(a_mat.ravel())}::DOUBLE[] AS am,
                     {_sql_list(b_mat.ravel())}::DOUBLE[] AS bm
            ), dims AS (SELECT unnest(range(1, {d + 1})) AS j),
            ev AS (
              SELECT vec_id, dims.j, CAST(embedding[dims.j] AS DOUBLE) AS x
              FROM embeddings, dims
            ), labels AS (SELECT vec_id, label FROM embeddings),
            quad AS (  -- x'Ax per vector
              SELECT a.vec_id,
                     sum(a.x * am[(a.j - 1) * {d} + b.j] * b.x) AS q
              FROM ev a JOIN ev b ON b.vec_id = a.vec_id
              CROSS JOIN consts
              GROUP BY a.vec_id
            ), u AS (  -- u(e, j) = sum_i e_i B_ij
              SELECT a.vec_id, dims.j,
                     sum(a.x * bm[(a.j - 1) * {d} + dims.j]) AS uj
              FROM ev a CROSS JOIN dims CROSS JOIN consts
              GROUP BY a.vec_id, dims.j
            ), pairs AS (
              SELECT e.vec_id AS enroll_id, t.vec_id AS test_id,
                     (le.label = lt.label) AS is_target
              FROM embeddings e JOIN embeddings t
                ON e.vec_id < 20 AND t.vec_id >= 20
               AND (e.vec_id * 7 + t.vec_id) % 5 = 0
              JOIN labels le ON le.vec_id = e.vec_id
              JOIN labels lt ON lt.vec_id = t.vec_id
            ), cross_term AS (
              SELECT p.enroll_id, p.test_id,
                     sum(u.uj * tv.x) AS ebt
              FROM pairs p
              JOIN u ON u.vec_id = p.enroll_id
              JOIN ev tv ON tv.vec_id = p.test_id AND tv.j = u.j
              GROUP BY 1, 2
            )
            SELECT p.enroll_id, p.test_id, p.is_target,
                   round(qe.q + qt.q + 2.0 * ct.ebt + ({const!r}), 6) AS score
            FROM pairs p
            JOIN quad qe ON qe.vec_id = p.enroll_id
            JOIN quad qt ON qt.vec_id = p.test_id
            JOIN cross_term ct
              ON ct.enroll_id = p.enroll_id AND ct.test_id = p.test_id
        """


def _fixed_sphnorm_params(d: int = 64, seed: int = 55):
    import numpy as np

    rng = np.random.default_rng(seed)
    return [
        (rng.standard_normal(d) * 0.1, rng.standard_normal((d, d)) * 0.15),
        (rng.standard_normal(d) * 0.1, rng.standard_normal((d, d)) * 0.15),
    ]


def q_sphnorm_fixed(spark, sf):
    """Two-step spherical nuisance normalization under FIXED seed-derived
    (mean, W) parameters: value-checks the shared Arrow whitening
    applicator (y = W(x−μ) + length-norm, chained) that both
    ``apply_sphnorm`` and ``apply_projection`` ride on. (The iterative
    *fitting* stays pytest-gated in `sphnorm_plda_scores`.) Long-form
    output: one row per (vector, dimension)."""
    from featureengineer_spark.operators.whitening import apply_sphnorm

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("feature_vec")
    )
    out = apply_sphnorm(emb, _fixed_sphnorm_params(), vec_col="feature_vec")
    return out.select(
        "vec_id", F.posexplode("feature_vec").alias("dim0", "y")
    ).select("vec_id", "dim0", _r(F.col("y")).alias("y"))


def _sphnorm_fixed_oracle_sql(d: int = 64) -> str:
    """DuckDB replica of the fixed two-step sphnorm chain: per-step
    y = W(x−μ) long-form matmul from literal coefficients, then unit
    length-norm (zero-norm guard → 1), applied twice."""
    params = _fixed_sphnorm_params(d)
    (m1, w1), (m2, w2) = params
    return f"""
            WITH consts AS (
              SELECT {_sql_list(m1)}::DOUBLE[] AS m1,
                     {_sql_list(w1.ravel())}::DOUBLE[] AS w1,
                     {_sql_list(m2)}::DOUBLE[] AS m2,
                     {_sql_list(w2.ravel())}::DOUBLE[] AS w2
            ), dims AS (SELECT unnest(range(1, {d + 1})) AS j),
            x AS (
              SELECT vec_id, dims.j, CAST(embedding[dims.j] AS DOUBLE) AS v
              FROM embeddings, dims
            ), y1 AS (
              SELECT x.vec_id, dims.j,
                     sum((x.v - m1[x.j]) * w1[(dims.j - 1) * {d} + x.j]) AS v
              FROM x CROSS JOIN dims CROSS JOIN consts
              GROUP BY x.vec_id, dims.j
            ), n1 AS (
              SELECT vec_id,
                     CASE WHEN sqrt(sum(v * v)) = 0 THEN 1.0
                          ELSE sqrt(sum(v * v)) END AS nrm
              FROM y1 GROUP BY vec_id
            ), y1n AS (
              SELECT y1.vec_id, y1.j, y1.v / n1.nrm AS v
              FROM y1 JOIN n1 ON n1.vec_id = y1.vec_id
            ), y2 AS (
              SELECT y1n.vec_id, dims.j,
                     sum((y1n.v - m2[y1n.j]) * w2[(dims.j - 1) * {d} + y1n.j]) AS v
              FROM y1n CROSS JOIN dims CROSS JOIN consts
              GROUP BY y1n.vec_id, dims.j
            ), n2 AS (
              SELECT vec_id,
                     CASE WHEN sqrt(sum(v * v)) = 0 THEN 1.0
                          ELSE sqrt(sum(v * v)) END AS nrm
              FROM y2 GROUP BY vec_id
            )
            SELECT y2.vec_id, CAST(y2.j - 1 AS INT) AS dim0,
                   round(y2.v / n2.nrm, 6) AS y
            FROM y2 JOIN n2 ON n2.vec_id = y2.vec_id
        """


def q_emb_near_dups(spark, sf):
    """Embedding-cosine near-duplicate pairs via the default OR-amplified
    hyperplane-LSH path — seed-derived planes let the DuckDB oracle
    replay bucketing + candidate join + exact in-bucket cosine, so the
    scale-default dedup path (not just the brute-force baseline) is
    value-checked."""
    from featureengineer_spark.operators.dedup import embedding_near_dups

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    out = embedding_near_dups(emb, threshold=0.3, n_planes=8, n_tables=6)
    return out.select("id_a", "id_b", _r(F.col("cosine")).alias("cosine"))


def _emb_near_dups_oracle_sql(
    dim: int = 64, n_planes: int = 8, n_tables: int = 6,
    threshold: float = 0.3, seed: int = 42,
) -> str:
    sigs = _hyperplane_sigs_sql(dim, n_planes, n_tables, seed)
    return f"""
            WITH emb AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
              WHERE sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum')) > 0
            ), sigs AS (
              {sigs}
            ), cand AS (
              SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
              FROM sigs a JOIN sigs b
                ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
            )
            SELECT cand.id_a, cand.id_b,
                   round(list_cosine_similarity(ea.v, eb.v), 6) AS cosine
            FROM cand
            JOIN emb ea ON ea.vec_id = cand.id_a
            JOIN emb eb ON eb.vec_id = cand.id_b
            WHERE list_cosine_similarity(ea.v, eb.v) >= {threshold}
        """


def q_ann_ivf_fixed(spark, sf):
    """IVF ANN search with FIXED seed-derived centroids: the coarse
    quantizer assignment (argmin of cn² − 2·x·cᵀ, ties to lowest list),
    n_probe candidate join, and exact cosine re-rank are all replayed in
    DuckDB from literal centroid coefficients — value-checks the whole
    search path. (k-means *training* stays pytest-gated; `ann_ivf` keeps
    the trained-quantizer rows-only variant.)"""
    from featureengineer_spark.operators.similarity import ann_topk_ivf

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann_topk_ivf(
        emb, q, k=5, n_lists=8, n_probe=3, centroids=_fixed_ivf_centroids()
    )
    return out.select(
        "query_id", "neighbor_id", "rank", _r(F.col("cosine")).alias("cosine")
    )


def _ann_ivf_corpus(spark, sf):
    """Embeddings under the bit-determinism layout contract (see
    ``_deterministic_labeled_emb``) — makes the trained k-means quantizer
    reproducible so its centroids can be captured as oracle literals."""
    return (
        _t(spark, sf, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .repartition(4, "vec_id")
        .sortWithinPartitions("vec_id")
    )


def _trained_ivf_centroids(spark, sf):
    from featureengineer_spark.operators.similarity import train_kmeans

    corpus = _ann_ivf_corpus(spark, sf)
    return train_kmeans(
        corpus.select("embedding"), k=16, n_iter=3, vec_col="embedding", seed=0
    )


def q_ann_ivf(spark, sf):
    """IVF ANN: distributed k-means inverted lists + n_probe exact
    re-rank (the scale path alternative to LSH). The Lloyd iterations are
    bit-deterministic under the layout contract, so the trained centroids
    are captured as literals and the DuckDB oracle replays assignment +
    probe + re-rank exactly (recall vs exact additionally pinned by
    tests/test_dedup.py)."""
    from featureengineer_spark.operators.similarity import ann_topk_ivf

    emb = _ann_ivf_corpus(spark, sf)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = _trained_ivf_centroids(spark, sf)
    out = ann_topk_ivf(emb, q, k=5, n_lists=16, n_probe=4, centroids=cents)
    return out.select(
        "query_id", "neighbor_id", "rank", _r(F.col("cosine")).alias("cosine")
    )


def q_ann_lsh(spark, sf):
    """Hyperplane-LSH ANN top-k. The hyperplanes are seed-derived, so the
    DuckDB oracle embeds them as literal coefficients and replays the
    sign-bit bucketing + bucket join + exact cosine re-rank bit-exactly
    (sequential left-fold dot products in both engines)."""
    from featureengineer_spark.operators.similarity import ann_topk_lsh

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann_topk_lsh(emb, q, dim=64, k=5, n_planes=8)
    return out.select(
        "query_id", "neighbor_id", "rank", _r(F.col("cosine")).alias("cosine")
    )


# ------------------------------------------------------------- web URLs —
# URL canonicalization / URL-keyed dedup / domain blocklist
# (operators/weburl.py). The documents table has no URL column, so each
# query synthesizes one deterministically from doc_id: docs 4k..4k+3 get
# four surface variants (clean, uppercase+:443+trailing-slash, tracking
# params, fragment) of the same logical page, hosted on example{k%7}.com.
# The oracle rebuilds the EXPECTED canonical form from the same doc_id
# arithmetic — string construction, not string parsing — so it is an
# independent check of the parser.

_URL_ORACLE_CTE = r"""
            WITH u AS (
              SELECT doc_id, doc_id // 4 AS k,
                     (doc_id // 4) % 7 AS h, doc_id % 4 AS v
              FROM documents
            ), uu AS (
              SELECT doc_id, k, h,
                     CASE v
                       WHEN 0 THEN 'https://www.example' || CAST(h AS VARCHAR) || '.com/p/' || CAST(k AS VARCHAR) || '?id=1&b=2'
                       WHEN 1 THEN 'HTTPS://WWW.EXAMPLE' || CAST(h AS VARCHAR) || '.COM:443/p/' || CAST(k AS VARCHAR) || '/?id=1&b=2'
                       WHEN 2 THEN 'https://www.example' || CAST(h AS VARCHAR) || '.com/p/' || CAST(k AS VARCHAR) || '?b=2&id=1&utm_source=feed&ref=x'
                       ELSE 'https://www.example' || CAST(h AS VARCHAR) || '.com/p/' || CAST(k AS VARCHAR) || '?id=1&b=2#s'
                     END AS url
              FROM u
            )
"""


def _doc_urls(spark, sf):
    """documents → (doc_id, url) with the deterministic synthetic URLs
    described above (pure map; stays in the scan's codegen stage)."""
    d = _t(spark, sf, "documents").select("doc_id")
    k = F.expr("doc_id div 4")
    h = (k % 7).cast("string")
    ks = k.cast("string")
    v = F.col("doc_id") % 4
    base = F.concat(F.lit("https://www.example"), h, F.lit(".com/p/"), ks)
    url = (
        F.when(v == 0, F.concat(base, F.lit("?id=1&b=2")))
        .when(
            v == 1,
            F.concat(
                F.lit("HTTPS://WWW.EXAMPLE"), h, F.lit(".COM:443/p/"), ks,
                F.lit("/?id=1&b=2"),
            ),
        )
        .when(v == 2, F.concat(base, F.lit("?b=2&id=1&utm_source=feed&ref=x")))
        .otherwise(F.concat(base, F.lit("?id=1&b=2#s")))
    )
    return d.withColumn("url", url)


def q_url_canonical(spark, sf):
    """Canonicalize every synthetic URL (lowercase scheme/host, default
    port + fragment + trailing slash stripped, tracking params removed,
    params sorted) and extract the registrable domain. All four surface
    variants of page k must collapse to one canonical string."""
    from featureengineer_spark.operators.weburl import with_canonical_url

    return with_canonical_url(_doc_urls(spark, sf)).select(
        "doc_id", "url", "canonical_url", "domain"
    )


def q_url_dedup_docs(spark, sf):
    """URL-level dedup (the first pass of every web-crawl pipeline):
    keep exactly one doc per canonical URL, earliest doc_id wins."""
    from featureengineer_spark.operators.weburl import url_dedup

    return url_dedup(_doc_urls(spark, sf), url_col="url", id_col="doc_id").select(
        "doc_id", "url"
    )


def q_url_blocklist(spark, sf):
    """Domain-blocklist filter via broadcast anti-join: drop documents
    hosted on example2.com / example5.com."""
    from featureengineer_spark.operators.weburl import filter_blocked_domains

    out = filter_blocked_domains(
        _doc_urls(spark, sf), ["example2.com", "example5.com"], url_col="url"
    )
    return out.select("doc_id")


# -------------------------------------------------- round-6 curation ops —
# Gopher quality rules, paragraph-level dedup, winnowing fingerprints,
# DSIR importance weighting, SemDeDup — each a published curation pass
# (operators/{quality,paragraphs,winnow,dsir,semdedup}.py) with a full
# value-level DuckDB replay.


def q_gopher_flags(spark, sf):
    """Gopher rule filters (Rae et al. 2021, App. A): one boolean per
    rule + the aggregate gate, all in one codegen'd Project over the
    scan. min_words=50 splits this corpus near its median word count, so
    the gate is non-trivial."""
    from featureengineer_spark.operators.quality import with_gopher_flags

    return with_gopher_flags(_t(spark, sf, "documents")).select(
        "doc_id", "r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
        "r_stopwords", "gopher_pass",
    )


def q_paragraph_dedup(spark, sf):
    """Sub-document (paragraph-level) dedup, CCNet/RefinedWeb style:
    16-word blocks over normalized text, keep only the FIRST global
    occurrence of every block, rebuild each doc from its survivors.
    69 duplicated blocks exist at sf0.01, so survivors differ from the
    input. Returns the rebuilt text's md5 so the whole reassembly is
    value-checked without hashing megabytes of text per row twice."""
    from featureengineer_spark.operators.paragraphs import (
        drop_duplicate_paragraphs,
    )

    out = drop_duplicate_paragraphs(
        _t(spark, sf, "documents"), mode="blocks", block_words=16
    )
    return out.select(
        "doc_id", F.md5(F.col("text")).alias("dedup_md5"), "n_paras", "n_kept"
    )


def q_paragraph_boilerplate(spark, sf):
    """Boilerplate census: 8-word blocks occurring more than once
    corpus-wide — (block hash, occurrences, distinct docs, first doc)."""
    from featureengineer_spark.operators.paragraphs import (
        duplicated_paragraph_groups,
        split_paragraphs,
    )

    paras = split_paragraphs(
        _t(spark, sf, "documents"), mode="blocks", block_words=8
    )
    return duplicated_paragraph_groups(paras).select(
        "para_md5", "n_occurrences", "n_docs", "first_doc_id"
    )


def q_winnow_prints(spark, sf):
    """Winnowing (MOSS) fingerprints, k=4-word grams, window w=5: the
    selected (hash, position) set per document — one sliding-window min
    per doc, ~2/(w+1) of the gram hashes kept."""
    from featureengineer_spark.operators.winnow import winnow_fingerprints

    return winnow_fingerprints(_t(spark, sf, "documents"), k=4, w=5)


def q_winnow_pairs(spark, sf):
    """Contiguous-overlap document pairs: ≥2 shared winnowing
    fingerprints (inverted-index equi-join with a max_df hot-hash cap —
    never a cross join)."""
    from featureengineer_spark.operators.winnow import winnow_pairs

    return winnow_pairs(
        _t(spark, sf, "documents"), k=4, w=5, min_shared=2, max_df=64
    )


def q_dsir_weights(spark, sf):
    """DSIR (Xie et al. 2023) log importance weights for every document
    against a src0 target corpus: hashed unigram+bigram multinomials
    (1024 md5 buckets, Laplace α=1), ratio table broadcast, per-doc
    feature-sum. Zero-feature docs carry the (0, 0.0) sentinel."""
    from featureengineer_spark.operators.dsir import dsir_weights

    docs = _t(spark, sf, "documents")
    target = docs.filter(F.col("source") == "src0")
    out = dsir_weights(docs, target)
    return out.select(
        "doc_id", "n_feats", _r(F.col("dsir_logweight")).alias("dsir_logweight")
    )


def q_dsir_topk(spark, sf):
    """Deterministic DSIR selection: the 100 documents most like the
    src0 target corpus (argmax-k of the importance weight, ties to the
    lowest doc_id; empty docs never selected)."""
    from featureengineer_spark.operators.dsir import dsir_select

    docs = _t(spark, sf, "documents")
    out = dsir_select(docs, docs.filter(F.col("source") == "src0"), k=100)
    return out.select(
        "doc_id", "n_feats", _r(F.col("dsir_logweight")).alias("dsir_logweight")
    )


def q_semdedup_verdicts(spark, sf):
    """SemDeDup (Abbas et al. 2023) over the embeddings table: assign to
    the 8 fixed seed-derived centroids (same literal-quantizer rule as
    ann_ivf_fixed), then within each cluster drop any vector ≥ τ=0.4
    cosine-similar to an earlier id (max pair cosine in this corpus is
    0.51, so the gate is non-trivial). Pairwise work never leaves a
    cluster."""
    from featureengineer_spark.operators.semdedup import semdedup

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    out = semdedup(emb, _fixed_ivf_centroids(8, 64), tau=0.4)
    return out.select(
        "vec_id", "cluster_id",
        _r(F.col("max_cos_earlier")).alias("max_cos_earlier"), "kept",
    )


def q_bm25_topk(spark, sf):
    """BM25 top-5 retrieval (Robertson/Okapi, Lucene idf form): the 12
    lowest-id documents act as queries over the full corpus; k1=1.2,
    b=0.75, df band [1, 0.8·N] (this corpus's 31-term vocab is df-heavy,
    so the 0.8 cap still prunes the most common terms). The query-term
    side broadcasts into the df-filtered posting join — the candidate
    space is Σ_t df(t), never |Q|×|C|."""
    from featureengineer_spark.operators.retrieval import bm25_topk

    docs = _t(spark, sf, "documents")
    qs = docs.filter(F.col("doc_id") < 12).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    out = bm25_topk(docs, qs, k=5, max_df_frac=0.8)
    return out.select(
        "query_id", "doc_id", "rank", _r(F.col("score")).alias("score")
    )


def q_bm25_idf(spark, sf):
    """The BM25 idf table for the corpus at df band [1, 0.8·N]:
    (term, df, idf) with the always-positive Lucene formulation
    ln(1 + (N − df + 0.5)/(df + 0.5))."""
    from featureengineer_spark.operators.retrieval import bm25_idf

    out = bm25_idf(_t(spark, sf, "documents"), max_df_frac=0.8)
    return out.select("term", "df", _r(F.col("idf")).alias("idf"))


def q_event_thread_roots(spark, sf):
    """Thread flattening via pointer doubling: a deterministic reply
    forest over the first 65,536 events (blocks of 64, binary-tree
    parent (k−1)//2 within each block, k≡0 the root) is resolved to
    (event_id, root_id, depth) in O(log depth) self-join rounds.
    DuckDB replays the same forest with a RECURSIVE CTE — the
    one-hop-per-pass plan this operator exists to replace at scale."""
    from featureengineer_spark.operators.hierarchy import resolve_roots

    ev = (
        _t(spark, sf, "events")
        .filter(F.col("event_id") < 65536)
        .select("event_id")
    )
    k = F.col("event_id") % 64
    pt = ev.select(
        F.col("event_id").alias("id"),
        F.when(k == 0, F.lit(None).cast("long"))
        .otherwise(
            (
                F.floor(F.col("event_id") / 64) * 64 + F.floor((k - 1) / 2)
            ).cast("long")
        )
        .alias("parent_id"),
    )
    out = resolve_roots(pt, "id", "parent_id", max_iter=8)
    return out.select(F.col("id").alias("event_id"), "root_id", "depth")


def q_corpus_overlap(spark, sf):
    """Pairwise corpus-overlap audit between the document sources:
    Broder MinHash estimate (64 md5-universal-hash slots, the exact
    coefficient family the near-dup gate uses) next to the true
    shingle-set Jaccard — the pre-mixing audit a multi-snapshot corpus
    needs. The estimate path reads |groups| signature rows in the pair
    stage regardless of corpus size; the exact path is the bounded
    verification join."""
    from featureengineer_spark.operators.overlap import corpus_overlap

    out = corpus_overlap(
        _t(spark, sf, "documents"), hash_fn="md5", exact=True
    )
    return out.select(
        "group_a",
        "group_b",
        _r(F.col("est_jaccard")).alias("est_jaccard"),
        _r(F.col("jaccard")).alias("jaccard"),
    )


def q_bloom_gate_flags(spark, sf):
    """Bloom ingest gate verdicts: the first 400 documents' normalized
    texts build a deliberately tight bitmap (m=2048, k=3 — measurable
    false-positive pressure), then every document is probed. True =
    might-contain (all k bits set; every genuinely seen key MUST read
    True — no false negatives), False = definitely new. DuckDB replays
    the md5 double-hash positions and the all-bits-set test exactly, so
    even the false-positive verdicts are value-checked."""
    from featureengineer_spark.operators.bloom import (
        build_bloom,
        with_bloom_flag,
    )
    from featureengineer_spark.operators.dedup import normalize_text

    docs = _t(spark, sf, "documents").select(
        "doc_id", normalize_text(F.col("text")).alias("key")
    )
    bloom = build_bloom(
        docs.filter(F.col("doc_id") < 400), "key", m_bits=2048, k=3
    )
    out = with_bloom_flag(docs, "key", bloom, m_bits=2048, k=3)
    return out.select("doc_id", "might_contain")


def q_doc_weighted_sample(spark, sf):
    """Efraimidis-Spirakis weighted sample without replacement: 50 docs
    drawn with probability proportional to length (weight = n_chars),
    selection a pure function of (seed, doc_id, weight) via the md5
    variant — DuckDB replays the ln(u)/w priorities and picks the
    identical 50 rows in the identical rank order."""
    from featureengineer_spark.operators.curation import weighted_sample

    out = weighted_sample(
        _t(spark, sf, "documents"),
        k=50,
        weight_col="n_chars",
        id_col="doc_id",
        seed=7,
        hash_fn="md5",
    )
    return out.select("doc_id", "n_chars", "sample_rank")


def q_hybrid_rrf(spark, sf):
    """Hybrid retrieval via reciprocal-rank fusion (SIGIR'09): BM25
    top-5 (lexical, over documents.text) and embedding-cosine top-5
    (semantic, over the id-aligned embeddings table) are fused as
    Σ 1/(60+rank) — ranks are the only thing crossing lists, so the
    incomparable BM25/cosine score scales never need calibration.
    DuckDB replays both rankings and the fused order end to end."""
    from featureengineer_spark.operators.retrieval import bm25_topk, rrf_fuse
    from featureengineer_spark.operators.similarity import cosine_topk

    docs = _t(spark, sf, "documents")
    qs = docs.filter(F.col("doc_id") < 12).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    lex = bm25_topk(docs, qs, k=5, max_df_frac=0.8).select(
        "query_id", "doc_id", "rank"
    )
    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    eq = emb.filter(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    sem = cosine_topk(emb, eq, k=5).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    out = rrf_fuse([lex, sem], top_k=8)
    return out.select(
        "query_id",
        "doc_id",
        _r(F.col("rrf_score")).alias("rrf_score"),
        "rrf_rank",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full point-in-time window stack over sf0.001 events."""
    sf = "/root/testdata/sf0.001"
    df = with_lags(_t(spark, sf, "events"), ["event_type"], offsets=(1,), **E)
    df = with_inter_turn_latency(df, ts_col="ts", **E)
    df = with_session_ids(df, idle_timeout_s=1800.0, ts_col="ts", **E)
    df = with_rolling_counts(
        df, {"rolling_purchases_10": F.col("event_type") == "purchase"}, window=10, **E
    )
    return df.select(
        "user_id", "event_id", "ts", "event_type", "lag1_event_type",
        "inter_turn_latency_s", "session_id", "rolling_purchases_10",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Round-6 window ROTATION (see COVERAGE.md): the driver certifies only
    # the first 50 entries. This round BOTH never-certified cohorts move
    # INTO the window: the 11 round-5 additions (doc_shuffle_shards,
    # doc_token_mix, doc_quality_quantiles, asof_next_purchase, doc_chunks,
    # conv_render, conv_dedup_turns, doc_bigram_logprob, ngram_containment,
    # conv_dedup_convs, time_features), the 11 round-6 web-curation
    # additions (url_canonical, url_dedup_docs, url_blocklist,
    # gopher_flags, paragraph_dedup, paragraph_boilerplate, winnow_prints,
    # winnow_pairs, dsir_weights, dsir_topk, semdedup_verdicts), AND the
    # 14 later round-6 additions (bm25_topk, bm25_idf, event_thread_roots,
    # corpus_overlap, bloom_gate_flags, doc_weighted_sample, hybrid_rrf,
    # dup_span_extents, dup_span_clean, bpe_pair_counts, bpe_encode,
    # html_extract, temp_mix, ppl_buckets) — all 36 never-certified
    # queries fit in one window, padded by 14 round-4/5-certified entries
    # (near_dedup_docs..session_quality). Displaced to the tail: 36
    # queries each certified green in 1-5 prior rounds (sliding_norm,
    # group_norm, topk_events, pricing_summary, join_rollup, left_join,
    # holdout_split, multikey_join, right_join, unpivot_stack,
    # global_stats, string_funcs, null_drop, sessionize, session_stats,
    # interval_session_lookup, group_norm_scaled, cumulative, delta,
    # dedup_keep_min, top1_per_user, tumbling_windows, media_features,
    # media_features_real, dedup_clusters, trial_scores_2cov,
    # gmm_suff_stats_fixed, latent_factors_fixed, plda_scores_fixed,
    # sphnorm_fixed, ann_ivf_fixed, trial_scores_maha_diag, crop_tiled,
    # simhash_near_dups, ann_lsh, emb_near_dups). After this round every
    # one of the 111 oracle-backed queries holds a driver-certified row
    # from some round. All 36 window entrants re-verified against their
    # DuckDB oracles under a foreign session config (plain builder,
    # local[16], shuffle=200, AQE) before rotation.
    # scripts/check_oracle.py still value-checks every oracle-backed entry,
    # window or tail.
    return {
        "url_canonical": q_url_canonical,
        "url_dedup_docs": q_url_dedup_docs,
        "url_blocklist": q_url_blocklist,
        "gopher_flags": q_gopher_flags,
        "paragraph_dedup": q_paragraph_dedup,
        "paragraph_boilerplate": q_paragraph_boilerplate,
        "winnow_prints": q_winnow_prints,
        "winnow_pairs": q_winnow_pairs,
        "dsir_weights": q_dsir_weights,
        "dsir_topk": q_dsir_topk,
        "semdedup_verdicts": q_semdedup_verdicts,
        "bm25_topk": q_bm25_topk,
        "bm25_idf": q_bm25_idf,
        "event_thread_roots": q_event_thread_roots,
        "corpus_overlap": q_corpus_overlap,
        "bloom_gate_flags": q_bloom_gate_flags,
        "doc_weighted_sample": q_doc_weighted_sample,
        "hybrid_rrf": q_hybrid_rrf,
        "dup_span_extents": q_dup_span_extents,
        "dup_span_clean": q_dup_span_clean,
        "bpe_pair_counts": q_bpe_pair_counts,
        "bpe_encode": q_bpe_encode,
        "html_extract": q_html_extract,
        "temp_mix": q_temp_mix,
        "ppl_buckets": q_ppl_buckets,
        "quality_clf_scores": q_quality_clf_scores,
        "pagerank_hosts": q_pagerank_hosts,
        "pq_topk": q_pq_topk,
        "near_dedup_docs": q_near_dedup_docs,
        "doc_redaction": q_doc_redaction,
        "doc_repetition": q_doc_repetition,
        "doc_contamination": q_doc_contamination,
        "gmm_suff_stats": q_gmm_suff_stats,
        "latent_factors": q_latent_factors,
        "trial_scores_plda": q_trial_scores_plda,
        "sphnorm_plda_scores": q_sphnorm_plda_scores,
        "lda_wccn_scores": q_lda_wccn_scores,
        "ann_ivf": q_ann_ivf,
        "doc_unigram_logprob": q_doc_unigram_logprob,
        "doc_shuffle_shards": q_doc_shuffle_shards,
        "doc_token_mix": q_doc_token_mix,
        "doc_quality_quantiles": q_doc_quality_quantiles,
        "asof_next_purchase": q_asof_next_purchase,
        "doc_chunks": q_doc_chunks,
        "conv_render": q_conv_render,
        "conv_dedup_turns": q_conv_dedup_turns,
        "doc_bigram_logprob": q_doc_bigram_logprob,
        "ngram_containment": q_ngram_containment,
        "conv_dedup_convs": q_conv_dedup_convs,
        "time_features": q_time_features,
        # --- entries 51+ sit past the driver's 50-query window; every one
        # holds a driver-certified green row from a prior round
        # (CORRECTNESS_r0{1,2,3,4,5}) and stays value-checked each round by
        # scripts/check_oracle.py.
        "doc_sample_stratified": q_doc_sample_stratified,
        "doc_pack_sequences": q_doc_pack_sequences,
        "session_quality": q_session_quality,
        "media_features": q_media_features,
        "media_features_real": q_media_features_real,
        "dedup_clusters": q_dedup_clusters,
        "trial_scores_2cov": q_trial_scores_2cov,
        "gmm_suff_stats_fixed": q_gmm_suff_stats_fixed,
        "latent_factors_fixed": q_latent_factors_fixed,
        "plda_scores_fixed": q_plda_scores_fixed,
        "sphnorm_fixed": q_sphnorm_fixed,
        "ann_ivf_fixed": q_ann_ivf_fixed,
        "trial_scores_maha_diag": q_trial_scores_maha_diag,
        "crop_tiled": q_crop_tiled,
        "simhash_near_dups": q_simhash_near_dups,
        "ann_lsh": q_ann_lsh,
        "emb_near_dups": q_emb_near_dups,
        "inter_event_latency": q_inter_event_latency,
        "union_distinct": q_union_distinct,
        "map_lookup": q_map_lookup,
        "regex_extract": q_regex_extract,
        "lag_lead": q_lag_lead,
        "rolling_counts": q_rolling_counts,
        "filters": q_filters,
        "deterministic_crop": q_deterministic_crop,
        "dedup_groups": q_dedup_groups,
        "ngram_jaccard": q_ngram_jaccard,
        "knn_cosine": q_knn_cosine,
        "trial_scores": q_trial_scores,
        "det_curve": q_det_curve,
        "min_dcf": q_min_dcf,
        "minhash_lsh": q_minhash_lsh,
        "anti_join": q_anti_join,
        "asof_purchase_click": q_asof_purchase_click,
        "backfill": q_backfill,
        "conv_embedding": q_conv_embedding,
        "count_distinct": q_count_distinct,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_lang_id": q_doc_lang_id,
        "doc_quality": q_doc_quality,
        "doc_token_stats": q_doc_token_stats,
        "except_all": q_except_all,
        "sliding_norm": q_sliding_norm,
        "group_norm": q_group_norm,
        "topk_events": q_topk_events,
        "pricing_summary": q_pricing_summary,
        "join_rollup": q_join_rollup,
        "left_join": q_left_join,
        "holdout_split": q_holdout_split,
        "multikey_join": q_multikey_join,
        "right_join": q_right_join,
        "unpivot_stack": q_unpivot_stack,
        "global_stats": q_global_stats,
        "string_funcs": q_string_funcs,
        "null_drop": q_null_drop,
        "sessionize": q_sessionize,
        "session_stats": q_session_stats,
        "interval_session_lookup": q_interval_session_lookup,
        "group_norm_scaled": q_group_norm_scaled,
        "cumulative": q_cumulative,
        "delta": q_delta,
        "dedup_keep_min": q_dedup_keep_min,
        "top1_per_user": q_top1_per_user,
        "tumbling_windows": q_tumbling_windows,
    }


_W = "PARTITION BY user_id ORDER BY ts, event_id"


def _trained_model_params():
    """Literal trained-model coefficients captured once from the
    bit-deterministic sf0.01 training chain by
    ``scripts/capture_trained_models.py`` (see ``_deterministic_emb`` for
    the determinism contract). Returns (w, mu, var, f_mat)."""
    import json
    import os

    import numpy as np

    path = os.path.join(os.path.dirname(__file__), "trained_models_sf001.json")
    with open(path) as fh:
        blob = json.load(fh)
    g = blob["gmm"]
    k, d = g["k"], g["d"]
    w = np.array([float(v) for v in g["weights"]])
    mu = np.array([float(v) for v in g["means"]]).reshape(k, d)
    var = np.array([float(v) for v in g["variances"]]).reshape(k, d)
    f_mat = np.array([float(v) for v in blob["tv"]["f_mat"]]).reshape(
        k * d, blob["tv"]["rank"]
    )
    return w, mu, var, f_mat


def _gmm_stats_core_sql(params=None) -> str:
    """Shared DuckDB CTE chain for a LITERAL-model GMM E-step: per-vector
    softmax responsibilities over literal per-component linear /
    quadratic coefficients (A = μ/σ², B = 1/σ², const folded in numpy),
    yielding CTE ``core`` = UNROUNDED per-(entity, component, dim)
    sufficient statistics (columns conv_id, comp, dim0, stat0, s1).
    ``params=None`` uses the seed-derived fixed model; pass
    ``(w, mu, var)`` to replay the E-step under the TRAINED model."""
    import numpy as np

    w, mu, var = params if params is not None else _fixed_gmm_params()
    k, d = mu.shape
    inv = 1.0 / var
    const = (
        np.log(w)
        - 0.5 * (d * np.log(2 * np.pi) + np.log(var).sum(axis=1))
        - 0.5 * np.einsum("kd,kd,kd->k", mu, mu, inv)
    )
    a = mu * inv

    consts = ", ".join(
        f"{_sql_list(a[c])}::DOUBLE[] AS a{c}, {_sql_list(inv[c])}::DOUBLE[] AS b{c}, "
        f"({const[c]!r}) AS c{c}"
        for c in range(k)
    )
    lg_sums = ", ".join(
        f"c{c} + sum(ev.v * a{c}[ev.j] - 0.5 * ev.v * ev.v * b{c}[ev.j]) AS l{c}"
        for c in range(k)
    )
    exp_sum = " + ".join(f"exp(l{c} - m)" for c in range(k))
    gammas = ", ".join(f"exp(l{c} - m) / ({exp_sum}) AS g{c}" for c in range(k))
    g_case = "CASE comps.c " + " ".join(
        f"WHEN {c} THEN g.g{c}" for c in range(k)
    ) + " END"
    return f"""
            WITH dims AS (SELECT unnest(range(1, {d + 1})) AS j),
            consts AS (SELECT {consts}),
            ev AS (
              SELECT vec_id, label::VARCHAR AS conv_id, dims.j,
                     CAST(embedding[dims.j] AS DOUBLE) AS v
              FROM embeddings, dims
            ), lg AS (
              SELECT ev.vec_id, ev.conv_id, {lg_sums}
              FROM ev CROSS JOIN consts
              GROUP BY ev.vec_id, ev.conv_id, {", ".join(f"c{c}" for c in range(k))}
            ), g AS (
              SELECT vec_id, conv_id, {gammas}
              FROM (SELECT *, greatest({", ".join(f"l{c}" for c in range(k))}) AS m FROM lg)
            ), comps AS (SELECT unnest(range(0, {k})) AS c),
            core AS (
              SELECT ev.conv_id,
                     CAST(comps.c AS INT) AS comp,
                     CAST(ev.j - 1 AS INT) AS dim0,
                     sum({g_case}) AS stat0,
                     sum(({g_case}) * ev.v) AS s1
              FROM ev
              JOIN g ON g.vec_id = ev.vec_id
              CROSS JOIN comps
              GROUP BY 1, 2, 3
            )"""


def _sql_list(vals) -> str:
    return "[" + ", ".join(repr(float(v)) for v in vals) + "]"


def _sql_int_list(vals) -> str:
    return "[" + ", ".join(str(int(v)) for v in vals) + "]"


def _minhash_coeffs():
    from featureengineer_spark.operators.dedup import minhash_perm_coeffs

    return minhash_perm_coeffs(64, 42)


_MINHASH_A, _MINHASH_B = _minhash_coeffs()


def _gmm_stats_oracle_sql() -> str:
    return (
        _gmm_stats_core_sql()
        + """
            SELECT conv_id, comp, dim0,
                   round(stat0, 6) AS stat0, round(s1, 6) AS s1
            FROM core
        """
    )


def _latent_fixed_oracle_sql() -> str:
    """DuckDB replica of rank-1 latent extraction over the fixed-GMM
    stats: s̃₁ = (s₁ − N·μ)/σ per (comp, dim), b = Σ T·s̃₁,
    Λ = 1 + Σ_c N_c·G_c (G_c = Σ_j T²_cj folded in numpy), w = b/Λ."""
    import numpy as np

    w, mu, var = _fixed_gmm_params()
    k, d = mu.shape
    rng = np.random.default_rng(9)
    f_mat = rng.standard_normal((mu.size, 1)) * 0.3
    isig = 1.0 / np.sqrt(var)
    gram = (f_mat.reshape(k, d) ** 2).sum(axis=1)  # (k,)
    g_case = "CASE n0.comp " + " ".join(
        f"WHEN {c} THEN ({gram[c]!r})" for c in range(k)
    ) + " END"
    return (
        _gmm_stats_core_sql()
        + f""",
            tvc AS (
              SELECT {_sql_list(mu.ravel())}::DOUBLE[] AS muf,
                     {_sql_list(isig.ravel())}::DOUBLE[] AS isig,
                     {_sql_list(f_mat.ravel())}::DOUBLE[] AS t
            ), whit AS (
              SELECT core.conv_id,
                     (core.s1 - core.stat0 * muf[core.comp * {d} + core.dim0 + 1])
                       * isig[core.comp * {d} + core.dim0 + 1]
                       * t[core.comp * {d} + core.dim0 + 1] AS term
              FROM core CROSS JOIN tvc
            ), b AS (
              SELECT conv_id, sum(term) AS bb FROM whit GROUP BY conv_id
            ), n0 AS (
              SELECT conv_id, comp, max(stat0) AS nc FROM core GROUP BY 1, 2
            ), lam AS (
              SELECT conv_id, 1.0 + sum(nc * ({g_case})) AS lm
              FROM n0 GROUP BY conv_id
            )
            SELECT b.conv_id, round(b.bb / lam.lm, 6) AS w0
            FROM b JOIN lam ON lam.conv_id = b.conv_id
        """
    )


def _gmm_stats_trained_oracle_sql() -> str:
    """Trained-model twin of ``_gmm_stats_oracle_sql``: the E-step is
    replayed under the LITERAL converged UBM (2 EM iterations, seed 3)
    captured from the bit-deterministic training chain — a value-level
    check of train_gmm → sufficient_stats end to end."""
    w, mu, var, _f = _trained_model_params()
    return (
        _gmm_stats_core_sql((w, mu, var))
        + """
            SELECT conv_id, comp, dim0,
                   round(stat0, 6) AS stat0, round(s1, 6) AS s1
            FROM core
        """
    )


def _det4_sql(m) -> str:
    """Leibniz expansion of a 4×4 determinant over SQL entry expressions
    ``m[i][j]`` — 24 signed products, generated mechanically."""
    from itertools import permutations

    terms = []
    for perm in permutations(range(4)):
        inversions = sum(
            1 for a in range(4) for b in range(a + 1, 4) if perm[a] > perm[b]
        )
        prod = " * ".join(m[i][perm[i]] for i in range(4))
        terms.append(("+ " if inversions % 2 == 0 else "- ") + f"({prod})")
    return "(" + " ".join(terms) + ")"


def _latent_trained_oracle_sql() -> str:
    """Trained-model rank-4 latent extraction replayed in DuckDB: s̃₁ from
    the literal trained UBM, b = Tᵀs̃₁ per rank component, precision
    Λ = I + Σ_c N_c·G_c from literal per-component Gram matrices
    (G_c = T_cᵀT_c folded in numpy — T is already σ-whitened), and the
    4×4 posterior solve Λw = b as a generated Cramer's-rule expansion
    (5 Leibniz determinants). Verifies the full five-stage
    train→stats→TV-EM→extract pipeline at value level."""
    import numpy as np

    w, mu, var, f_mat = _trained_model_params()
    k, d = mu.shape
    r = f_mat.shape[1]
    assert r == 4
    isig = 1.0 / np.sqrt(var)
    fk = f_mat.reshape(k, d, r)
    gram = np.matmul(fk.transpose(0, 2, 1), fk)  # (k, r, r)

    b_terms = ", ".join(
        f"sum((core.s1 - core.stat0 * muf[core.comp * {d} + core.dim0 + 1])"
        f" * isig[core.comp * {d} + core.dim0 + 1]"
        f" * t{i}[core.comp * {d} + core.dim0 + 1]) AS b{i}"
        for i in range(r)
    )
    t_arrays = ", ".join(
        f"{_sql_list(f_mat[:, i])}::DOUBLE[] AS t{i}" for i in range(r)
    )
    lam_cols = ", ".join(
        f"{'1.0' if i == j else '0.0'} + sum(nc * (CASE comp "
        + " ".join(f"WHEN {c} THEN ({gram[c, i, j]!r})" for c in range(k))
        + f" END)) AS l{i}{j}"
        for i in range(r)
        for j in range(r)
    )
    a_mat = [[f"l{i}{j}" for j in range(r)] for i in range(r)]
    det_a = _det4_sql(a_mat)
    w_cols = []
    for i in range(r):
        a_i = [
            [f"b{row}" if col == i else f"l{row}{col}" for col in range(r)]
            for row in range(r)
        ]
        w_cols.append(f"round({_det4_sql(a_i)} / {det_a}, 6) AS w{i}")
    return (
        _gmm_stats_core_sql((w, mu, var))
        + f""",
            tvc AS (
              SELECT {_sql_list(mu.ravel())}::DOUBLE[] AS muf,
                     {_sql_list(isig.ravel())}::DOUBLE[] AS isig,
                     {t_arrays}
            ), b AS (
              SELECT core.conv_id, {b_terms}
              FROM core CROSS JOIN tvc GROUP BY core.conv_id
            ), n0 AS (
              SELECT conv_id, comp, max(stat0) AS nc FROM core GROUP BY 1, 2
            ), lam AS (
              SELECT conv_id, {lam_cols} FROM n0 GROUP BY conv_id
            )
            SELECT b.conv_id, {", ".join(w_cols)}
            FROM b JOIN lam ON lam.conv_id = b.conv_id
        """
    )



def _plda_llr_consts(model_key: str):
    """(a_mat, b_mat, const, mean) for a captured PLDA model — derived
    via the INDEPENDENT joint-Gaussian block formulation (same
    cross-check as ``_plda_fixed_oracle_sql``)."""
    import numpy as np

    blob = __import__("json").load(
        open(__import__("os").path.join(
            __import__("os").path.dirname(__file__), "trained_models_sf001.json"))
    )[model_key]
    d = len(blob["mean"])
    r = blob["rank"]
    mean = np.array([float(v) for v in blob["mean"]])
    v = np.array([float(x) for x in blob["v_mat"]]).reshape(d, r)
    sigma = np.array([float(x) for x in blob["sigma"]]).reshape(d, d)
    s_b = v @ v.T
    s_t = s_b + sigma
    s1 = np.block([[s_t, s_b], [s_b, s_t]])
    s0 = np.block([[s_t, np.zeros_like(s_t)], [np.zeros_like(s_t), s_t]])
    w_full = 0.5 * (np.linalg.inv(s0) - np.linalg.inv(s1))
    const = 0.5 * (np.linalg.slogdet(s0)[1] - np.linalg.slogdet(s1)[1])
    return w_full[:d, :d], w_full[:d, d:], float(const), mean


def _pair_llr_tail_sql(a_mat, b_mat, const, d: int, round_dp: int = 4) -> str:
    """Shared pair-LLR SQL tail over a CTE ``ev(vec_id, j, x)`` of
    CENTERED per-dimension values: quadratic forms + cross term +
    constant, scored over the standard trial mask."""
    return f"""llr_consts AS (
              SELECT {_sql_list(a_mat.ravel())}::DOUBLE[] AS am,
                     {_sql_list(b_mat.ravel())}::DOUBLE[] AS bm
            ), labels AS (SELECT vec_id, label FROM embeddings),
            quad AS (
              SELECT a.vec_id,
                     sum(a.x * am[(a.j - 1) * {d} + b.j] * b.x) AS q
              FROM ev a JOIN ev b ON b.vec_id = a.vec_id
              CROSS JOIN llr_consts
              GROUP BY a.vec_id
            ), u AS (
              SELECT a.vec_id, dims.j,
                     sum(a.x * bm[(a.j - 1) * {d} + dims.j]) AS uj
              FROM ev a CROSS JOIN dims CROSS JOIN llr_consts
              GROUP BY a.vec_id, dims.j
            ), pairs AS (
              SELECT e.vec_id AS enroll_id, t.vec_id AS test_id,
                     (le.label = lt.label) AS is_target
              FROM embeddings e JOIN embeddings t
                ON e.vec_id < 20 AND t.vec_id >= 20
               AND (e.vec_id * 7 + t.vec_id) % 5 = 0
              JOIN labels le ON le.vec_id = e.vec_id
              JOIN labels lt ON lt.vec_id = t.vec_id
            ), cross_term AS (
              SELECT p.enroll_id, p.test_id,
                     sum(u.uj * tv.x) AS ebt
              FROM pairs p
              JOIN u ON u.vec_id = p.enroll_id
              JOIN ev tv ON tv.vec_id = p.test_id AND tv.j = u.j
              GROUP BY 1, 2
            )
            SELECT p.enroll_id, p.test_id, p.is_target,
                   round(qe.q + qt.q + 2.0 * ct.ebt + ({const!r}), {round_dp}) AS score
            FROM pairs p
            JOIN quad qe ON qe.vec_id = p.enroll_id
            JOIN quad qt ON qt.vec_id = p.test_id
            JOIN cross_term ct
              ON ct.enroll_id = p.enroll_id AND ct.test_id = p.test_id
        """


def _plda_trained_oracle_sql(d: int = 64) -> str:
    """Trained-model PLDA trial scoring replayed in DuckDB from captured
    literals (bit-deterministic EM — see ``_deterministic_labeled_emb``),
    A/B/const derived via the independent joint-Gaussian formulation."""
    a_mat, b_mat, const, mean = _plda_llr_consts("plda")
    return f"""
            WITH mean_c AS (SELECT {_sql_list(mean)}::DOUBLE[] AS mv),
            dims AS (SELECT unnest(range(1, {d + 1})) AS j),
            ev AS (
              SELECT vec_id, dims.j,
                     CAST(embedding[dims.j] AS DOUBLE) - mv[dims.j] AS x
              FROM embeddings, dims CROSS JOIN mean_c
            ), """ + _pair_llr_tail_sql(a_mat, b_mat, const, d)


def _sphnorm_plda_oracle_sql(d: int = 64) -> str:
    """Trained sphnorm→PLDA chain replayed in DuckDB: the two captured
    (mean, W) whiten+length-norm steps produce the normalized vectors,
    then the captured PLDA model's pair LLR scores them."""
    import json as _json
    import os as _os

    blob = _json.load(
        open(_os.path.join(_os.path.dirname(__file__), "trained_models_sf001.json"))
    )["sphnorm"]["params"]
    import numpy as np

    (m1, w1), (m2, w2) = [
        (np.array([float(v) for v in m]), np.array([float(v) for v in w]))
        for m, w in blob
    ]
    a_mat, b_mat, const, mean = _plda_llr_consts("plda_sph")
    return f"""
            WITH sph_c AS (
              SELECT {_sql_list(m1)}::DOUBLE[] AS m1,
                     {_sql_list(w1)}::DOUBLE[] AS w1,
                     {_sql_list(m2)}::DOUBLE[] AS m2,
                     {_sql_list(w2)}::DOUBLE[] AS w2,
                     {_sql_list(mean)}::DOUBLE[] AS mv
            ), dims AS (SELECT unnest(range(1, {d + 1})) AS j),
            x AS (
              SELECT vec_id, dims.j, CAST(embedding[dims.j] AS DOUBLE) AS v
              FROM embeddings, dims
            ), y1 AS (
              SELECT x.vec_id, dims.j,
                     sum((x.v - m1[x.j]) * w1[(dims.j - 1) * {d} + x.j]) AS v
              FROM x CROSS JOIN dims CROSS JOIN sph_c
              GROUP BY x.vec_id, dims.j
            ), n1 AS (
              SELECT vec_id,
                     CASE WHEN sqrt(sum(v * v)) = 0 THEN 1.0
                          ELSE sqrt(sum(v * v)) END AS nrm
              FROM y1 GROUP BY vec_id
            ), y1n AS (
              SELECT y1.vec_id, y1.j, y1.v / n1.nrm AS v
              FROM y1 JOIN n1 ON n1.vec_id = y1.vec_id
            ), y2 AS (
              SELECT y1n.vec_id, dims.j,
                     sum((y1n.v - m2[y1n.j]) * w2[(dims.j - 1) * {d} + y1n.j]) AS v
              FROM y1n CROSS JOIN dims CROSS JOIN sph_c
              GROUP BY y1n.vec_id, dims.j
            ), n2 AS (
              SELECT vec_id,
                     CASE WHEN sqrt(sum(v * v)) = 0 THEN 1.0
                          ELSE sqrt(sum(v * v)) END AS nrm
              FROM y2 GROUP BY vec_id
            ), ev AS (
              SELECT y2.vec_id, y2.j, y2.v / n2.nrm - mv[y2.j] AS x
              FROM y2 JOIN n2 ON n2.vec_id = y2.vec_id CROSS JOIN sph_c
            ), """ + _pair_llr_tail_sql(a_mat, b_mat, const, d)


def _lda_wccn_oracle_sql(d: int = 64) -> str:
    """Trained LDA+WCCN cosine scoring replayed in DuckDB: the captured
    effective projection E = proj·L gives y = Eᵀ(x − μ); scores are the
    cosine of projected trial pairs (zero-norm guard → 0)."""
    import json as _json
    import os as _os

    import numpy as np

    blob = _json.load(
        open(_os.path.join(_os.path.dirname(__file__), "trained_models_sf001.json"))
    )["lda_wccn"]
    r = blob["r"]
    mu = np.array([float(v) for v in blob["mu"]])
    eff = np.array([float(v) for v in blob["eff"]])  # (d*r,) row-major
    return f"""
            WITH consts AS (
              SELECT {_sql_list(mu)}::DOUBLE[] AS mu,
                     {_sql_list(eff)}::DOUBLE[] AS eff
            ), dims AS (SELECT unnest(range(1, {d + 1})) AS j),
            rdims AS (SELECT unnest(range(1, {r + 1})) AS i),
            x AS (
              SELECT vec_id, dims.j, CAST(embedding[dims.j] AS DOUBLE) AS v
              FROM embeddings, dims
            ), proj AS (
              SELECT x.vec_id, rdims.i,
                     sum((x.v - mu[x.j]) * eff[(x.j - 1) * {r} + rdims.i]) AS v
              FROM x CROSS JOIN rdims CROSS JOIN consts
              GROUP BY x.vec_id, rdims.i
            ), nrm AS (
              SELECT vec_id, sqrt(sum(v * v)) AS n FROM proj GROUP BY vec_id
            ), labels AS (SELECT vec_id, label FROM embeddings),
            pairs AS (
              SELECT e.vec_id AS enroll_id, t.vec_id AS test_id,
                     (le.label = lt.label) AS is_target
              FROM embeddings e JOIN embeddings t
                ON e.vec_id < 20 AND t.vec_id >= 20
               AND (e.vec_id * 7 + t.vec_id) % 5 = 0
              JOIN labels le ON le.vec_id = e.vec_id
              JOIN labels lt ON lt.vec_id = t.vec_id
            ), dots AS (
              SELECT p.enroll_id, p.test_id, sum(pe.v * pt.v) AS dot
              FROM pairs p
              JOIN proj pe ON pe.vec_id = p.enroll_id
              JOIN proj pt ON pt.vec_id = p.test_id AND pt.i = pe.i
              GROUP BY 1, 2
            )
            SELECT p.enroll_id, p.test_id, p.is_target,
                   round(CASE WHEN ne.n > 0 AND nt.n > 0
                              THEN d.dot / (ne.n * nt.n) ELSE 0.0 END, 4) AS score
            FROM pairs p
            JOIN dots d ON d.enroll_id = p.enroll_id AND d.test_id = p.test_id
            JOIN nrm ne ON ne.vec_id = p.enroll_id
            JOIN nrm nt ON nt.vec_id = p.test_id
        """


def _ann_ivf_oracle_sql(
    n_lists: int = 8, n_probe: int = 3, k: int = 5, d: int = 64, cents=None
) -> str:
    """DuckDB replica of literal-centroid IVF search: per-vector distance
    d²(c) = ‖c‖² − 2·x·cᵀ from literal centroids (‖c‖² folded in numpy,
    matching the kernel's broadcast constant), stable argmin / top-n_probe
    by (d², list), equi join on list id, exact cosine re-rank. Default
    centroids = the fixed seed-derived set; pass trained centroids to
    verify the trained-quantizer query."""
    import numpy as np

    if cents is None:
        cents = _fixed_ivf_centroids(n_lists, d)
    cn2 = (cents * cents).sum(axis=1)
    return f"""
            WITH emb AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
              WHERE sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum')) > 0
            ), consts AS (
              SELECT {_sql_list(cents.ravel())}::DOUBLE[] AS cm,
                     {_sql_list(cn2)}::DOUBLE[] AS cn2
            ), dims AS (SELECT unnest(range(1, {d + 1})) AS j),
            lists AS (SELECT unnest(range(0, {n_lists})) AS c),
            d2 AS (
              SELECT emb.vec_id, lists.c,
                     cn2[lists.c + 1]
                       - 2.0 * (SELECT sum(v[dims.j] * cm[lists.c * {d} + dims.j])
                                FROM dims) AS dist
              FROM emb CROSS JOIN lists CROSS JOIN consts
            ), ranked AS (
              SELECT vec_id, c,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY dist ASC, c ASC) AS r
              FROM d2
            ), c_assign AS (
              SELECT vec_id AS neighbor_id, c AS list_id FROM ranked WHERE r = 1
            ), q_assign AS (
              SELECT vec_id AS query_id, c AS list_id FROM ranked
              WHERE r <= {n_probe} AND vec_id < 10
            ), cand AS (
              SELECT DISTINCT q.query_id, c.neighbor_id
              FROM q_assign q JOIN c_assign c ON c.list_id = q.list_id
              WHERE c.neighbor_id != q.query_id
            ), scored AS (
              SELECT cand.query_id, cand.neighbor_id,
                     list_cosine_similarity(eq.v, ec.v) AS cos
              FROM cand
              JOIN emb eq ON eq.vec_id = cand.query_id
              JOIN emb ec ON ec.vec_id = cand.neighbor_id
            ), rr AS (
              SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine
            FROM rr WHERE rank <= {k}
        """


def _semdedup_oracle_sql(n_lists: int = 8, d: int = 64, tau: float = 0.4) -> str:
    """DuckDB replica of SemDeDup over the fixed seed-derived centroids:
    the same literal-quantizer assignment CTE as `_ann_ivf_oracle_sql`
    (argmin of ‖c‖² − 2·x·cᵀ, ties to the lowest list), then the
    within-cluster earlier-id max-cosine and the τ verdict."""
    cents = _fixed_ivf_centroids(n_lists, d)
    cn2 = (cents * cents).sum(axis=1)
    return f"""
            WITH emb AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ), consts AS (
              SELECT {_sql_list(cents.ravel())}::DOUBLE[] AS cm,
                     {_sql_list(cn2)}::DOUBLE[] AS cn2
            ), dims AS (SELECT unnest(range(1, {d + 1})) AS j),
            lists AS (SELECT unnest(range(0, {n_lists})) AS c),
            d2 AS (
              SELECT emb.vec_id, lists.c,
                     cn2[lists.c + 1]
                       - 2.0 * (SELECT sum(v[dims.j] * cm[lists.c * {d} + dims.j])
                                FROM dims) AS dist
              FROM emb CROSS JOIN lists CROSS JOIN consts
            ), assign AS (
              SELECT vec_id, c AS cluster_id FROM (
                SELECT vec_id, c,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist ASC, c ASC) AS r
                FROM d2
              ) WHERE r = 1
            ), nz AS (
              SELECT a.vec_id, a.cluster_id, e.v
              FROM assign a JOIN emb e ON e.vec_id = a.vec_id
              WHERE sqrt(list_aggregate(list_transform(e.v, x -> x*x), 'sum')) > 0
            ), earlier AS (
              SELECT b.vec_id, max(list_cosine_similarity(a.v, b.v)) AS mc
              FROM nz b JOIN nz a
                ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
              GROUP BY b.vec_id
            )
            SELECT s.vec_id, s.cluster_id,
                   round(earlier.mc, 6) AS max_cos_earlier,
                   coalesce(earlier.mc < {tau}, true) AS kept
            FROM assign s LEFT JOIN earlier ON earlier.vec_id = s.vec_id
        """


def _ann_ivf_trained_oracle_sql() -> str:
    """Trained-quantizer IVF oracle: literal centroids captured from the
    bit-deterministic Lloyd run (scripts/capture_trained_models.py)."""
    import numpy as np

    blob = __import__("json").load(
        open(__import__("os").path.join(
            __import__("os").path.dirname(__file__), "trained_models_sf001.json"))
    )
    if "ivf_centroids" not in blob:
        raise KeyError("run scripts/capture_trained_models.py to capture ivf_centroids")
    cents = np.array([float(v) for v in blob["ivf_centroids"]]).reshape(16, -1)
    return _ann_ivf_oracle_sql(n_lists=16, n_probe=4, k=5, d=cents.shape[1], cents=cents)


def _hyperplane_sigs_sql(
    dim: int, n_planes: int, n_tables: int, seed: int
) -> str:
    """UNION ALL block yielding (vec_id, v, t, bucket) sign-bit LSH rows
    from literal seed-derived hyperplanes — each dot product is an
    explicit left-associated sum chain, matching Spark's sequential
    ``aggregate(zip_with(...))`` fold bit-for-bit, so the buckets (and
    therefore any candidate set built on them) are identical."""
    import numpy as np

    sig_rows = []
    for t in range(n_tables):
        rng = np.random.default_rng(seed + 1013 * t)
        planes = rng.standard_normal((n_planes, dim))
        bits = []
        for i in range(n_planes):
            dot = " + ".join(f"v[{j + 1}]*({planes[i][j]!r})" for j in range(dim))
            bits.append(f"(CASE WHEN ({dot}) >= 0 THEN {2 ** i} ELSE 0 END)")
        bucket = " + ".join(bits)
        sig_rows.append(
            f"SELECT vec_id, v, {t} AS t, ({bucket}) AS bucket FROM emb"
        )
    return "\n              UNION ALL\n              ".join(sig_rows)


def _ann_lsh_oracle_sql(
    dim: int = 64, n_planes: int = 8, n_tables: int = 4, k: int = 5, seed: int = 42
) -> str:
    """DuckDB replica of ``ann_topk_lsh`` built on literal hyperplanes
    (see ``_hyperplane_sigs_sql``): bucket join + exact cosine re-rank."""
    sigs = _hyperplane_sigs_sql(dim, n_planes, n_tables, seed)
    return f"""
            WITH emb AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
              WHERE sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum')) > 0
            ), sigs AS (
              {sigs}
            ), q AS (
              SELECT vec_id AS query_id, t, bucket FROM sigs WHERE vec_id < 10
            ), c AS (
              SELECT vec_id AS neighbor_id, t, bucket FROM sigs
            ), cand AS (
              SELECT DISTINCT q.query_id, c.neighbor_id
              FROM q JOIN c ON c.t = q.t AND c.bucket = q.bucket
              WHERE c.neighbor_id != q.query_id
            ), scored AS (
              SELECT cand.query_id, cand.neighbor_id,
                     list_cosine_similarity(eq.v, ec.v) AS cos
              FROM cand
              JOIN emb eq ON eq.vec_id = cand.query_id
              JOIN emb ec ON ec.vec_id = cand.neighbor_id
            ), r AS (
              SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine
            FROM r WHERE rank <= {k}
        """


def _media_oracle_sql(k: int = 14) -> str:
    """DuckDB oracle for the stub media-feature kernel: reproduces the
    ``np.array_split`` chunk boundaries (first L%k chunks one byte
    longer) with list slicing over codepoints — valid because the
    document payloads are pure ASCII (byte == codepoint; the query's
    content column is UTF-8-encoded text)."""
    chunk_cols = []
    for i in range(k):
        s = f"({i} * q + least({i}, r))"
        e = f"({i + 1} * q + least({i + 1}, r))"
        chunk_cols.append(
            f"CASE WHEN L > 0 AND {e} > {s} THEN round("
            f"list_aggregate(list_transform(chars[{s} + 1:{e}], x -> unicode(x)), 'sum')"
            f" * 1.0 / ({e} - {s}), 6) ELSE 0.0 END AS c{i}"
        )
    chunks = ",\n                   ".join(chunk_cols)
    return f"""
            WITH base AS (
              SELECT doc_id AS media_id,
                     ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS modality,
                     coalesce(text, '') AS t
              FROM documents
            ), prep AS (
              SELECT media_id, modality,
                     octet_length(encode(t)) AS L,
                     octet_length(encode(t)) // {k} AS q,
                     octet_length(encode(t)) % {k} AS r,
                     string_split(t, '') AS chars
              FROM base
            )
            SELECT media_id, modality, L AS n_bytes,
                   {chunks},
                   CASE WHEN L > 0 THEN CAST(media_id % 3 AS DOUBLE) ELSE 0.0 END AS mod_code
            FROM prep
        """


def _media_real_oracle_sql(k: int = 14) -> str:
    """DuckDB oracle for the REAL decode chain: regenerates the decoded
    sample/pixel values from the same deterministic formulas the payload
    generator packed into the WAV/PGM containers, then replays the
    array_split chunk means. Verifies the container writer↔parser
    roundtrip end to end (a single misread byte shifts every value)."""
    chunk_cols = []
    for i in range(k):
        s = f"({i} * q + least({i}, r))"
        e = f"({i + 1} * q + least({i + 1}, r))"
        chunk_cols.append(
            f"CASE WHEN n > 0 AND {e} > {s} THEN round("
            f"list_aggregate(v[{s} + 1:{e}], 'sum') * 1.0 / ({e} - {s}), 6)"
            f" ELSE 0.0 END AS c{i}"
        )
    chunks = ",\n                   ".join(chunk_cols)
    return f"""
            WITH prep AS (
              SELECT doc_id AS media_id,
                     CASE WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'image' END AS modality,
                     CASE WHEN doc_id % 3 = 1 THEN doc_id % 977 + 10
                          WHEN doc_id % 3 = 2 THEN (doc_id % 37 + 1) * (doc_id % 23 + 1)
                          ELSE (doc_id % 29 + 1) * (doc_id % 19 + 1) END AS n
              FROM documents
            ), vals AS (
              SELECT media_id, modality, n, n // {k} AS q, n % {k} AS r,
                     CASE WHEN media_id % 3 = 1
                       THEN list_transform(range(n), i -> (media_id * 2654435761 + i * 40503) % 65536 - 32768)
                       WHEN media_id % 3 = 2
                       THEN list_transform(range(n), i -> (media_id * 31 + i * 7) % 256)
                       ELSE list_transform(range(n), i -> (media_id * 17 + i * 11) % 256)
                     END AS v
              FROM prep
            )
            SELECT media_id, modality, CAST(n AS DOUBLE) AS n_values,
                   {chunks},
                   CASE WHEN modality = 'audio' THEN 1.0 ELSE 0.0 END AS mod_code
            FROM vals
        """


# BM25 corpus model (operators/retrieval.py), shared by the bm25_topk /
# bm25_idf oracles: normalized whitespace tokens → per-doc term
# frequencies + doc length → corpus stats (N counts EVERY document,
# empty/null text contributing dl=0, exactly as corpus_stats does).
_BM25_CTE = r"""
            WITH tok AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS ws
              FROM documents
            ), dls AS (
              SELECT doc_id,
                     CASE WHEN array_to_string(ws, '') = '' THEN 0
                          ELSE len(ws) END AS dl
              FROM tok
            ), stats AS (
              SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dls
            ), occ AS (
              SELECT t.doc_id, unnest(t.ws) AS t FROM tok t
            ), posts AS (
              SELECT o.doc_id, o.t AS term, count(*) AS tf,
                     any_value(d.dl) AS dl
              FROM occ o JOIN dls d ON o.doc_id = d.doc_id
              WHERE o.t <> ''
              GROUP BY o.doc_id, o.t
            )
"""

# Winnowing fingerprint selection (operators/winnow.py), shared by the
# winnow_prints / winnow_pairs oracles: normalized words → 4-grams →
# per-position keys (60-bit md5 prefix % 2⁴⁰)·2²² + pos → sliding
# 5-window min → full windows only → distinct. The range cross-join is
# bounded at 512 gram positions (>5× this corpus's max word count).
_WINNOW_SEL_CTE = r"""
            WITH w AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id, greatest(len(ws) - 3, 1) AS ng, i AS pos,
                     array_to_string(ws[i+1:i+4], ' ') AS gram
              FROM w, (SELECT unnest(range(0, 512)) AS i)
              WHERE i < greatest(len(ws) - 3, 1)
            ), k AS (
              SELECT doc_id, ng, pos,
                     (('0x' || substr(md5(gram), 1, 15))::BIGINT % 1099511627776) * 4194304 + pos AS key
              FROM g
            ), wm AS (
              SELECT doc_id, ng, pos,
                     min(key) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS wmin
              FROM k
            ), sel AS (
              SELECT DISTINCT doc_id, wmin FROM wm
              WHERE pos <= greatest(ng - 5, 0)
            )
"""

# DSIR importance weights (operators/dsir.py), shared by the
# dsir_weights / dsir_topk oracles: raw corpus = documents, target =
# source='src0'. Buckets are 60-bit md5 prefixes % 1024 of every
# unigram/bigram OCCURRENCE; the ratio applies the unified Laplace form
# log((count+α)/(total+αB)) on both sides, so target-missing buckets
# get the smoothing floor exactly as the engine's coalesce does.
_DSIR_WEIGHTS_CTE = r"""
            WITH nw AS (
              SELECT doc_id, source,
                     string_split(trim(regexp_replace(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS ws
              FROM documents
            ), feats AS (
              SELECT doc_id, source, g FROM (
                SELECT doc_id, source, unnest(ws) AS g FROM nw
                UNION ALL
                SELECT doc_id, source, ws[i+1] || ' ' || ws[i+2] AS g
                FROM nw, (SELECT unnest(range(0, 512)) AS i)
                WHERE i < len(ws) - 1
              ) WHERE g != ''
            ), bf AS (
              SELECT doc_id, source,
                     ('0x' || substr(md5(g), 1, 15))::BIGINT % 1024 AS bucket
              FROM feats
            ), rc AS (
              SELECT bucket, count(*) AS n FROM bf GROUP BY bucket
            ), rt AS (SELECT sum(n) AS tot FROM rc),
            tc AS (
              SELECT bucket, count(*) AS n FROM bf
              WHERE source = 'src0' GROUP BY bucket
            ), tt AS (SELECT coalesce(sum(n), 0) AS tot FROM tc),
            ratio AS (
              SELECT rc.bucket,
                     ln((coalesce(tc.n, 0) + 1.0) / (tt.tot + 1024.0))
                       - ln((rc.n + 1.0) / (rt.tot + 1024.0)) AS log_ratio
              FROM rc LEFT JOIN tc ON tc.bucket = rc.bucket
              CROSS JOIN rt CROSS JOIN tt
            ), scored AS (
              SELECT bf.doc_id, count(*)::BIGINT AS n_feats,
                     sum(ratio.log_ratio) AS w
              FROM bf JOIN ratio ON ratio.bucket = bf.bucket
              GROUP BY bf.doc_id
            ), weights AS (
              SELECT d.doc_id,
                     coalesce(s.n_feats, 0)::BIGINT AS n_feats,
                     coalesce(s.w, 0.0) AS w
              FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
            )
"""


def _quality_clf_oracle_sql() -> str:
    """Scoring replay with the captured literal weights: identical
    feature chain to the Spark side (normalize -> unigrams+bigrams ->
    md5-prefix bucket mod 512), per-doc mean of bucket weights + bias,
    sigmoid, round 6."""
    blob = _quality_clf_literals()
    vals = ", ".join(
        f"({i}, {w!r})" for i, w in enumerate(blob["weights"])
    )
    return rf"""
        WITH nw AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS ws
          FROM documents
        ), feats AS (
          SELECT doc_id, g FROM (
            SELECT doc_id, unnest(ws) AS g FROM nw
            UNION ALL
            SELECT doc_id, ws[CAST(i AS INTEGER) + 1] || ' ' || ws[CAST(i AS INTEGER) + 2] AS g
            FROM nw, LATERAL (SELECT unnest(range(greatest(len(ws) - 1, 0))) AS i) gi
          ) WHERE g != ''
        ), bf AS (
          SELECT doc_id,
                 ('0x' || substr(md5(g), 1, 15))::BIGINT % {blob["n_buckets"]} AS bucket
          FROM feats
        ), wts(bucket, wt) AS (VALUES {vals}),
        scored AS (
          SELECT bf.doc_id, sum(coalesce(wts.wt, 0.0)) / count(*) AS dot
          FROM bf LEFT JOIN wts ON wts.bucket = bf.bucket
          GROUP BY bf.doc_id
        )
        SELECT d.doc_id, d.source,
               round(1.0 / (1.0 + exp(-({blob["bias"]!r} + coalesce(s.dot, 0.0)))), 6) AS quality_prob
        FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
    """


def _pq_oracle_sql() -> str:
    """Replay PQ encode + ADC + rank from the captured codebooks: one
    (sub, cid, pos, val) literal table; per-(vec, sub, cid) exact
    subspace distances; encode = row_number argmin (ties -> lower cid,
    matching numpy argmin); adc(q, x) = sum over sub of the query's
    distance to x's assigned centroid."""
    blob = _pq_literals()
    dsub = blob["dsub"]
    vals = ", ".join(
        f"({j}, {c}, {p}, {v!r})"
        for j, cb in enumerate(blob["centroids"])
        for c, cent in enumerate(cb)
        for p, v in enumerate(cent)
    )
    return f"""
        WITH cent(sub, cid, pos, val) AS (VALUES {vals}),
        dists AS (
          SELECT e.vec_id, c.sub, c.cid,
                 sum((e.embedding[c.sub * {dsub} + c.pos + 1]::DOUBLE - c.val) ^ 2) AS dd
          FROM embeddings e CROSS JOIN cent c
          GROUP BY e.vec_id, c.sub, c.cid
        ),
        codes AS (
          SELECT vec_id, sub, cid FROM (
            SELECT vec_id, sub, cid,
                   row_number() OVER (PARTITION BY vec_id, sub ORDER BY dd, cid) AS rn
            FROM dists
          ) WHERE rn = 1
        ),
        adc AS (
          SELECT dq.vec_id AS query_id, cx.vec_id AS cand_id,
                 sum(dq.dd) AS adc_dist
          FROM codes cx
          JOIN dists dq ON dq.sub = cx.sub AND dq.cid = cx.cid
          WHERE dq.vec_id < 8
          GROUP BY dq.vec_id, cx.vec_id
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id,
               round(adc_dist, 6) AS adc_dist
        FROM (
          SELECT query_id, cand_id AS vec_id, adc_dist,
                 row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, cand_id) AS rank
          FROM adc
        ) WHERE rank <= 5
    """


def _pagerank_oracle_sql() -> str:
    from featureengineer_spark.operators.graphrank import pagerank_oracle_sql

    return pagerank_oracle_sql(
        "SELECT event_id % 997 AS src, (event_id * 31 + 7) % 997 AS dst "
        "FROM events",
        damping=0.85,
        n_iter=5,
        round_to=6,
    )


def oracle_sql() -> dict[str, str]:
    return {
        "lag_lead": f"""
            SELECT user_id, event_id,
                   lag(event_type) OVER ({_W}) AS lag1_event_type,
                   lead(event_type) OVER ({_W}) AS lead1_event_type
            FROM events
        """,
        "inter_event_latency": f"""
            SELECT user_id, event_id,
                   round(epoch(ts - lag(ts) OVER ({_W})), 6) AS latency_s
            FROM events
        """,
        "rolling_counts": f"""
            SELECT user_id, event_id,
                   CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)
                     OVER ({_W} ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_purchases_10,
                   CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END)
                     OVER ({_W} ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_errors_10
            FROM events
        """,
        "sessionize": f"""
            WITH g AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN epoch(ts - lag(ts) OVER ({_W})) > 1800 THEN 1 ELSE 0 END AS flag
              FROM events
            )
            SELECT user_id, event_id,
                   CAST(sum(flag) OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
            FROM g
        """,
        "session_stats": f"""
            WITH g AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN epoch(ts - lag(ts) OVER ({_W})) > 1800 THEN 1 ELSE 0 END AS flag
              FROM events
            ), s AS (
              SELECT user_id, ts, value,
                     CAST(sum(flag) OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
              FROM g
            )
            SELECT user_id, session_id, count(*) AS n_events,
                   round(sum(value), 6) AS sum_value,
                   round(epoch(max(ts) - min(ts)), 6) AS duration_s
            FROM s GROUP BY user_id, session_id
        """,
        "backfill": f"""
            SELECT user_id, event_id,
                   last_value(CASE WHEN event_type='purchase' THEN props END IGNORE NULLS)
                     OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_props
            FROM events
        """,
        "cumulative": f"""
            SELECT user_id, event_id,
                   round(sum(value) OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_value
            FROM events
        """,
        "delta": f"""
            WITH d AS (
              SELECT user_id, event_id, ts, value - lag(value) OVER ({_W}) AS d1 FROM events
            )
            SELECT user_id, event_id, round(d1, 6) AS value_delta,
                   round(d1 - lag(d1) OVER ({_W}), 6) AS value_delta2
            FROM d
        """,
        "sliding_norm": f"""
            SELECT user_id, event_id,
                   round(CASE WHEN stddev_samp(value) OVER w > 0
                         THEN (value - avg(value) OVER w) / stddev_samp(value) OVER w
                         ELSE 0.0 END, 6) AS value_norm
            FROM events
            WINDOW w AS ({_W} ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)
        """,
        "group_norm": """
            SELECT user_id, event_id,
                   round(CASE WHEN stddev_samp(value) OVER w > 0
                         THEN (value - avg(value) OVER w) / stddev_samp(value) OVER w
                         ELSE 0.0 END, 6) AS value_cmvn
            FROM events
            WINDOW w AS (PARTITION BY user_id)
        """,
        "group_norm_scaled": """
            SELECT user_id, event_id,
                   round(CASE WHEN stddev_samp(value) OVER w > 0
                         THEN (value - avg(value) OVER w) / stddev_samp(value) OVER w
                         ELSE 0.0 END, 6) AS value_cmvn
            FROM events
            WINDOW w AS (PARTITION BY user_id)
        """,
        "asof_purchase_click": """
            WITH anchors AS (
              SELECT user_id, ts AS anchor_ts, event_id AS purchase_id
              FROM events WHERE event_type='purchase'
            ), ranked AS (
              SELECT a.user_id, a.purchase_id, e.event_id AS click_id,
                     round(e.value, 6) AS click_value,
                     row_number() OVER (PARTITION BY a.user_id, a.purchase_id
                                        ORDER BY e.ts DESC, e.event_id DESC) AS rn
              FROM anchors a
              JOIN events e ON e.user_id = a.user_id AND e.event_type='click'
                            AND e.ts < a.anchor_ts
            )
            SELECT a.user_id, a.purchase_id, r.click_id, r.click_value
            FROM (SELECT user_id, purchase_id FROM anchors) a
            LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r USING (user_id, purchase_id)
        """,
        "asof_next_purchase": """
            WITH anchors AS (
              SELECT user_id, ts AS anchor_ts, event_id AS click_id
              FROM events WHERE event_type='click'
            ), ranked AS (
              SELECT a.user_id, a.click_id, e.event_id AS purchase_id,
                     round(e.value, 6) AS purchase_value,
                     row_number() OVER (PARTITION BY a.user_id, a.click_id
                                        ORDER BY e.ts ASC, e.event_id ASC) AS rn
              FROM anchors a
              JOIN events e ON e.user_id = a.user_id AND e.event_type='purchase'
                            AND e.ts >= a.anchor_ts
            )
            SELECT a.user_id, a.click_id, r.purchase_id, r.purchase_value
            FROM (SELECT user_id, click_id FROM anchors) a
            LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r USING (user_id, click_id)
        """,
        "topk_events": """
            SELECT event_id, user_id, round(value, 6) AS value
            FROM events ORDER BY value DESC, event_id ASC LIMIT 20
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 6) AS sum_qty,
                   round(sum(l_extendedprice), 6) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "join_rollup": """
            SELECT n_name, c_mktsegment, count(*) AS n_orders,
                   round(sum(o_totalprice), 6) AS total_price
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name, c_mktsegment
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
        """,
        "dedup_keep_min": """
            SELECT o_custkey, min(o_orderkey) AS first_orderkey
            FROM orders GROUP BY o_custkey
        """,
        "union_distinct": """
            SELECT DISTINCT o_custkey FROM (
              SELECT o_custkey FROM orders WHERE o_totalprice > 100000
              UNION ALL
              SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            )
        """,
        "filters": """
            SELECT p_brand, count(*) AS n_parts, round(avg(p_retailprice), 6) AS avg_price
            FROM part
            WHERE regexp_matches(p_type, 'ECONOMY|PROMO')
              AND p_brand IN ('Brand#1','Brand#2','Brand#3')
              AND p_size >= 10
            GROUP BY p_brand
        """,
        "left_join": """
            SELECT o_orderkey, o_custkey, c_name, round(c_acctbal, 6) AS c_acctbal
            FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
            ON o_custkey = c_custkey
        """,
        "except_all": """
            SELECT o_custkey FROM orders WHERE o_totalprice > 100000
            EXCEPT ALL
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        """,
        "count_distinct": """
            SELECT c_mktsegment, count(DISTINCT o_custkey) AS n_customers,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "top1_per_user": f"""
            WITH r AS (
              SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
              FROM events
            )
            SELECT user_id, event_id, round(value, 6) AS value FROM r WHERE rn = 1
        """,
        "deterministic_crop": f"""
            WITH r AS (
              SELECT user_id, event_id, ts,
                     row_number() OVER ({_W}) AS rn,
                     count(*) OVER (PARTITION BY user_id) AS n
              FROM events
            )
            SELECT user_id, event_id FROM r
            WHERE rn > (user_id * 2654435761) % greatest(n - 4, 1)
              AND rn <= (user_id * 2654435761) % greatest(n - 4, 1) + 5
        """,
        "doc_token_stats": r"""
            SELECT doc_id,
                   length(coalesce(text,'')) AS n_chars_computed,
                   CASE WHEN length(trim(coalesce(text,''))) = 0 THEN 0
                        ELSE len(string_split_regex(trim(coalesce(text,'')), '\s+')) END AS n_ws_tokens,
                   len(regexp_extract_all(coalesce(text,''), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens
            FROM documents
        """,
        "doc_quality": r"""
            WITH m AS (
              SELECT doc_id,
                     length(coalesce(text,''))::DOUBLE AS n,
                     length(regexp_replace(coalesce(text,''), '[^A-Za-z]', '', 'g'))::DOUBLE AS alpha,
                     length(regexp_replace(coalesce(text,''), '[A-Za-z0-9\s]', '', 'g'))::DOUBLE AS punct,
                     (CASE WHEN length(trim(coalesce(text,''))) = 0 THEN 0
                           ELSE len(string_split_regex(trim(coalesce(text,'')), '\s+')) END)::DOUBLE AS words
              FROM documents
            ), r AS (
              SELECT doc_id,
                     CASE WHEN n > 0 THEN alpha / n ELSE 0.0 END AS alpha_ratio,
                     CASE WHEN n > 0 THEN punct / n ELSE 0.0 END AS punct_ratio,
                     CASE WHEN words > 0 THEN alpha / words ELSE 0.0 END AS mean_word_len,
                     least(n / 200.0, 1.0) AS len_score
              FROM m
            )
            SELECT doc_id, round(alpha_ratio, 6) AS alpha_ratio,
                   round(punct_ratio, 6) AS punct_ratio,
                   round(mean_word_len, 6) AS mean_word_len,
                   round(0.35 * len_score + 0.35 * alpha_ratio
                         + 0.15 * (CASE WHEN mean_word_len >= 3 AND mean_word_len <= 10 THEN 1.0 ELSE 0.5 END)
                         + 0.15 * (1.0 - least(punct_ratio * 4, 1.0)), 6) AS quality_score
            FROM r
        """,
        "doc_lang_id": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split(regexp_replace(trim(lower(coalesce(text,''))), '\s+', ' ', 'g'), ' ') AS ws
              FROM documents
            ), h AS (
              SELECT doc_id,
                     len(list_filter(ws, x -> x IN ('the','a','of','and','to','in','is','it'))) AS h_en,
                     len(list_filter(ws, x -> x IN ('el','la','de','que','y','en','un','es'))) AS h_es,
                     len(list_filter(ws, x -> x IN ('le','la','de','et','un','est','que','en'))) AS h_fr,
                     len(list_filter(ws, x -> x IN ('der','die','das','und','ist','ein','zu','in'))) AS h_de
              FROM w
            )
            SELECT doc_id,
                   CASE WHEN greatest(h_en,h_es,h_fr,h_de) = 0 THEN 'und'
                        WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                        WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                        WHEN h_es >= h_fr THEN 'es'
                        ELSE 'fr' END AS lang_pred,
                   greatest(h_en,h_es,h_fr,h_de) AS lang_hits
            FROM h
        """,
        "doc_fingerprint": r"""
            SELECT doc_id,
                   md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fingerprint_md5
            FROM documents
        """,
        "dedup_groups": r"""
            SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS text_hash,
                   count(*) AS n_dups, min(doc_id) AS min_doc_id
            FROM documents GROUP BY 1
        """,
        "ngram_jaccard": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(1, greatest(len(ws)-2, 1)+1),
                                   i -> array_to_string(ws[i:i+2], ' '))) AS grams
              FROM w
            ), e0 AS (
              SELECT doc_id, unnest(grams) AS sh FROM g
            ), e AS (  -- stop-shingle cap (max document frequency 1000)
              SELECT e0.doc_id, e0.sh FROM e0
              JOIN (SELECT sh FROM e0 GROUP BY sh HAVING count(*) <= 1000) k
                ON k.sh = e0.sh
            ), sizes AS (
              SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b, round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
            FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
            WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.4
        """,
        "ngram_containment": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(1, greatest(len(ws)-2, 1)+1),
                                   i -> array_to_string(ws[i:i+2], ' '))) AS grams
              FROM w
            ), e0 AS (
              SELECT doc_id, unnest(grams) AS sh FROM g
            ), e AS (
              SELECT e0.doc_id, e0.sh FROM e0
              JOIN (SELECT sh FROM e0 GROUP BY sh HAVING count(*) <= 1000) k
                ON k.sh = e0.sh
            ), sizes AS (
              SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(i * 1.0 / sa.n, 6) AS containment_a,
                   round(i * 1.0 / sb.n, 6) AS containment_b,
                   round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
            FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
            WHERE greatest(i * 1.0 / sa.n, i * 1.0 / sb.n) >= 0.6
        """,
        "conv_dedup_convs": r"""
            WITH r AS (
              SELECT user_id,
                     md5(string_agg(event_type || ': ' || coalesce(props, ''), chr(10)
                                    ORDER BY event_id)) AS rh
              FROM events GROUP BY user_id
            ), keep AS (
              SELECT min(user_id) AS user_id FROM r GROUP BY rh
            )
            SELECT e.user_id, e.event_id, e.event_type
            FROM events e SEMI JOIN keep k ON k.user_id = e.user_id
        """,
        "interval_session_lookup": f"""
            WITH g AS (
              SELECT user_id, event_id, ts, event_type,
                     CASE WHEN epoch(ts - lag(ts) OVER ({_W})) > 1800 THEN 1 ELSE 0 END AS flag
              FROM events
            ), s AS (
              SELECT user_id, event_id, ts, event_type,
                     CAST(sum(flag) OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
              FROM g
            ), iv AS (
              SELECT user_id, session_id, min(ts) AS vfrom, max(ts) AS vto
              FROM s GROUP BY user_id, session_id
            )
            SELECT p.user_id, p.event_id AS purchase_id, iv.session_id
            FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
            JOIN iv ON iv.user_id = p.user_id AND p.ts >= iv.vfrom AND p.ts <= iv.vto
        """,
        "holdout_split": f"""
            WITH r AS (
              SELECT user_id, event_id,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            )
            SELECT user_id, event_id,
                   CASE WHEN rn <= 1 THEN 'holdout' ELSE 'train' END AS split
            FROM r
        """,
        "tumbling_windows": """
            SELECT user_id, time_bucket(INTERVAL '6 hours', ts, TIMESTAMP '1970-01-01') AS window_start,
                   count(*) AS n_events, round(sum(value), 6) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "multikey_join": """
            WITH agg AS (
              SELECT l_orderkey, l_suppkey, round(sum(l_quantity), 6) AS qty
              FROM lineitem GROUP BY l_orderkey, l_suppkey
            )
            SELECT l.l_orderkey, count(*) AS n, round(sum(a.qty), 6) AS total_qty
            FROM lineitem l JOIN agg a
              ON l.l_orderkey = a.l_orderkey AND l.l_suppkey = a.l_suppkey
            GROUP BY l.l_orderkey
        """,
        "right_join": """
            SELECT c_custkey, o_orderkey, round(o_totalprice, 6) AS o_totalprice
            FROM (SELECT * FROM orders WHERE o_totalprice > 150000) o
            RIGHT JOIN customer ON o_custkey = c_custkey
        """,
        "map_lookup": """
            SELECT o_orderkey,
                   CASE o_orderpriority
                     WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
                     WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
                     WHEN '5-LOW' THEN 5 ELSE 0 END AS prio_rank
            FROM orders
        """,
        "unpivot_stack": """
            SELECT p_partkey, 'size' AS metric, round(p_size::DOUBLE, 6) AS value FROM part
            UNION ALL
            SELECT p_partkey, 'price' AS metric, round(p_retailprice, 6) AS value FROM part
        """,
        "global_stats": """
            SELECT round(avg(value), 6) AS mean_value,
                   round(var_samp(value), 6) AS var_value,
                   count(*) AS n
            FROM events
        """,
        "conv_embedding": """
            SELECT user_id, count(*) AS n_events,
                   round(avg(value), 6) AS mean_value,
                   round(stddev_samp(value), 6) AS std_value,
                   round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 6) AS purchase_value,
                   min(ts) AS first_ts, max(ts) AS last_ts
            FROM events GROUP BY user_id
        """,
        "regex_extract": r"""
            SELECT o_orderkey,
                   CAST(regexp_extract(o_orderpriority, '^(\d+)-', 1) AS INT) AS prio_num
            FROM orders
        """,
        "string_funcs": """
            SELECT c_custkey, upper(c_name) AS name_upper,
                   substring(c_name, 1, 8) AS name_prefix,
                   c_mktsegment || '#' || CAST(c_nationkey AS VARCHAR) AS seg_key,
                   length(c_name) AS name_len
            FROM customer
        """,
        "null_drop": """
            SELECT o_orderkey, c_name
            FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
              ON o_custkey = c_custkey
            WHERE c_name IS NOT NULL
        """,
        "doc_redaction": r"""
            WITH s0 AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
            s1 AS (
              SELECT doc_id,
                     len(regexp_extract_all(t, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')) AS n_redacted_email,
                     regexp_replace(t, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
              FROM s0
            ), s2 AS (
              SELECT doc_id, n_redacted_email,
                     len(regexp_extract_all(t, 'https?://[^\s]+')) AS n_redacted_url,
                     regexp_replace(t, 'https?://[^\s]+', '<URL>', 'g') AS t
              FROM s1
            ), s3 AS (
              SELECT doc_id, n_redacted_email, n_redacted_url,
                     len(regexp_extract_all(t, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS n_redacted_ip,
                     regexp_replace(t, '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS t
              FROM s2
            ), s4 AS (
              SELECT doc_id, n_redacted_email, n_redacted_url, n_redacted_ip,
                     len(regexp_extract_all(t, '\b\d{7,}\b')) AS n_redacted_number,
                     regexp_replace(t, '\b\d{7,}\b', '<NUMBER>', 'g') AS t
              FROM s3
            )
            SELECT doc_id, n_redacted_email, n_redacted_url, n_redacted_ip,
                   n_redacted_number, md5(t) AS redacted_md5
            FROM s4
        """,
        "doc_repetition": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id, ws,
                     list_transform(range(1, greatest(len(ws)-2, 1)+1),
                                    i -> array_to_string(ws[i:i+2], ' ')) AS grams
              FROM w
            )
            SELECT doc_id,
                   round(CASE WHEN len(grams) > 0
                         THEN 1.0 - len(list_distinct(grams)) * 1.0 / len(grams)
                         ELSE 0.0 END, 6) AS rep_3gram_frac,
                   round(CASE WHEN len(ws) > 0
                         THEN 1.0 - len(list_distinct(ws)) * 1.0 / len(ws)
                         ELSE 0.0 END, 6) AS rep_word_frac
            FROM g
        """,
        "doc_contamination": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(1, greatest(len(ws)-7, 1)+1),
                                   i -> array_to_string(ws[i:i+7], ' '))) AS grams
              FROM w
            ), ce0 AS (
              SELECT doc_id AS corpus_id, unnest(grams) AS sh FROM g
            ), ce AS (
              SELECT ce0.corpus_id, ce0.sh FROM ce0
              JOIN (SELECT sh FROM ce0 GROUP BY sh HAVING count(*) <= 1000) k
                ON k.sh = ce0.sh
            ), be AS (
              SELECT doc_id AS bench_id, unnest(grams) AS sh FROM g
              WHERE doc_id % 17 = 0
            )
            SELECT ce.corpus_id, be.bench_id,
                   CAST(count(*) AS BIGINT) AS n_shared_ngrams
            FROM ce JOIN be ON be.sh = ce.sh
            GROUP BY 1, 2
            HAVING count(*) >= 3 AND ce.corpus_id != be.bench_id
        """,
        "doc_sample_stratified": r"""
            SELECT doc_id, lang FROM documents
            WHERE ('0x' || substr(md5('7:' || doc_id::VARCHAR), 1, 15))::BIGINT % 1000000
                  < CASE lang WHEN 'en' THEN 500000 WHEN 'es' THEN 200000
                              WHEN 'fr' THEN 100000 ELSE 0 END
        """,
        "doc_pack_sequences": r"""
            WITH toks AS (
              SELECT doc_id,
                     CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                          ELSE len(string_split_regex(trim(coalesce(text, '')), '\s+'))
                     END AS n_tokens
              FROM documents
            ), c AS (
              SELECT doc_id, n_tokens,
                     CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_excl
              FROM toks
            )
            SELECT doc_id, n_tokens,
                   cum_excl // 512 AS seq_idx,
                   cum_excl % 512 AS seq_offset
            FROM c
        """,
        "doc_unigram_logprob": r"""
            WITH w AS (
              SELECT doc_id, unnest(string_split(
                trim(regexp_replace(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')) AS word
              FROM documents
            ), wf AS (
              SELECT doc_id, word FROM w WHERE word != ''
            ), counts AS (
              SELECT word, count(*) AS n FROM wf GROUP BY word
            ), tot AS (
              SELECT sum(n) AS total, count(*) AS vocab FROM counts
            ), per_doc AS (
              SELECT wf.doc_id,
                     avg(ln((counts.n + 1.0) / (tot.total + tot.vocab + 1.0))) AS m,
                     CAST(count(*) AS BIGINT) AS n_scored_words
              FROM wf JOIN counts ON counts.word = wf.word CROSS JOIN tot
              GROUP BY wf.doc_id
            )
            SELECT d.doc_id, round(per_doc.m, 6) AS mean_word_logprob,
                   per_doc.n_scored_words
            FROM documents d LEFT JOIN per_doc ON per_doc.doc_id = d.doc_id
        """,
        "session_quality": r"""
            WITH base AS (
              SELECT user_id, event_id, event_type,
                     coalesce(props, '') AS t,
                     event_type IN ('click', 'purchase') AS ua
              FROM events
            ), lagged AS (
              SELECT *,
                     last_value(CASE WHEN ua THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_ua,
                     first_value(CASE WHEN ua THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_ua
              FROM base
            )
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_user_turns,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_assistant_turns,
                   CAST(sum(CASE WHEN ua AND event_type = prev_ua THEN 1 ELSE 0 END) AS BIGINT) AS alternation_violations,
                   round(sum(CASE WHEN length(trim(t)) = 0 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS empty_text_frac,
                   round(avg(length(t)), 6) AS mean_turn_chars,
                   (first(first_ua) = 'click') AS starts_with_user
            FROM lagged
            GROUP BY user_id
        """,
        "near_dedup_docs": r"""
            WITH RECURSIVE w AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(1, greatest(len(ws)-2, 1)+1),
                                   i -> array_to_string(ws[i:i+2], ' '))) AS grams
              FROM w
            ), e0 AS (
              SELECT doc_id, unnest(grams) AS sh FROM g
            ), e AS (
              SELECT e0.doc_id, e0.sh FROM e0
              JOIN (SELECT sh FROM e0 GROUP BY sh HAVING count(*) <= 1000) k
                ON k.sh = e0.sh
            ), sizes AS (
              SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), pairs AS (
              SELECT id_a, id_b
              FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
              WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.4
            ), edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs
              UNION SELECT id_a, id_a FROM pairs
              UNION SELECT id_b, id_b FROM pairs
            ), reach AS (
              SELECT src AS a, dst AS b FROM edges
              UNION
              SELECT r.a, x.dst FROM reach r JOIN edges x ON x.src = r.b
            ), clusters AS (
              SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
            )
            SELECT d.doc_id, length(coalesce(d.text, '')) AS n_chars
            FROM documents d
            WHERE d.doc_id NOT IN (
              SELECT doc_id FROM clusters WHERE cluster_id != doc_id
            )
        """,
        "dedup_clusters": r"""
            WITH RECURSIVE w AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(1, greatest(len(ws)-2, 1)+1),
                                   i -> array_to_string(ws[i:i+2], ' '))) AS grams
              FROM w
            ), e0 AS (
              SELECT doc_id, unnest(grams) AS sh FROM g
            ), e AS (
              SELECT e0.doc_id, e0.sh FROM e0
              JOIN (SELECT sh FROM e0 GROUP BY sh HAVING count(*) <= 1000) k
                ON k.sh = e0.sh
            ), sizes AS (
              SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), pairs AS (
              SELECT id_a, id_b
              FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
              WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.4
            ), edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs
              UNION SELECT id_a, id_a FROM pairs
              UNION SELECT id_b, id_b FROM pairs
            ), reach AS (
              SELECT src AS a, dst AS b FROM edges
              UNION
              SELECT r.a, x.dst FROM reach r JOIN edges x ON x.src = r.b
            )
            SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
        """,
        "trial_scores_maha_diag": """
            WITH dims AS (SELECT unnest(range(1, 65)) AS j),
            ev AS (
              SELECT vec_id, label, j, CAST(embedding[j] AS DOUBLE) AS v
              FROM embeddings, dims
            ),
            vs AS (SELECT j, var_pop(v) AS v2 FROM ev GROUP BY j),
            pairs AS (
              SELECT a.vec_id AS enroll_id, b.vec_id AS test_id,
                     (a.label = b.label) AS is_target
              FROM embeddings a, embeddings b
              WHERE a.vec_id < 20 AND b.vec_id >= 20
                AND (a.vec_id * 7 + b.vec_id) % 5 = 0
            )
            SELECT p.enroll_id, p.test_id, p.is_target,
                   round(-sum((e.v - t.v) * (e.v - t.v) / vs.v2), 6) AS score
            FROM pairs p
            JOIN ev e ON e.vec_id = p.enroll_id
            JOIN ev t ON t.vec_id = p.test_id AND t.j = e.j
            JOIN vs ON vs.j = e.j
            GROUP BY 1, 2, 3
        """,
        "min_dcf": """
            WITH e AS (SELECT vec_id AS enroll_id, embedding::DOUBLE[] AS ev, label AS el
                       FROM embeddings WHERE vec_id < 20),
            t AS (SELECT vec_id AS test_id, embedding::DOUBLE[] AS tv, label AS tl
                  FROM embeddings WHERE vec_id >= 20),
            s AS (
              SELECT (el = tl) AS is_target,
                     list_cosine_similarity(ev, tv) AS score
              FROM e CROSS JOIN t
              WHERE (enroll_id * 7 + test_id) % 5 = 0
            ), tot AS (
              SELECT sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS n_tar,
                     sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS n_non
              FROM s
            ), c AS (
              SELECT score, is_target,
                     sum(CASE WHEN is_target THEN 1 ELSE 0 END)
                       OVER (ORDER BY score DESC, is_target DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tar,
                     sum(CASE WHEN is_target THEN 0 ELSE 1 END)
                       OVER (ORDER BY score DESC, is_target DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_non
              FROM s
            ), costs AS (
              SELECT 1.0 * 0.05 * (1.0 - cum_tar * 1.0 / n_tar)
                   + 2.0 * 0.95 * (cum_non * 1.0 / n_non) AS dcf
              FROM c CROSS JOIN tot
            )
            SELECT round(least(min(dcf), 1.0 * 0.05) / least(1.0 * 0.05, 2.0 * 0.95), 6)
                   AS min_dcf
            FROM costs
        """,
        "crop_tiled": f"""
            WITH r AS (
              SELECT user_id, event_id,
                     row_number() OVER ({_W}) AS rn,
                     count(*) OVER (PARTITION BY user_id) AS n
              FROM events
            ), x AS (
              SELECT user_id, event_id, rn, n,
                     (user_id * 2654435761) % greatest(n - 80 + 1, 1) AS off,
                     CASE WHEN n >= 80 THEN 1 ELSE CAST(ceil(80.0 / n) AS INT) END AS reps
              FROM r
            ), tiled AS (
              SELECT user_id, event_id, rn, n, off, unnest(range(0, reps)) AS rep
              FROM x
            )
            SELECT user_id, event_id,
                   CAST(CASE WHEN n >= 80 THEN rn - 1 - off
                             ELSE rn - 1 + rep * n END AS INTEGER) AS crop_pos
            FROM tiled
            WHERE (CASE WHEN n >= 80 THEN rn - 1 - off ELSE rn - 1 + rep * n END)
                  BETWEEN 0 AND 79
        """,
        "trial_scores_2cov": """
            -- diagonal two-covariance pair LLR, re-derived per dimension:
            -- lam=b+w, schur=lam-b*b/lam, q=.5*(1/lam-1/schur), p=.5*b/(schur*lam),
            -- const=-0.5*sum(ln schur - ln lam); score=sum_j q*(e^2+t^2)+2p*e*t (+const)
            WITH dims AS (SELECT unnest(range(1, 65)) AS j),
            ev AS (
              SELECT vec_id, label, j, CAST(embedding[j] AS DOUBLE) AS v
              FROM embeddings, dims
            ),
            gstat AS (SELECT j, avg(v) AS mu, count(*) AS n FROM ev GROUP BY j),
            cls AS (SELECT label, j, avg(v) AS cmu, count(*) AS cn FROM ev GROUP BY label, j),
            wth AS (
              SELECT ev.j, sum((ev.v - cls.cmu) * (ev.v - cls.cmu)) AS ss
              FROM ev JOIN cls ON cls.label = ev.label AND cls.j = ev.j
              GROUP BY ev.j
            ),
            btw AS (
              SELECT cls.j, sum(cls.cn * (cls.cmu - gstat.mu) * (cls.cmu - gstat.mu)) AS ss
              FROM cls JOIN gstat ON gstat.j = cls.j
              GROUP BY cls.j
            ),
            coef AS (
              SELECT gstat.j, gstat.mu,
                     wth.ss / gstat.n AS w,
                     btw.ss / gstat.n AS b,
                     (btw.ss / gstat.n + wth.ss / gstat.n) AS lam,
                     (btw.ss / gstat.n + wth.ss / gstat.n)
                       - (btw.ss / gstat.n) * (btw.ss / gstat.n)
                         / (btw.ss / gstat.n + wth.ss / gstat.n) AS schur
              FROM gstat JOIN wth ON wth.j = gstat.j JOIN btw ON btw.j = gstat.j
            ),
            konst AS (SELECT -0.5 * sum(ln(schur) - ln(lam)) AS c FROM coef),
            pairs AS (
              SELECT a.vec_id AS enroll_id, b.vec_id AS test_id,
                     (a.label = b.label) AS is_target
              FROM embeddings a, embeddings b
              WHERE a.vec_id < 20 AND b.vec_id >= 20
                AND (a.vec_id * 7 + b.vec_id) % 5 = 0
            ),
            quad AS (
              SELECT p.enroll_id, p.test_id, p.is_target,
                     sum(0.5 * (1.0/coef.lam - 1.0/coef.schur)
                           * ((e.v - coef.mu)*(e.v - coef.mu) + (t.v - coef.mu)*(t.v - coef.mu))
                         + (coef.b / (coef.schur * coef.lam)) * (e.v - coef.mu) * (t.v - coef.mu)
                     ) AS s
              FROM pairs p
              JOIN ev e ON e.vec_id = p.enroll_id
              JOIN ev t ON t.vec_id = p.test_id AND t.j = e.j
              JOIN coef ON coef.j = e.j
              GROUP BY 1, 2, 3
            )
            SELECT enroll_id, test_id, is_target,
                   round(s + (SELECT c FROM konst), 6) AS score
            FROM quad
        """,
        "trial_scores": """
            WITH e AS (SELECT vec_id AS enroll_id, embedding::DOUBLE[] AS ev, label AS el
                       FROM embeddings WHERE vec_id < 20),
            t AS (SELECT vec_id AS test_id, embedding::DOUBLE[] AS tv, label AS tl
                  FROM embeddings WHERE vec_id >= 20)
            SELECT enroll_id, test_id, (el = tl) AS is_target,
                   round(list_cosine_similarity(ev, tv), 6) AS score
            FROM e CROSS JOIN t
            WHERE (enroll_id * 7 + test_id) % 5 = 0
        """,
        "det_curve": """
            WITH e AS (SELECT vec_id AS enroll_id, embedding::DOUBLE[] AS ev, label AS el
                       FROM embeddings WHERE vec_id < 20),
            t AS (SELECT vec_id AS test_id, embedding::DOUBLE[] AS tv, label AS tl
                  FROM embeddings WHERE vec_id >= 20),
            s AS (
              SELECT (el = tl) AS is_target,
                     list_cosine_similarity(ev, tv) AS score
              FROM e CROSS JOIN t
              WHERE (enroll_id * 7 + test_id) % 5 = 0
            ), tot AS (
              SELECT sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS n_tar,
                     sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS n_non
              FROM s
            ), c AS (
              SELECT score, is_target,
                     sum(CASE WHEN is_target THEN 1 ELSE 0 END)
                       OVER (ORDER BY score DESC, is_target DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tar,
                     sum(CASE WHEN is_target THEN 0 ELSE 1 END)
                       OVER (ORDER BY score DESC, is_target DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_non
              FROM s
            )
            SELECT round(score, 6) AS threshold,
                   round(1.0 - cum_tar * 1.0 / n_tar, 6) AS miss_rate,
                   round(cum_non * 1.0 / n_non, 6) AS fa_rate
            FROM c CROSS JOIN tot
        """,
        "knn_cosine": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
            c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
            s AS (
              SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS cos
              FROM q CROSS JOIN c WHERE neighbor_id != query_id
            ), r AS (
              SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM s
            )
            SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine FROM r WHERE rank <= 5
        """,
        "media_features": _media_oracle_sql(),
        "media_features_real": _media_real_oracle_sql(),
        "doc_shuffle_shards": r"""
            WITH h AS (
              SELECT doc_id,
                     ('0x' || substr(md5('3:' || doc_id::VARCHAR), 1, 15))::BIGINT AS hv
              FROM documents
            )
            SELECT doc_id,
                   CAST(hv % 8 AS INTEGER) AS shard,
                   CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) - 1
                        AS INTEGER) AS shard_pos
            FROM h
        """,
        "doc_token_mix": r"""
            WITH totals AS (
              SELECT lang, sum(n_chars) AS domain_tokens FROM documents GROUP BY lang
            )
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d JOIN totals t ON d.lang = t.lang
            WHERE ('0x' || substr(md5('11:' || d.doc_id::VARCHAR), 1, 15))::BIGINT % 1000000
                  < CAST(floor(least(1.0,
                        CASE d.lang WHEN 'en' THEN 200000 WHEN 'es' THEN 80000 ELSE 0 END
                        / greatest(t.domain_tokens, 1)) * 1000000) AS BIGINT)
        """,
        "doc_bigram_logprob": r"""
            WITH base AS (
              SELECT doc_id, list_filter(string_split(
                trim(regexp_replace(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' '),
                w -> length(w) > 0) AS ws
              FROM documents
            ), toks AS (
              SELECT doc_id, g.i AS ord, ws[CAST(g.i AS INTEGER) + 1] AS w
              FROM base, LATERAL (SELECT unnest(range(len(ws))) AS i) g
            ), pairs AS (
              SELECT doc_id, prev, w AS word FROM (
                SELECT doc_id, w,
                       lag(w) OVER (PARTITION BY doc_id ORDER BY ord) AS prev
                FROM toks
              ) WHERE prev IS NOT NULL
            ), pc AS (
              SELECT prev, word, count(*) AS n FROM pairs GROUP BY prev, word
            ), pt AS (
              SELECT prev, count(*) AS n_prev FROM pairs GROUP BY prev
            ), v AS (
              SELECT count(DISTINCT w) AS vocab FROM toks
            ), scored AS (
              SELECT p.doc_id,
                     ln((coalesce(pc.n, 0) + 1.0)
                        / (coalesce(pt.n_prev, 0) + v.vocab + 1.0)) AS lp
              FROM pairs p
              LEFT JOIN pc ON pc.prev = p.prev AND pc.word = p.word
              LEFT JOIN pt ON pt.prev = p.prev
              CROSS JOIN v
            ), per_doc AS (
              SELECT doc_id, avg(lp) AS m, CAST(count(*) AS BIGINT) AS n_scored_pairs
              FROM scored GROUP BY doc_id
            )
            SELECT d.doc_id, round(per_doc.m, 6) AS mean_bigram_logprob,
                   per_doc.n_scored_pairs
            FROM documents d LEFT JOIN per_doc ON per_doc.doc_id = d.doc_id
        """,
        "time_features": r"""
            SELECT event_id,
                   CAST(hour(ts) AS INTEGER) AS hour,
                   CAST(isodow(ts) - 1 AS INTEGER) AS weekday,
                   CAST(CASE WHEN isodow(ts) - 1 >= 5 THEN 1 ELSE 0 END AS INTEGER) AS is_weekend,
                   round(sin(hour(ts) * 2 * pi() / 24.0), 6) AS sin_hour,
                   round(cos(hour(ts) * 2 * pi() / 24.0), 6) AS cos_hour,
                   round(sin((isodow(ts) - 1) * 2 * pi() / 7.0), 6) AS sin_weekday,
                   round(cos((isodow(ts) - 1) * 2 * pi() / 7.0), 6) AS cos_weekday
            FROM events
        """,
        "conv_dedup_turns": r"""
            WITH n AS (
              SELECT user_id, event_id, event_type,
                     trim(regexp_replace(regexp_replace(lower(coalesce(props, '')),
                          '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nt
              FROM events
            ), l AS (
              SELECT user_id, event_id, event_type, nt,
                     lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS p_type,
                     lag(nt) OVER (PARTITION BY user_id ORDER BY event_id) AS p_nt
              FROM n
            )
            SELECT user_id, event_id, event_type
            FROM l
            WHERE NOT coalesce(event_type IS NOT DISTINCT FROM p_type AND nt = p_nt, FALSE)
        """,
        "doc_chunks": r"""
            WITH d AS (
              SELECT doc_id, coalesce(text, '') AS t,
                     greatest(CAST(ceil((length(coalesce(text, '')) - 32) / 224.0) AS BIGINT), 1) AS n_chunks
              FROM documents
            )
            SELECT doc_id, g.i AS chunk_idx, n_chunks,
                   md5(substr(t, CAST(g.i AS INTEGER) * 224 + 1, 256)) AS chunk_md5
            FROM d, LATERAL (SELECT unnest(range(n_chunks)) AS i) g
        """,
        "html_extract": r"""
            WITH page AS (
              SELECT doc_id,
                     '<html><head><title>Doc ' || doc_id::VARCHAR ||
                     '</title><style>p{color:red}</style>' ||
                     '<script>var a = "<b>hi</b>";</script></head>' ||
                     '<body><!-- boilerplate --><p>' || coalesce(text, '') ||
                     '</p><a href="/nav">' || coalesce(lang, 'xx') ||
                     ' link</a>&amp; tail</body></html>' AS html
              FROM documents
            ), stripped AS (
              SELECT doc_id, html,
                     regexp_replace(regexp_replace(regexp_replace(html,
                       '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
                       '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
                       '(?s)<!--.*?-->', ' ', 'g') AS s1
              FROM page
            ), detag AS (
              SELECT doc_id, html,
                     replace(replace(replace(replace(replace(replace(
                       regexp_replace(s1, '(?s)<[^>]*>', ' ', 'g'),
                       '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                       '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS s2
              FROM stripped
            ), extracted AS (
              SELECT doc_id, html,
                     trim(regexp_replace(s2, '\s+', ' ', 'g')) AS txt
              FROM detag
            ), anchors AS (
              SELECT doc_id,
                     coalesce(list_sum(list_transform(
                       regexp_extract_all(html, '(?is)<a\b[^>]*>(.*?)</a>', 1),
                       a -> length(trim(regexp_replace(regexp_replace(a,
                              '(?s)<[^>]*>', ' ', 'g'), '\s+', ' ', 'g'))))), 0) AS ac,
                     len(regexp_extract_all(html, '(?s)<[^>]*>', 0)) AS tc
              FROM page
            )
            SELECT e.doc_id, md5(e.txt) AS extracted_md5,
                   round(a.ac * 1.0 / greatest(length(e.txt), 1), 6) AS link_density,
                   CAST(a.tc AS INT) AS tag_count,
                   round(length(e.txt) * 1.0 / greatest(length(e.html), 1), 6) AS text_ratio
            FROM extracted e JOIN anchors a USING (doc_id)
        """,
        "temp_mix": r"""
            WITH totals AS (
              SELECT lang, sum(n_chars) AS dt FROM documents GROUP BY lang
            ), wsum AS (
              SELECT sum(pow(dt, 0.5)) AS s FROM totals
            ), fr AS (
              SELECT lang,
                     least(1.0, (pow(dt, 0.5) / s) * 120000 / greatest(dt, 1)) AS frac
              FROM totals CROSS JOIN wsum
            )
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d JOIN fr ON d.lang = fr.lang
            WHERE ('0x' || substr(md5('11:' || d.doc_id::VARCHAR), 1, 15))::BIGINT % 1000000
                  < CAST(floor(frac * 1000000) AS BIGINT)
        """,
        "ppl_buckets": r"""
            WITH base AS (
              SELECT doc_id, list_filter(string_split(
                trim(regexp_replace(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' '),
                w -> length(w) > 0) AS ws
              FROM documents
            ), toks AS (
              SELECT doc_id, g.i AS ord, ws[CAST(g.i AS INTEGER) + 1] AS w
              FROM base, LATERAL (SELECT unnest(range(len(ws))) AS i) g
            ), pairs AS (
              SELECT doc_id, prev, w AS word FROM (
                SELECT doc_id, w,
                       lag(w) OVER (PARTITION BY doc_id ORDER BY ord) AS prev
                FROM toks
              ) WHERE prev IS NOT NULL
            ), pc AS (
              SELECT prev, word, count(*) AS n FROM pairs GROUP BY prev, word
            ), pt AS (
              SELECT prev, count(*) AS n_prev FROM pairs GROUP BY prev
            ), v AS (
              SELECT count(DISTINCT w) AS vocab FROM toks
            ), scored AS (
              SELECT p.doc_id,
                     ln((coalesce(pc.n, 0) + 1.0)
                        / (coalesce(pt.n_prev, 0) + v.vocab + 1.0)) AS lp
              FROM pairs p
              LEFT JOIN pc ON pc.prev = p.prev AND pc.word = p.word
              LEFT JOIN pt ON pt.prev = p.prev
              CROSS JOIN v
            ), per_doc AS (
              SELECT doc_id, exp(-avg(lp)) AS ppl FROM scored GROUP BY doc_id
            ), joined AS (
              SELECT d.doc_id, d.lang, per_doc.ppl
              FROM documents d LEFT JOIN per_doc ON per_doc.doc_id = d.doc_id
            ), cuts AS (
              SELECT lang, quantile_cont(ppl, 0.33) AS c_lo,
                     quantile_cont(ppl, 0.67) AS c_hi
              FROM joined WHERE ppl IS NOT NULL GROUP BY lang
            )
            SELECT j.doc_id, j.lang, round(j.ppl, 6) AS perplexity,
                   CASE WHEN j.ppl IS NULL THEN NULL
                        WHEN j.ppl <= c.c_lo THEN 'head'
                        WHEN j.ppl <= c.c_hi THEN 'middle'
                        ELSE 'tail' END AS ppl_bucket
            FROM joined j LEFT JOIN cuts c ON c.lang = j.lang
        """,
        "quality_clf_scores": _quality_clf_oracle_sql(),
        "pagerank_hosts": _pagerank_oracle_sql(),
        "pq_topk": _pq_oracle_sql(),
        "bpe_pair_counts": r"""
            WITH w AS (
              SELECT unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')) AS wd
              FROM documents
            ), wc AS (
              SELECT wd, count(*) AS c FROM w WHERE wd != '' GROUP BY wd
            ), syms AS (
              SELECT wd, c, string_split(wd, '') || ['</w>'] AS s FROM wc
            ), pairs AS (
              SELECT c, s[g.i] AS a, s[g.i+1] AS b
              FROM syms, LATERAL (SELECT unnest(generate_series(1, len(s) - 1)) AS i) g
            )
            SELECT a, b, CAST(sum(c) AS BIGINT) AS pcount
            FROM pairs GROUP BY a, b
        """,
        "bpe_encode": _bpe_encode_oracle_sql(),
        "dup_span_extents": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS ws
              FROM documents
            ), wn AS (
              SELECT doc_id, ws,
                     CASE WHEN len(ws) = 1 AND ws[1] = '' THEN 0 ELSE len(ws) END AS nw
              FROM w
            ), pk AS (
              SELECT doc_id, g.i AS pos,
                     md5(array_to_string(ws[g.i:g.i+4], ' ')) AS key
              FROM wn, LATERAL (SELECT unnest(generate_series(1, greatest(nw - 4, 0))) AS i) g
            ), dupk AS (
              SELECT key FROM pk GROUP BY key HAVING count(*) >= 2
            ), d AS (
              SELECT pk.doc_id, pk.pos FROM pk SEMI JOIN dupk USING (key)
            ), runs AS (
              SELECT doc_id, pos,
                     CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5
                          THEN 1 ELSE 0 END AS newflag
              FROM d
            ), grp AS (
              SELECT doc_id, pos,
                     sum(newflag) OVER (PARTITION BY doc_id ORDER BY pos) AS g
              FROM runs
            ), ext AS (
              SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
                     CAST(max(pos) + 4 AS INT) AS span_end
              FROM grp GROUP BY doc_id, g
            )
            SELECT ext.doc_id, span_start, span_end,
                   CAST(span_end - span_start + 1 AS INT) AS span_words,
                   md5(array_to_string(w.ws[span_start:span_end], ' ')) AS span_md5
            FROM ext JOIN w ON w.doc_id = ext.doc_id
        """,
        "dup_span_clean": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS ws
              FROM documents
            ), wn AS (
              SELECT doc_id, ws,
                     CASE WHEN len(ws) = 1 AND ws[1] = '' THEN 0 ELSE len(ws) END AS nw
              FROM w
            ), pk AS (
              SELECT doc_id, g.i AS pos,
                     md5(array_to_string(ws[g.i:g.i+4], ' ')) AS key
              FROM wn, LATERAL (SELECT unnest(generate_series(1, greatest(nw - 4, 0))) AS i) g
            ), dupk AS (
              SELECT key FROM pk GROUP BY key HAVING count(*) >= 2
            ), d AS (
              SELECT pk.doc_id, pk.pos FROM pk SEMI JOIN dupk USING (key)
            ), runs AS (
              SELECT doc_id, pos,
                     CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5
                          THEN 1 ELSE 0 END AS newflag
              FROM d
            ), grp AS (
              SELECT doc_id, pos,
                     sum(newflag) OVER (PARTITION BY doc_id ORDER BY pos) AS g
              FROM runs
            ), ext AS (
              SELECT doc_id, min(pos) AS span_start, max(pos) + 4 AS span_end
              FROM grp GROUP BY doc_id, g
            ), wordpos AS (
              SELECT wn.doc_id, g.j, ws[g.j] AS word
              FROM wn, LATERAL (SELECT unnest(generate_series(1, nw)) AS j) g
            ), keptw AS (
              SELECT wp.doc_id, wp.j, wp.word
              FROM wordpos wp
              WHERE NOT EXISTS (
                SELECT 1 FROM ext e
                WHERE e.doc_id = wp.doc_id
                  AND wp.j BETWEEN e.span_start AND e.span_end
              )
            ), agg AS (
              SELECT doc_id,
                     string_agg(word, ' ' ORDER BY j) AS clean_text,
                     count(*) AS kept
              FROM keptw GROUP BY doc_id
            )
            SELECT wn.doc_id, md5(coalesce(agg.clean_text, '')) AS clean_md5,
                   CAST(wn.nw - coalesce(agg.kept, 0) AS INT) AS removed_words
            FROM wn LEFT JOIN agg USING (doc_id)
        """,
        "conv_render": r"""
            WITH r AS (
              SELECT user_id,
                     string_agg(event_type || ': ' || coalesce(props, ''), chr(10)
                                ORDER BY event_id) AS rendered,
                     count(*) AS n_turns
              FROM events GROUP BY user_id
            )
            SELECT user_id, md5(rendered) AS rendered_md5, n_turns,
                   length(rendered) AS n_chars
            FROM r
        """,
        "doc_quality_quantiles": r"""
            SELECT lang,
                   round(quantile_cont(n_chars, 0.1), 6) AS q10,
                   round(quantile_cont(n_chars, 0.5), 6) AS q50,
                   round(quantile_cont(n_chars, 0.9), 6) AS q90,
                   round(quantile_cont(n_chars, 0.99), 6) AS q99
            FROM documents GROUP BY lang
        """,
        "ann_lsh": _ann_lsh_oracle_sql(),
        "gmm_suff_stats_fixed": _gmm_stats_oracle_sql(),
        "latent_factors_fixed": _latent_fixed_oracle_sql(),
        "gmm_suff_stats": _gmm_stats_trained_oracle_sql(),
        "latent_factors": _latent_trained_oracle_sql(),
        "trial_scores_plda": _plda_trained_oracle_sql(),
        "sphnorm_plda_scores": _sphnorm_plda_oracle_sql(),
        "lda_wccn_scores": _lda_wccn_oracle_sql(),
        "ann_ivf_fixed": _ann_ivf_oracle_sql(),
        "ann_ivf": _ann_ivf_trained_oracle_sql(),
        "emb_near_dups": _emb_near_dups_oracle_sql(),
        "plda_scores_fixed": _plda_fixed_oracle_sql(),
        "sphnorm_fixed": _sphnorm_fixed_oracle_sql(),
        "simhash_near_dups": r"""
            -- md5-variant SimHash replica: 60-bit word hashes, per-bit
            -- signed majorities, sign-bit reassembly, brute-force
            -- hamming scan (== the engine's pigeonhole-blocked join)
            WITH w AS (
              SELECT doc_id,
                     unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')) AS wd
              FROM documents
            ), h AS (
              SELECT doc_id, ('0x' || substr(md5(wd), 1, 15))::BIGINT AS hv FROM w
            ), grid AS (SELECT unnest(range(0, 60)) AS b),
            bitsums AS (
              SELECT h.doc_id, grid.b,
                     sum(CASE WHEN (h.hv // (1::BIGINT << grid.b)) % 2 = 1
                              THEN 1 ELSE -1 END) AS s
              FROM h CROSS JOIN grid
              GROUP BY h.doc_id, grid.b
            ), sig AS (
              SELECT doc_id,
                     sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS sh
              FROM bitsums GROUP BY doc_id
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   bit_count(xor(a.sh, b.sh)) AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sh, b.sh)) <= 8
        """,
        "minhash_lsh": rf"""
            -- full MinHash-LSH replica: same normalization/shingles as
            -- ngram_jaccard; hash-once md5-prefix 60-bit base (identical
            -- to the engine's hash_fn='md5'), then the universal-hash
            -- permutation family h_p = (a_p*h + b_p) mod (2^31-1) with
            -- the engine's seed-derived literal coefficients; 64 perms,
            -- 16 bands of 4
            WITH w AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(1, greatest(len(ws)-2, 1)+1),
                                   i -> array_to_string(ws[i:i+2], ' '))) AS grams
              FROM w
            ), e AS (
              SELECT doc_id,
                     ('0x' || substr(md5('42:' || unnest(grams)), 1, 15))::BIGINT % 2147483647 AS h
              FROM g
            ), coeffs AS (
              SELECT {_sql_int_list(_MINHASH_A)}::BIGINT[] AS ca,
                     {_sql_int_list(_MINHASH_B)}::BIGINT[] AS cb
            ), perms AS (SELECT unnest(range(0, 64)) AS p),
            mins AS (
              SELECT e.doc_id, perms.p,
                     min((ca[perms.p + 1] * e.h + cb[perms.p + 1]) % 2147483647) AS mh
              FROM e CROSS JOIN perms CROSS JOIN coeffs
              GROUP BY e.doc_id, perms.p
            ), sig AS (
              SELECT doc_id, list(mh ORDER BY p) AS s FROM mins GROUP BY doc_id
            ), bandgrid AS (SELECT unnest(range(0, 16)) AS b),
            banded AS (
              SELECT sig.doc_id, bandgrid.b,
                     ('0x' || substr(md5(array_to_string(sig.s[bandgrid.b*4+1 : bandgrid.b*4+4], ',')), 1, 15))::BIGINT AS bh
              FROM sig CROSS JOIN bandgrid
            ), cand AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(count(*) AS BIGINT) AS n_shared_bands
              FROM banded a JOIN banded b
                ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), est AS (
              SELECT c.id_a, c.id_b, c.n_shared_bands,
                     sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) / 64.0 AS est_jaccard
              FROM cand c
              JOIN mins ma ON ma.doc_id = c.id_a
              JOIN mins mb ON mb.doc_id = c.id_b AND mb.p = ma.p
              GROUP BY 1, 2, 3
            )
            SELECT id_a, id_b, n_shared_bands, est_jaccard
            FROM est WHERE est_jaccard >= 0.5
        """,
        # The url_* oracles CONSTRUCT the expected canonical/dedup result
        # from doc_id arithmetic (see _URL_ORACLE_CTE) instead of parsing
        # the URL — an independent check of the Spark-side parser.
        "url_canonical": _URL_ORACLE_CTE + r"""
            SELECT doc_id, url,
                   'https://www.example' || CAST(h AS VARCHAR) || '.com/p/' ||
                     CAST(k AS VARCHAR) || '?b=2&id=1' AS canonical_url,
                   'example' || CAST(h AS VARCHAR) || '.com' AS domain
            FROM uu
        """,
        "url_dedup_docs": _URL_ORACLE_CTE + r"""
            SELECT doc_id, url FROM (
              SELECT doc_id, url,
                     row_number() OVER (PARTITION BY k ORDER BY doc_id) AS rn
              FROM uu
            ) WHERE rn = 1
        """,
        "url_blocklist": _URL_ORACLE_CTE + r"""
            SELECT doc_id FROM uu WHERE h NOT IN (2, 5)
        """,
        # Gopher rule replay: every ratio recomputed from the raw text
        # with DuckDB list/regex functions at the engine's default
        # thresholds (operators/quality.py docstring).
        "gopher_flags": r"""
            WITH feats AS (
              SELECT doc_id, coalesce(text, '') AS t,
                     CASE WHEN length(trim(coalesce(text, ''))) = 0
                          THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(coalesce(text, '')), '\s+')
                     END AS ws,
                     CASE WHEN length(trim(coalesce(text, ''))) = 0
                          THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+')
                     END AS lws,
                     string_split(coalesce(text, ''), chr(10)) AS lines
              FROM documents
            ), m AS (
              SELECT doc_id,
                     len(ws)::DOUBLE AS nw,
                     CASE WHEN len(ws) > 0
                          THEN list_aggregate(list_transform(ws, w -> length(w)), 'sum')::DOUBLE / len(ws)
                          ELSE 0.0 END AS mean_wlen,
                     CASE WHEN len(ws) > 0
                          THEN ((length(t) - length(replace(t, '#', ''))) + len(regexp_extract_all(t, '\.\.\.|…')))::DOUBLE / len(ws)
                          ELSE 0.0 END AS sym_ratio,
                     CASE WHEN len(lines) > 0
                          THEN len(list_filter(lines, l -> regexp_matches(l, '^\s*([-*•‣▪●]|\d+[.)])\s')))::DOUBLE / len(lines)
                          ELSE 0.0 END AS bullet_ratio,
                     CASE WHEN len(lines) > 0
                          THEN len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))::DOUBLE / len(lines)
                          ELSE 0.0 END AS ell_ratio,
                     CASE WHEN len(ws) > 0
                          THEN len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE / len(ws)
                          ELSE 0.0 END AS alpha_ratio,
                     len(list_filter(lws, w -> list_contains(['the','be','to','of','and','that','have','with'], w))) AS stop_hits
              FROM feats
            )
            SELECT doc_id,
                   (nw >= 50 AND nw <= 100000) AS r_word_count,
                   (mean_wlen >= 3.0 AND mean_wlen <= 10.0) AS r_mean_word_len,
                   (sym_ratio <= 0.1) AS r_symbol_ratio,
                   (bullet_ratio <= 0.9) AS r_bullet_lines,
                   (ell_ratio <= 0.3) AS r_ellipsis_lines,
                   (alpha_ratio >= 0.8) AS r_alpha_words,
                   (stop_hits >= 2) AS r_stopwords,
                   ((nw >= 50 AND nw <= 100000)
                    AND (mean_wlen >= 3.0 AND mean_wlen <= 10.0)
                    AND (sym_ratio <= 0.1) AND (bullet_ratio <= 0.9)
                    AND (ell_ratio <= 0.3) AND (alpha_ratio >= 0.8)
                    AND (stop_hits >= 2)) AS gopher_pass
            FROM m
        """,
        # 16-word-block paragraph dedup replay: block split over the
        # normalized text (range cross-join bounded at 256 blocks — 4096
        # words, far past this corpus's max), global first-occurrence
        # ranking on the block md5, ordered string_agg reassembly.
        "paragraph_dedup": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS ws
              FROM documents
            ), b AS (
              SELECT doc_id, i AS para_idx,
                     array_to_string(ws[i*16+1:i*16+16], ' ') AS para
              FROM w, (SELECT unnest(range(0, 256)) AS i)
              WHERE i < greatest(ceil(len(ws)/16.0)::BIGINT, 1)
            ), h AS (
              SELECT doc_id, para_idx, para,
                     row_number() OVER (PARTITION BY md5(para)
                                        ORDER BY doc_id, para_idx) AS rn
              FROM b
            )
            SELECT doc_id,
                   md5(coalesce(string_agg(CASE WHEN rn = 1 THEN para END, ' ' ORDER BY para_idx), '')) AS dedup_md5,
                   count(*)::BIGINT AS n_paras,
                   sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept
            FROM h GROUP BY doc_id
        """,
        "paragraph_boilerplate": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS ws
              FROM documents
            ), b AS (
              SELECT doc_id, md5(array_to_string(ws[i*8+1:i*8+8], ' ')) AS para_md5
              FROM w, (SELECT unnest(range(0, 256)) AS i)
              WHERE i < greatest(ceil(len(ws)/8.0)::BIGINT, 1)
            )
            SELECT para_md5, count(*)::BIGINT AS n_occurrences,
                   count(DISTINCT doc_id)::BIGINT AS n_docs,
                   min(doc_id) AS first_doc_id
            FROM b GROUP BY para_md5 HAVING count(*) > 1
        """,
        # Winnowing replay: 4-word grams, per-position keys
        # hash·2²² + pos (60-bit md5 prefix kept to 40 bits), sliding
        # 5-window min, full windows only (clipped window 0 for short
        # docs), distinct selected keys.
        "winnow_prints": _WINNOW_SEL_CTE + r"""
            SELECT doc_id, wmin // 4194304 AS fp_hash,
                   (wmin % 4194304)::BIGINT AS fp_pos
            FROM sel
        """,
        "winnow_pairs": _WINNOW_SEL_CTE + r"""
            , fps AS (
              SELECT DISTINCT doc_id, wmin // 4194304 AS fp_hash FROM sel
            ), sizes AS (
              SELECT doc_id, count(*) AS nfp FROM fps GROUP BY doc_id
            ), dfc AS (
              SELECT fp_hash, count(DISTINCT doc_id) AS df FROM fps GROUP BY fp_hash
            ), rare AS (
              SELECT f.doc_id, f.fp_hash
              FROM fps f JOIN dfc ON dfc.fp_hash = f.fp_hash
              WHERE dfc.df <= 64
            ), p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*)::BIGINT AS n_shared
              FROM rare a JOIN rare b ON a.fp_hash = b.fp_hash
              WHERE a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
              HAVING count(*) >= 2
            )
            SELECT p.id_a, p.id_b, p.n_shared,
                   round(p.n_shared / least(sa.nfp, sb.nfp)::DOUBLE, 6) AS overlap
            FROM p
            JOIN sizes sa ON sa.doc_id = p.id_a
            JOIN sizes sb ON sb.doc_id = p.id_b
        """,
        # DSIR replay: hashed unigram+bigram occurrences (1024 md5
        # buckets), Laplace-smoothed target/raw bucket log-probs
        # (missing target buckets score the smoothing floor — the same
        # unified (count+α)/(total+αB) form), per-doc log-ratio sum.
        "dsir_weights": _DSIR_WEIGHTS_CTE + r"""
            SELECT doc_id, n_feats, round(w, 6) AS dsir_logweight FROM weights
        """,
        "dsir_topk": _DSIR_WEIGHTS_CTE + r"""
            SELECT doc_id, n_feats, round(w, 6) AS dsir_logweight
            FROM weights WHERE n_feats > 0
            ORDER BY w DESC, doc_id ASC LIMIT 100
        """,
        "semdedup_verdicts": _semdedup_oracle_sql(),
        "bm25_topk": _BM25_CTE + r"""
            , qt AS (
              SELECT doc_id AS query_id, t AS term, count(*) AS qtf
              FROM occ WHERE doc_id < 12 GROUP BY doc_id, t
            ), dfreq AS (
              SELECT term, count(*) AS df FROM posts
              WHERE term IN (SELECT DISTINCT term FROM qt)
              GROUP BY term
            ), idf AS (
              SELECT d.term,
                     ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) AS idf,
                     s.avgdl
              FROM dfreq d, stats s
              WHERE d.df >= 1 AND d.df <= s.n_docs * 0.8
            ), sc AS (
              SELECT q.query_id, p.doc_id,
                     sum(q.qtf * i.idf * p.tf * 2.2
                         / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / i.avgdl))) AS score
              FROM qt q
              JOIN idf i ON q.term = i.term
              JOIN posts p ON p.term = q.term
              GROUP BY q.query_id, p.doc_id
            ), rk AS (
              SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, doc_id ASC) AS rank,
                     score
              FROM sc
            )
            SELECT query_id, doc_id, rank, round(score, 6) AS score
            FROM rk WHERE rank <= 5
        """,
        "bm25_idf": _BM25_CTE + r"""
            , dfreq AS (
              SELECT term, count(*) AS df FROM posts GROUP BY term
            )
            SELECT d.term, d.df,
                   round(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)), 6) AS idf
            FROM dfreq d, stats s
            WHERE d.df >= 1 AND d.df <= s.n_docs * 0.8
        """,
        "event_thread_roots": r"""
            WITH RECURSIVE pt AS (
              SELECT event_id AS id,
                     CASE WHEN event_id % 64 = 0 THEN NULL
                          ELSE (event_id // 64) * 64 + ((event_id % 64) - 1) // 2
                     END AS parent_id
              FROM events WHERE event_id < 65536
            ), walk AS (
              SELECT id, id AS cur, 0 AS depth FROM pt
              UNION ALL
              SELECT w.id, p.parent_id AS cur, w.depth + 1
              FROM walk w JOIN pt p ON w.cur = p.id
              WHERE p.parent_id IS NOT NULL
            ), fin AS (
              SELECT id, cur AS root_id, depth,
                     row_number() OVER (PARTITION BY id
                                        ORDER BY depth DESC) AS rn
              FROM walk
            )
            SELECT id AS event_id, root_id, depth FROM fin WHERE rn = 1
        """,
        "corpus_overlap": r"""
            -- corpus-level MinHash (operators/overlap.py): same
            -- normalization/shingles/univ-hash family as minhash_lsh but
            -- grouped by source; exact Jaccard from distinct shingles
            WITH w AS (
              SELECT source,
                     string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS ws
              FROM documents
            ), g AS (
              SELECT source,
                     list_distinct(list_transform(range(1, greatest(len(ws)-2, 1)+1),
                                   i -> array_to_string(ws[i:i+2], ' '))) AS grams
              FROM w
            ), e AS (
              SELECT DISTINCT source, sh FROM (
                SELECT source, unnest(grams) AS sh FROM g
              )
            ), h AS (
              SELECT source, sh,
                     ('0x' || substr(md5('42:' || sh), 1, 15))::BIGINT % 2147483647 AS hv
              FROM e
            ), coeffs AS (
              SELECT {A}::BIGINT[] AS ca, {B}::BIGINT[] AS cb
            ), perms AS (SELECT unnest(range(0, 64)) AS p),
            mins AS (
              SELECT h.source, perms.p,
                     min((ca[perms.p + 1] * h.hv + cb[perms.p + 1]) % 2147483647) AS mh
              FROM h CROSS JOIN perms CROSS JOIN coeffs
              GROUP BY h.source, perms.p
            ), sig AS (
              SELECT source, list(mh ORDER BY p) AS s FROM mins GROUP BY source
            ), sizes AS (
              SELECT source, count(*) AS n FROM e GROUP BY source
            ), inter AS (
              SELECT x.source AS group_a, y.source AS group_b,
                     count(*) AS i
              FROM e x JOIN e y ON x.sh = y.sh AND x.source < y.source
              GROUP BY 1, 2
            ), prs AS (
              SELECT a.source AS group_a, b.source AS group_b,
                     a.s AS sa, b.s AS sb
              FROM sig a JOIN sig b ON a.source < b.source
            ), est AS (
              SELECT group_a, group_b,
                     sum(CASE WHEN sa[pp.p + 1] = sb[pp.p + 1]
                         THEN 1 ELSE 0 END) / 64.0 AS est_jaccard
              FROM prs CROSS JOIN perms pp
              GROUP BY group_a, group_b
            )
            SELECT e2.group_a, e2.group_b,
                   round(e2.est_jaccard, 6) AS est_jaccard,
                   round(coalesce(i.i, 0)
                         / (sa.n + sb.n - coalesce(i.i, 0)), 6) AS jaccard
            FROM est e2
            LEFT JOIN inter i
              ON i.group_a = e2.group_a AND i.group_b = e2.group_b
            JOIN sizes sa ON sa.source = e2.group_a
            JOIN sizes sb ON sb.source = e2.group_b
        """.replace("{A}", _sql_int_list(_MINHASH_A)).replace(
            "{B}", _sql_int_list(_MINHASH_B)
        ),
        "bloom_gate_flags": r"""
            -- Bloom gate replica (operators/bloom.py): md5 double-hash
            -- positions g_i = (h1 + i*h2) mod 2048, i < 3; corpus =
            -- doc_id < 400; might_contain = all 3 bits present
            WITH keys AS (
              SELECT doc_id,
                     trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS key
              FROM documents
            ), hashed AS (
              SELECT doc_id,
                     ('0x' || substr(md5('42:' || key), 1, 15))::BIGINT AS h1,
                     ('0x' || substr(md5('43:' || key), 1, 15))::BIGINT AS h2
              FROM keys WHERE key IS NOT NULL
            ), grid AS (SELECT unnest(range(0, 3)) AS i),
            cpos AS (
              SELECT DISTINCT (h1 + i * h2) % 2048 AS pos
              FROM hashed, grid WHERE doc_id < 400
            ), ipos AS (
              SELECT doc_id, (h1 + i * h2) % 2048 AS pos
              FROM hashed, grid
            ), flags AS (
              SELECT doc_id,
                     min(CASE WHEN pos IN (SELECT pos FROM cpos)
                         THEN 1 ELSE 0 END) = 1 AS might_contain
              FROM ipos GROUP BY doc_id
            )
            SELECT k.doc_id, coalesce(f.might_contain, FALSE) AS might_contain
            FROM keys k LEFT JOIN flags f ON k.doc_id = f.doc_id
        """,
        "doc_weighted_sample": r"""
            -- A-ES weighted sample replica (operators/curation.py):
            -- u = (md5_60('7:'||id) + 1) / 2^60, key = ln(u)/w,
            -- top-50 by key desc (doc_id asc ties)
            WITH keyed AS (
              SELECT doc_id, n_chars,
                     ln((('0x' || substr(md5('7:' || doc_id::VARCHAR), 1, 15))::BIGINT + 1)
                        / 1152921504606846976.0)
                       / CAST(n_chars AS DOUBLE) AS aes_key
              FROM documents
              WHERE n_chars IS NOT NULL AND n_chars > 0
            )
            SELECT doc_id, n_chars,
                   CAST(row_number() OVER (ORDER BY aes_key DESC, doc_id) AS INT)
                     AS sample_rank
            FROM keyed
            ORDER BY aes_key DESC, doc_id
            LIMIT 50
        """,
        "hybrid_rrf": _BM25_CTE + r"""
            -- RRF hybrid (operators/retrieval.py): BM25 top-5 + cosine
            -- top-5 fused as sum(1/(60+rank)), ties by doc_id asc
            , qt AS (
              SELECT doc_id AS query_id, t AS term, count(*) AS qtf
              FROM occ WHERE doc_id < 12 GROUP BY doc_id, t
            ), dfreq AS (
              SELECT term, count(*) AS df FROM posts
              WHERE term IN (SELECT DISTINCT term FROM qt)
              GROUP BY term
            ), idf AS (
              SELECT d.term,
                     ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) AS idf,
                     s.avgdl
              FROM dfreq d, stats s
              WHERE d.df >= 1 AND d.df <= s.n_docs * 0.8
            ), sc AS (
              SELECT q.query_id, p.doc_id,
                     sum(q.qtf * i.idf * p.tf * 2.2
                         / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / i.avgdl))) AS score
              FROM qt q
              JOIN idf i ON q.term = i.term
              JOIN posts p ON p.term = q.term
              GROUP BY q.query_id, p.doc_id
            ), lex AS (
              SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, doc_id ASC) AS rank
              FROM sc QUALIFY rank <= 5
            ), eq AS (
              SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 12
            ), cc AS (
              SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
              FROM embeddings
            ), ss AS (
              SELECT query_id, neighbor_id,
                     list_cosine_similarity(qv, cv) AS cos
              FROM eq CROSS JOIN cc WHERE neighbor_id != query_id
            ), sem AS (
              SELECT query_id, neighbor_id AS doc_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM ss QUALIFY rank <= 5
            ), uni AS (
              SELECT query_id, doc_id, 1.0 / (60 + rank) AS c FROM lex
              UNION ALL
              SELECT query_id, doc_id, 1.0 / (60 + rank) AS c FROM sem
            ), fs AS (
              SELECT query_id, doc_id, sum(c) AS rrf_score
              FROM uni GROUP BY query_id, doc_id
            )
            SELECT query_id, doc_id, round(rrf_score, 6) AS rrf_score,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY rrf_score DESC, doc_id ASC) AS INT) AS rrf_rank
            FROM fs
            QUALIFY rrf_rank <= 8
        """,
    }
