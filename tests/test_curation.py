"""Curation operators: deterministic stratified sampling + packing."""

import pytest
from pyspark.sql import functions as F


def test_stratified_sample_deterministic_and_nested(spark):
    from featureengineer_spark.operators.curation import stratified_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "fr") for i in range(3000)],
        "doc_id long, lang string",
    )
    a = stratified_sample(df, {"en": 0.5, "fr": 0.1}, "lang", seed=7)
    b = stratified_sample(
        df.repartition(13), {"en": 0.5, "fr": 0.1}, "lang", seed=7
    )
    ids_a = {r.doc_id for r in a.collect()}
    ids_b = {r.doc_id for r in b.collect()}
    assert ids_a == ids_b  # partitioning-independent, re-run identical
    n_en = sum(1 for i in ids_a if i % 3)
    n_fr = len(ids_a) - n_en
    assert abs(n_en / 2000 - 0.5) < 0.05 and abs(n_fr / 1000 - 0.1) < 0.05
    # nested: raising a fraction only ADDS rows
    bigger = {
        r.doc_id
        for r in stratified_sample(df, {"en": 0.8, "fr": 0.1}, "lang", seed=7).collect()
    }
    assert ids_a <= bigger
    # unmapped strata default to 0
    extra = df.unionByName(
        spark.createDataFrame([(99999, "de")], "doc_id long, lang string")
    )
    assert (
        stratified_sample(extra, {"en": 0.5, "fr": 0.1}, "lang", seed=7)
        .filter("lang = 'de'").count() == 0
    )


def test_pack_sequences_concat_then_chunk(spark):
    from featureengineer_spark.operators.curation import pack_sequences

    rows = [(i, [40, 100, 80, 30, 60, 200, 10][i]) for i in range(7)]
    out = {
        r.doc_id: (r.seq_idx, r.seq_offset)
        for r in pack_sequences(
            spark.createDataFrame(rows, "doc_id long, n_tokens long"), budget=128
        ).collect()
    }
    # exclusive cumsums: 0, 40, 140, 220, 250, 310, 510
    assert out == {
        0: (0, 0), 1: (0, 40), 2: (1, 12), 3: (1, 92),
        4: (1, 122), 5: (2, 54), 6: (3, 126),
    }
    # sharded: packing restarts per shard, deterministic per shard
    sharded = pack_sequences(
        spark.createDataFrame(
            [(i, 100, i % 2) for i in range(8)], "doc_id long, n_tokens long, shard int"
        ),
        budget=250,
        shard_col="shard",
    )
    got = {(r.shard, r.doc_id): (r.seq_idx, r.seq_offset) for r in sharded.collect()}
    assert got[(0, 0)] == (0, 0) and got[(0, 2)] == (0, 100)
    assert got[(0, 4)] == (0, 200) and got[(0, 6)] == (1, 50)
    assert got[(1, 1)] == (0, 0) and got[(1, 7)] == (1, 50)


def test_conversation_quality_profile(spark):
    from featureengineer_spark.operators.curation import conversation_quality

    rows = [
        # c1: clean alternation with a system turn interleaved
        ("c1", 0, "system", "be helpful"),
        ("c1", 1, "user", "hi"),
        ("c1", 2, "assistant", "hello"),
        ("c1", 3, "user", "q"),
        ("c1", 4, "assistant", "a"),
        # c2: double assistant turn (1 violation), one empty text,
        # starts with assistant
        ("c2", 0, "assistant", "unprompted"),
        ("c2", 1, "assistant", ""),
        ("c2", 2, "user", "ok"),
    ]
    out = {
        r["conv_id"]: r
        for r in conversation_quality(
            spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
        ).collect()
    }
    c1 = out["c1"]
    assert c1["n_turns"] == 5 and c1["n_user_turns"] == 2 and c1["n_assistant_turns"] == 2
    assert c1["alternation_violations"] == 0 and c1["starts_with_user"]
    assert c1["empty_text_frac"] == 0.0
    c2 = out["c2"]
    assert c2["alternation_violations"] == 1
    assert not c2["starts_with_user"]
    assert abs(c2["empty_text_frac"] - 1 / 3) < 1e-9


def test_pack_sequences_unsharded_guard(spark):
    """The unsharded path routes everything through ONE window partition,
    so it must refuse large inputs instead of silently serializing them;
    shard_col and an explicit raised cap both stay available."""
    from featureengineer_spark.operators.curation import pack_sequences

    df = spark.createDataFrame(
        [(i, 100, i % 4) for i in range(50)], "doc_id long, n_tokens long, shard int"
    )
    with pytest.raises(ValueError, match="single window partition"):
        pack_sequences(df, budget=128, max_unsharded_rows=10).collect()
    # sharded path: no guard needed, no single global window
    assert pack_sequences(df, budget=128, shard_col="shard",
                          max_unsharded_rows=10).count() == 50
    # explicit opt-in past the cap
    assert pack_sequences(df, budget=128, max_unsharded_rows=50).count() == 50
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, budget=0)


def test_shuffle_shards_deterministic_permutation(spark):
    """Shard + position are a pure function of (seed, id): partitioning-
    invariant, positions form 0..n-1 per shard, and a new seed is a
    different permutation (fresh epoch)."""
    from featureengineer_spark.operators.curation import shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = shuffle_shards(df, 8, seed=1).toPandas()
    b = shuffle_shards(df.repartition(13), 8, seed=1).toPandas()
    ka = a.set_index("doc_id")[["shard", "shard_pos"]].to_dict("index")
    kb = b.set_index("doc_id")[["shard", "shard_pos"]].to_dict("index")
    assert ka == kb  # partitioning-invariant
    assert a["shard"].between(0, 7).all()
    for s, grp in a.groupby("shard"):
        assert sorted(grp["shard_pos"]) == list(range(len(grp)))
    c = shuffle_shards(df, 8, seed=2).toPandas()
    kc = c.set_index("doc_id")[["shard", "shard_pos"]].to_dict("index")
    assert ka != kc  # different epoch
    # md5 variant works and is deterministic too
    m1 = shuffle_shards(df, 4, seed=1, hash_fn="md5").toPandas()
    m2 = shuffle_shards(df.repartition(7), 4, seed=1, hash_fn="md5").toPandas()
    assert m1.set_index("doc_id")["shard_pos"].to_dict() == \
           m2.set_index("doc_id")["shard_pos"].to_dict()
    with pytest.raises(ValueError, match="n_shards"):
        shuffle_shards(df, 0)


def test_token_budget_mix_hits_targets_and_nests(spark):
    """Per-domain kept token mass approximates the budget; unlisted
    domains default to dropped; raising a budget only ADDS docs; the
    keep set is partitioning-invariant."""
    from featureengineer_spark.operators.curation import token_budget_mix

    rows = []
    for i in range(4000):
        lang = ["en", "es", "de"][i % 3]
        rows.append((i, lang, 100 + (i % 7) * 10))
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    tot = {r["lang"]: r["t"] for r in
           df.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()}
    targets = {"en": int(tot["en"] * 0.4), "es": int(tot["es"] * 0.85)}
    out = token_budget_mix(df, targets, domain_col="lang",
                           token_col="n_tokens", seed=5)
    kept = {r["lang"]: r["t"] for r in
            out.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()}
    assert "de" not in kept  # default budget 0
    assert abs(kept["en"] / targets["en"] - 1) < 0.1
    assert abs(kept["es"] / targets["es"] - 1) < 0.1
    # over-budget target keeps the whole domain
    all_en = token_budget_mix(df, {"en": tot["en"] * 10}, domain_col="lang",
                              token_col="n_tokens", seed=5)
    assert all_en.filter("lang='en'").count() == df.filter("lang='en'").count()
    # nested: doubling a budget only adds documents
    ids_small = {r.doc_id for r in out.select("doc_id").collect()}
    bigger = token_budget_mix(
        df, {"en": targets["en"] * 2, "es": targets["es"]},
        domain_col="lang", token_col="n_tokens", seed=5)
    ids_big = {r.doc_id for r in bigger.select("doc_id").collect()}
    assert {i for i in ids_small if i % 3 == 0} <= ids_big
    # partitioning-invariant
    again = token_budget_mix(df.repartition(17), targets, domain_col="lang",
                             token_col="n_tokens", seed=5)
    assert {r.doc_id for r in again.select("doc_id").collect()} == ids_small


def test_token_budget_mix_null_domain_gets_default(spark):
    """NULL-domain rows are their own group sampled under
    default_tokens — not silently dropped by inner-join null semantics:
    default 0 drops them explicitly, an over-budget default keeps them
    all, and a partial default samples to roughly that token mass."""
    from featureengineer_spark.operators.curation import token_budget_mix

    rows = []
    for i in range(3000):
        lang = None if i % 3 == 0 else "en"
        rows.append((i, lang, 100 + (i % 7) * 10))
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    null_total = (
        df.filter(F.col("lang").isNull())
        .agg(F.sum("n_tokens").alias("t")).first()["t"]
    )
    en_total = (
        df.filter(F.col("lang") == "en").agg(F.sum("n_tokens").alias("t")).first()["t"]
    )

    # default 0: NULL-domain rows dropped, en intact
    out0 = token_budget_mix(df, {"en": en_total * 2}, domain_col="lang",
                            token_col="n_tokens", seed=5)
    assert out0.filter(F.col("lang").isNull()).count() == 0
    assert out0.filter(F.col("lang") == "en").count() == 2000

    # over-budget default keeps every NULL-domain row
    out_all = token_budget_mix(df, {"en": en_total * 2}, domain_col="lang",
                               token_col="n_tokens", seed=5,
                               default_tokens=null_total * 2)
    assert out_all.filter(F.col("lang").isNull()).count() == 1000

    # partial default samples NULL rows to ~half their token mass
    out_half = token_budget_mix(df, {"en": en_total * 2}, domain_col="lang",
                                token_col="n_tokens", seed=5,
                                default_tokens=null_total // 2)
    kept_null = (
        out_half.filter(F.col("lang").isNull())
        .agg(F.sum("n_tokens").alias("t")).first()["t"]
    )
    assert abs(kept_null / (null_total / 2) - 1) < 0.15


def test_with_chunks_matches_python_oracle(spark):
    from featureengineer_spark.operators.curation import with_chunks

    texts = {
        0: "a" * 600,
        1: "hello world",
        2: "",
        3: None,
        4: "x" * 512,       # exactly one chunk
        5: "y" * 513,       # just over → two chunks
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    out = with_chunks(df, chunk_chars=512, overlap=64)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text, r.n_chunks))
    step = 512 - 64
    for did, text in texts.items():
        t = text or ""
        n_chunks = max(-(-(max(len(t) - 64, len(t) and 0)) // step), 1) if t else 1
        import math
        n_chunks = max(math.ceil((len(t) - 64) / step), 1)
        exp = [(i, t[i * step : i * step + 512]) for i in range(n_chunks)]
        rows = sorted(got[did])
        assert [(i, c) for i, c, _ in rows] == exp, did
        assert all(n == n_chunks for _, _, n in rows)
        # coverage: stripping the overlap re-concatenates to the original
        rebuilt = "".join(c if i == 0 else c[64:] for i, c, _ in rows)
        assert rebuilt == t, did
    with pytest.raises(ValueError, match="overlap"):
        with_chunks(df, chunk_chars=64, overlap=64)


def test_render_conversations(spark):
    from featureengineer_spark.operators.curation import render_conversations

    rows = [
        ("c1", 1, "user", "hi"),
        ("c1", 0, "system", "be helpful"),
        ("c1", 2, "assistant", "hello"),
        ("c2", 0, "user", None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    got = {r.conv_id: r for r in render_conversations(df.repartition(5)).collect()}
    assert got["c1"].rendered == "system: be helpful\nuser: hi\nassistant: hello"
    assert got["c1"].n_turns == 3
    assert got["c1"].n_chars == len(got["c1"].rendered)
    assert got["c2"].rendered == "user: "


def test_drop_repeated_turns(spark):
    from featureengineer_spark.operators.curation import drop_repeated_turns

    rows = [
        ("c1", 0, "user", "hello"),
        ("c1", 1, "user", "Hello  "),      # consecutive same role+normalized text → drop
        ("c1", 2, "assistant", "hi"),
        ("c1", 3, "user", "hello"),        # repeat but NOT consecutive → keep
        ("c1", 4, "user", "different"),
        ("c2", 0, "user", "hello"),        # other conversation unaffected
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    kept = {(r.conv_id, r.turn_idx) for r in drop_repeated_turns(df.repartition(4)).collect()}
    assert kept == {("c1", 0), ("c1", 2), ("c1", 3), ("c1", 4), ("c2", 0)}
