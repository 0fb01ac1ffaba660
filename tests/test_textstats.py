"""Training-data text operators: redaction, repetition, contamination."""


def test_redaction_patterns_and_counts(spark):
    from featureengineer_spark.operators.textstats import with_redaction

    rows = [
        (1, "mail me at a.b+c@example.com or visit https://x.io/p?q=1 now"),
        (2, "server 10.0.255.7 logged card 12345678 twice: 12345678"),
        (3, None),
        (4, "clean text with a short number 123"),
    ]
    out = {
        r["doc_id"]: r
        for r in with_redaction(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1]["n_redacted_email"] == 1 and out[1]["n_redacted_url"] == 1
    assert "<EMAIL>" in out[1]["text_redacted"] and "<URL>" in out[1]["text_redacted"]
    assert "example.com" not in out[1]["text_redacted"].replace("<EMAIL>", "")
    assert out[2]["n_redacted_ip"] == 1 and out[2]["n_redacted_number"] == 2
    assert out[2]["text_redacted"].count("<NUMBER>") == 2
    assert out[3]["text_redacted"] == ""
    assert out[4]["text_redacted"] == rows[3][1]  # untouched


def test_repetition_stats_values(spark):
    from featureengineer_spark.operators.textstats import with_repetition_stats

    rows = [
        (1, "a b c a b c a b c"),     # 9 words (3 distinct); 7 3-grams, 3 distinct
        (2, "all words are unique here"),
        (3, ""),
    ]
    out = {
        r["doc_id"]: r
        for r in with_repetition_stats(
            spark.createDataFrame(rows, "doc_id long, text string"), n=3
        ).collect()
    }
    assert abs(out[1]["rep_word_frac"] - (1 - 3 / 9)) < 1e-9
    assert abs(out[1]["rep_3gram_frac"] - (1 - 3 / 7)) < 1e-9
    assert out[2]["rep_word_frac"] == 0.0 and out[2]["rep_3gram_frac"] == 0.0
    assert out[3]["rep_word_frac"] == 0.0


def test_contamination_overlap_finds_verbatim_spans(spark):
    from featureengineer_spark.operators.textstats import contamination_overlap

    span = "the quick brown fox jumps over the lazy sleeping dog tonight"
    corpus = spark.createDataFrame(
        [
            (1, "prefix words here " + span + " suffix words"),
            (2, "completely unrelated text about spark window functions and joins"),
            (3, span),  # exact benchmark text
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, span)], "bench_doc_id long, text string")
    got = {
        (r["corpus_id"], r["bench_id"]): r["n_shared_ngrams"]
        for r in contamination_overlap(
            corpus, bench, bench_id_col="bench_doc_id", n=8, min_shared=3
        ).collect()
    }
    assert set(got) == {(1, 100), (3, 100)}  # doc 2 clean
    assert got[(3, 100)] >= got[(1, 100)] >= 3


def test_unigram_logprob_matches_python_oracle(spark):
    import math

    from featureengineer_spark.operators.textstats import with_unigram_logprob

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat"),
        (3, "zyx qwv unseen gibberish tokens"),
        (4, None),
    ]
    out = {
        r["doc_id"]: r
        for r in with_unigram_logprob(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    # python oracle with the same add-one smoothing
    words = []
    for _, t in rows:
        words += (t or "").lower().split()
    from collections import Counter

    c = Counter(words)
    total, vocab = sum(c.values()), len(c)

    def logp(w):
        return math.log((c[w] + 1.0) / (total + vocab + 1.0))

    for did, t in rows:
        ws = (t or "").lower().split()
        if not ws:
            assert out[did]["mean_word_logprob"] is None
            continue
        exp = sum(logp(w) for w in ws) / len(ws)
        assert abs(out[did]["mean_word_logprob"] - exp) < 1e-9, did
    # common-word doc scores higher than the gibberish doc
    assert out[1]["mean_word_logprob"] > out[3]["mean_word_logprob"]


def test_unigram_logprob_broadcasts_vocab_and_salted_parity(spark):
    """The word join key is Zipf-skewed, so the model side must go out as
    a broadcast hash join when the vocab fits (plan-asserted: no shuffle
    on `word` at all); the salted shuffle variant for oversized vocabs
    must return identical values."""
    from featureengineer_spark.operators.textstats import (
        unigram_model,
        with_unigram_logprob,
    )

    docs = spark.createDataFrame(
        [(i, "the quick brown fox " * (i % 3 + 1) + f"tail{i}") for i in range(40)],
        "doc_id long, text string",
    )
    model = unigram_model(docs)
    out = with_unigram_logprob(docs, model)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    base = {r.doc_id: (r.mean_word_logprob, r.n_scored_words) for r in out.collect()}

    salted = with_unigram_logprob(
        docs, model, broadcast_model=False, salt_partitions=4
    )
    got = {r.doc_id: (r.mean_word_logprob, r.n_scored_words) for r in salted.collect()}
    assert set(got) == set(base)
    for k in base:
        assert got[k][1] == base[k][1]
        assert abs(got[k][0] - base[k][0]) < 1e-12


def test_quantile_thresholds_exact_and_approx(spark):
    """Exact path == numpy linear-interpolated percentile per group;
    approx (sketch) path lands within rank-error tolerance of exact;
    global (ungrouped) form works; q-name mangling handles fractional
    percents."""
    import numpy as np

    from featureengineer_spark.operators.textstats import quantile_thresholds

    rng = np.random.default_rng(9)
    rows = [
        (int(i), ["a", "b"][i % 2], float(v))
        for i, v in enumerate(rng.gamma(2.0, 50.0, size=4000))
    ]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    got = {
        r["grp"]: r
        for r in quantile_thresholds(
            df, "v", "grp", qs=(0.1, 0.5, 0.999)
        ).collect()
    }
    pdf = {g: np.array([v for i, gg, v in rows if gg == g]) for g in ("a", "b")}
    for g in ("a", "b"):
        np.testing.assert_allclose(
            [got[g]["q10"], got[g]["q50"], got[g]["q99_9"]],
            np.percentile(pdf[g], [10, 50, 99.9]),
            rtol=1e-9,
        )
    # approx: rank error ~1/accuracy → value close to exact on this data
    approx = {
        r["grp"]: r
        for r in quantile_thresholds(
            df, "v", "grp", qs=(0.1, 0.5), approx=True, accuracy=10_000
        ).collect()
    }
    for g in ("a", "b"):
        assert abs(approx[g]["q50"] - got[g]["q50"]) / got[g]["q50"] < 0.02
    # global form: one row, no group column
    glob = quantile_thresholds(df, "v", qs=(0.5,)).collect()
    assert len(glob) == 1
    np.testing.assert_allclose(
        glob[0]["q50"],
        np.percentile(np.array([v for _, _, v in rows]), 50),
        rtol=1e-9,
    )


def test_bigram_logprob_matches_python_oracle(spark):
    """Bigram model + per-doc mean conditional logprob vs a literal
    python replication: add-one smoothing over (prev totals + V), OOV
    floors for unseen pair/unseen prev, null for sub-2-token docs, and
    the fluency property (coherent corpus text outscores shuffled word
    salad with identical unigrams)."""
    import math

    from featureengineer_spark.operators.textstats import (
        bigram_model,
        with_bigram_logprob,
    )

    texts = {
        0: "the cat sat on the mat",
        1: "the cat sat on the rug",
        2: "the dog sat on the mat",
        3: "mat the on sat cat the",   # same unigrams as 0, scrambled
        4: "one",                      # single token → no pairs → null
        5: "",                         # empty → null
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    out = {r.doc_id: r for r in with_bigram_logprob(df).collect()}

    # python replication
    def toks(t):
        import re
        t = re.sub(r"[^a-z0-9\s]", " ", t.lower())
        return [w for w in re.sub(r"\s+", " ", t).strip().split(" ") if w]

    pair_counts, prev_counts, vocab = {}, {}, set()
    for t in texts.values():
        ws = toks(t)
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
            prev_counts[a] = prev_counts.get(a, 0) + 1
    V = len(vocab)
    for did, t in texts.items():
        ws = toks(t)
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            assert out[did].mean_bigram_logprob is None
            continue
        lps = [
            math.log(
                (pair_counts.get((a, b), 0) + 1)
                / (prev_counts.get(a, 0) + V + 1)
            )
            for a, b in pairs
        ]
        assert abs(out[did].mean_bigram_logprob - sum(lps) / len(lps)) < 1e-9, did
        assert out[did].n_scored_pairs == len(pairs)
    # fluency: scrambled doc scores strictly below its coherent twin
    assert out[3].mean_bigram_logprob < out[0].mean_bigram_logprob
    # explicit model reuse path + broadcast off gives identical values
    m = bigram_model(df)
    alt = {r.doc_id: r.mean_bigram_logprob
           for r in with_bigram_logprob(df, m, broadcast_model=False).collect()}
    for did in (0, 1, 2, 3):
        assert abs(alt[did] - out[did].mean_bigram_logprob) < 1e-12
