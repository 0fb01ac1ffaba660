from __future__ import annotations

import re

import pytest

from featureengineer_spark.operators.tokenize import (
    EOW,
    apply_bpe,
    encode_words,
    train_bpe,
    word_counts,
)


def _norm_words(text: str) -> list[str]:
    t = re.sub(r"[^a-z0-9\s]", " ", text.lower())
    t = re.sub(r"\s+", " ", t).strip()
    return [w for w in t.split(" ") if w]


def _oracle_train(docs: list[str], n_merges: int, min_pair_count: int = 2):
    """Sennrich reference trainer on the word-frequency table."""
    wc: dict[str, int] = {}
    for t in docs:
        for w in _norm_words(t):
            wc[w] = wc.get(w, 0) + 1
    segs = {w: list(w) + [EOW] for w in wc}
    merges = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for w, syms in segs.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + wc[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _ = best
        merges.append((a, b))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges, segs, wc


DOCS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest new low",
    "low low low new new wide",
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], ["doc_id", "text"]
    )


def test_word_counts(spark, docs_df):
    got = {r.word: r.wcount for r in word_counts(docs_df).collect()}
    _, _, wc = _oracle_train(DOCS, 0)
    assert got == wc


def test_train_bpe_matches_reference_trainer(spark, docs_df):
    n = 12
    exp_merges, exp_segs, _ = _oracle_train(DOCS, n)
    merges, wt = train_bpe(docs_df, n_merges=n)
    assert merges == exp_merges
    got_segs = {r.word: list(r.syms) for r in wt.collect()}
    assert got_segs == exp_segs


def test_early_stop_on_min_pair_count(spark):
    df = spark.createDataFrame([(0, "ab cd ef")], ["doc_id", "text"])
    merges, _ = train_bpe(df, n_merges=10, min_pair_count=2)
    assert merges == []  # every pair occurs once


def test_encode_words_uses_trained_segmentation_and_char_fallback(spark, docs_df):
    merges, wt = train_bpe(docs_df, n_merges=12)
    enc = encode_words(docs_df, wt)
    segs = {r.word: list(r.syms) for r in wt.collect()}
    for r in enc.collect():
        assert list(r.tokens) == segs[r.word]
        assert r.n_tokens == len(segs[r.word])
    # OOV word falls back to characters + EOW
    oov = spark.createDataFrame([(99, "zzq")], ["doc_id", "text"])
    row = encode_words(oov, wt).collect()[0]
    assert list(row.tokens) == ["z", "z", "q", EOW]


def test_apply_bpe_rank_encoder_matches_training_segmentation(spark, docs_df):
    # On training words, replaying merges by rank reproduces the trained
    # segmentation (BPE invariant); OOV words encode deterministically.
    merges, wt = train_bpe(docs_df, n_merges=12)
    segs = {r.word: list(r.syms) for r in wt.collect()}
    out = {r.doc_id: list(r.tokens) for r in apply_bpe(docs_df, merges).collect()}
    for i, t in enumerate(DOCS):
        exp = [s for w in _norm_words(t) for s in segs[w]]
        assert out[i] == exp


def test_merges_compress_token_count(spark, docs_df):
    merges, wt = train_bpe(docs_df, n_merges=12)
    assert len(merges) > 0
    enc = encode_words(docs_df, wt)
    import pyspark.sql.functions as F

    total = enc.agg(F.sum("n_tokens")).collect()[0][0]
    chars = sum(len(w) + 1 for t in DOCS for w in _norm_words(t))
    assert total < chars  # merging strictly reduced the token count
