"""Bloom ingest gate: no false negatives ever, python-oracle bit
parity (md5 double hashing), FP rate in the analytic ballpark, empty
corpus."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from featureengineer_spark.operators.bloom import (
    bloom_gate,
    build_bloom,
    with_bloom_flag,
)


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_positions(key: str, m_bits: int, k: int, seed: int = 42):
    h1 = _md5_60(f"{seed}:{key}")
    h2 = _md5_60(f"{seed + 1}:{key}")
    return [(h1 + i * h2) % m_bits for i in range(k)]


def _py_bloom(keys, m_bits: int, k: int, seed: int = 42):
    bm = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    for key in keys:
        for p in _py_positions(key, m_bits, k, seed):
            bm[p >> 3] |= 1 << (p & 7)
    return bm


M, K = 4096, 5
SEEN = [f"doc-{i}" for i in range(200)]
NEW = [f"new-{i}" for i in range(200)]


@pytest.fixture(scope="module")
def corpora(spark):
    corpus = spark.createDataFrame([(s,) for s in SEEN], ["key"])
    incoming = spark.createDataFrame(
        [(s,) for s in SEEN + NEW], ["key"]
    )
    return corpus, incoming


def test_bitmap_matches_python_oracle(spark, corpora):
    corpus, _ = corpora
    got = np.frombuffer(
        build_bloom(corpus, "key", m_bits=M, k=K), dtype=np.uint8
    )
    assert np.array_equal(got, _py_bloom(SEEN, M, K))


def test_no_false_negatives_and_exact_flags(spark, corpora):
    corpus, incoming = corpora
    bloom = build_bloom(corpus, "key", m_bits=M, k=K)
    flags = {
        r.key: r.might_contain
        for r in with_bloom_flag(
            incoming, "key", bloom, m_bits=M, k=K
        ).collect()
    }
    bm = _py_bloom(SEEN, M, K)
    for key in SEEN:
        assert flags[key] is True  # every seen key flagged — no FN
    for key in NEW:
        exp = all(bm[p >> 3] >> (p & 7) & 1 for p in _py_positions(key, M, K))
        assert flags[key] == exp  # FP verdicts byte-deterministic


def test_gate_and_fp_rate(spark, corpora):
    corpus, incoming = corpora
    kept = {r.key for r in bloom_gate(corpus, incoming, "key",
                                      m_bits=M, k=K).collect()}
    assert not (kept & set(SEEN))  # nothing seen passes
    fp = 1 - len(kept) / len(NEW)
    # analytic FP at n=200, m=4096, k=5: (1-exp(-k n/m))^k ~ 0.5%
    assert fp < 0.10


def test_empty_corpus_passes_everything(spark, corpora):
    _, incoming = corpora
    empty = incoming.filter("key = 'nope'")
    kept = bloom_gate(empty, incoming, "key", m_bits=M, k=K).count()
    assert kept == incoming.count()


def test_null_keys_never_flagged(spark):
    corpus = spark.createDataFrame([("x",)], ["key"])
    inc = spark.createDataFrame([("x",), (None,)], ["key"])
    bloom = build_bloom(corpus, "key", m_bits=M, k=K)
    rows = {
        r.key: r.might_contain
        for r in with_bloom_flag(inc, "key", bloom, m_bits=M, k=K).collect()
    }
    assert rows["x"] is True and rows[None] is False
