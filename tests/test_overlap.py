"""Corpus-overlap MinHash: deterministic python-oracle parity (md5
variant), exact-Jaccard correctness, estimator sanity."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pytest

from featureengineer_spark.operators.dedup import (
    MINHASH_PRIME,
    minhash_perm_coeffs,
)
from featureengineer_spark.operators.overlap import (
    corpus_overlap,
    corpus_signatures,
)

DOCS = [
    ("a", "the quick brown fox jumps over the lazy dog near the river bank"),
    ("a", "pack my box with five dozen liquor jugs for the trip"),
    ("b", "the quick brown fox jumps over the lazy dog near the old mill"),
    ("b", "sphinx of black quartz judge my vow tonight"),
    ("c", "completely different text about spark query engines and shuffles"),
]


def _norm(t: str) -> str:
    t = t.lower()
    t = re.sub(r"[^a-z0-9\s]", " ", t)
    return re.sub(r"\s+", " ", t).strip()


def _shingles(t: str, n: int = 3) -> set[str]:
    ws = _norm(t).split(" ")
    k = max(len(ws) - (n - 1), 1)
    return {" ".join(ws[i : i + n]) for i in range(k)}


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_signature(shingles: set[str], num_perm: int = 64, seed: int = 42):
    a, b = minhash_perm_coeffs(num_perm, seed)
    hs = [_md5_60(f"{seed}:{sh}") % MINHASH_PRIME for sh in shingles]
    return [
        min((a[p] * h + b[p]) % MINHASH_PRIME for h in hs)
        for p in range(num_perm)
    ]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["source", "text"])


def _group_shingles():
    out: dict[str, set[str]] = {}
    for g, t in DOCS:
        out.setdefault(g, set()).update(_shingles(t))
    return out


def test_signatures_match_python_oracle(spark, docs_df):
    sigs = {
        r.source: list(r.minhash)
        for r in corpus_signatures(docs_df, hash_fn="md5").collect()
    }
    for g, sh in _group_shingles().items():
        assert sigs[g] == _py_signature(sh), g


def test_overlap_matches_python_oracle(spark, docs_df):
    rows = {
        (r.group_a, r.group_b): r
        for r in corpus_overlap(docs_df, hash_fn="md5", exact=True).collect()
    }
    gs = _group_shingles()
    names = sorted(gs)
    assert set(rows) == {(x, y) for i, x in enumerate(names)
                        for y in names[i + 1:]}
    for (x, y), r in rows.items():
        exact = len(gs[x] & gs[y]) / len(gs[x] | gs[y])
        assert abs(r.jaccard - exact) < 1e-12
        sx, sy = _py_signature(gs[x]), _py_signature(gs[y])
        est = sum(1 for u, v in zip(sx, sy) if u == v) / 64.0
        assert abs(r.est_jaccard - est) < 1e-12


def test_estimator_tracks_truth(spark, docs_df):
    # a/b share a long clause -> positive overlap; c is disjoint from
    # both -> estimator must separate the two regimes
    rows = {
        (r.group_a, r.group_b): r
        for r in corpus_overlap(docs_df, hash_fn="md5", exact=True).collect()
    }
    assert rows[("a", "b")].jaccard > 0.15
    assert rows[("a", "c")].jaccard == 0.0
    assert rows[("a", "b")].est_jaccard > rows[("a", "c")].est_jaccard
