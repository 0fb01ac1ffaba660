"""BM25 retrieval: python-oracle parity, df-cap stopword guard, plan
shape (broadcast query side, no cartesian)."""

from __future__ import annotations

import collections
import math
import re

import pytest

from featureengineer_spark.operators.retrieval import bm25_idf, bm25_topk

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a quick brown dog"),
    (3, "lazy cats sleep all day, lazy dogs bark"),
    (4, "foxes and dogs are animals; the fox is quick"),
    (5, ""),
    (6, None),
    (7, "quick quick quick fox"),
    (8, "the the the the"),
]
QUERIES = [
    (100, "quick fox"),
    (101, "lazy dog bark"),
    (102, "zzz unseen term"),
    (103, "the"),  # df-capped stopword → no results
]


def _norm(t: str | None) -> str:
    t = (t or "").lower()
    t = re.sub(r"[^a-z0-9\s]", " ", t)
    return re.sub(r"\s+", " ", t).strip()


def _py_bm25(k: int = 3, k1: float = 1.2, b: float = 0.75,
             min_df: int = 1, max_df_frac: float = 0.5):
    tok = {d: _norm(t).split(" ") if _norm(t) else [] for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in tok.values()) / n
    dfreq: collections.Counter = collections.Counter()
    for ws in tok.values():
        dfreq.update(set(ws))

    def score(qws, d):
        tf = collections.Counter(tok[d])
        s = 0.0
        for t, qtf in collections.Counter(qws).items():
            df_ = dfreq.get(t, 0)
            if df_ < min_df or df_ > max_df_frac * n or tf[t] == 0:
                continue
            idf = math.log(1 + (n - df_ + 0.5) / (df_ + 0.5))
            s += (qtf * idf * tf[t] * (k1 + 1)
                  / (tf[t] + k1 * (1 - b + b * len(tok[d]) / avgdl)))
        return s

    exp = {}
    for qid, qt in QUERIES:
        qws = [w for w in _norm(qt).split(" ") if w]
        cand = sorted(
            ((score(qws, d), d) for d, _ in DOCS if score(qws, d) > 0),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        exp[qid] = [(d, r + 1, s) for r, (s, d) in enumerate(cand)]
    return exp


@pytest.fixture(scope="module")
def frames(spark):
    corpus = spark.createDataFrame(DOCS, ["doc_id", "text"])
    queries = spark.createDataFrame(QUERIES, ["query_id", "query_text"])
    return corpus, queries


def test_bm25_matches_python_oracle(spark, frames):
    corpus, queries = frames
    out = bm25_topk(corpus, queries, k=3).collect()
    got = collections.defaultdict(list)
    for r in sorted(out, key=lambda r: (r.query_id, r.rank)):
        got[r.query_id].append((r.doc_id, r.rank, r.score))
    exp = _py_bm25(k=3)
    for qid, rows in exp.items():
        assert len(got.get(qid, [])) == len(rows), qid
        for (gd, gr, gs), (ed, er, es) in zip(got[qid], rows):
            assert (gd, gr) == (ed, er)
            assert abs(gs - es) < 1e-9


def test_df_cap_drops_stopwords(spark, frames):
    corpus, queries = frames
    out = bm25_topk(corpus, queries, k=5).collect()
    # 'the' appears in 3/8 docs -> kept at 0.5 cap; at cap 0.25 dropped
    strict = bm25_topk(corpus, queries, k=5, max_df_frac=0.25).collect()
    assert any(r.query_id == 103 for r in out)
    assert not any(r.query_id == 103 for r in strict)
    # unseen terms never match regardless
    assert not any(r.query_id == 102 for r in out)


def test_bm25_idf_band(spark, frames):
    corpus, _ = frames
    rows = {r.term: r for r in bm25_idf(corpus, min_df=2).collect()}
    n = len(DOCS)
    # every surviving term respects the df band and the idf formula
    assert rows, "idf table empty"
    for t, r in rows.items():
        assert 2 <= r.df <= 0.5 * n
        assert abs(r.idf - math.log(1 + (n - r.df + 0.5) / (r.df + 0.5))) < 1e-12
    # exact membership from a python-side recount
    dfreq: collections.Counter = collections.Counter()
    for _, t in DOCS:
        dfreq.update(set(_norm(t).split(" ")) - {""})
    expect = {t for t, d in dfreq.items() if 2 <= d <= 0.5 * n}
    assert set(rows) == expect


def test_plan_shape_no_cartesian(spark, frames):
    corpus, queries = frames
    plan = bm25_topk(
        corpus, queries, k=3, broadcast_queries=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
