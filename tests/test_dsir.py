"""DSIR importance weighting (operators/dsir.py) vs a pure-Python
reference of the identical hashed-ngram formula."""

import hashlib
import math
import re

import pytest

B = 64
ALPHA = 1.0

TARGET = [
    (100, "spark sql window functions over partitioned data"),
    (101, "spark dataframe joins and window aggregation"),
    (102, "sql queries on spark with window functions"),
]
RAW = [
    (1, "spark sql window functions and dataframe joins"),   # target-like
    (2, "recipe for sourdough bread with wild yeast starter"),  # off-target
    (3, "spark window aggregation over sql data"),           # target-like
    (4, ""),                                                  # empty
]


def _norm(s):
    s = re.sub(r"[^a-z0-9\s]", " ", s.lower())
    return re.sub(r"\s+", " ", s).strip()


def _feats(text):
    ws = [w for w in _norm(text).split(" ") if w]
    grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    return [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B for g in grams]


def _py_weights():
    t_counts, r_counts = {}, {}
    for _, t in TARGET:
        for b in _feats(t):
            t_counts[b] = t_counts.get(b, 0) + 1
    for _, t in RAW:
        for b in _feats(t):
            r_counts[b] = r_counts.get(b, 0) + 1
    t_tot, r_tot = sum(t_counts.values()), sum(r_counts.values())

    def t_logp(b):
        return math.log((t_counts.get(b, 0) + ALPHA) / (t_tot + ALPHA * B))

    def r_logp(b):
        return math.log((r_counts.get(b, 0) + ALPHA) / (r_tot + ALPHA * B))

    out = {}
    for did, t in RAW:
        fs = _feats(t)
        out[did] = (len(fs), sum(t_logp(b) - r_logp(b) for b in fs))
    return out


def _dfs(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, target


def test_weights_match_python_reference(spark):
    from featureengineer_spark.operators.dsir import dsir_weights

    raw, target = _dfs(spark)
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_logweight"])
        for r in dsir_weights(raw, target, n_buckets=B, alpha=ALPHA).collect()
    }
    exp = _py_weights()
    assert set(got) == set(exp)
    for did in exp:
        assert got[did][0] == exp[did][0], did
        assert got[did][1] == pytest.approx(exp[did][1], rel=1e-9), did


def test_target_like_scores_higher(spark):
    from featureengineer_spark.operators.dsir import dsir_weights

    raw, target = _dfs(spark)
    got = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_weights(raw, target, n_buckets=B).collect()
    }
    assert got[1] > got[2] and got[3] > got[2]
    assert got[4] == 0.0   # empty doc: zero features, weight 0, not dropped


def test_select_topk_deterministic(spark):
    from featureengineer_spark.operators.dsir import dsir_select

    raw, target = _dfs(spark)
    top = dsir_select(raw, target, k=2, n_buckets=B).collect()
    exp = _py_weights()
    want = sorted(
        (d for d in exp if exp[d][0] > 0),
        key=lambda d: (-exp[d][1], d),
    )[:2]
    assert [r["doc_id"] for r in top] == want


def test_ratio_table_is_broadcast(spark):
    from featureengineer_spark.operators.dsir import dsir_weights

    raw, target = _dfs(spark)
    plan = (
        dsir_weights(raw, target, n_buckets=B)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
