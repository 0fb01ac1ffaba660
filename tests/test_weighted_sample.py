"""Efraimidis-Spirakis weighted sampling: python-oracle parity (md5),
partitioning invariance, weight-bias law, nonpositive-weight
exclusion, TakeOrdered plan shape."""

from __future__ import annotations

import hashlib
import math

import pytest

from featureengineer_spark.operators.curation import weighted_sample

ROWS = [(i, float(1 + (i % 7))) for i in range(300)] + [
    (1000, None),
    (1001, 0.0),
    (1002, -3.0),
]


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_topk(k: int, seed: int = 0):
    keyed = []
    for i, w in ROWS:
        if w is None or w <= 0:
            continue
        u = (_md5_60(f"{seed}:{i}") + 1) / float(1 << 60)
        keyed.append((math.log(u) / w, i))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    return [i for _, i in keyed[:k]]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "weight"])


def test_matches_python_oracle(spark, df):
    got = [
        r.doc_id
        for r in weighted_sample(df, 25, "weight", hash_fn="md5")
        .orderBy("sample_rank")
        .collect()
    ]
    assert got == _py_topk(25)


def test_partitioning_invariance(spark, df):
    a = weighted_sample(df, 40, "weight", hash_fn="md5").orderBy(
        "sample_rank"
    ).collect()
    b = weighted_sample(
        df.repartition(13, "doc_id"), 40, "weight", hash_fn="md5"
    ).orderBy("sample_rank").collect()
    assert [(r.doc_id, r.sample_rank) for r in a] == [
        (r.doc_id, r.sample_rank) for r in b
    ]


def test_nonpositive_weights_excluded(spark, df):
    got = {
        r.doc_id
        for r in weighted_sample(df, 1000, "weight", hash_fn="md5").collect()
    }
    assert got.isdisjoint({1000, 1001, 1002})
    assert len(got) == 300  # every valid row when k >= n


def test_weight_bias(spark, df):
    # across many seeds, weight-7 rows must be selected far more often
    # than weight-1 rows (inclusion probability rises with weight)
    heavy = {i for i, w in ROWS if w == 7.0}
    light = {i for i, w in ROWS if w == 1.0}
    h = l = 0
    for seed in range(40):
        sel = set(_py_topk(30, seed))
        h += len(sel & heavy)
        l += len(sel & light)
    assert h > 2.5 * l


def test_take_ordered_plan(spark, df):
    plan = (
        weighted_sample(df, 10, "weight")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
