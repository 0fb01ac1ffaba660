"""Reciprocal-rank fusion: python-oracle parity, weights, missing-list
handling, symmetric-tie determinism, top_k, plan guard."""

from __future__ import annotations

import pytest

from featureengineer_spark.operators.retrieval import rrf_fuse

# two rankings over queries 1-2; doc 30 appears only in the lexical list
LEX = [
    (1, 10, 1), (1, 20, 2), (1, 30, 3),
    (2, 10, 1), (2, 40, 2),
]
SEM = [
    (1, 20, 1), (1, 10, 2),
    (2, 40, 1), (2, 50, 2),
]


def _py_rrf(lists, weights, k=60):
    scores: dict[tuple[int, int], float] = {}
    for rows, w in zip(lists, weights):
        for q, d, r in rows:
            scores[(q, d)] = scores.get((q, d), 0.0) + w / (k + r)
    out = {}
    for q in {q for q, _ in scores}:
        docs = sorted(
            ((d, s) for (qq, d), s in scores.items() if qq == q),
            key=lambda t: (-t[1], t[0]),
        )
        out[q] = [(d, i + 1, s) for i, (d, s) in enumerate(docs)]
    return out


@pytest.fixture(scope="module")
def rankings(spark):
    cols = ["query_id", "doc_id", "rank"]
    return (
        spark.createDataFrame(LEX, cols),
        spark.createDataFrame(SEM, cols),
    )


def test_matches_python_oracle(spark, rankings):
    got = rrf_fuse(list(rankings)).collect()
    exp = _py_rrf([LEX, SEM], [1.0, 1.0])
    assert len(got) == sum(len(v) for v in exp.values())
    for row in got:
        d, r, s = next(
            (d, r, s)
            for d, r, s in exp[row.query_id]
            if d == row.doc_id
        )
        assert row.rrf_rank == r
        assert abs(row.rrf_score - s) < 1e-12


def test_weights(spark, rankings):
    got = {
        (r.query_id, r.doc_id): r.rrf_score
        for r in rrf_fuse(list(rankings), weights=[2.0, 0.5]).collect()
    }
    exp = _py_rrf([LEX, SEM], [2.0, 0.5])
    for q, rows in exp.items():
        for d, _, s in rows:
            assert abs(got[(q, d)] - s) < 1e-12


def test_single_list_doc_scored(spark, rankings):
    # doc 30 only in LEX; doc 50 only in SEM — both present, damped
    got = {
        (r.query_id, r.doc_id): r.rrf_rank
        for r in rrf_fuse(list(rankings)).collect()
    }
    assert (1, 30) in got and (2, 50) in got


def test_symmetric_tie_broken_by_id(spark):
    # A: rank1 in list1 + rank2 in list2; B: the mirror — exact score
    # tie, lower id must win
    cols = ["query_id", "doc_id", "rank"]
    l1 = spark.createDataFrame([(9, 7, 1), (9, 3, 2)], cols)
    l2 = spark.createDataFrame([(9, 3, 1), (9, 7, 2)], cols)
    got = rrf_fuse([l1, l2]).orderBy("rrf_rank").collect()
    assert [r.doc_id for r in got] == [3, 7]
    assert got[0].rrf_score == got[1].rrf_score


def test_top_k(spark, rankings):
    got = rrf_fuse(list(rankings), top_k=2).collect()
    assert all(r.rrf_rank <= 2 for r in got)
    assert len(got) == 4  # 2 per query


def test_no_cartesian_plan(spark, rankings):
    plan = (
        rrf_fuse(list(rankings))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_bad_args(spark, rankings):
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse(list(rankings), weights=[1.0])
