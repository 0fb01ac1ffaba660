"""Pointer-doubling root resolution: python-oracle parity on a mixed
forest, deep-chain convergence in O(log d) rounds, dangling parents,
cycles."""

from __future__ import annotations

import warnings

import pytest

from featureengineer_spark.operators.hierarchy import (
    resolve_roots,
    with_thread_root,
)


def _py_resolve(edges: dict[int, int | None]):
    out = {}
    for v in edges:
        seen = set()
        cur, depth = v, 0
        while True:
            if cur in seen:
                out[v] = (None, None)
                break
            seen.add(cur)
            p = edges.get(cur, "__missing__")
            if p == "__missing__":
                # dangling pointer: cur not a row -> external root
                out[v] = (cur, depth)
                break
            if p is None:
                out[v] = (cur, depth)
                break
            cur, depth = p, depth + 1
    return out


def test_matches_python_oracle_mixed_forest(spark):
    # two chains, one binary tree, one dangling parent, singletons
    edges: dict[int, int | None] = {0: None, 100: None}
    for i in range(1, 20):  # chain of 20 under 0
        edges[i] = i - 1
    for k in range(1, 15):  # binary tree under 100
        edges[100 + k] = 100 + (k - 1) // 2
    edges[500] = 999  # dangling parent -> external root 999
    edges[600] = None  # singleton root
    df = spark.createDataFrame(
        [(i, p) for i, p in edges.items()], ["id", "parent_id"]
    )
    got = {
        r.id: (r.root_id, r.depth)
        for r in resolve_roots(df, "id", "parent_id").collect()
    }
    assert got == _py_resolve(edges)


def test_deep_chain_log_rounds(spark):
    # depth 700 must resolve within max_iter=12 (2^12 = 4096 >= 700);
    # a one-hop-per-round walk would need 700 rounds
    n = 700
    rows = [(0, None)] + [(i, i - 1) for i in range(1, n + 1)]
    df = spark.createDataFrame(rows, ["id", "parent_id"])
    out = {
        r.id: (r.root_id, r.depth)
        for r in resolve_roots(df, max_iter=12).collect()
    }
    assert out[n] == (0, n)
    assert out[1] == (0, 1)
    assert all(root == 0 for root, _ in out.values())


def test_cycle_yields_null_and_warns(spark):
    rows = [(1, 2), (2, 3), (3, 1), (10, None), (11, 10)]
    df = spark.createDataFrame(rows, ["id", "parent_id"])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = {
            r.id: (r.root_id, r.depth)
            for r in resolve_roots(df, max_iter=6).collect()
        }
    assert any("unresolved" in str(x.message) for x in w)
    assert got[1] == (None, None)
    assert got[2] == (None, None)
    assert got[3] == (None, None)
    assert got[10] == (10, 0)
    assert got[11] == (10, 1)


def test_with_thread_root_attaches(spark):
    rows = [(0, None, "a"), (1, 0, "b"), (2, 1, "c")]
    df = spark.createDataFrame(rows, ["id", "parent_id", "payload"])
    got = {
        r.id: (r.root_id, r.depth, r.payload)
        for r in with_thread_root(df).collect()
    }
    assert got == {0: (0, 0, "a"), 1: (0, 1, "b"), 2: (0, 2, "c")}
