"""Persisted IVF-PQ index: numpy parity (full probe), probe-restricted
parity, partition pruning, store compression, determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from featureengineer_spark.operators.pq import (
    build_ivfpq_index,
    search_ivfpq_index,
)

D = 16
N_LISTS = 4
M, K = 4, 4


def _synth(n=160, seed=5):
    rng = np.random.RandomState(seed)
    centers = rng.randn(N_LISTS, D) * 4.0
    labels = np.arange(n) % N_LISTS
    return centers[labels] + rng.randn(n, D) * 0.3, labels


@pytest.fixture(scope="module")
def corpus(spark):
    x, _ = _synth()
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(len(x))]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(4).cache()


@pytest.fixture(scope="module")
def index(corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    cents, model = build_ivfpq_index(
        corpus, path, n_lists=N_LISTS, m=M, k=K, kmeans_iter=4,
        pq_iter=4, seed=0,
    )
    return path, cents, model


def _ref_search(x, cents, model, q, n_probe, k_top):
    """numpy IVF-PQ reference with the same stable tie rules."""
    cn2 = (cents * cents).sum(axis=1)
    assign = np.argsort(cn2 - 2.0 * (x @ cents.T), axis=1, kind="stable")[:, 0]
    resid = x - cents[assign]
    m, k, dsub = model.m, model.k, model.dsub
    codes = np.empty((len(x), m), dtype=int)
    for j in range(m):
        rj = resid[:, j * dsub : (j + 1) * dsub]
        cj = model.centroids[j]
        codes[:, j] = np.argmin(
            (cj * cj).sum(axis=1) - 2.0 * (rj @ cj.T), axis=1
        )
    probe = np.argsort(cn2 - 2.0 * (q[None, :] @ cents.T), axis=1, kind="stable")[
        0, :n_probe
    ]
    cand = []
    for lid in probe:
        qr = (q - cents[lid]).reshape(m, dsub)
        lut = np.empty((m, k))
        for j in range(m):
            diff = qr[j][None, :] - model.centroids[j]
            lut[j] = (diff * diff).sum(axis=1)
        for i in np.where(assign == lid)[0]:
            cand.append((float(lut[np.arange(m), codes[i]].sum()), int(i)))
    cand.sort()
    return cand[:k_top]


def test_full_probe_matches_numpy(spark, corpus, index):
    path, cents, model = index
    x, _ = _synth()
    queries = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(6)],
        "query_id long, embedding array<double>",
    )
    got = {}
    res = search_ivfpq_index(
        spark, path, queries, k_top=8, n_probe=N_LISTS
    ).collect()
    for r in res:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["adc_dist"])
        )
    for qid in range(6):
        ref = _ref_search(x, cents, model, x[qid], N_LISTS, 8)
        mine = sorted(got[qid])
        assert [v for _, v, _ in mine] == [i for _, i in ref]
        for (_, _, dgot), (dref, _) in zip(mine, ref):
            assert dgot == pytest.approx(dref, rel=1e-9, abs=1e-12)


def test_restricted_probe_matches_numpy(spark, corpus, index):
    path, cents, model = index
    x, _ = _synth()
    queries = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(10, 14)],
        "query_id long, embedding array<double>",
    )
    res = search_ivfpq_index(spark, path, queries, k_top=5, n_probe=2)
    got = {}
    for r in res.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for qid in range(10, 14):
        ref = _ref_search(x, cents, model, x[qid], 2, 5)
        assert [v for _, v in sorted(got[qid])] == [i for _, i in ref]


def test_partition_pruning(spark, corpus, index):
    path, _, _ = index
    x, _ = _synth()
    queries = spark.createDataFrame(
        [(0, [float(v) for v in x[0]])],
        "query_id long, embedding array<double>",
    )
    res = search_ivfpq_index(spark, path, queries, k_top=3, n_probe=1)
    res.collect()
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan, plan


def test_store_holds_codes_only(spark, index):
    path, _, model = index
    store = spark.read.parquet(path)
    assert set(store.columns) == {"vec_id", "pq_code", "list_id"}
    row = store.first()
    assert len(row["pq_code"]) == M


def test_build_deterministic(corpus, tmp_path):
    a = build_ivfpq_index(
        corpus, str(tmp_path / "i1"), n_lists=N_LISTS, m=M, k=K,
        kmeans_iter=3, pq_iter=3, seed=0,
    )
    b = build_ivfpq_index(
        corpus, str(tmp_path / "i2"), n_lists=N_LISTS, m=M, k=K,
        kmeans_iter=3, pq_iter=3, seed=0,
    )
    assert np.array_equal(a[0], b[0])
    assert np.array_equal(a[1].centroids, b[1].centroids)


def test_search_broadcast_carries_no_driver_luts(spark, corpus, index, monkeypatch):
    """LUT construction moved off the driver (round 7): the search
    broadcast holds (qids, qx, probe, centroids, codebooks, k, m, dsub)
    — the query block plus model constants — and the per-(query, list)
    ADC tables are built lazily inside the Arrow kernel. Pin the
    broadcast payload shape so a regression back to driver-side LUT
    dicts (O(n_query * m * k * n_probed) driver memory) is caught."""
    import pyspark

    path, cents, model = index
    x, _ = _synth()
    queries = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(6)],
        "query_id long, embedding array<double>",
    )
    payloads = []
    orig = pyspark.SparkContext.broadcast

    def capture(self, value):
        payloads.append(value)
        return orig(self, value)

    monkeypatch.setattr(pyspark.SparkContext, "broadcast", capture)
    res = search_ivfpq_index(spark, path, queries, k_top=3, n_probe=2)
    monkeypatch.undo()
    search_payloads = [p for p in payloads if isinstance(p, tuple) and len(p) == 8]
    assert len(search_payloads) == 1, [type(p) for p in payloads]
    qids, qx, probe, cents_b, cbs, kt, m, dsub = search_payloads[0]
    assert qx.shape == (6, D) and probe.shape == (6, 2)
    assert cbs.shape == (M, K, D // M)
    assert not any(isinstance(p, dict) for p in payloads)
    assert res.count() > 0
