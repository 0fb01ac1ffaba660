"""Product quantization: determinism, the ADC identity, Lloyd
distortion monotonicity, numpy search parity, and cluster recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from featureengineer_spark.operators.pq import (
    encode_pq,
    reconstruct_pq,
    search_pq,
    train_pq,
)

D, M, K = 16, 4, 4


def _synth(n=120, seed=3, spread=0.05):
    """Four well-separated clusters in R^D."""
    rng = np.random.RandomState(seed)
    centers = np.eye(4).repeat(D // 4, axis=1) * 5.0  # (4, D)
    labels = np.arange(n) % 4
    x = centers[labels] + rng.randn(n, D) * spread
    return x, labels


@pytest.fixture(scope="module")
def emb(spark):
    x, labels = _synth()
    rows = [
        (int(i), [float(v) for v in x[i]], int(labels[i]))
        for i in range(len(x))
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).repartition(4).cache()


@pytest.fixture(scope="module")
def model(emb):
    return train_pq(emb, m=M, k=K, n_iter=5, seed=0)


def test_train_deterministic(emb, model):
    again = train_pq(emb, m=M, k=K, n_iter=5, seed=0)
    assert np.array_equal(model.centroids, again.centroids)


def test_lloyd_distortion_monotone(emb):
    x, _ = _synth()

    def distortion(mod):
        err = 0.0
        for j in range(mod.m):
            xj = x[:, j * mod.dsub : (j + 1) * mod.dsub]
            cj = mod.centroids[j]
            d2 = ((xj[:, None, :] - cj[None, :, :]) ** 2).sum(axis=2)
            err += d2.min(axis=1).sum()
        return err

    m1 = train_pq(emb, m=M, k=K, n_iter=1, seed=0)
    m5 = train_pq(emb, m=M, k=K, n_iter=5, seed=0)
    assert distortion(m5) <= distortion(m1) + 1e-9


def test_adc_identity(emb, model):
    """ADC distance == exact L2^2 between the query and the
    RECONSTRUCTED corpus vector (the defining PQ property)."""
    codes = encode_pq(emb, model)
    queries = emb.filter(F.col("vec_id") < 3)
    code_map = {
        r["vec_id"]: np.array(r["pq_code"])
        for r in codes.select("vec_id", "pq_code").collect()
    }
    x, _ = _synth()
    got = search_pq(
        codes,
        queries.select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        model,
        k_top=200,
    ).collect()
    for r in got:
        q = x[r["query_id"]]
        rec = reconstruct_pq(
            model, code_map[r["vec_id"]].reshape(1, -1)
        )[0]
        assert r["adc_dist"] == pytest.approx(
            float(((q - rec) ** 2).sum()), rel=1e-9, abs=1e-9
        )


def test_search_matches_numpy_reference(emb, model):
    x, _ = _synth()
    codes = encode_pq(emb, model)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {}
    for r in search_pq(codes, queries, model, k_top=7).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"])
        )
    # numpy reference: encode all, ADC, sort by (dist, id)
    cmap = {
        r["vec_id"]: np.array(r["pq_code"])
        for r in codes.select("vec_id", "pq_code").collect()
    }
    ids = np.array(sorted(cmap))
    rec = reconstruct_pq(model, np.stack([cmap[i] for i in ids]))
    for qid in range(5):
        d = ((x[qid][None, :] - rec) ** 2).sum(axis=1)
        order = np.lexsort((ids, d))[:7]
        expect = [(rk + 1, int(ids[o])) for rk, o in enumerate(order)]
        assert sorted(got[qid]) == expect


def test_cluster_recall(emb, model):
    """Queries at the 4 cluster centers retrieve only their cluster."""
    x, labels = _synth()
    codes = encode_pq(emb, model)
    centers = np.eye(4).repeat(D // 4, axis=1) * 5.0
    spark = emb.sparkSession
    queries = spark.createDataFrame(
        [(int(i), [float(v) for v in centers[i]]) for i in range(4)],
        "query_id long, embedding array<double>",
    )
    got = search_pq(codes, queries, model, k_top=10).collect()
    for r in got:
        assert labels[r["vec_id"]] == r["query_id"]


def test_encode_shape_and_range(emb, model):
    rows = encode_pq(emb, model).select("pq_code").collect()
    for r in rows:
        assert len(r["pq_code"]) == M
        assert all(0 <= c < K for c in r["pq_code"])
