"""Distributed GMM EM vs a single-node numpy EM oracle (the UBM graft:
same init, same math → allclose per iteration; LLK monotone)."""

from __future__ import annotations

import numpy as np
import pytest

from featureengineer_spark.operators.em import (
    GMM,
    _responsibilities,
    sufficient_stats,
    train_gmm,
)

K, D, N = 3, 4, 900


@pytest.fixture(scope="module")
def gmm_data(spark):
    rng = np.random.default_rng(21)
    centers = rng.standard_normal((K, D)) * 3
    x = np.vstack([centers[i % K] + rng.standard_normal(D) for i in range(N)])
    conv = [f"c{i % 30}" for i in range(N)]
    df = spark.createDataFrame(
        [(conv[i], [float(v) for v in x[i]]) for i in range(N)],
        "conv_id string, feature_vec array<double>",
    ).repartition(6).cache()
    df.count()
    return df, x


def numpy_em(x: np.ndarray, model: GMM, n_iter: int, min_var: float = 1e-6) -> GMM:
    llks = list(model.llk_history)
    for _ in range(n_iter):
        gamma, llk = _responsibilities(x, model)
        llks.append(llk / len(x))
        nk = np.maximum(gamma.sum(axis=0), 1e-12)
        means = gamma.T @ x / nk[:, None]
        variances = np.maximum(gamma.T @ (x * x) / nk[:, None] - means**2, min_var)
        model = GMM(gamma.sum(axis=0) / len(x), means, variances, llks)
    return model


def test_em_matches_numpy_and_llk_monotone(spark, gmm_data):
    from featureengineer_spark.operators.em import init_gmm

    df, x = gmm_data
    init = init_gmm(df, "feature_vec", K, seed=3)
    init_copy = GMM(init.weights.copy(), init.means.copy(), init.variances.copy())

    got = train_gmm(df, n_components=K, n_iter=6, model=init)
    exp = numpy_em(x, init_copy, n_iter=6)

    np.testing.assert_allclose(got.weights, exp.weights, rtol=1e-8)
    np.testing.assert_allclose(got.means, exp.means, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(got.variances, exp.variances, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(got.llk_history, exp.llk_history, rtol=1e-9)
    # the reference's convergence check: per-sample LLK non-decreasing
    diffs = np.diff(got.llk_history)
    assert (diffs > -1e-9).all(), got.llk_history


def test_sufficient_stats_match_numpy(spark, gmm_data):
    df, x = gmm_data
    model = train_gmm(df, n_components=K, n_iter=3, seed=3)
    got = sufficient_stats(df, model).toPandas().set_index("conv_id")

    gamma, _ = _responsibilities(x, model)
    conv = np.array([f"c{i % 30}" for i in range(N)])
    for c in sorted(set(conv)):
        mask = conv == c
        s0 = gamma[mask].sum(axis=0)
        s1 = (gamma[mask].T @ x[mask]).ravel()
        np.testing.assert_allclose(np.array(got.loc[c, "stat0"]), s0, rtol=1e-8)
        np.testing.assert_allclose(np.array(got.loc[c, "stat1"]), s1, rtol=1e-8, atol=1e-10)
