"""LDA / WCCN / two-covariance / PLDA vs independent numpy oracles.

Oracles are written loop-per-class / direct-joint-Gaussian (different
idioms from the batched einsum kernels under test)."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from featureengineer_spark.operators.plda import (
    PLDAModel,
    apply_projection,
    class_means,
    fit_lda,
    fit_two_cov,
    fit_wccn,
    pair_llr_matrices,
    scatter_matrices,
    train_plda,
)

D, C, PER = 6, 8, 25


@pytest.fixture(scope="module")
def labeled(spark):
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((C, D)) * 3.0
    rows, xs, ys = [], [], []
    for c in range(C):
        for j in range(PER):
            x = centers[c] + rng.standard_normal(D)
            rows.append((c * PER + j, int(c), x.tolist()))
            xs.append(x)
            ys.append(c)
    schema = T.StructType(
        [
            T.StructField("vid", T.LongType()),
            T.StructField("label", T.IntegerType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    df = spark.createDataFrame(rows, schema).repartition(4)
    return df, np.array(xs), np.array(ys)


def _scatter_oracle(x, y):
    n = len(x)
    mu = x.mean(axis=0)
    w = np.zeros((D, D))
    b = np.zeros((D, D))
    for c in np.unique(y):
        xc = x[y == c]
        mc = xc.mean(axis=0)
        for row in xc:
            w += np.outer(row - mc, row - mc)
        b += len(xc) * np.outer(mc - mu, mc - mu)
    return mu, w / n, b / n


def test_scatter_matches_oracle(labeled):
    df, x, y = labeled
    mu, w_cov, b_cov, n = scatter_matrices(df)
    mu_e, w_e, b_e = _scatter_oracle(x, y)
    assert n == len(x)
    np.testing.assert_allclose(mu, mu_e, rtol=1e-10)
    np.testing.assert_allclose(w_cov, w_e, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(b_cov, b_e, rtol=1e-8, atol=1e-10)


def test_class_means_matches_oracle(labeled):
    df, x, y = labeled
    got = {r["label"]: np.array(r["mean"]) for r in class_means(df).collect()}
    for c in np.unique(y):
        np.testing.assert_allclose(got[int(c)], x[y == c].mean(axis=0), rtol=1e-10)


def test_pair_llr_matches_joint_gaussian():
    """(Q, P, const) must reproduce the direct joint-Gaussian LLR."""
    rng = np.random.default_rng(1)
    a = rng.standard_normal((D, D))
    w = a @ a.T + D * np.eye(D)
    v = rng.standard_normal((D, 2))
    gamma = v @ v.T
    lam = gamma + w
    q, p, const = pair_llr_matrices(gamma, lam)

    def logpdf(z, cov):
        sign, logdet = np.linalg.slogdet(cov)
        return -0.5 * (z @ np.linalg.solve(cov, z) + logdet + len(z) * np.log(2 * np.pi))

    same = np.block([[lam, gamma], [gamma, lam]])
    diff = np.block([[lam, np.zeros((D, D))], [np.zeros((D, D)), lam]])
    for _ in range(5):
        x1, x2 = rng.standard_normal(D), rng.standard_normal(D)
        z = np.concatenate([x1, x2])
        expected = logpdf(z, same) - logpdf(z, diff)
        got = x1 @ q @ x1 + x2 @ q @ x2 + 2 * x1 @ p @ x2 + const
        np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_lda_invariants(labeled):
    df, x, y = labeled
    mu, proj = fit_lda(df, n_components=3)
    _, w_e, b_e = _scatter_oracle(x, y)
    # W-orthonormal columns, B diagonalized with the top gen-eigenvalues
    np.testing.assert_allclose(proj.T @ w_e @ proj, np.eye(3), atol=1e-6)
    got_vals = np.diag(proj.T @ b_e @ proj)
    all_vals = np.sort(np.real(np.linalg.eigvals(np.linalg.solve(w_e, b_e))))[::-1]
    np.testing.assert_allclose(np.sort(got_vals)[::-1], all_vals[:3], rtol=1e-6)
    off = proj.T @ b_e @ proj - np.diag(got_vals)
    assert np.abs(off).max() < 1e-6


def test_wccn_invariant(labeled):
    df, x, y = labeled
    l_mat = fit_wccn(df)
    _, w_e, _ = _scatter_oracle(x, y)
    np.testing.assert_allclose(l_mat.T @ w_e @ l_mat, np.eye(D), atol=1e-6)


def test_two_cov_scoring_separates(labeled, spark):
    from featureengineer_spark.operators.scoring import eer, score_trials_two_cov

    df, x, y = labeled
    mu, b_cov, w_cov = fit_two_cov(df)
    enroll = df.selectExpr("vid as enroll_id", "embedding", "label as e_label")
    test = df.selectExpr("vid as test_id", "embedding", "label as t_label")
    trials = (
        enroll.select("enroll_id", "e_label")
        .crossJoin(test.select("test_id", "t_label"))
        .filter(F.col("enroll_id") < F.col("test_id"))
        .filter((F.col("enroll_id") + F.col("test_id")) % 7 == 0)
        .select("enroll_id", "test_id", (F.col("e_label") == F.col("t_label")).alias("is_target"))
    )
    scored = score_trials_two_cov(
        enroll.drop("e_label"), test.drop("t_label"), trials, mu, b_cov, w_cov
    )
    rate = eer(scored)
    assert rate < 0.15  # far below chance (0.5) on separated classes


def _plda_oracle(x, y, rank, n_iter, seed):
    n, d = x.shape
    mu = x.mean(axis=0)
    xc = x - mu
    s_tot = xc.T @ xc
    labels = np.unique(y)
    f = {c: xc[y == c].sum(axis=0) for c in labels}
    cnt = {c: (y == c).sum() for c in labels}
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((d, rank)) * 0.1
    sigma = s_tot / n
    for _ in range(n_iter):
        si = np.linalg.inv(sigma + 1e-8 * np.eye(d))
        g = v.T @ si @ v
        r1 = np.zeros((d, rank))
        r2 = np.zeros((rank, rank))
        for c in labels:
            prec = np.eye(rank) + cnt[c] * g
            cov = np.linalg.inv(prec)
            h = cov @ (v.T @ si @ f[c])
            r1 += np.outer(f[c], h)
            r2 += cnt[c] * (cov + np.outer(h, h))
        v = np.linalg.solve(0.5 * (r2 + r2.T), r1.T).T
        sigma = (s_tot - v @ r1.T) / n
        sigma = 0.5 * (sigma + sigma.T)
    return mu, v, sigma


def test_plda_em_matches_oracle(labeled):
    df, x, y = labeled
    model = train_plda(df, rank=2, n_iter=3, seed=9)
    mu_e, v_e, sig_e = _plda_oracle(x, y, rank=2, n_iter=3, seed=9)
    np.testing.assert_allclose(model.mean, mu_e, rtol=1e-9)
    np.testing.assert_allclose(model.v_mat, v_e, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(model.sigma, sig_e, rtol=1e-7, atol=1e-9)


def test_plda_scoring_separates(labeled, spark):
    from featureengineer_spark.operators.scoring import eer, score_trials_plda

    df, x, y = labeled
    model = train_plda(df, rank=4, n_iter=5, seed=3)
    enroll = df.selectExpr("vid as enroll_id", "embedding", "label as e_label")
    test = df.selectExpr("vid as test_id", "embedding", "label as t_label")
    trials = (
        enroll.select("enroll_id", "e_label")
        .crossJoin(test.select("test_id", "t_label"))
        .filter(F.col("enroll_id") < F.col("test_id"))
        .filter((F.col("enroll_id") + F.col("test_id")) % 11 == 0)
        .select("enroll_id", "test_id", (F.col("e_label") == F.col("t_label")).alias("is_target"))
    )
    scored = score_trials_plda(enroll.drop("e_label"), test.drop("t_label"), trials, model)
    assert eer(scored) < 0.15


def test_composed_lda_wccn_cosine(labeled, spark):
    """The reference's cosine+LDA+WCCN chain (log.txt:656-660): project,
    then WCCN in LDA space, then cosine — vs a pure-numpy pipeline."""
    from featureengineer_spark.operators.scoring import score_trials

    df, x, y = labeled
    mu, proj = fit_lda(df, n_components=3)
    lda_df = apply_projection(df, proj, mu, out_col="lda_vec")
    wccn_l = fit_wccn(lda_df.select("label", "lda_vec"), vec_col="lda_vec")
    final = apply_projection(
        lda_df.select("label", "lda_vec"), wccn_l, vec_col="lda_vec", out_col="embedding"
    )
    # numpy pipeline
    z = (x - mu) @ proj
    z2 = z @ wccn_l
    got = np.array(
        [r["embedding"] for r in final.select("embedding").collect()]
    )
    # row order differs → compare as sorted sets of rounded rows
    a = np.array(sorted(map(tuple, np.round(got, 8))))
    b = np.array(sorted(map(tuple, np.round(z2, 8))))
    np.testing.assert_allclose(a, b, atol=1e-7)
