"""TV-matrix EM + latent-factor extraction vs an independent numpy
oracle (loop-per-session idiom, deliberately different from the batched
einsum kernels in operators/tv.py)."""

import numpy as np
import pytest
from pyspark.sql import types as T

from featureengineer_spark.operators.em import GMM
from featureengineer_spark.operators.tv import (
    TVModel,
    extract_latent_factors,
    train_total_variability,
    whiten_stats,
)

K, D, RANK = 3, 4, 2


@pytest.fixture(scope="module")
def fixture(spark):
    rng = np.random.default_rng(7)
    n = 40
    stat0 = rng.uniform(1.0, 5.0, size=(n, K))
    stat1 = rng.standard_normal((n, K * D)) * 3.0 + 1.0
    ubm = GMM(
        weights=np.full(K, 1.0 / K),
        means=rng.standard_normal((K, D)),
        variances=rng.uniform(0.5, 2.0, size=(K, D)),
    )
    rows = [
        (f"e{i:03d}", stat0[i].tolist(), stat1[i].tolist()) for i in range(n)
    ]
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("stat0", T.ArrayType(T.DoubleType())),
            T.StructField("stat1", T.ArrayType(T.DoubleType())),
        ]
    )
    df = spark.createDataFrame(rows, schema).repartition(4)
    return df, stat0, stat1, ubm


def _whiten_oracle(stat0, stat1, ubm):
    out = np.empty_like(stat1)
    for s in range(stat0.shape[0]):
        for k in range(K):
            for j in range(D):
                idx = k * D + j
                out[s, idx] = (stat1[s, idx] - stat0[s, k] * ubm.means[k, j]) / np.sqrt(
                    ubm.variances[k, j]
                )
    return out


def _em_oracle_np(stat0, s1w, f_init, n_iter, min_div=True):
    """Plain per-session-loop FA EM (the reference's algorithm shape)."""
    f = f_init.copy()
    n, _ = stat0.shape
    r = f.shape[1]
    index_map = np.repeat(np.arange(K), D)
    for _ in range(n_iter):
        a_acc = np.zeros((K, r, r))
        c_acc = np.zeros((r, K * D))
        r_acc = np.zeros((r, r))
        for s in range(n):
            lam = np.eye(r) + (f.T * stat0[s, index_map]) @ f
            cov = np.linalg.inv(lam)
            w = cov @ (f.T @ s1w[s])
            eww = cov + np.outer(w, w)
            for k in range(K):
                a_acc[k] += stat0[s, k] * eww
            c_acc += np.outer(w, s1w[s])
            r_acc += eww
        r_acc /= n
        new_f = np.empty_like(f)
        for k in range(K):
            idx = slice(k * D, (k + 1) * D)
            new_f[idx] = np.linalg.solve(a_acc[k], c_acc[:, idx]).T
        if min_div:
            new_f = new_f @ np.linalg.cholesky(r_acc).T
        f = new_f
    return f


def _extract_oracle(stat0, s1w, f):
    index_map = np.repeat(np.arange(K), D)
    out = np.zeros((stat0.shape[0], f.shape[1]))
    for s in range(stat0.shape[0]):
        lam = np.eye(f.shape[1]) + (f.T * stat0[s, index_map]) @ f
        out[s] = np.linalg.solve(lam, f.T @ s1w[s])
    return out


def test_whiten_matches_oracle(fixture):
    df, stat0, stat1, ubm = fixture
    got = {
        r["conv_id"]: np.array(r["stat1"])
        for r in whiten_stats(df, ubm).collect()
    }
    exp = _whiten_oracle(stat0, stat1, ubm)
    for i in range(stat0.shape[0]):
        np.testing.assert_allclose(got[f"e{i:03d}"], exp[i], rtol=1e-10)


@pytest.mark.parametrize("min_div", [True, False])
def test_tv_em_matches_oracle(fixture, min_div):
    df, stat0, stat1, ubm = fixture
    tv = train_total_variability(
        df, ubm, rank=RANK, n_iter=3, seed=11, min_div=min_div
    )
    f_init = np.random.default_rng(11).standard_normal((K * D, RANK))
    s1w = _whiten_oracle(stat0, stat1, ubm)
    f_exp = _em_oracle_np(stat0, s1w, f_init, n_iter=3, min_div=min_div)
    np.testing.assert_allclose(tv.F_mat, f_exp, rtol=1e-8, atol=1e-10)


def test_extract_matches_oracle(fixture):
    df, stat0, stat1, ubm = fixture
    tv = train_total_variability(df, ubm, rank=RANK, n_iter=2, seed=5)
    got = {
        r["conv_id"]: np.array(r["latent"])
        for r in extract_latent_factors(df, tv).collect()
    }
    s1w = _whiten_oracle(stat0, stat1, ubm)
    exp = _extract_oracle(stat0, s1w, tv.F_mat)
    for i in range(stat0.shape[0]):
        np.testing.assert_allclose(got[f"e{i:03d}"], exp[i], rtol=1e-8, atol=1e-10)


def test_full_pipeline_stats_to_latent(spark):
    """UBM → suff stats → TV → latent factors, end to end on vectors."""
    from featureengineer_spark.operators.em import sufficient_stats, train_gmm

    rng = np.random.default_rng(0)
    rows = []
    for e in range(30):
        center = rng.standard_normal(D) * 2
        for _ in range(10):
            rows.append((f"c{e:02d}", (center + rng.standard_normal(D)).tolist()))
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("feature_vec", T.ArrayType(T.DoubleType())),
        ]
    )
    df = spark.createDataFrame(rows, schema).repartition(4)
    ubm = train_gmm(df, n_components=K, n_iter=2, seed=1)
    stats = sufficient_stats(df, ubm)
    tv = train_total_variability(stats, ubm, rank=RANK, n_iter=2, seed=2)
    lat = extract_latent_factors(stats, tv)
    out = lat.collect()
    assert len(out) == 30
    assert all(len(r["latent"]) == RANK for r in out)
    vals = np.array([r["latent"] for r in out])
    assert np.isfinite(vals).all() and np.abs(vals).max() > 0


def test_estep_partials_bounded_at_production_shape(spark):
    """K=512·d=39·R=200 (the reference's production shape family): the
    full E-step partial is ~114 MB, well past a sane Arrow record — every
    emitted slice must respect max_partial_bytes, and the sliced
    in-cluster reduce must equal the in-process numpy partial."""
    from pyspark.sql import functions as F

    from featureengineer_spark.operators.em import reduce_sliced_partials
    from featureengineer_spark.operators.tv import _estep_partials, _posteriors

    k, d, rank, n = 512, 39, 200, 24
    sv = k * d
    rng = np.random.default_rng(13)
    stat0 = rng.uniform(1.0, 5.0, size=(n, k))
    stat1 = rng.standard_normal((n, sv))
    f_mat = rng.standard_normal((sv, rank)) * 0.1

    schema = T.StructType(
        [
            T.StructField("stat0", T.ArrayType(T.DoubleType())),
            T.StructField("stat1", T.ArrayType(T.DoubleType())),
        ]
    )
    df = spark.createDataFrame(
        [(stat0[i].tolist(), stat1[i].tolist()) for i in range(n)], schema
    ).repartition(4)

    budget = 8 << 20  # 8 MB → 1M doubles per slice
    frame, total_size, slice_elems = _estep_partials(df, f_mat, k, d, budget)
    n_tri = rank * (rank + 1) // 2
    assert total_size == k * n_tri + rank * sv + n_tri + 1
    assert slice_elems == budget // 8

    frame = frame.persist()
    sizes = frame.select(F.size("vals").alias("s")).toPandas()["s"]
    assert sizes.max() <= slice_elems  # no row exceeds the byte budget
    assert len(sizes) >= -(-total_size // slice_elems)  # >= ceil slices

    flat = reduce_sliced_partials(frame, total_size, slice_elems)
    frame.unpersist()

    # in-process replication of the same partial
    tri = np.triu_indices(rank)
    e_w, e_ww = _posteriors(stat0, stat1, f_mat, k, d)
    e_ww_tri = e_ww[:, tri[0], tri[1]]
    exp = np.concatenate(
        [
            (stat0.T @ e_ww_tri).ravel(),
            (e_w.T @ stat1).ravel(),
            e_ww_tri.sum(axis=0),
            [float(n)],
        ]
    )
    np.testing.assert_allclose(flat, exp, rtol=1e-9, atol=1e-9)
