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


def test_train_gmm_split_matches_numpy(spark, gmm_data):
    """The 1→2→4 splitting schedule must reproduce a numpy replication
    exactly (deterministic — no random init), with monotone LLK within
    each EM stage and cluster means recovered."""
    from featureengineer_spark.operators.em import split_gmm, train_gmm_split

    df, x = gmm_data
    got = train_gmm_split(df, n_components=4, n_iter_per_stage=3)

    model = GMM(
        weights=np.array([1.0]),
        means=x.mean(axis=0, keepdims=True),
        variances=np.maximum(x.var(axis=0, ddof=0, keepdims=True), 1e-6),
    )
    for _ in range(2):  # 1 -> 2 -> 4
        model = split_gmm(model)
        model = numpy_em(x, model, n_iter=3)

    np.testing.assert_allclose(got.weights, model.weights, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(got.means, model.means, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(got.variances, model.variances, rtol=1e-6, atol=1e-9)
    # LLK monotone within each 3-iteration stage
    h = got.llk_history
    for s in range(2):
        stage = h[s * 3 : (s + 1) * 3]
        assert all(b >= a - 1e-9 for a, b in zip(stage, stage[1:])), h
    # the split schedule should land near the true cluster means
    true_means = np.random.default_rng(21).standard_normal((K, D)) * 3
    for tm in true_means:
        assert np.min(np.linalg.norm(got.means - tm, axis=1)) < 1.5


def test_train_gmm_split_rejects_non_power_of_two(spark, gmm_data):
    from featureengineer_spark.operators.em import train_gmm_split

    df, _ = gmm_data
    with pytest.raises(ValueError, match="power of two"):
        train_gmm_split(df, n_components=3)


def test_reduce_partials_rejects_wrong_length_and_empty(spark):
    import pytest
    from pyspark.sql import functions as F

    from featureengineer_spark.operators.em import reduce_partials

    good = spark.createDataFrame(
        [([1.0, 2.0], 3.0), ([4.0, 5.0], 7.0)], "arr: array<double>, s: double"
    )
    out = reduce_partials(good, {"arr": 2, "s": None})
    assert list(out["arr"]) == [5.0, 7.0] and out["s"] == 10.0

    bad = spark.createDataFrame([([1.0, 2.0, 3.0],)], "arr: array<double>")
    with pytest.raises(Exception, match="must have length 2"):
        reduce_partials(bad, {"arr": 2})

    empty = good.filter(F.lit(False))
    with pytest.raises(ValueError, match="empty input frame"):
        reduce_partials(empty, {"arr": 2, "s": None})


def test_trained_model_bit_deterministic_across_configs(spark):
    """The round-4 determinism contract: the gate queries' explicit
    repartition-by-key + sortWithinPartitions layout, combined with
    em._stable_sum's pid-sorted partial fold, makes the trained model a
    pure function of (input rows, seed) — independent of how the source
    happened to be partitioned. Training from two very different input
    layouts must converge to BIT-identical parameters (float addition is
    not associative, so any order leak shows up in the last bits)."""
    import numpy as np
    from pyspark.sql import functions as F

    from featureengineer_spark.operators.em import train_gmm

    src = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(
            "vec_id",
            F.col("label").cast("string").alias("conv_id"),
            F.col("embedding").cast("array<double>").alias("feature_vec"),
        )
    )

    def contract(df):
        return (
            df.repartition(4, "conv_id")
            .sortWithinPartitions("conv_id", "vec_id")
            .drop("vec_id")
        )

    layout_a = contract(src)
    # adversarial source layout: scrambled round-robin over 13 partitions
    layout_b = contract(src.repartition(13).sortWithinPartitions("embedding"))

    m_a = train_gmm(layout_a, n_components=3, n_iter=2, seed=3)
    m_b = train_gmm(layout_b, n_components=3, n_iter=2, seed=3)
    assert np.array_equal(m_a.means, m_b.means)
    assert np.array_equal(m_a.variances, m_b.variances)
    assert np.array_equal(m_a.weights, m_b.weights)
