"""Grouped-map featurizer vs pandas oracle — the allclose gate at each
(conv_id, ts) key (BASELINE.json:metric)."""

from __future__ import annotations

import numpy as np

from featureengineer_spark.kernels import FEATURE_DIM, featurize
from featureengineer_spark.oracle import oracle_features

KEY = ["conv_id", "ts", "turn_idx"]


def test_feature_vec_allclose(spark, transcripts, transcripts_pdf):
    got = featurize(transcripts).toPandas().sort_values(KEY, kind="mergesort")
    exp = oracle_features(transcripts_pdf).sort_values(KEY, kind="mergesort")
    assert len(got) == len(exp)
    gv = np.vstack(got["feature_vec"].to_numpy())
    ev = np.vstack(exp["feature_vec"].to_numpy())
    assert gv.shape == (len(exp), FEATURE_DIM)
    # numpy.allclose default tolerances — the BASELINE.json metric
    np.testing.assert_allclose(gv, ev, rtol=1e-5, atol=1e-8)
    # per-turn text-equality invariant under stable ordering: keys align
    np.testing.assert_array_equal(
        got["turn_idx"].to_numpy(), exp["turn_idx"].to_numpy()
    )


def test_featurize_deterministic_across_partitionings(spark, transcripts):
    a = featurize(transcripts.repartition(3)).toPandas().sort_values(KEY, kind="mergesort")
    b = featurize(transcripts.repartition(17)).toPandas().sort_values(KEY, kind="mergesort")
    np.testing.assert_allclose(
        np.vstack(a["feature_vec"].to_numpy()),
        np.vstack(b["feature_vec"].to_numpy()),
        rtol=1e-12,
    )


def test_featurize_fast_allclose(spark, transcripts, transcripts_pdf):
    from featureengineer_spark.kernels import featurize_fast

    got = featurize_fast(transcripts, partitions=7).toPandas().sort_values(KEY, kind="mergesort")
    exp = oracle_features(transcripts_pdf).sort_values(KEY, kind="mergesort")
    assert len(got) == len(exp)
    gv = np.vstack(got["feature_vec"].to_numpy())
    ev = np.vstack(exp["feature_vec"].to_numpy())
    np.testing.assert_allclose(gv, ev, rtol=1e-5, atol=1e-8)


def test_featurize_fast_small_batches_cross_batch_carry(spark, transcripts, transcripts_pdf):
    """Force tiny Arrow batches so the mega conversation spans many
    batches — exercises the carry-state path."""
    from featureengineer_spark.kernels import featurize_fast

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, "64")
    try:
        got = featurize_fast(transcripts, partitions=3).toPandas().sort_values(KEY, kind="mergesort")
    finally:
        spark.conf.set(key, prev)
    exp = oracle_features(transcripts_pdf).sort_values(KEY, kind="mergesort")
    np.testing.assert_allclose(
        np.vstack(got["feature_vec"].to_numpy()),
        np.vstack(exp["feature_vec"].to_numpy()),
        rtol=1e-5, atol=1e-8,
    )


def test_featurize_sql_allclose(spark, transcripts, transcripts_pdf):
    from featureengineer_spark.kernels import featurize_sql

    got = featurize_sql(transcripts).toPandas().sort_values(KEY, kind="mergesort")
    exp = oracle_features(transcripts_pdf).sort_values(KEY, kind="mergesort")
    assert len(got) == len(exp)
    np.testing.assert_allclose(
        np.vstack(got["feature_vec"].to_numpy()),
        np.vstack(exp["feature_vec"].to_numpy()),
        rtol=1e-5, atol=1e-8,
    )


def test_featurize_fast_clustered_allclose(spark, transcripts, transcripts_pdf, tmp_path):
    """clustered=True over a conv-bucketed store (no exchange) must match."""
    from featureengineer_spark.kernels import featurize_fast

    path = str(tmp_path / "clustered")
    transcripts.repartition(5, "conv_id").write.parquet(path)
    t = spark.read.parquet(path)
    got = featurize_fast(t, clustered=True).toPandas().sort_values(KEY, kind="mergesort")
    exp = oracle_features(transcripts_pdf).sort_values(KEY, kind="mergesort")
    assert len(got) == len(exp)
    np.testing.assert_allclose(
        np.vstack(got["feature_vec"].to_numpy()),
        np.vstack(exp["feature_vec"].to_numpy()),
        rtol=1e-5, atol=1e-8,
    )


def test_learn_feature_model_whitens(spark, transcripts):
    """The data-learned FeatureModel must plug into featurize unchanged
    and produce identity-covariance features (decorrelation by
    construction)."""
    import numpy as np

    from featureengineer_spark.kernels import featurize_fast, learn_feature_model

    model = learn_feature_model(transcripts)
    out = featurize_fast(transcripts, model=model)
    vecs = np.array([r["feature_vec"] for r in out.select("feature_vec").collect()])
    cov = np.cov(vecs, rowvar=False, ddof=0)
    np.testing.assert_allclose(cov, np.eye(vecs.shape[1]), atol=1e-6)
