"""SemDeDup (operators/semdedup.py)."""

import numpy as np
import pytest

CENTS = [[1.0, 0.0], [0.0, 1.0]]

ROWS = [
    (1, [1.0, 0.0]),
    (2, [0.999, 0.01]),   # near-dup of 1, same cluster → dropped
    (3, [0.6, 0.8]),      # cluster 1 seed
    (4, [0.58, 0.81]),    # near-dup of 3 in cluster 1 → dropped
    (5, [1.0, 1.0]),      # tie → cluster 0; cos vs 1 ≈ 0.707 → kept
    (6, [0.0, 0.0]),      # zero norm → kept, no cosine
]


def _df(spark):
    return spark.createDataFrame(ROWS, "vec_id long, embedding array<double>")


def test_assignment_matches_numpy(spark):
    from featureengineer_spark.operators.semdedup import assign_clusters

    got = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters(_df(spark), CENTS).collect()
    }
    c = np.array(CENTS)
    cn2 = (c * c).sum(axis=1)
    for vid, v in ROWS:
        d = cn2 - 2.0 * np.asarray(v) @ c.T
        assert got[vid] == int(np.argmin(d)), vid  # argmin → lowest on tie


def test_semdedup_verdicts(spark):
    from featureengineer_spark.operators.semdedup import semdedup

    out = {
        r["vec_id"]: r.asDict()
        for r in semdedup(_df(spark), CENTS, tau=0.95).collect()
    }
    assert [out[i]["kept"] for i in (1, 2, 3, 4, 5, 6)] == [
        True, False, True, False, True, True,
    ]
    assert out[2]["max_cos_earlier"] == pytest.approx(0.99995, abs=1e-4)
    # max over BOTH earlier cluster-0 vectors (cos vs id 2 ≈ 0.7142)
    assert out[5]["max_cos_earlier"] == pytest.approx(0.7142, abs=1e-3)
    assert out[6]["max_cos_earlier"] is None
    # near-dup across DIFFERENT clusters is invisible by design
    assert out[3]["cluster_id"] != out[1]["cluster_id"]


def test_semdedup_filter_preserves_schema(spark):
    from featureengineer_spark.operators.semdedup import semdedup_filter

    df = _df(spark)
    df = df.withColumn("extra", df.vec_id * 2)
    out = semdedup_filter(df, CENTS, tau=0.95)
    assert set(out.columns) == {"vec_id", "embedding", "extra"}
    assert sorted(r["vec_id"] for r in out.collect()) == [1, 3, 5, 6]


def test_no_cartesian_in_plan(spark):
    from featureengineer_spark.operators.semdedup import semdedup

    plan = (
        semdedup(_df(spark), CENTS)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
