"""Trial scoring + DET/EER vs a numpy reference (jyh/result.py graft)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def trial_data(spark):
    rng = np.random.default_rng(5)
    n_e, n_t, d = 20, 40, 16
    ev = rng.standard_normal((n_e, d))
    tv = rng.standard_normal((n_t, d))
    enroll = spark.createDataFrame(
        [(i, [float(x) for x in ev[i]]) for i in range(n_e)], "enroll_id int, embedding array<double>"
    )
    test = spark.createDataFrame(
        [(j, [float(x) for x in tv[j]]) for j in range(n_t)], "test_id int, embedding array<double>"
    )
    pairs = [(i, j, bool((i + j) % 5 == 0)) for i in range(n_e) for j in range(n_t) if (i * 7 + j) % 3 == 0]
    trials = spark.createDataFrame(pairs, "enroll_id int, test_id int, is_target boolean")
    return enroll, test, trials, ev, tv, pairs


def test_score_trials_matches_numpy(spark, trial_data):
    from featureengineer_spark.operators.scoring import score_trials

    enroll, test, trials, ev, tv, pairs = trial_data
    got = (
        score_trials(enroll, test, trials)
        .toPandas()
        .sort_values(["enroll_id", "test_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(pairs)
    exp = []
    for i, j, _ in sorted(pairs):
        c = ev[i] @ tv[j] / (np.linalg.norm(ev[i]) * np.linalg.norm(tv[j]))
        exp.append(c)
    np.testing.assert_allclose(got["score"].to_numpy(), exp, rtol=1e-9)


def test_eer_matches_numpy(spark, trial_data):
    from featureengineer_spark.operators.scoring import eer, score_trials

    enroll, test, trials, ev, tv, pairs = trial_data
    scored = score_trials(enroll, test, trials)
    got = eer(scored)

    # numpy reference: sweep all thresholds (scores desc)
    import pandas as pd

    pdf = scored.select("score", "is_target").toPandas()
    s = pdf.sort_values(["score", "is_target"], ascending=[False, False])
    tar = s["is_target"].to_numpy()
    cum_tar = np.cumsum(tar)
    cum_non = np.cumsum(~tar)
    miss = 1.0 - cum_tar / tar.sum()
    fa = cum_non / (~tar).sum()
    k = np.argmin(np.abs(miss - fa))
    exp = (miss[k] + fa[k]) / 2.0
    assert abs(got - exp) < 1e-9
    assert 0.0 <= got <= 1.0


def test_mahalanobis_scoring_matches_numpy(spark, trial_data):
    from featureengineer_spark.operators.scoring import (
        fit_precision,
        score_trials_mahalanobis,
    )

    enroll, test, trials, ev, tv, pairs = trial_data
    allvec = enroll.select(F.col("embedding")).unionAll(test.select("embedding"))
    m = fit_precision(allvec, vec_col="embedding")

    got = (
        score_trials_mahalanobis(enroll, test, trials, m)
        .toPandas()
        .sort_values(["enroll_id", "test_id"])
        .reset_index(drop=True)
    )
    exp = []
    for i, j, _ in sorted(pairs):
        d = ev[i] - tv[j]
        exp.append(-(d @ m @ d))
    np.testing.assert_allclose(got["score"].to_numpy(), exp, rtol=1e-7)

    # precision sanity: M ≈ inverse of the empirical covariance
    allv = np.vstack([ev, tv])
    cov = np.cov(allv, rowvar=False, ddof=0)
    np.testing.assert_allclose(m @ cov, np.eye(ev.shape[1]), atol=1e-4)


def test_det_curve_bucketed_equals_global(spark):
    """The range-bucketed two-pass DET must equal the single-window form
    exactly, and its full-input window must be partitioned (no global
    funnel — the scale guard from jyh/result.py's cumsum graft)."""
    import pandas as pd

    from featureengineer_spark.operators.scoring import det_curve

    rng = np.random.default_rng(3)
    n = 5000
    pdf = pd.DataFrame(
        {
            "score": np.round(rng.standard_normal(n), 3),  # many ties
            "is_target": rng.random(n) < 0.3,
        }
    )
    scored = spark.createDataFrame(pdf)

    bucketed = det_curve(scored, n_buckets=16)
    global_ = det_curve(scored, n_buckets=1)

    key = ["threshold", "miss_rate", "fa_rate"]
    a = bucketed.toPandas().sort_values(key).reset_index(drop=True)
    b = global_.toPandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # plan guard: every window over the full trial-row input must be
    # partitioned (first spec argument = partition column, no sort
    # direction); an unpartitioned window is only allowed for the
    # <= n_buckets totals scan (its aggregates are __bt/__bn sums).
    plan = bucketed._jdf.queryExecution().optimizedPlan().toString()
    partitioned, unpartitioned = 0, 0
    for ln in plan.splitlines():
        parts = ln.split("windowspecdefinition(")
        for spec in parts[1:]:
            first_arg = spec.split(",", 1)[0]
            if "ASC" in first_arg or "DESC" in first_arg:
                unpartitioned += 1
                assert "__bt" in ln or "__bn" in ln, f"global window over trials: {ln}"
            else:
                partitioned += 1
                assert first_arg.startswith("__bkt"), ln
    assert partitioned >= 1, "bucketed path not taken"


def test_min_dcf_matches_numpy(spark):
    """minDCF vs a brute-force numpy sweep over all thresholds."""
    import pandas as pd

    from featureengineer_spark.operators.scoring import min_dcf

    rng = np.random.default_rng(9)
    tar = rng.standard_normal(300) + 1.2
    non = rng.standard_normal(900)
    pdf = pd.DataFrame(
        {
            "score": np.concatenate([tar, non]),
            "is_target": [True] * len(tar) + [False] * len(non),
        }
    )
    scored = spark.createDataFrame(pdf)
    p_tar, cm, cf = 0.05, 1.0, 2.0
    got = min_dcf(scored, p_target=p_tar, c_miss=cm, c_fa=cf).collect()[0]["min_dcf"]

    scores = pdf["score"].to_numpy()
    labels = pdf["is_target"].to_numpy()
    thresholds = np.concatenate([np.unique(scores), [np.inf]])
    best = np.inf
    for t in thresholds:
        miss = ((scores < t) & labels).sum() / labels.sum()
        fa = ((scores >= t) & ~labels).sum() / (~labels).sum()
        best = min(best, cm * p_tar * miss + cf * (1 - p_tar) * fa)
    exp = best / min(cm * p_tar, cf * (1 - p_tar))
    np.testing.assert_allclose(got, exp, rtol=1e-9)


def test_score_trials_gemm_matches_join_path(spark):
    """The broadcast-GEMM trial scorer must reproduce score_trials
    row-for-row: same trial rows (inner-join drop semantics, passthrough
    columns preserved), same zero-norm guard, allclose scores."""
    import numpy as np
    from pyspark.sql import functions as F

    from featureengineer_spark.operators.scoring import score_trials, score_trials_gemm

    d = 16

    def vecs(n, tag):
        return spark.range(n).select(
            F.col("id").alias(f"{tag}_id"),
            F.when(
                F.col("id") == 3, F.array_repeat(F.lit(0.0), d)  # zero-norm row
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.lit(d)),
                    lambda i: (F.pmod(F.xxhash64(F.col("id"), i, F.lit(tag)), F.lit(200)) / 50.0 - 2.0),
                )
            ).alias("embedding"),
        )

    enroll = vecs(40, "e")
    test = vecs(300, "t")
    trials = (
        enroll.select("e_id").crossJoin(test.select("t_id"))
        .filter(F.pmod(F.col("e_id") * 7 + F.col("t_id"), F.lit(5)) == 0)
        .select(
            F.col("e_id").alias("enroll_id"),
            F.col("t_id").alias("test_id"),
            (F.pmod(F.col("e_id") + F.col("t_id"), F.lit(2)) == 0).alias("is_target"),
        )
        # a trial row with an unknown enroll id must drop on BOTH paths
        .unionByName(
            spark.createDataFrame(
                [(999_999, 0, True)], "enroll_id long, test_id long, is_target boolean"
            )
        )
    )
    key = ["enroll_id", "test_id"]
    jp = (
        score_trials(enroll, test, trials).toPandas()
        .sort_values(key).reset_index(drop=True)
    )
    gp = (
        score_trials_gemm(enroll, test, trials).toPandas()
        .sort_values(key).reset_index(drop=True)
    )
    assert len(jp) == len(gp) > 0
    assert (jp[key + ["is_target"]].values == gp[key + ["is_target"]].values).all()
    np.testing.assert_allclose(jp.score, gp.score, rtol=1e-9, atol=1e-12)
    # zero-norm rows scored 0.0 on both paths
    assert (gp.loc[gp.test_id == 3, "score"] == 0.0).all()


def test_score_trials_gemm_trial_table_guard(spark):
    """The trial mask rides the driver broadcast and scales with |test|,
    so it needs its own cap with an actionable error, like the enroll
    side has."""
    import pytest
    from featureengineer_spark.operators.scoring import score_trials_gemm

    enroll = spark.createDataFrame(
        [(f"e{i}", [1.0, 0.0]) for i in range(3)],
        "enroll_id string, embedding array<double>",
    )
    test = spark.createDataFrame(
        [(f"t{i}", [0.0, 1.0]) for i in range(4)],
        "test_id string, embedding array<double>",
    )
    trials = enroll.select("enroll_id").crossJoin(test.select("test_id"))
    with pytest.raises(ValueError, match="trial table exceeds"):
        score_trials_gemm(enroll, test, trials, max_trial_rows=5)
    # under the cap: normal results
    assert score_trials_gemm(enroll, test, trials).count() == 12
