"""Trial scoring and DET/EER evaluation (SURVEY.md §2.3 J8, §2.6 O1/O2,
§2.4 A11).

The reference scores every (enroll model × test segment) pair admitted by
the ndx trial mask with cosine/2cov/PLDA kernels (``IVector.py:1324-1390``)
and evaluates with DET curves / EER over sorted cumulative error rates
(``jyh/result.py:34-77``). Here:

* the dense boolean trial matrix becomes a **long-form trial table**
  ``(enroll_id, test_id, is_target)`` — never materialized dense;
* scoring = inner join on the trial table + a JVM-side cosine over the
  embedding arrays (``zip_with``/``aggregate`` — no Python);
* DET/EER = one global sort of scores + cumulative sums via Window —
  the ``DETsort`` + ``np.cumsum`` pipeline as two Window expressions.

At 100 TB the trial table is the pruning structure: the join's shuffle is
bounded by |trials|, not |enroll|×|test|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _norm(c) -> F.Column:
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))


def score_trials(
    enroll: DataFrame,
    test: DataFrame,
    trials: DataFrame,
    enroll_id: str = "enroll_id",
    test_id: str = "test_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine-score exactly the pairs named by the trial table.

    ``enroll``/``test``: (id, embedding array); ``trials``:
    (enroll_id, test_id[, is_target]). Returns trials + ``score``.
    Both sides are joined by id (broadcast when small), the per-pair
    cosine runs inside codegen.
    """
    e = enroll.select(
        F.col(enroll.columns[0]).alias(enroll_id),
        F.col(vec_col).alias("__ev"),
        _norm(vec_col).alias("__en"),
    )
    t = test.select(
        F.col(test.columns[0]).alias(test_id),
        F.col(vec_col).alias("__tv"),
        _norm(vec_col).alias("__tn"),
    )
    dot = F.aggregate(
        F.zip_with("__ev", "__tv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    out = (
        trials.join(e, on=enroll_id, how="inner")
        .join(t, on=test_id, how="inner")
        .withColumn(
            "score",
            F.when(
                (F.col("__en") > 0) & (F.col("__tn") > 0),
                dot / (F.col("__en") * F.col("__tn")),
            ).otherwise(F.lit(0.0)),
        )
        .drop("__ev", "__en", "__tv", "__tn")
    )
    return out


#: enroll rows above which score_trials_gemm refuses to broadcast the
#: enroll matrix (at d=400 float64 this caps the broadcast at ~1.6 GB/
#: 100k — keep well under; the join path has no such bound).
DEFAULT_MAX_GEMM_ENROLL_ROWS = 200_000

#: trial rows above which score_trials_gemm refuses to collect the trial
#: table to the driver — the trial mask rides the broadcast alongside
#: the enroll matrix and scales with |test|·trials-per-test, so it needs
#: its own guard (20M rows of (ids + passthrough) is already ~GB-scale
#: pandas on the driver; the join path has no such bound).
DEFAULT_MAX_GEMM_TRIAL_ROWS = 20_000_000


def score_trials_gemm(
    enroll: DataFrame,
    test: DataFrame,
    trials: DataFrame,
    enroll_id: str = "enroll_id",
    test_id: str = "test_id",
    vec_col: str = "embedding",
    max_enroll_rows: int = DEFAULT_MAX_GEMM_ENROLL_ROWS,
    max_trial_rows: int = DEFAULT_MAX_GEMM_TRIAL_ROWS,
) -> DataFrame:
    """Broadcast-GEMM cosine trial scorer — same results as
    :func:`score_trials`, different physical plan for the common shape
    |enroll| ≪ |test| with a broadcastable trial mask (the reference's
    ndx shape: thousands of enroll models against a large test stream).

    The enroll matrix, its norms, and the trial table ride ONE broadcast;
    a single ``mapInArrow`` pass over the TEST side computes each batch's
    full cosine block as one BLAS matrix product (T_b·Eᵀ), gathers the
    trial-masked entries, and emits the trial rows (all passthrough
    columns preserved) with their scores — the per-pair vectors never
    enter a shuffle and never cross the Arrow boundary (only the test
    batch does: |batch|·d doubles vs the join path's |trials|·2d). Rows
    of ``trials`` whose enroll/test id has no vector row are dropped, and
    zero-norm vectors score 0.0 — identical inner-join semantics.

    Scale: shuffle-free; output size = |trials| rows. Driver/executor
    memory holds (|enroll| + |trials|)·O(1) — both sides guarded
    (``max_enroll_rows`` / ``max_trial_rows``, each a limit-bounded
    count); past either cap use :func:`score_trials`.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from pyspark.sql import types as T

    if enroll.limit(max_enroll_rows + 1).count() > max_enroll_rows:
        raise ValueError(
            f"score_trials_gemm: enroll side exceeds {max_enroll_rows} rows — "
            "use score_trials (join path) at this shape"
        )
    if trials.limit(max_trial_rows + 1).count() > max_trial_rows:
        raise ValueError(
            f"score_trials_gemm: trial table exceeds {max_trial_rows} rows — "
            "the trial mask is collected to the driver and broadcast, which "
            "scales with |test|; use score_trials (join path) at this shape"
        )
    sc = enroll.sparkSession.sparkContext
    e_pdf = enroll.toPandas()
    e_ids = e_pdf.iloc[:, 0].to_numpy()
    e_mat = (
        np.vstack(e_pdf[vec_col].to_numpy())
        if len(e_pdf)
        else np.zeros((0, 1))
    )
    e_norm = np.linalg.norm(e_mat, axis=1)
    e_row = {eid: i for i, eid in enumerate(e_ids)}

    t_trials = trials.toPandas()
    # trial rows with an unknown enroll id drop here (inner-join parity)
    known = t_trials[enroll_id].map(e_row).notna().to_numpy()
    t_trials = t_trials[known].reset_index(drop=True)
    t_trials["__e_row"] = t_trials[enroll_id].map(e_row).astype(np.int64)
    by_test = {
        tid: grp.index.to_numpy() for tid, grp in t_trials.groupby(test_id)
    }
    b = sc.broadcast((e_mat, e_norm, t_trials, by_test))

    out_schema = T.StructType(
        list(trials.schema.fields) + [T.StructField("score", T.DoubleType())]
    )

    def kernel(batches):
        e_m, e_n, tr_pdf, idx_by_test = b.value
        for batch in batches:
            if batch.num_rows == 0:
                continue
            pdf = batch.to_pandas()
            tids = pdf.iloc[:, 0].to_numpy()
            x = np.vstack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
            t_n = np.linalg.norm(x, axis=1)
            # trial rows touching this batch, with their local test row
            local_rows, trial_rows = [], []
            for li, tid in enumerate(tids):
                rows = idx_by_test.get(tid)
                if rows is not None:
                    trial_rows.append(rows)
                    local_rows.append(np.full(len(rows), li))
            if not trial_rows:
                continue
            trial_rows = np.concatenate(trial_rows)
            local_rows = np.concatenate(local_rows)
            # one BLAS block for the whole batch, then a masked gather
            block = x @ e_m.T  # (batch, |enroll|)
            e_rows = tr_pdf["__e_row"].to_numpy()[trial_rows]
            dots = block[local_rows, e_rows]
            denom = t_n[local_rows] * e_n[e_rows]
            scores = np.where(denom > 0, dots / np.where(denom > 0, denom, 1.0), 0.0)
            out = tr_pdf.drop(columns="__e_row").iloc[trial_rows].copy()
            out["score"] = scores
            yield pa.RecordBatch.from_pandas(out, preserve_index=False)

    return test.select(
        F.col(test.columns[0]).alias(test_id), F.col(vec_col)
    ).mapInArrow(kernel, schema=out_schema)


def score_trials_mahalanobis(
    enroll: DataFrame,
    test: DataFrame,
    trials: DataFrame,
    precision,
    enroll_id: str = "enroll_id",
    test_id: str = "test_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mahalanobis trial scoring (``IVector.py:1345`` graft):
    score = −(e−t)ᵀ M (e−t) with the (small) precision matrix broadcast
    and applied inside an Arrow-batched kernel — the broadcast-model
    pattern of the reference's metric scorers."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    sc = enroll.sparkSession.sparkContext
    b_m = sc.broadcast(np.asarray(precision))

    e = enroll.select(F.col(enroll.columns[0]).alias(enroll_id), F.col(vec_col).alias("__ev"))
    t = test.select(F.col(test.columns[0]).alias(test_id), F.col(vec_col).alias("__tv"))

    def _score_fn(ev, tv):
        m = b_m.value
        a = np.vstack(ev.to_numpy())
        b = np.vstack(tv.to_numpy())
        diff = a - b
        return pd.Series(-((diff @ m) * diff).sum(axis=1))

    _score = F.pandas_udf(_score_fn, T.DoubleType())
    return (
        trials.join(e, on=enroll_id, how="inner")
        .join(t, on=test_id, how="inner")
        .withColumn("score", _score(F.col("__ev"), F.col("__tv")))
        .drop("__ev", "__tv")
    )


def score_trials_bilinear(
    enroll: DataFrame,
    test: DataFrame,
    trials: DataFrame,
    q_mat,
    p_mat,
    const: float = 0.0,
    mean=None,
    enroll_id: str = "enroll_id",
    test_id: str = "test_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Generic pair log-likelihood-ratio scorer:
    score = e̅ᵀQe̅ + t̅ᵀQt̅ + 2·e̅ᵀPt̅ + const with x̅ = x − μ.

    Covers the reference's two-covariance (``IVector.py:1371-1394``) and
    PLDA (``IVector.py:1398-1455``) scorers — (Q, P, const) come from
    ``plda.pair_llr_matrices``. Matrices are broadcast; the quadratic
    forms run batched (einsum) in an Arrow kernel over the trial join,
    so the shuffle is bounded by |trials| exactly like ``score_trials``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    q_mat = np.asarray(q_mat, dtype=np.float64)
    p_mat = np.asarray(p_mat, dtype=np.float64)
    mean = np.zeros(q_mat.shape[0]) if mean is None else np.asarray(mean, dtype=np.float64)
    sc = enroll.sparkSession.sparkContext
    b = sc.broadcast((q_mat, p_mat, float(const), mean))

    e = enroll.select(F.col(enroll.columns[0]).alias(enroll_id), F.col(vec_col).alias("__ev"))
    t = test.select(F.col(test.columns[0]).alias(test_id), F.col(vec_col).alias("__tv"))

    def _score_fn(ev, tv):
        qm, pm, c0, mu = b.value
        x1 = np.vstack(ev.to_numpy()) - mu
        x2 = np.vstack(tv.to_numpy()) - mu
        # quadratic forms as GEMM + rowwise dot (BLAS-dispatched; the
        # 3-operand einsum falls back to a generic loop)
        s = (
            ((x1 @ qm) * x1).sum(axis=1)
            + ((x2 @ qm) * x2).sum(axis=1)
            + 2.0 * ((x1 @ pm) * x2).sum(axis=1)
            + c0
        )
        return pd.Series(s)

    _score = F.pandas_udf(_score_fn, T.DoubleType())
    return (
        trials.join(e, on=enroll_id, how="inner")
        .join(t, on=test_id, how="inner")
        .withColumn("score", _score(F.col("__ev"), F.col("__tv")))
        .drop("__ev", "__tv")
    )


def score_trials_two_cov(
    enroll: DataFrame,
    test: DataFrame,
    trials: DataFrame,
    mu,
    b_cov,
    w_cov,
    **kw,
) -> DataFrame:
    """Two-covariance trial scoring (Γ = B, Λ = B + W)."""
    import numpy as np

    from featureengineer_spark.operators.plda import pair_llr_matrices

    q, p, c = pair_llr_matrices(np.asarray(b_cov), np.asarray(b_cov) + np.asarray(w_cov))
    return score_trials_bilinear(enroll, test, trials, q, p, c, mean=mu, **kw)


def score_trials_plda(
    enroll: DataFrame,
    test: DataFrame,
    trials: DataFrame,
    model,
    **kw,
) -> DataFrame:
    """PLDA trial scoring (Γ = VVᵀ, Λ = VVᵀ + Σ)."""
    q, p, c = model.llr_matrices()
    return score_trials_bilinear(enroll, test, trials, q, p, c, mean=model.mean, **kw)


def fit_precision(df: DataFrame, vec_col: str = "embedding", eps: float = 1e-6):
    """Precision (inverse covariance) of a vector column — one distributed
    pass of numpy partials (see ``whitening.fit_whitener``), tiny inverse
    on the driver."""
    import numpy as np

    from featureengineer_spark.operators.whitening import fit_whitener

    mean, w = fit_whitener(df, vec_col=vec_col, eps=eps)
    # fit_whitener returns W = C^{-1/2}; precision = WᵀW
    return w.T @ w


def det_curve(
    scored: DataFrame,
    score_col: str = "score",
    target_col: str = "is_target",
    n_buckets: int = 64,
) -> DataFrame:
    """DET operating points: for each distinct threshold (= each score,
    descending), the miss rate P(score < thr | target) and false-alarm
    rate P(score >= thr | non-target) — ``jyh/result.py:48-59``.

    Scale-safe cumulative sums: scores are range-bucketed by approximate
    quantiles (one pass), the running counts are computed per bucket in
    parallel, and an exclusive scan over the tiny per-bucket totals frame
    (``n_buckets`` rows) supplies the cross-bucket offsets — the same
    two-pass prefix-scan trick as ``skew.salted_cumulative``. No window
    ever sees more than one bucket of rows, so a 10⁹-trial score set
    never funnels through a single task. Ties cannot cross buckets
    (bucketing is by score only), so the output is EXACTLY the global
    sort's. ``n_buckets<=1`` falls back to the single global window.
    """
    totals = scored.agg(
        F.sum(F.when(F.col(target_col), 1).otherwise(0)).alias("n_tar"),
        F.sum(F.when(~F.col(target_col), 1).otherwise(0)).alias("n_non"),
    )

    bounds: list[float] = []
    if n_buckets and n_buckets > 1:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = sorted(set(scored.approxQuantile(score_col, qs, 0.001)))

    if bounds:
        lit_bounds = F.array(*[F.lit(float(b)) for b in bounds])
        # bucket = #boundaries strictly above this score → bucket 0 holds
        # the highest scores; cumulative order = ascending bucket id
        bucket = F.aggregate(
            lit_bounds,
            F.lit(0),
            lambda acc, b: acc + F.when(F.col(score_col) < b, 1).otherwise(0),
        )
        base = scored.select(
            F.col(score_col), F.col(target_col), bucket.alias("__bkt")
        )
        w_in = (
            Window.partitionBy("__bkt")
            .orderBy(F.col(score_col).desc(), F.col(target_col).desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        local = base.select(
            score_col,
            target_col,
            "__bkt",
            F.sum(F.when(F.col(target_col), 1).otherwise(0)).over(w_in).alias("__loc_tar"),
            F.sum(F.when(~F.col(target_col), 1).otherwise(0)).over(w_in).alias("__loc_non"),
        )
        bkt_totals = base.groupBy("__bkt").agg(
            F.sum(F.when(F.col(target_col), 1).otherwise(0)).alias("__bt"),
            F.sum(F.when(~F.col(target_col), 1).otherwise(0)).alias("__bn"),
        )
        # exclusive scan over ≤ n_buckets rows — driver-scale by design
        w_scan = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
        offsets = bkt_totals.select(
            "__bkt",
            F.coalesce(F.sum("__bt").over(w_scan), F.lit(0)).alias("__off_tar"),
            F.coalesce(F.sum("__bn").over(w_scan), F.lit(0)).alias("__off_non"),
        )
        cum = local.join(F.broadcast(offsets), on="__bkt", how="inner").select(
            F.col(score_col),
            F.col(target_col),
            (F.col("__loc_tar") + F.col("__off_tar")).alias("__cum_tar"),
            (F.col("__loc_non") + F.col("__off_non")).alias("__cum_non"),
        )
    else:
        w = (
            Window.orderBy(F.col(score_col).desc(), F.col(target_col).desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = scored.select(
            F.col(score_col),
            F.col(target_col),
            F.sum(F.when(F.col(target_col), 1).otherwise(0)).over(w).alias("__cum_tar"),
            F.sum(F.when(~F.col(target_col), 1).otherwise(0)).over(w).alias("__cum_non"),
        )
    return cum.crossJoin(F.broadcast(totals)).select(
        F.col(score_col).alias("threshold"),
        # accepted = score >= thr; misses are targets NOT yet seen
        (1.0 - F.col("__cum_tar") / F.col("n_tar")).alias("miss_rate"),
        (F.col("__cum_non") / F.col("n_non")).alias("fa_rate"),
    )


def min_dcf(
    scored: DataFrame,
    p_target: float = 0.01,
    c_miss: float = 1.0,
    c_fa: float = 1.0,
    score_col: str = "score",
    target_col: str = "is_target",
) -> DataFrame:
    """Minimum normalized detection cost (the cost-weighted operating
    point of the reference's evaluation family, ``jyh/result.py``; the
    NIST SRE DCF definition):

        DCF(θ) = C_miss·P_tar·P_miss(θ) + C_fa·(1−P_tar)·P_fa(θ)
        minDCF = min_θ DCF(θ) / min(C_miss·P_tar, C_fa·(1−P_tar))

    One row: (min_dcf). Runs over :func:`det_curve`'s scale-safe
    operating-point frame — a single agg, no extra sort."""
    det = det_curve(scored, score_col, target_col)
    cost = (
        F.lit(c_miss * p_target) * F.col("miss_rate")
        + F.lit(c_fa * (1.0 - p_target)) * F.col("fa_rate")
    )
    norm = min(c_miss * p_target, c_fa * (1.0 - p_target))
    # the θ → ∞ operating point (reject all: miss=1, fa=0, cost
    # C_miss·P_tar) is a valid threshold not present in the per-score
    # frame; accept-all IS (the lowest threshold row)
    return det.agg(
        F.least(F.min(cost), F.lit(c_miss * p_target)).alias("__c")
    ).select((F.col("__c") / F.lit(norm)).alias("min_dcf"))


def eer(scored: DataFrame, score_col: str = "score", target_col: str = "is_target") -> float:
    """Equal error rate: operating point minimizing |miss - fa| (top-1 by
    ``orderBy(...).limit(1)`` — the argmin graft, ``jyh/result.py:56-58``)."""
    det = det_curve(scored, score_col, target_col)
    row = (
        det.withColumn("gap", F.abs(F.col("miss_rate") - F.col("fa_rate")))
        .orderBy(F.col("gap").asc(), F.col("threshold").desc())
        .limit(1)
        .collect()[0]
    )
    return float((row["miss_rate"] + row["fa_rate"]) / 2.0)
