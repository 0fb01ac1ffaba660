"""Supervised back end: class scatter, LDA, WCCN, two-covariance and
PLDA models over a labeled vector column.

Grafts the reference's scoring chain (``IVector.py:1336-1339`` LDA,
``:1508-1511`` WCCN, ``:1371-1394`` two-covariance, ``:1398-1455`` PLDA)
into distributed primitives:

* class statistics = one hash aggregation (``groupBy(label)`` with d
  JVM-side sums — map-side combined, shuffle bounded by |classes|);
* scatter matrices = the ``fit_whitener`` partials pattern: per-batch
  numpy outer-product sums reduced IN-CLUSTER (``em.reduce_partials``),
  driver receives O(d²) regardless of rows — the MPI ``Reduce(SUM)``
  analog;
* eigensolves / Cholesky on the tiny d×d matrices happen driver-side;
* model application / scoring = broadcast matrices inside Arrow kernels.

The two-covariance and PLDA pair log-likelihood ratios share one closed
form (public: Brümmer & de Villiers, "The speaker partitioning
problem", Odyssey 2010; Ioffe, "Probabilistic LDA", ECCV 2006): with
marginal covariance Λ and same-class cross-covariance Γ of centered
vectors, the joint covariances of a pair are

    same  = [[Λ, Γ], [Γ, Λ]],     diff = [[Λ, 0], [0, Λ]]

and  LLR(x1,x2) = x1ᵀQx1 + x2ᵀQx2 + 2·x1ᵀPx2 + const  with

    M = (Λ − ΓΛ⁻¹Γ)⁻¹
    Q = ½(Λ⁻¹ − M),  P = ½·MΓΛ⁻¹,  const = −½(ln|Λ−ΓΛ⁻¹Γ| − ln|Λ|).

Two-covariance: Γ = B (between-class), Λ = B + W (within-class).
PLDA (x = μ + Vh + ε, h~N(0,I_r), ε~N(0,Σ)): Γ = VVᵀ, Λ = VVᵀ + Σ —
well-defined even though Γ is rank-deficient (no B⁻¹ needed).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featureengineer_spark.operators.em import reduce_partials

__all__ = [
    "class_means",
    "scatter_matrices",
    "fit_two_cov",
    "fit_lda",
    "fit_wccn",
    "apply_projection",
    "PLDAModel",
    "train_plda",
    "pair_llr_matrices",
]


def _dim(df: DataFrame, vec_col: str) -> int:
    return len(df.select(vec_col).first()[0])


def _stable_class_layout(cm: DataFrame, label_col: str, parts: int = 4) -> DataFrame:
    """Pin a class-statistics frame to a deterministic layout before any
    per-task float accumulation over it: explicit hash repartition on the
    label (a pure function of the key; the explicit numPartitions blocks
    AQE coalescing) + local sort. Without this, a groupBy output's
    partition count and row order follow the session's shuffle config
    and fetch order, so per-task partial sums over class rows — and with
    them the converged LDA/WCCN/PLDA model — drift in the last float
    bits across sessions. O(|classes|) rows, negligible.
    """
    return cm.repartition(parts, label_col).sortWithinPartitions(label_col)


def class_means(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding", d: int | None = None
) -> DataFrame:
    """(label, n, mean array<double>) — d JVM-side sums per class, one
    shuffle bounded by |classes| (map-side combine)."""
    d = d or _dim(df, vec_col)
    sums = df.groupBy(label_col).agg(
        F.count("*").alias("n"),
        *[F.sum(F.col(vec_col)[i].cast("double")).alias(f"__s{i}") for i in range(d)],
    )
    return sums.select(
        label_col,
        "n",
        F.array(*[F.col(f"__s{i}") / F.col("n") for i in range(d)]).alias("mean"),
    )


def _second_moment(df: DataFrame, vec_col: str, d: int, weight_col: str | None = None):
    """Distributed Σ w·xxᵀ (+ Σ w·x, Σ w) via per-TASK numpy partials
    (accumulated across Arrow batches) reduced in-cluster. Returns
    (n, sx (d,), sxx (d,d))."""
    import pyarrow as pa
    from pyspark.sql import types as T

    cols = [vec_col] + ([weight_col] if weight_col else [])
    src = df.select(*cols)

    def partials(batches):
        n_acc = 0.0
        sx_acc = np.zeros(d)
        sxx_acc = np.zeros((d, d))
        seen = False
        for batch in batches:
            x = batch.column(0).flatten().to_numpy(zero_copy_only=False).reshape(-1, d)
            w = (
                batch.column(1).to_numpy(zero_copy_only=False).astype(np.float64)
                if weight_col
                else np.ones(x.shape[0])
            )
            n_acc += float(w.sum())
            sx_acc += w @ x
            sxx_acc += (x * w[:, None]).T @ x
            seen = True
        if not seen:
            return
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([n_acc]),
                pa.array([sx_acc.tolist()], type=pa.list_(pa.float64())),
                pa.array([sxx_acc.ravel().tolist()], type=pa.list_(pa.float64())),
            ],
            names=["n", "sx", "sxx"],
        )

    schema = T.StructType(
        [
            T.StructField("n", T.DoubleType()),
            T.StructField("sx", T.ArrayType(T.DoubleType())),
            T.StructField("sxx", T.ArrayType(T.DoubleType())),
        ]
    )
    parts = reduce_partials(
        src.mapInArrow(partials, schema=schema), {"n": None, "sx": d, "sxx": d * d}
    )
    return parts["n"], parts["sx"], parts["sxx"].reshape(d, d)


def scatter_matrices(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """(global mean μ, within-class cov W, between-class cov B, N).

    W = (Σxxᵀ − Σ_c n_c μ_cμ_cᵀ)/N,  B = Σ_c n_c μ_cμ_cᵀ/N − μμᵀ.
    Both second-moment terms are distributed partial sums; class means
    stay in a DataFrame (never collected), so |classes| is unbounded.
    """
    d = _dim(df, vec_col)
    vecs = df.select(F.col(vec_col).cast("array<double>").alias(vec_col), F.col(label_col))
    n, sx, sxx = _second_moment(vecs, vec_col, d)
    cm = _stable_class_layout(class_means(vecs, label_col, vec_col, d), label_col)
    _, _, class_mm = _second_moment(cm, "mean", d, weight_col="n")
    mu = sx / n
    w_cov = (sxx - class_mm) / n
    b_cov = class_mm / n - np.outer(mu, mu)
    w_cov = 0.5 * (w_cov + w_cov.T)
    b_cov = 0.5 * (b_cov + b_cov.T)
    return mu, w_cov, b_cov, float(n)


def fit_two_cov(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    diag: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Two-covariance model (μ, B between, W within) — the reference's
    ``two_covariance_Score`` fit (``IVector.py:1371-1378``). ``diag=True``
    keeps only the variances (the SQL-checkable variant)."""
    mu, w_cov, b_cov, _ = scatter_matrices(df, label_col, vec_col)
    if diag:
        w_cov = np.diag(np.diag(w_cov))
        b_cov = np.diag(np.diag(b_cov))
    return mu, b_cov, w_cov


def fit_lda(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    n_components: int = 2,
    ridge: float = 1e-8,
) -> tuple[np.ndarray, np.ndarray]:
    """LDA rotation (``IVector.py:1336-1339`` get_lda_matrix graft):
    top-r generalized eigenvectors of (W, B), solved symmetrically via
    Cholesky whitening of W on the driver. Returns (μ, proj (d, r));
    apply y = projᵀ(x−μ)."""
    mu, w_cov, b_cov, _ = scatter_matrices(df, label_col, vec_col)
    d = len(mu)
    chol = np.linalg.cholesky(w_cov + ridge * np.eye(d))
    inv_l = np.linalg.inv(chol)
    sym = inv_l @ b_cov @ inv_l.T
    vals, vecs = np.linalg.eigh(0.5 * (sym + sym.T))
    top = vecs[:, ::-1][:, :n_components]
    proj = inv_l.T @ top  # (d, r)
    # deterministic sign: first nonzero coefficient positive
    for j in range(proj.shape[1]):
        nz = np.flatnonzero(np.abs(proj[:, j]) > 1e-12)
        if len(nz) and proj[nz[0], j] < 0:
            proj[:, j] = -proj[:, j]
    return mu, proj


def fit_wccn(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    ridge: float = 1e-8,
) -> np.ndarray:
    """WCCN (``IVector.py:1508-1511`` graft): L = chol(W⁻¹) (lower);
    apply y = Lᵀx → expected within-class covariance becomes identity."""
    _, w_cov, _, _ = scatter_matrices(df, label_col, vec_col)
    d = w_cov.shape[0]
    inv_w = np.linalg.inv(w_cov + ridge * np.eye(d))
    return np.linalg.cholesky(0.5 * (inv_w + inv_w.T))


def apply_projection(
    df: DataFrame,
    proj: np.ndarray,
    mean: np.ndarray | None = None,
    vec_col: str = "embedding",
    out_col: str = "projected",
    length_norm: bool = False,
) -> DataFrame:
    """y = projᵀ(x − μ), broadcast matmul in an Arrow kernel (reuses the
    whitening applicator)."""
    from featureengineer_spark.operators.whitening import apply_whitening

    mean = mean if mean is not None else np.zeros(proj.shape[0])
    return apply_whitening(
        df, mean, np.asarray(proj).T, vec_col=vec_col, out_col=out_col, length_norm=length_norm
    )


def pair_llr_matrices(
    gamma: np.ndarray, lam: np.ndarray
) -> tuple[np.ndarray, np.ndarray, float]:
    """(Q, P, const) of the pair LLR for same-class cross-cov Γ and
    marginal cov Λ (see module docstring)."""
    lam_inv = np.linalg.inv(lam)
    schur = lam - gamma @ lam_inv @ gamma
    m = np.linalg.inv(schur)
    q = 0.5 * (lam_inv - m)
    p = 0.5 * (m @ gamma @ lam_inv)
    sign_s, logdet_s = np.linalg.slogdet(schur)
    sign_l, logdet_l = np.linalg.slogdet(lam)
    const = -0.5 * (logdet_s - logdet_l)
    q = 0.5 * (q + q.T)
    p = 0.5 * (p + p.T)
    return q, p, float(const)


@dataclass
class PLDAModel:
    """x = μ + V·h + ε with h ~ N(0, I_rank), ε ~ N(0, Σ)."""

    mean: np.ndarray  # (d,)
    v_mat: np.ndarray  # (d, rank)
    sigma: np.ndarray  # (d, d)
    llk_history: list[float] = field(default_factory=list)

    def llr_matrices(self) -> tuple[np.ndarray, np.ndarray, float]:
        gamma = self.v_mat @ self.v_mat.T
        return pair_llr_matrices(gamma, gamma + self.sigma)


def train_plda(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    rank: int = 2,
    n_iter: int = 10,
    seed: int = 0,
    ridge: float = 1e-8,
) -> PLDAModel:
    """Distributed PLDA EM (``IVector.py:1433-1435`` graft; standard
    simplified PLDA EM, Ioffe 2006 / Prince & Elder 2007).

    The E-step needs only per-class (n_c, f_c = Σ centered x): the class
    frame is built ONCE by hash aggregation; each EM iteration is a
    ``mapInArrow`` over that (|classes|-row) frame emitting one partial
    per batch — R1 = Σ f_c·h̄_cᵀ, R2 = Σ n_c(P_c⁻¹ + h̄h̄ᵀ) — reduced
    in-cluster. The global second moment S is computed once. Driver work
    per iteration is O(d·r + r²) linear algebra.
    """
    import pyarrow as pa
    from pyspark.sql import types as T

    sc = df.sparkSession.sparkContext
    d = _dim(df, vec_col)
    vecs = df.select(F.col(vec_col).cast("array<double>").alias(vec_col), F.col(label_col))
    n, sx, sxx = _second_moment(vecs, vec_col, d)
    mu = sx / n
    s_tot = sxx - n * np.outer(mu, mu)  # Σ (x−μ)(x−μ)ᵀ

    cm = _stable_class_layout(class_means(vecs, label_col, vec_col, d), label_col)
    b_mu = sc.broadcast(mu)
    cls = cm.select(F.col("n").cast("double").alias("n"), "mean")
    # f_c = n_c (μ_c − μ): center the class sums once, keep distributed
    def center(batches):
        m = b_mu.value
        for batch in batches:
            nc = batch.column(0).to_numpy(zero_copy_only=False)
            cmeans = batch.column(1).flatten().to_numpy(zero_copy_only=False).reshape(-1, d)
            f_c = (cmeans - m) * nc[:, None]
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(list(f_c), type=pa.list_(pa.float64()))],
                names=["n", "f"],
            )

    cls_schema = T.StructType(
        [T.StructField("n", T.DoubleType()), T.StructField("f", T.ArrayType(T.DoubleType()))]
    )
    cls_frame = cls.mapInArrow(center, schema=cls_schema).persist()

    rng = np.random.default_rng(seed)
    v_mat = rng.standard_normal((d, rank)) * 0.1
    sigma = s_tot / n

    part_schema = T.StructType(
        [
            T.StructField("r1", T.ArrayType(T.DoubleType())),  # d·rank
            T.StructField("r2", T.ArrayType(T.DoubleType())),  # rank²
        ]
    )

    model = PLDAModel(mean=mu, v_mat=v_mat, sigma=sigma)
    for _ in range(n_iter):
        sig_inv = np.linalg.inv(model.sigma + ridge * np.eye(d))
        b_m = sc.broadcast((model.v_mat, sig_inv))

        def estep(batches):
            v_cur, si = b_m.value
            r = v_cur.shape[1]
            g = v_cur.T @ si @ v_cur  # (r, r)
            vt_si = v_cur.T @ si  # (r, d)
            r1 = np.zeros((d, r))
            r2 = np.zeros((r, r))
            seen = False
            for batch in batches:
                nc = batch.column(0).to_numpy(zero_copy_only=False)
                f_c = batch.column(1).flatten().to_numpy(zero_copy_only=False).reshape(-1, d)
                prec = np.eye(r) + nc[:, None, None] * g  # (c, r, r)
                cov = np.linalg.inv(prec)
                h = np.matmul(cov, (f_c @ vt_si.T)[:, :, None])[:, :, 0]
                r1 += f_c.T @ h  # (d, r)
                r2 += (cov * nc[:, None, None]).sum(axis=0) + (h * nc[:, None]).T @ h
                seen = True
            if not seen:
                return
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([r1.ravel().tolist()], type=pa.list_(pa.float64())),
                    pa.array([r2.ravel().tolist()], type=pa.list_(pa.float64())),
                ],
                names=["r1", "r2"],
            )

        parts = reduce_partials(
            cls_frame.mapInArrow(estep, schema=part_schema),
            {"r1": d * rank, "r2": rank * rank},
        )
        r1 = parts["r1"].reshape(d, rank)
        r2 = parts["r2"].reshape(rank, rank)
        new_v = np.linalg.solve(0.5 * (r2 + r2.T), r1.T).T
        new_sigma = (s_tot - new_v @ r1.T) / n
        new_sigma = 0.5 * (new_sigma + new_sigma.T)
        model = PLDAModel(
            mean=mu, v_mat=new_v, sigma=new_sigma, llk_history=model.llk_history
        )

    cls_frame.unpersist()
    return model
