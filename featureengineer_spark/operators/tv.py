"""Total-variability (latent-factor) EM + per-entity factor extraction.

The reference's core model-training loop: a low-rank factor-analysis
("TV") matrix T is learned from the per-segment sufficient statistics
(StatServer) by EM (``IVector.py:131-244`` FA.total_variability; MPI
data-parallel variant ``mpiIV.py:139-214``), then each segment's latent
factor ("i-vector") is the posterior mean of the factor given its stats
(``mpiIV.py:306-312``). The algorithm is the standard public i-vector
front end (Dehak et al., "Front-End Factor Analysis for Speaker
Verification", IEEE TASLP 2011).

Model: centered+whitened first-order stats  s̃₁(e) ≈ T·w(e),
posterior precision  Λ(e) = I + Σ_k N_k(e)·T_kᵀT_k,
posterior mean       w(e) = Λ(e)⁻¹ Tᵀ s̃₁(e).

Spark-native split (same shape as ``em.train_gmm``):

* stats whitening: one Arrow kernel, model broadcast — the reference's
  ``whiten_stat1`` (``mpiIV.py:289-293``).
* E-step: ``mapInArrow`` over StatServer batches; each TASK accumulates
  its partial (A = Σ N_k·E[wwᵀ] per component, C = Σ E[w]·s̃₁ᵀ,
  R = Σ E[wwᵀ], n) across all its batches in one numpy buffer, with
  symmetric matrices upper-triangle packed (the reference's
  4 GB-MPI-limit packing, ``mpiIV.py:139-141``), then emits it as flat
  slices of at most ``max_partial_bytes`` each. Slices reduce
  IN-CLUSTER via ``em.reduce_sliced_partials`` (positional hash agg);
  the driver receives O(K·R² + K·d·R) doubles regardless of input size.
* M-step: driver-side numpy per-component solve T_k = solve(A_k, C_k)ᵀ
  plus the optional minimum-divergence Cholesky step
  (``mpiIV.py:229-234``).
* extraction: ``mapInArrow`` with broadcast T; per-session solves are
  BATCHED (one ``np.linalg.solve`` over the whole Arrow batch), not a
  Python loop per row.

Scale notes: the full partial is K·R(R+1)/2 + R·K·d + R(R+1)/2 + 1
doubles — at the reference's production shape (K=2048, d=39, R=400)
that is ≈1.3 GB for A plus ≈256 MB for C, i.e. ≈1.6 GB, the same
object the reference chunks through its 4 GB MPI ceiling
(``mpiIV.py:184-201``). Hence: ONE accumulator per task (not per Arrow
batch), shipped as ``max_partial_bytes``-bounded slices so no Arrow
record, shuffle row, or executor spike scales with K·R²; the shuffle
carries #tasks × partial-size positional pairs with map-side combine;
the driver gathers exactly one full partial (it must hold A for the
per-component solves, as the reference's root rank does). Extraction
shuffles nothing at all.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from featureengineer_spark.operators.em import GMM, reduce_sliced_partials

__all__ = [
    "TVModel",
    "whiten_stats",
    "train_total_variability",
    "extract_latent_factors",
]


@dataclass
class TVModel:
    """Learned low-rank projection. ``F_mat`` is (K·d, R)."""

    F_mat: np.ndarray
    ubm: GMM
    llk_like_history: list[float] = field(default_factory=list)

    @property
    def rank(self) -> int:
        return self.F_mat.shape[1]


def _list_array(mat: np.ndarray):
    """(n, d) float matrix → Arrow list<double> column without per-row
    Python objects (vectorized offsets + one flat buffer)."""
    import pyarrow as pa

    n, d = mat.shape
    offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
    return pa.ListArray.from_arrays(
        offsets, pa.array(np.ascontiguousarray(mat.ravel()), type=pa.float64())
    )


def _whiten_np(stat0: np.ndarray, stat1: np.ndarray, ubm: GMM) -> np.ndarray:
    """(n, K·d) centered + variance-normalized first-order stats:
    s̃₁ = (s₁ − N ⊗ μ) / σ  (per component/dim; ``whiten_stat1``)."""
    k, d = ubm.means.shape
    mu = ubm.means.reshape(-1)  # (K·d,)
    isig = 1.0 / np.sqrt(ubm.variances.reshape(-1))  # (K·d,)
    n_exp = np.repeat(stat0, d, axis=1)  # (n, K·d)
    return (stat1 - n_exp * mu) * isig


def whiten_stats(
    stats: DataFrame,
    ubm: GMM,
    entity_col: str = "conv_id",
    stat0_col: str = "stat0",
    stat1_col: str = "stat1",
) -> DataFrame:
    """StatServer → same frame with ``stat1`` replaced by the whitened
    form. Arrow-batched, model broadcast; no shuffle."""
    import pyarrow as pa

    sc = stats.sparkSession.sparkContext
    k, d = ubm.means.shape
    b = sc.broadcast((ubm.weights, ubm.means, ubm.variances))

    out_schema = T.StructType(
        [
            T.StructField(entity_col, stats.schema[entity_col].dataType),
            T.StructField(stat0_col, T.ArrayType(T.DoubleType())),
            T.StructField(stat1_col, T.ArrayType(T.DoubleType())),
        ]
    )

    def kernel(batches):
        w, mu, var = b.value
        m = GMM(w, mu, var)
        for batch in batches:
            ent = batch.column(0)
            s0 = batch.column(1).flatten().to_numpy(zero_copy_only=False).reshape(-1, k)
            s1 = batch.column(2).flatten().to_numpy(zero_copy_only=False).reshape(-1, k * d)
            s1w = _whiten_np(s0, s1, m)
            yield pa.RecordBatch.from_arrays(
                [ent, _list_array(s0), _list_array(s1w)],
                names=[entity_col, stat0_col, stat1_col],
            )

    return stats.select(entity_col, stat0_col, stat1_col).mapInArrow(
        kernel, schema=out_schema
    )


def _posteriors(
    s0: np.ndarray, s1w: np.ndarray, f_mat: np.ndarray, k: int, d: int
) -> tuple[np.ndarray, np.ndarray]:
    """Batched posterior mean/covariance of the latent factor.

    Returns (e_w (n,R), e_ww (n,R,R) = Λ⁻¹ + wwᵀ). Uses per-component
    Gram matrices G_k = T_kᵀT_k so Λ(e) = I + Σ_k N_k(e)·G_k is one
    einsum over the batch; all solves are batched numpy."""
    r = f_mat.shape[1]
    fk = f_mat.reshape(k, d, r)
    # batched GEMMs, not generic einsum loops: BLAS-dispatched forms are
    # ~4x faster at production shapes and numerically identical
    gram = np.matmul(fk.transpose(0, 2, 1), fk)  # (K, R, R)
    lam = np.eye(r) + (s0 @ gram.reshape(k, r * r)).reshape(-1, r, r)
    b_vec = s1w @ f_mat  # (n, R)
    cov = np.linalg.inv(lam)  # (n, R, R)
    e_w = np.matmul(cov, b_vec[:, :, None])[:, :, 0]
    e_ww = cov + e_w[:, :, None] * e_w[:, None, :]
    return e_w, e_ww


def _estep_partials(
    src: DataFrame,
    f_mat: np.ndarray,
    k: int,
    d: int,
    max_partial_bytes: int,
) -> tuple[DataFrame, int, int]:
    """One E-step pass → sliced-partial frame.

    Each task folds ALL its Arrow batches into one numpy accumulator
    (A triangle-packed per component, C, R, n) and emits it as flat
    ``(start, vals)`` slices of at most ``max_partial_bytes`` — no Arrow
    record or shuffle row ever scales with K·R². Returns
    (frame, total_size, slice_elems) for ``reduce_sliced_partials``.
    """
    import pyarrow as pa

    sc = src.sparkSession.sparkContext
    sv = k * d
    rank = f_mat.shape[1]
    tri = np.triu_indices(rank)
    n_tri = rank * (rank + 1) // 2
    total_size = k * n_tri + rank * sv + n_tri + 1
    slice_elems = max(int(max_partial_bytes) // 8, 1)
    b_f = sc.broadcast(f_mat)

    part_schema = T.StructType(
        [
            T.StructField("start", T.LongType()),
            T.StructField("vals", T.ArrayType(T.DoubleType())),
        ]
    )

    def estep(batches):
        f_cur = b_f.value
        a_acc = np.zeros((k, n_tri))
        c_acc = np.zeros((rank, sv))
        r_acc = np.zeros(n_tri)
        n_acc = 0.0
        seen = False
        for batch in batches:
            s0 = batch.column(0).flatten().to_numpy(zero_copy_only=False).reshape(-1, k)
            s1w = batch.column(1).flatten().to_numpy(zero_copy_only=False).reshape(-1, sv)
            e_w, e_ww = _posteriors(s0, s1w, f_cur, k, d)
            e_ww_tri = e_ww[:, tri[0], tri[1]]  # (n, n_tri)
            a_acc += s0.T @ e_ww_tri  # (K, n_tri)
            c_acc += e_w.T @ s1w  # (R, K·d)
            r_acc += e_ww_tri.sum(axis=0)  # (n_tri,)
            n_acc += float(s0.shape[0])
            seen = True
        if not seen:
            return
        flat = np.concatenate([a_acc.ravel(), c_acc.ravel(), r_acc, [n_acc]])
        for s in range(0, flat.size, slice_elems):
            sl = flat[s : s + slice_elems]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([s], type=pa.int64()),
                    _list_array(sl.reshape(1, -1)),
                ],
                names=["start", "vals"],
            )

    return src.mapInArrow(estep, schema=part_schema), total_size, slice_elems


def train_total_variability(
    stats: DataFrame,
    ubm: GMM,
    rank: int = 8,
    n_iter: int = 5,
    seed: int = 0,
    min_div: bool = True,
    entity_col: str = "conv_id",
    stat0_col: str = "stat0",
    stat1_col: str = "stat1",
    whitened: bool = False,
    max_partial_bytes: int = 64 << 20,
) -> TVModel:
    """Distributed TV EM over a StatServer DataFrame.

    One Spark job per iteration; each task contributes ONE
    triangle-packed partial, shipped as ``max_partial_bytes``-bounded
    slices and reduced in-cluster. The M-step is the reference's
    per-component solve (``mpiIV.py:222-228``) + optional
    minimum-divergence Cholesky rescale (``mpiIV.py:229-234``)."""
    sc = stats.sparkSession.sparkContext  # noqa: F841 — session liveness
    k, d = ubm.means.shape
    sv = k * d
    rng = np.random.default_rng(seed)
    f_mat = rng.standard_normal((sv, rank))

    if not whitened:
        stats = whiten_stats(stats, ubm, entity_col, stat0_col, stat1_col)
    src = stats.select(stat0_col, stat1_col)
    # whitening + E-step re-run per iteration; persisting the whitened
    # stats avoids recomputing the upstream lineage every pass.
    src = src.persist()

    tri = np.triu_indices(rank)
    n_tri = rank * (rank + 1) // 2

    model = TVModel(F_mat=f_mat, ubm=ubm)
    for _ in range(n_iter):
        frame, total_size, slice_elems = _estep_partials(
            src, model.F_mat, k, d, max_partial_bytes
        )
        flat = reduce_sliced_partials(frame, total_size, slice_elems)
        a_acc = flat[: k * n_tri].reshape(k, n_tri)
        c_acc = flat[k * n_tri : k * n_tri + rank * sv].reshape(rank, sv)
        n_total = flat[-1]
        r_acc = flat[k * n_tri + rank * sv : -1] / n_total

        new_f = np.empty_like(model.F_mat)
        a_full = np.zeros((rank, rank))
        for c in range(k):
            a_full[tri] = a_acc[c]
            a_full.T[tri] = a_acc[c]
            idx = slice(c * d, (c + 1) * d)
            new_f[idx, :] = np.linalg.solve(a_full, c_acc[:, idx]).T
        if min_div:
            r_full = np.zeros((rank, rank))
            r_full[tri] = r_acc
            r_full.T[tri] = r_acc
            ch = np.linalg.cholesky(r_full).T  # upper, matches scipy default
            new_f = new_f @ ch
        # trace of Σ E[wwᵀ]/n → monitors convergence toward identity
        model = TVModel(
            F_mat=new_f,
            ubm=ubm,
            llk_like_history=model.llk_like_history + [float(np.trace(_sym(r_acc, rank, tri)))],
        )

    src.unpersist()
    return model


def _sym(packed: np.ndarray, rank: int, tri) -> np.ndarray:
    m = np.zeros((rank, rank))
    m[tri] = packed
    m.T[tri] = packed
    return m


def extract_latent_factors(
    stats: DataFrame,
    tv: TVModel,
    entity_col: str = "conv_id",
    stat0_col: str = "stat0",
    stat1_col: str = "stat1",
    out_col: str = "latent",
    whitened: bool = False,
) -> DataFrame:
    """Per-entity latent factor (the reference's per-session i-vector
    solve, ``mpiIV.py:306-312``): w = Λ⁻¹ Tᵀ s̃₁. Arrow-batched, T in a
    broadcast; zero shuffle — each entity's stats row maps to one output
    row in place."""
    import pyarrow as pa

    sc = stats.sparkSession.sparkContext
    ubm = tv.ubm
    k, d = ubm.means.shape
    sv = k * d
    b = sc.broadcast((tv.F_mat, ubm.weights, ubm.means, ubm.variances, whitened))

    out_schema = T.StructType(
        [
            T.StructField(entity_col, stats.schema[entity_col].dataType),
            T.StructField(out_col, T.ArrayType(T.DoubleType())),
        ]
    )

    def kernel(batches):
        f_cur, w0, mu0, var0, pre_whitened = b.value
        m = GMM(w0, mu0, var0)
        r = f_cur.shape[1]
        fk = f_cur.reshape(k, d, r)
        gram = np.matmul(fk.transpose(0, 2, 1), fk)  # (K, R, R), BLAS
        for batch in batches:
            ent = batch.column(0)
            s0 = batch.column(1).flatten().to_numpy(zero_copy_only=False).reshape(-1, k)
            s1 = batch.column(2).flatten().to_numpy(zero_copy_only=False).reshape(-1, sv)
            # whitening is FUSED into this kernel (one Arrow boundary,
            # not two — the stats never re-serialize between steps)
            s1w = s1 if pre_whitened else _whiten_np(s0, s1, m)
            # extraction needs only the posterior MEAN — batched solve,
            # no explicit inverse (half the flops of the training path)
            lam = np.eye(r) + (s0 @ gram.reshape(k, r * r)).reshape(-1, r, r)
            e_w = np.linalg.solve(lam, s1w @ f_cur)
            yield pa.RecordBatch.from_arrays(
                [ent, _list_array(e_w)], names=[entity_col, out_col]
            )

    return stats.select(entity_col, stat0_col, stat1_col).mapInArrow(
        kernel, schema=out_schema
    )
