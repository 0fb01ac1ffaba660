"""Distributed GMM EM + sufficient statistics — the UBM graft.

The reference's core compute is EM over a diagonal-covariance GMM (UBM,
``IVector.py:1048-1053``; MPI variant ``mpiIV.py:346-533``: every rank
accumulates local sufficient statistics and ``Reduce(SUM)``s them to rank
0, which M-steps and broadcasts the new model). Spark-native form:

* E-step: ``mapInArrow`` over the vector column with the model in a
  broadcast variable; each Arrow batch emits ONE row of partials
  (Σγ_k, Σγ_k·x, Σγ_k·x², Σ log-lik) — the map-side-combined analog of
  ``comm.Reduce(op=MPI.SUM)``.
* M-step: driver-side numpy over the tiny combined partials; new model
  re-broadcast next iteration.
* per-entity sufficient statistics (the reference's StatServer
  ``stat0``/``stat1``, ``IVector.py:810-815``): responsibilities computed
  in the same Arrow kernel, aggregated per entity with plain hash aggs.

Log-likelihood is recorded per iteration — monotone non-decrease is the
reference's own convergence check (``IVector.py:571-586``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG2PI = float(np.log(2.0 * np.pi))


@dataclass
class GMM:
    weights: np.ndarray  # (k,)
    means: np.ndarray  # (k, d)
    variances: np.ndarray  # (k, d) diagonal
    llk_history: list[float] = field(default_factory=list)


def _log_gauss(x: np.ndarray, model: GMM) -> np.ndarray:
    """(n, k) log N(x | mu_k, diag sigma_k) + log w_k — vectorized."""
    k, d = model.means.shape
    inv = 1.0 / model.variances  # (k, d)
    const = (
        np.log(model.weights)
        - 0.5 * (d * _LOG2PI + np.log(model.variances).sum(axis=1))
        - 0.5 * np.einsum("kd,kd,kd->k", model.means, model.means, inv)
    )  # (k,)
    lin = x @ (model.means * inv).T  # (n, k)
    quad = -0.5 * (x * x) @ inv.T  # (n, k)
    return const + lin + quad


def _responsibilities(x: np.ndarray, model: GMM) -> tuple[np.ndarray, float]:
    lg = _log_gauss(x, model)
    mx = lg.max(axis=1, keepdims=True)
    p = np.exp(lg - mx)
    s = p.sum(axis=1, keepdims=True)
    llk = float((np.log(s) + mx).sum())
    return p / s, llk


def _stable_sum() -> F.Column:
    """Bit-deterministic per-position reduce: collect (source-partition-id,
    value) pairs, sort by pid, left-fold the sum. Float addition is not
    associative, so a plain ``F.sum`` depends on task COMPLETION order and
    the converged model drifts in the last bits across runs; folding in
    pid order makes the trained model a pure function of (input files,
    partitioning, seed) — which is what lets trained-model outputs be
    embedded as literals in DuckDB value oracles. Each task emits at most
    one partial per position, so the per-position list is ≤ #tasks long
    and the shuffle volume is unchanged (there was nothing for map-side
    combine to merge within a task anyway)."""
    pairs = F.array_sort(F.collect_list(F.struct(F.col("pid"), F.col("v"))))
    return F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x["v"])


def reduce_partials(df: DataFrame, sizes: dict[str, int | None]) -> dict[str, np.ndarray]:
    """Element-wise sum of per-batch partial columns, reduced IN-CLUSTER.

    ``sizes`` maps column name → array length (None for scalar doubles).
    All partials are concatenated into one array per row, posexploded, and
    hash-aggregated by position — Spark's partial+final aggregation gives
    map-side combine, so the shuffle carries O(#partitions × total_size)
    doubles and the driver receives exactly ``total_size`` rows regardless
    of input size. This is the ``comm.Reduce(op=MPI.SUM)`` analog
    (reference ``mpiIV.py:186-214``) without the O(#batches) driver
    gather that a plain ``collect()`` of partial rows would cost.
    """
    cols = []
    for name, sz in sizes.items():
        if sz is None:
            cols.append(F.array(F.col(name)))
        else:
            # a short/long partial array would silently shift every
            # posexplode position and corrupt ALL reduced statistics —
            # fail loudly in the executor instead
            cols.append(
                F.when(F.size(F.col(name)) == int(sz), F.col(name)).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                f"reduce_partials: partial '{name}' must have "
                                f"length {sz}, got "
                            ),
                            F.size(F.col(name)).cast("string"),
                        )
                    )
                )
            )
    exploded = df.select(
        F.spark_partition_id().alias("pid"),
        F.posexplode(F.concat(*cols)).alias("pos", "v"),
    )
    # Arrow-path gather: at the reference's production TV shape the
    # reduced statistics are ~10⁸ doubles — driver-side Row objects would
    # dominate; toPandas() moves one Arrow table instead.
    pdf = exploded.groupBy("pos").agg(_stable_sum().alias("s")).toPandas()
    if len(pdf) == 0:
        raise ValueError(
            "reduce_partials: no partial rows to reduce (empty input frame) — "
            "downstream statistics would be all-zero"
        )
    total = sum(1 if sz is None else sz for sz in sizes.values())
    flat = np.zeros(total)
    flat[pdf["pos"].to_numpy()] = pdf["s"].to_numpy()
    out: dict[str, np.ndarray] = {}
    off = 0
    for name, sz in sizes.items():
        width = 1 if sz is None else sz
        chunk = flat[off : off + width]
        out[name] = float(chunk[0]) if sz is None else chunk
        off += width
    return out


def reduce_sliced_partials(
    df: DataFrame,
    total_size: int,
    slice_elems: int,
    start_col: str = "start",
    vals_col: str = "vals",
) -> np.ndarray:
    """In-cluster reduce of a flat partial vector shipped as bounded
    slices.

    Rows carry ``(start, vals)`` where ``vals`` is the slice of a
    conceptual length-``total_size`` vector beginning at ``start`` —
    kernels emit slices of at most ``slice_elems`` doubles so no single
    Arrow row (or shuffle record) exceeds the caller's byte budget, the
    chunked analog of the reference's 4 GB MPI reduce loop
    (``mpiIV.py:184-201``). Positions are globalized (start + offset),
    hash-aggregated with map-side combine, and gathered as one Arrow
    table; the driver receives exactly ``total_size`` values.
    """
    expected = F.least(
        F.lit(int(slice_elems)), F.lit(int(total_size)) - F.col(start_col)
    )
    guarded = F.when(F.size(F.col(vals_col)) == expected, F.col(vals_col)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("reduce_sliced_partials: slice at start "),
                F.col(start_col).cast("string"),
                F.lit(" has length "),
                F.size(F.col(vals_col)).cast("string"),
                F.lit(", expected "),
                expected.cast("string"),
            )
        )
    )
    exploded = df.select(
        F.spark_partition_id().alias("pid"),
        F.col(start_col),
        F.posexplode(guarded).alias("p", "v"),
    ).select("pid", (F.col(start_col) + F.col("p")).alias("pos"), "v")
    pdf = exploded.groupBy("pos").agg(_stable_sum().alias("s")).toPandas()
    if len(pdf) == 0:
        raise ValueError(
            "reduce_sliced_partials: no partial slices to reduce (empty input)"
        )
    flat = np.zeros(int(total_size))
    flat[pdf["pos"].to_numpy()] = pdf["s"].to_numpy()
    return flat


def init_gmm(df: DataFrame, vec_col: str, n_components: int, seed: int = 0) -> GMM:
    """Deterministic init: global mean/var (one pass) + seeded jitter on
    the means — the reference initializes from global statistics too
    (``IVector.py:601-603``)."""
    from featureengineer_spark.operators.whitening import fit_whitener

    mean, _w = fit_whitener(df, vec_col=vec_col)
    d = len(mean)
    var = np.ones(d)
    rng = np.random.default_rng(seed)
    means = mean + rng.standard_normal((n_components, d)) * 0.1
    return GMM(
        weights=np.full(n_components, 1.0 / n_components),
        means=means,
        variances=np.tile(var, (n_components, 1)),
    )


def train_gmm(
    df: DataFrame,
    vec_col: str = "feature_vec",
    n_components: int = 4,
    n_iter: int = 5,
    seed: int = 0,
    min_var: float = 1e-6,
    model: GMM | None = None,
) -> GMM:
    """Distributed EM. One Spark job per iteration; ONE partial per task
    (accumulated across its Arrow batches in numpy — nothing row-shaped
    or per-batch leaves executors), reduced in-cluster."""
    import pyarrow as pa

    sc = df.sparkSession.sparkContext
    model = model or init_gmm(df, vec_col, n_components, seed)
    k, d = model.means.shape
    vecs = df.select(vec_col)

    part_schema = T.StructType(
        [
            T.StructField("nk", T.ArrayType(T.DoubleType())),
            T.StructField("sx", T.ArrayType(T.DoubleType())),
            T.StructField("sxx", T.ArrayType(T.DoubleType())),
            T.StructField("llk", T.DoubleType()),
            T.StructField("n", T.DoubleType()),
        ]
    )

    for _ in range(n_iter):
        b_model = sc.broadcast((model.weights, model.means, model.variances))

        def estep(batches):
            w, mu, var = b_model.value
            m = GMM(w, mu, var)
            nk = np.zeros(k)
            sx = np.zeros((k, d))
            sxx = np.zeros((k, d))
            llk = 0.0
            n_rows = 0.0
            seen = False
            for batch in batches:
                x = batch.column(0).flatten().to_numpy(zero_copy_only=False).reshape(-1, d)
                gamma, b_llk = _responsibilities(x, m)
                nk += gamma.sum(axis=0)  # (k,)
                sx += gamma.T @ x  # (k, d)
                sxx += gamma.T @ (x * x)  # (k, d)
                llk += b_llk
                n_rows += float(x.shape[0])
                seen = True
            if not seen:
                return
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([nk.tolist()], type=pa.list_(pa.float64())),
                    pa.array([sx.ravel().tolist()], type=pa.list_(pa.float64())),
                    pa.array([sxx.ravel().tolist()], type=pa.list_(pa.float64())),
                    pa.array([llk]),
                    pa.array([n_rows]),
                ],
                names=["nk", "sx", "sxx", "llk", "n"],
            )

        parts = reduce_partials(
            vecs.mapInArrow(estep, schema=part_schema),
            {"nk": k, "sx": k * d, "sxx": k * d, "llk": None, "n": None},
        )
        nk = parts["nk"]
        sx = parts["sx"].reshape(k, d)
        sxx = parts["sxx"].reshape(k, d)
        n = parts["n"]
        llk = parts["llk"] / n
        model.llk_history.append(llk)

        nk_safe = np.maximum(nk, 1e-12)
        means = sx / nk_safe[:, None]
        variances = np.maximum(sxx / nk_safe[:, None] - means * means, min_var)
        model = GMM(nk / n, means, variances, model.llk_history)
    return model


def split_gmm(model: GMM, eps: float = 0.1) -> GMM:
    """Binary mixture splitting: every component becomes two at
    μ ± ε·σ with half the weight and the same variance — the growth step
    of the reference's UBM schedule (``trainUBM`` 1→2→…→2ᵏ Gaussians,
    ``IVector.py:1048-1053``; standard sidekit/HTK ``EM_split``)."""
    k, d = model.means.shape
    sd = np.sqrt(model.variances)
    means = np.concatenate([model.means + eps * sd, model.means - eps * sd])
    variances = np.concatenate([model.variances, model.variances])
    weights = np.concatenate([model.weights, model.weights]) / 2.0
    return GMM(weights, means, variances, model.llk_history)


def train_gmm_split(
    df: DataFrame,
    vec_col: str = "feature_vec",
    n_components: int = 8,
    n_iter_per_stage: int = 3,
    min_var: float = 1e-6,
    eps: float = 0.1,
) -> GMM:
    """UBM training by EM with binary splitting (the reference's actual
    algorithm): fit the exact single-Gaussian global model (one
    distributed pass), then repeatedly split every component and run
    ``n_iter_per_stage`` EM iterations at each size until
    ``n_components`` (must be a power of two, like the reference's
    1→2048 schedule). Fully deterministic — no random init at all."""
    if n_components < 1 or (n_components & (n_components - 1)) != 0:
        raise ValueError(f"n_components must be a power of two, got {n_components}")
    d = len(df.select(vec_col).first()[0])
    row = df.agg(
        *[F.avg(F.col(vec_col)[i]).alias(f"m{i}") for i in range(d)],
        *[F.var_pop(F.col(vec_col)[i]).alias(f"v{i}") for i in range(d)],
    ).collect()[0]
    model = GMM(
        weights=np.array([1.0]),
        means=np.array([[row[f"m{i}"] for i in range(d)]]),
        variances=np.maximum(np.array([[row[f"v{i}"] for i in range(d)]]), min_var),
    )
    while model.means.shape[0] < n_components:
        model = split_gmm(model, eps)
        model = train_gmm(
            df, vec_col=vec_col, n_iter=n_iter_per_stage, min_var=min_var, model=model
        )
    return model


def sufficient_stats(
    df: DataFrame,
    model: GMM,
    entity_col: str = "conv_id",
    vec_col: str = "feature_vec",
) -> DataFrame:
    """Per-entity StatServer: ``stat0[k]`` = Σ responsibilities,
    ``stat1[k*d]`` = Σ responsibility-weighted features (the reference's
    per-segment sufficient statistics, ``IVector.py:810-815``).

    Responsibilities come from an Arrow kernel (broadcast model), and the
    kernel PRE-AGGREGATES per entity within each batch (dictionary-encode
    the entity column, stable-sort + ``np.add.reduceat``), so the Arrow
    boundary and the shuffle carry one (k + k·d)-double row per
    (entity, batch), never per input row — at the reference's production
    shape (k=2048, d=39) a per-row emission would be ~650 KB/row. The
    final per-entity reduction is a plain hash aggregation (partial+final,
    shuffle bounded by |entities|); on the bucketed layout each entity
    appears in one batch stream, so partials are already near-final.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    sc = df.sparkSession.sparkContext
    k, d = model.means.shape
    b_model = sc.broadcast((model.weights, model.means, model.variances))

    ent_type = df.schema[entity_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(entity_col, ent_type),
            T.StructField("stat0", T.ArrayType(T.DoubleType())),
            T.StructField("stat1", T.ArrayType(T.DoubleType())),
        ]
    )

    def kernel(batches):
        w, mu, var = b_model.value
        m = GMM(w, mu, var)
        for batch in batches:
            ent = batch.column(0)
            x = batch.column(1).flatten().to_numpy(zero_copy_only=False).reshape(-1, d)
            gamma, _ = _responsibilities(x, m)
            enc = pc.dictionary_encode(ent)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            uniq = enc.dictionary
            order = np.argsort(codes, kind="stable")
            starts = np.flatnonzero(
                np.diff(codes[order], prepend=codes[order[0]] - 1 if len(order) else 0)
            )
            s0 = np.add.reduceat(gamma[order], starts, axis=0)  # (g, k)
            gx = (gamma[:, :, None] * x[:, None, :]).reshape(len(x), k * d)
            s1 = np.add.reduceat(gx[order], starts, axis=0)  # (g, k·d)
            from featureengineer_spark.operators.tv import _list_array

            yield pa.RecordBatch.from_arrays(
                [uniq.take(pa.array(codes[order][starts])), _list_array(s0), _list_array(s1)],
                names=[entity_col, "stat0", "stat1"],
            )

    partial = df.select(entity_col, vec_col).mapInArrow(kernel, schema=out_schema)
    # final reduce: fold the (few) per-batch partial arrays of each entity
    # with element-wise zip_with sums — shuffle bounded by
    # |entities| × #batches-per-entity (1 on the bucketed layout)
    def _fold(col_name: str, width: int):
        return F.aggregate(
            F.collect_list(col_name),
            F.array_repeat(F.lit(0.0), width),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias(col_name)

    return partial.groupBy(entity_col).agg(_fold("stat0", k), _fold("stat1", k * d))
