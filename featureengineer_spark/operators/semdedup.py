"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication" — public).

Pipeline: k-means-assign each embedding to a cluster, then WITHIN each
cluster drop every vector that is ≥ τ cosine-similar to an
earlier-id vector. Pairwise work is confined to clusters — with k
chosen so clusters stay small (the paper uses ~100k clusters at
web scale), the O(Σ|cluster|²) comparisons are a vanishing fraction
of the O(n²) naive pair space, and each cluster's pairs co-locate in
one shuffle partition. Reference analog: the per-model grouping before
pairwise trial scoring (``IVector.py:1122-1135``) — group first, score
pairs only inside the group.

The cluster assignment here is the same coarse-quantizer rule as the
IVF kernel (argmin of ‖c‖² − 2·x·cᵀ, ties to the lowest cluster id,
``similarity.ann_topk_ivf``) but evaluated as pure JVM expressions from
literal centroids — zero Python on the hot path, and replayable
verbatim in DuckDB for the oracle. Pass trained centroids from
``similarity.train_kmeans`` for the real pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featureengineer_spark.operators.similarity import _dot, _norm


def assign_clusters(
    df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach ``cluster_id``: argmin_j ‖c_j‖² − 2·x·c_jᵀ (equivalent to
    nearest-centroid in L2 for fixed ‖x‖), ties to the lowest j.
    Centroids are a (k, d) array folded into literal expressions — the
    whole assignment is one codegen'd Project, no shuffle, no Python."""
    import numpy as np

    cents = np.asarray(centroids, dtype=float)
    cn2 = (cents * cents).sum(axis=1)
    n_lists = cents.shape[0]
    dists = [
        F.lit(float(cn2[j]))
        - 2.0
        * _dot(
            F.col(vec_col),
            F.array(*[F.lit(float(x)) for x in cents[j]]),
        )
        for j in range(n_lists)
    ]
    best_c = F.lit(n_lists - 1)
    best_d = dists[n_lists - 1]
    for j in range(n_lists - 2, -1, -1):
        # <= so the LOWEST cluster id wins exact ties (matches the
        # kernel's / oracle's ORDER BY dist ASC, c ASC)
        best_c = F.when(dists[j] <= best_d, F.lit(j)).otherwise(best_c)
        best_d = F.least(dists[j], best_d)
    return df.withColumn("cluster_id", best_c.cast("int"))


def semdedup(
    df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = 0.95,
) -> DataFrame:
    """Per-vector SemDeDup verdict: (id, cluster_id, max_cos_earlier,
    kept).

    A vector is dropped iff some EARLIER id in the same cluster is
    ≥ τ cosine-similar — the first-seen-wins discipline every dedup
    operator in this engine uses, and a rule with no transitive
    chaining, so it is one within-cluster self-join + aggregation
    (SQL-expressible, oracle-checkable). Zero-norm vectors have no
    cosine and are passed through kept with ``max_cos_earlier`` null.
    """
    work = assign_clusters(
        df.select(id_col, vec_col), centroids, id_col=id_col, vec_col=vec_col
    ).withColumn("__nrm", _norm(vec_col))
    a = work.select(
        F.col(id_col).alias("__ida"),
        F.col("cluster_id").alias("__ca"),
        F.col(vec_col).alias("__va"),
        F.col("__nrm").alias("__na"),
    ).filter(F.col("__na") > 0)
    b = work.select(
        F.col(id_col).alias("__idb"),
        F.col("cluster_id").alias("__cb"),
        F.col(vec_col).alias("__vb"),
        F.col("__nrm").alias("__nb"),
    ).filter(F.col("__nb") > 0)
    # later id (b) vs every earlier id (a) in the same cluster
    earlier = (
        b.join(a, (F.col("__cb") == F.col("__ca")) & (F.col("__ida") < F.col("__idb")))
        .select(
            F.col("__idb"),
            (_dot("__va", "__vb") / (F.col("__na") * F.col("__nb"))).alias("__cos"),
        )
        .groupBy("__idb")
        .agg(F.max("__cos").alias("max_cos_earlier"))
    )
    out = work.join(
        earlier, work[id_col] == earlier["__idb"], how="left"
    ).select(
        F.col(id_col),
        "cluster_id",
        F.col("max_cos_earlier"),
        F.coalesce(F.col("max_cos_earlier") < tau, F.lit(True)).alias("kept"),
    )
    return out


def semdedup_filter(
    df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = 0.95,
) -> DataFrame:
    """Rows surviving SemDeDup, original schema preserved."""
    verdict = semdedup(df, centroids, id_col=id_col, vec_col=vec_col, tau=tau)
    keep = verdict.filter(F.col("kept")).select(id_col)
    return df.join(keep, on=id_col, how="inner")
