"""Similarity search over embedding columns (``array<float>``).

The reference scores enroll×test i-vector pairs with cosine /
mahalanobis kernels over a trial mask (``IVector.py:1324-1390``,
``jyh/Utils.py:393-404`` pairwise euclidean). Here: top-k cosine
neighbors over an embedding corpus — brute force as the exactness
baseline, random-hyperplane LSH bucketing as the scale path (bounds the
pair space the way the reference's ndx trial mask bounds scoring pairs).

Dot products are pure JVM higher-order functions (``zip_with`` +
``aggregate``) — no Python in the pair loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _norm(vec_col: str) -> F.Column:
    return F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a: F.Column | str, b: F.Column | str) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force top-k cosine neighbors for each query vector.

    queries: (query_id, embedding). Self-matches (same id) are excluded.
    Tie-break: higher cosine first, then lower neighbor id — fully
    deterministic. The corpus side stays as-is; the (small) query side is
    broadcast, so the pair space is |Q|×|C| scanned in one pass, no
    shuffle until the per-query top-k aggregation.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _norm(vec_col).alias("__cn"),
    ).filter(F.col("__cn") > 0)
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qv"),
        _norm(vec_col).alias("__qn"),
    ).filter(F.col("__qn") > 0)
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col(query_id_col))
    scored = pairs.select(
        query_id_col,
        "neighbor_id",
        (_dot("__cv", "__qv") / (F.col("__cn") * F.col("__qn"))).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cosine")
    )


def hyperplane_signature(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    out_col: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane (SRP) LSH bucket id per vector.

    The hyperplane matrix is tiny and embedded as literal arrays —
    evaluated JVM-side per row (no Python, no broadcast needed). Two
    vectors share a bucket iff they agree on the sign of all ``n_planes``
    projections; collision probability rises with cosine similarity.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    acc = F.lit(0).cast("long")
    for i in range(n_planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in planes[i]])
        bit = F.when(_dot(vec_col, lit_plane) >= 0, F.lit(1).cast("long")).otherwise(0)
        acc = acc + bit * (2 ** i)
    return df.withColumn(out_col, acc)


def hyperplane_tables(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """OR-amplified SRP LSH: one (table_idx, bucket) row per vector per
    table, each table drawn from an independent hyperplane set.

    A single hash table has a recall cliff (a near neighbor missing one
    bit of one signature is lost); with T OR'd tables the miss
    probability decays as (1−pⁿ)ᵀ. Output is exploded long-form so the
    candidate join is a plain equi join on (table_idx, bucket)."""
    out = df
    for t in range(n_tables):
        out = hyperplane_signature(
            out, dim, n_planes, vec_col, seed + 1013 * t, out_col=f"__b{t}"
        )
    return out.select(
        *df.columns,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_idx"), F.col(f"__b{t}").alias("bucket")
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("__tb"),
    ).select(*df.columns, "__tb.table_idx", "__tb.bucket")


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates limited to vectors sharing any of the
    query's ``n_tables`` LSH buckets (OR amplification), then exact
    cosine ranking within the candidate set. At corpus scale the bucket
    join replaces the |Q|×|C| scan with ~|Q|×|C|·T/2^planes expected
    pairs; recall rises with ``n_tables``, candidate cost with
    ``n_planes`` lowered."""
    c = hyperplane_tables(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)),
        dim, n_planes, n_tables, vec_col, seed,
    ).withColumn("__cn", _norm(vec_col)).filter(F.col("__cn") > 0)
    q = hyperplane_tables(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv")),
        dim, n_planes, n_tables, "__qv", seed,
    ).withColumn("__qn", _norm("__qv")).filter(F.col("__qn") > 0)
    pairs = (
        c.join(F.broadcast(q), on=["table_idx", "bucket"])
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        # a pair colliding in several tables must score once
        .dropDuplicates(["neighbor_id", query_id_col])
    )
    scored = pairs.select(
        query_id_col,
        "neighbor_id",
        (_dot(vec_col, "__qv") / (F.col("__cn") * F.col("__qn"))).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cosine")
    )
