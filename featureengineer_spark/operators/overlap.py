"""Corpus-level overlap estimation between document collections.

Before mixing crawl snapshots, vendor corpora, or dated dumps into one
training set, a pipeline needs to know how much they SHARE — pairwise
shingle-set Jaccard between whole corpora. Computing that exactly means
joining the corpora's shingle sets (fine occasionally, expensive to
repeat); the published estimator (Broder's MinHash, the same family the
per-document near-dup gate uses) compresses each corpus to a
``num_perm``-slot signature in ONE pass — per-group columnwise minima,
map-side combinable — after which any number of pairwise comparisons
cost O(num_perm) each, independent of corpus size. The estimate's
standard error is ~1/sqrt(num_perm) (~0.125 at 64 perms).

The reference engine's analog is its dataset-level audit discipline
(show/channel composition counts before model training,
``IVector.py:1046-1069``); here the audit statistic is set overlap.

Scale shape: the signature aggregation is ONE hash agg over the shingle
explode (identical cost to the per-doc MinHash pass); the pair join runs
over ≤ |groups| signature rows — at 100 TB the groups are snapshot
names, so the pairwise stage is driver-trivial no matter the corpus
size. The exact path exists for verification and small group counts:
its shingle-level equi self-join is bounded by the distinct-shingle
count, never |A|×|B|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featureengineer_spark.operators.dedup import (
    MINHASH_PRIME,
    _exploded_shingles,
    _seeded_hash,
    minhash_perm_coeffs,
)


def corpus_signatures(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    num_perm: int = 64,
    shingle: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(group, minhash array) — one MinHash signature per CORPUS
    (distinct values of ``group_col``), the columnwise minimum over
    every shingle any document of the group contains. The min over a
    group's shingle multiset equals the min over its shingle SET, so
    per-document duplicate shingles cost nothing. ``hash_fn='md5'`` is
    the DuckDB-replayable variant."""
    p_lit = F.lit(MINHASH_PRIME)
    base = _seeded_hash(seed, F.col("__sh"), hash_fn)
    ex = _exploded_shingles(df, group_col, text_col, shingle).select(
        group_col, F.pmod(base, p_lit).alias("__h")
    )
    a, b = minhash_perm_coeffs(num_perm, seed)
    mins = ex.groupBy(group_col).agg(
        *[
            F.min(
                F.pmod(F.lit(a[p]) * F.col("__h") + F.lit(b[p]), p_lit)
            ).alias(f"mh_{p}")
            for p in range(num_perm)
        ]
    )
    return mins.select(
        group_col,
        F.array(*[F.col(f"mh_{p}") for p in range(num_perm)]).alias(
            "minhash"
        ),
    )


def corpus_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    num_perm: int = 64,
    shingle: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    exact: bool = False,
) -> DataFrame:
    """Pairwise corpus overlap: (group_a, group_b, est_jaccard[,
    jaccard]) for every unordered group pair, ``group_a < group_b``.

    ``est_jaccard`` = fraction of agreeing signature slots (Broder's
    estimator). ``exact=True`` adds the true shingle-set Jaccard via a
    distinct-shingle equi self-join — use it for verification or small
    group counts; the estimate path is the one that scales (the pair
    stage reads only |groups| signature rows)."""
    sigs = corpus_signatures(
        df, group_col, text_col, num_perm, shingle, seed, hash_fn
    )
    a_side = sigs.select(
        F.col(group_col).alias("group_a"), F.col("minhash").alias("__ma")
    )
    b_side = sigs.select(
        F.col(group_col).alias("group_b"), F.col("minhash").alias("__mb")
    )
    pairs = a_side.join(
        b_side, F.col("group_a") < F.col("group_b"), "inner"
    )
    match = F.size(
        F.filter(
            F.zip_with("__ma", "__mb", lambda x, y: x == y), lambda m: m
        )
    )
    out = pairs.select(
        "group_a",
        "group_b",
        (match / F.lit(float(num_perm))).alias("est_jaccard"),
    )
    if not exact:
        return out

    sh = (
        _exploded_shingles(df, group_col, text_col, shingle)
        .select(F.col(group_col).alias("__g"), "__sh")
        .distinct()
    )
    sizes = sh.groupBy("__g").agg(F.count(F.lit(1)).alias("__n"))
    inter = (
        sh.alias("x")
        .join(
            sh.alias("y"),
            (F.col("x.__sh") == F.col("y.__sh"))
            & (F.col("x.__g") < F.col("y.__g")),
        )
        .groupBy(
            F.col("x.__g").alias("group_a"),
            F.col("y.__g").alias("group_b"),
        )
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    na = sizes.select(
        F.col("__g").alias("group_a"), F.col("__n").alias("__na")
    )
    nb = sizes.select(
        F.col("__g").alias("group_b"), F.col("__n").alias("__nb")
    )
    exact_j = (
        out.join(inter, ["group_a", "group_b"], "left")
        .join(F.broadcast(na), "group_a")
        .join(F.broadcast(nb), "group_b")
        .select(
            "group_a",
            "group_b",
            "est_jaccard",
            (
                F.coalesce(F.col("__i"), F.lit(0))
                / (
                    F.col("__na")
                    + F.col("__nb")
                    - F.coalesce(F.col("__i"), F.lit(0))
                )
            ).alias("jaccard"),
        )
    )
    return exact_j
