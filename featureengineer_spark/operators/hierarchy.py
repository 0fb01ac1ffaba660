"""Hierarchy flattening: resolve every node's root ancestor and depth.

Threaded conversations, reply chains, quote-trees, and folder-like
catalogs all arrive as (id, parent_id) pointer tables; training-data
prep needs them FLAT — every row tagged with its thread root and depth
so conversations can be grouped, rendered, and deduplicated at the
thread level. A recursive CTE (the single-node SQL answer) walks one
hop per iteration — O(depth) passes; at web scale reply chains reach
10⁴+ hops and that plan dies. This operator uses POINTER DOUBLING
(path doubling — the same O(log d) discipline as
``dedup.near_dup_clusters``): each round every unresolved node jumps to
its ancestor's ancestor and accumulates the hop count, so the distance
to the root halves each round — a 10⁶-deep chain resolves in ~20
rounds, each round one equi self-join + no window, all shuffle-bounded
by |nodes|.

Reference analog: the reference flattens its trial/segment key
hierarchies driver-side with dict walks (``IVector.py:1046-1069``);
here the walk is a distributed self-join loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_roots(
    df: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_id",
    max_iter: int = 30,
) -> DataFrame:
    """(id, root_id, depth) for every row of an (id, parent) pointer
    table.

    Rows with NULL ``parent_col`` are roots (root_id = id, depth = 0).
    A parent id that does not exist as a row is treated as an external
    root (root_id = that id). Cycles never resolve: after ``max_iter``
    doubling rounds (caps chains of length 2^max_iter) surviving rows
    are returned with NULL root_id/depth and a warning.

    Each round: unresolved nodes look up their current ancestor pointer
    in the previous round's mapping — resolved ancestors finish the
    node (depth adds), unresolved ancestors hand over their own pointer
    (distance doubles). ``localCheckpoint`` truncates the per-round
    lineage exactly as the connected-components loop does.
    """
    base = df.select(
        F.col(id_col).alias("id"), F.col(parent_col).alias("ptr")
    )
    id_type = dict(base.dtypes)["id"]
    resolved = base.filter(F.col("ptr").isNull()).select(
        "id",
        F.col("id").alias("root_id"),
        F.lit(0).cast("long").alias("depth"),
    )
    pending = base.filter(F.col("ptr").isNotNull()).select(
        "id", "ptr", F.lit(1).cast("long").alias("d")
    )
    # the lookup table carries BOTH populations: resolved rows expose
    # (root_id, depth), unresolved rows expose (ptr, d)
    resolved = resolved.persist()
    pending = pending.persist()
    converged = None  # decided in loop
    for _ in range(max_iter):
        n_pending = pending.limit(1).count()
        if n_pending == 0:
            converged = True
            break
        lut = (
            resolved.select(
                F.col("id").alias("__a"),
                F.col("root_id").alias("__aroot"),
                F.col("depth").alias("__adepth"),
                F.lit(None).cast(id_type).alias("__aptr"),
                F.lit(None).cast("long").alias("__ad"),
            )
            .unionByName(
                pending.select(
                    F.col("id").alias("__a"),
                    F.lit(None).cast(id_type).alias("__aroot"),
                    F.lit(None).cast("long").alias("__adepth"),
                    F.col("ptr").alias("__aptr"),
                    F.col("d").alias("__ad"),
                )
            )
        )
        stepped = pending.join(
            lut, pending.ptr == lut.__a, "left"
        ).localCheckpoint(eager=True)
        # ancestor missing entirely -> external root = the pointer
        newly = stepped.filter(
            F.col("__a").isNull() | F.col("__aroot").isNotNull()
        ).select(
            "id",
            F.coalesce(F.col("__aroot"), F.col("ptr")).alias("root_id"),
            (F.col("d") + F.coalesce(F.col("__adepth"), F.lit(0))).alias(
                "depth"
            ),
        )
        still = stepped.filter(
            F.col("__a").isNotNull() & F.col("__aroot").isNull()
        ).select(
            "id",
            F.col("__aptr").alias("ptr"),
            (F.col("d") + F.col("__ad")).alias("d"),
        )
        new_resolved = resolved.unionByName(newly).localCheckpoint(
            eager=True
        )
        new_pending = still.localCheckpoint(eager=True)
        resolved.unpersist()
        pending.unpersist()
        resolved, pending = new_resolved.persist(), new_pending.persist()
    else:
        converged = pending.limit(1).count() == 0

    if not converged:
        import warnings

        warnings.warn(
            f"resolve_roots: {pending.count()} nodes unresolved after "
            f"max_iter={max_iter} doubling rounds — cycle in the pointer "
            "table, or depth > 2^max_iter; unresolved rows carry NULL "
            "root_id",
            stacklevel=2,
        )
        out = resolved.unionByName(
            pending.select(
                "id",
                F.lit(None).cast(id_type).alias("root_id"),
                F.lit(None).cast("long").alias("depth"),
            )
        )
    else:
        out = resolved
    final = out.localCheckpoint(eager=True)
    resolved.unpersist()
    pending.unpersist()
    return final.select(
        F.col("id").alias(id_col),
        "root_id",
        "depth",
    )


def with_thread_root(
    df: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_id",
    max_iter: int = 30,
) -> DataFrame:
    """Attach (root_id, depth) to every row of ``df`` — the flattening
    join: resolve the pointer table, then one equi join back on the id.
    """
    roots = resolve_roots(
        df.select(id_col, parent_col), id_col, parent_col, max_iter
    )
    return df.join(roots, on=id_col, how="left")
