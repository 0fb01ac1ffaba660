"""Point-in-time correctness validators.

Graft of the reference's invariant assertions (``idmap.validate()``,
``statserver.validate()`` — ``PrepareData.py:917-952``, ``IVector.py:905``)
plus the start/stop temporal bound (``IVector.py:796-800``): validation
*queries*, not optimizer rules (SURVEY.md §4 custom #2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def leakage_violations(
    joined: DataFrame,
    anchor_ts_col: str = "anchor_ts",
    matched_ts_col: str = "matched_ts",
) -> DataFrame:
    """Rows of an as-of join output whose matched feature row is later
    than its anchor — must be empty (zero temporal leakage)."""
    return joined.filter(F.col(matched_ts_col) > F.col(anchor_ts_col))


def assert_no_leakage(joined: DataFrame, **kw) -> None:
    n = leakage_violations(joined, **kw).count()
    if n:
        raise AssertionError(f"temporal leakage: {n} feature rows read past their anchor")


def spine_violations(
    df: DataFrame,
    entity_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Transcript-spine invariants, one labelled row per violation:

    * duplicate (conv_id, turn_idx)
    * turn_idx not contiguous from 0
    * ts not non-decreasing in turn_idx order
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(entity_col).orderBy(idx_col)
    checked = df.select(
        entity_col,
        idx_col,
        ts_col,
        F.row_number().over(w).alias("__rn"),
        F.lag(ts_col).over(w).alias("__prev_ts"),
        F.count("*").over(Window.partitionBy(entity_col, idx_col)).alias("__dup"),
    )
    return checked.select(
        entity_col,
        idx_col,
        F.when(F.col("__dup") > 1, "duplicate_turn_idx")
        .when(F.col(idx_col) != F.col("__rn") - 1, "non_contiguous_turn_idx")
        .when(F.col("__prev_ts") > F.col(ts_col), "ts_regression")
        .alias("violation"),
    ).filter(F.col("violation").isNotNull())


def clustering_violations(
    df, entity_col: str = "conv_id"
):
    """Entities spanning more than one input file — violates the
    precondition of the shuffle-free (clustered=True) kernels. Run this
    once per new table layout; a file split mid-conversation would
    silently corrupt segmented carry state otherwise."""
    from pyspark.sql import functions as F

    # input_file_name() is non-deterministic for the analyzer; project it
    # into a column first, then aggregate
    return (
        df.select(F.col(entity_col), F.input_file_name().alias("__file"))
        .groupBy(entity_col)
        .agg(F.countDistinct("__file").alias("n_files"))
        .filter(F.col("n_files") > 1)
    )
