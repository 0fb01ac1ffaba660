"""Point-in-time correctness validators.

Graft of the reference's invariant assertions (``idmap.validate()``,
``statserver.validate()`` — ``PrepareData.py:917-952``, ``IVector.py:905``)
plus the start/stop temporal bound (``IVector.py:796-800``): validation
*queries*, not optimizer rules (SURVEY.md §4 custom #2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: schema-metadata key marking a column whose value at row t was computed
#: from rows LATER than t (e.g. a centered sliding window). Such columns
#: must never ride through a point-in-time join as feature values.
NON_CAUSAL_KEY = "featureengineer_spark.non_causal"


def non_causal_columns(df: DataFrame, cols=None) -> list[str]:
    """Columns of ``df`` (or of ``cols``) tagged non-causal via schema
    metadata — produced by centered/two-sided window operators
    (``with_sliding_norm(center=True)``). Metadata rides the schema, so
    the tag survives select/filter/join as long as the column itself is
    carried through unchanged."""
    wanted = set(cols) if cols is not None else None
    return [
        f.name
        for f in df.schema.fields
        if (wanted is None or f.name in wanted) and f.metadata.get(NON_CAUSAL_KEY)
    ]


def assert_causal(df: DataFrame, cols, context: str = "as-of join") -> None:
    """Refuse non-causal feature columns at PIT boundaries — the
    start/stop temporal discipline of the reference (``IVector.py:796-800``)
    lifted to column provenance: a centered-window feature at row t has
    already read rows after t, so attaching it as-of an anchor leaks the
    future even though matched_ts <= anchor_ts."""
    bad = non_causal_columns(df, cols)
    if bad:
        raise ValueError(
            f"{context}: value_cols {bad} are tagged non-causal "
            f"(schema metadata '{NON_CAUSAL_KEY}') — they were computed with a "
            "centered/two-sided window and would leak future rows through the "
            "point-in-time boundary. Recompute them with a trailing window "
            "(e.g. with_sliding_norm(center=False)) or pass "
            "allow_non_causal=True for an offline parity run."
        )


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
    silently corrupt segmented carry state otherwise.

    NOTE: file granularity is necessary but NOT sufficient — Spark also
    splits single files larger than ``spark.sql.files.maxPartitionBytes``
    into multiple scan partitions, and a conversation crossing such a
    split boundary keeps ONE file name but lands in TWO tasks, which this
    check cannot see. Use :func:`partition_clustering_violations` for the
    check at the granularity the kernels actually run at."""
    from pyspark.sql import functions as F

    # input_file_name() is non-deterministic for the analyzer; project it
    # into a column first, then aggregate
    return (
        df.select(F.col(entity_col), F.input_file_name().alias("__file"))
        .groupBy(entity_col)
        .agg(F.countDistinct("__file").alias("n_files"))
        .filter(F.col("n_files") > 1)
    )


def partition_clustering_violations(df, entity_col: str = "conv_id"):
    """Entities spanning more than one SCAN PARTITION — the exact
    precondition of the shuffle-free (clustered=True) kernels, at the
    granularity they execute at. Catches what the file-level check
    misses: a bucket file larger than ``maxPartitionBytes`` is split
    into several tasks (same ``input_file_name``, different partitions),
    silently breaking a conversation's carry chain mid-file. The probe
    evaluates ``spark_partition_id()`` on the same leaf scan the kernel
    would consume (same split rules), one count-distinct aggregation."""
    from pyspark.sql import functions as F

    return (
        df.select(F.col(entity_col), F.spark_partition_id().alias("__pid"))
        .groupBy(entity_col)
        .agg(F.countDistinct("__pid").alias("n_partitions"))
        .filter(F.col("n_partitions") > 1)
    )


def assert_clustered(df, entity_col: str = "conv_id") -> None:
    """Raise if any entity spans multiple scan partitions — pre-flight
    gate for ``featurize_fast(clustered=True)`` on a new table layout."""
    n = partition_clustering_violations(df, entity_col).limit(1).count()
    if n:
        raise AssertionError(
            f"clustered-kernel precondition violated: at least one {entity_col} "
            "spans multiple scan partitions (file split mid-entity — raise "
            "spark.sql.files.maxPartitionBytes above the largest bucket file, "
            "or use clustered=False)"
        )
