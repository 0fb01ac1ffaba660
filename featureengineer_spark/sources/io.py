"""Sources & sinks (SURVEY.md §2.1).

=====================  ============================================  =====================
engine function        reference concept                             reference evidence
=====================  ============================================  =====================
read_csv_spine         regex-delimited CSV key scans                 PrepareData.py:157 etc.
write_transcripts_...  HDF5 group-per-segment store                  FeaGet.py:259-284
read_transcripts       HDF5 keyed read + dataset pruning             IVector.py:346-355
compact_small_files    10k-file HDF5 consolidation                   DataInteger.py:150-165
=====================  ============================================  =====================

The transcript store uses the Iceberg physical layout — ``days(ts)`` ×
``bucket(N, conv_id)`` partitioning — emulated as plain parquet directory
partitions (no Iceberg runtime jar is available offline; swapping
``write.partitionBy`` for ``writeTo(...).partitionedBy(days(ts),
bucket(N, conv_id))`` is a one-line change when it is). Partition pruning
on both dimensions is exercised by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_transcripts_partitioned(
    df: DataFrame,
    path: str,
    conv_buckets: int = 16,
    mode: str = "overwrite",
    file_format: str = "parquet",
) -> None:
    """Write the transcript table in Iceberg layout: day × conv-bucket.

    ``ts_day`` gives temporal partition pruning for ts-range scans;
    ``conv_bucket = pmod(xxhash64(conv_id), N)`` co-locates each
    conversation so per-conversation stages can prune to one bucket and
    as-of joins can use storage-partitioned joins on a real Iceberg
    catalog. ``file_format`` may be ``parquet`` (default) or ``orc`` —
    both columnar formats Iceberg supports; the layout, pruning, and
    downstream plans are format-agnostic."""
    out = df.withColumn("ts_day", F.date_trunc("day", F.col("ts")).cast("date")).withColumn(
        "conv_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(conv_buckets)).cast("int")
    )
    out.write.mode(mode).partitionBy("ts_day", "conv_bucket").format(file_format).save(path)


def read_transcripts(
    spark: SparkSession, path: str, file_format: str = "parquet"
) -> DataFrame:
    """Scan the partitioned transcript store, dropping the physical
    partition columns (they are derivable)."""
    return spark.read.format(file_format).load(path).drop("ts_day", "conv_bucket")


def _pinned_split_session(spark: SparkSession, cap: str) -> SparkSession:
    """Child session with ``spark.sql.files.maxPartitionBytes`` AND
    ``openCostInBytes`` pinned to ``cap`` (cap bounds the split size,
    the open-cost floor stops small files being coalesced-split at the
    4 MB default: maxSplitBytes = min(cap, max(floor, bytesPerCore))).

    File-split planning reads these keys from the SESSION conf at
    execution time — per-read reader options are ignored — so pinning
    them on a child session is the only way to guarantee whole-file
    splits without mutating the caller's session. ``cloneSession``
    keeps the caller's runtime conf overrides (``newSession`` would
    silently reset e.g. a runtime ``shuffle.partitions`` override back
    to the builder value — verified empirically)."""
    try:
        child = SparkSession(spark.sparkContext, spark._jsparkSession.cloneSession())
    except Exception:  # pragma: no cover - Connect / future API drift
        child = spark.newSession()
    child.conf.set("spark.sql.files.maxPartitionBytes", cap)
    child.conf.set("spark.sql.files.openCostInBytes", cap)
    return child


def read_clustered(
    spark: SparkSession,
    path: str,
    file_format: str = "parquet",
    validate: bool = False,
    entity_col: str = "conv_id",
    slack: float = 1.25,
) -> DataFrame:
    """Read a conv-bucketed store with WHOLE-FILE splits guaranteed — the
    safe input for the shuffle-free ``clustered=True`` kernels.

    Spark splits a single file larger than the effective split size into
    several scan partitions (maxSplitBytes = min(maxPartitionBytes,
    max(openCostInBytes, bytesPerCore))), which breaks a conversation's
    carry chain MID-FILE while keeping one ``input_file_name`` — the
    failure mode ``validation.partition_clustering_violations`` detects.
    This reader lists the store, sizes the split cap to the largest data
    file (×``slack``), and executes the scan under a DEDICATED child
    session whose ``spark.sql.files.maxPartitionBytes`` /
    ``openCostInBytes`` confs are pinned to that cap, so every file is
    one split regardless of the caller session's config or total size.
    The child session is required for correctness, not hygiene:
    per-read ``DataFrameReader.option(...)`` forms of these two keys are
    silently IGNORED by Spark's file-split planning (splitting consults
    only the session confs ``spark.sql.files.*``, at execution time —
    verified empirically on Spark 4.1: the session conf moves a 13 MB
    file's scan between 1 and 200+ partitions while the per-read option
    changes nothing). The child is a ``cloneSession`` (shares the
    SparkContext; inherits the caller's runtime conf overrides, e.g.
    ``shuffle.partitions``, then pins the two file confs), falling back
    to ``newSession`` + a conf copy where the clone API is unavailable.
    With ``validate=True`` it additionally runs ``assert_clustered``
    (one count-distinct aggregation) before returning — use once per
    new layout. At 100 TB this is the moment to check the bucket-file
    sizes are sane (a 10 GB bucket file = a 10 GB task; rebucket
    instead of raising the split cap without thought)."""
    import os

    largest = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                largest = max(largest, os.path.getsize(os.path.join(root, f)))
    session = spark
    if largest:
        cap = str(int(largest * slack))
        session = _pinned_split_session(spark, cap)
    df = session.read.format(file_format).load(path)
    if validate:
        from featureengineer_spark.validation import assert_clustered

        assert_clustered(df, entity_col)
    return df


def compact_small_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_files: int,
    file_format: str = "parquet",
) -> int:
    """Small-file compaction: many small files → ``target_files`` larger
    ones (the reference consolidates 10,000 HDF5 files per output,
    ``DataInteger.py:150-165``; Iceberg's ``rewrite_data_files`` is the
    managed equivalent). Returns rows written."""
    df = spark.read.format(file_format).load(in_path)
    df.repartition(target_files).write.mode("overwrite").format(file_format).save(out_path)
    return spark.read.format(file_format).load(out_path).count()


def read_csv_spine(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    sep: str = ",",
    header: bool = False,
) -> DataFrame:
    """CSV key-table scan with DECLARED schema (never inferred in
    production paths) — the reference's ``pd.read_csv(..., delimiter=
    ',|\\s*', header=None)`` sites with regex delimiters are handled by
    reading lines and splitting when ``sep`` is a regex."""
    if len(sep) == 1:
        return spark.read.csv(path, schema=schema, sep=sep, header=header)
    # regex delimiter: read raw lines, split, project into the schema
    raw = spark.read.text(path)
    if header:
        # skip the header PER FILE (a glob input has one header per file;
        # a single global first-row filter would cast the other files'
        # header lines into null-filled data rows)
        from pyspark.sql.window import Window

        w = Window.partitionBy(F.input_file_name()).orderBy(
            F.monotonically_increasing_id()
        )
        raw = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") > 1)
            .drop("__rn")
        )
    parts = F.split(F.col("value"), sep)
    struct = schema if isinstance(schema, T.StructType) else T.StructType.fromDDL(schema)
    cols = [
        F.element_at(parts, i + 1).cast(f.dataType).alias(f.name)
        for i, f in enumerate(struct.fields)
    ]
    return raw.select(*cols)


def read_binary_dir(spark: SparkSession, path: str, pattern: str = "*") -> DataFrame:
    """Opaque-file scan (S2/S3 graft — the reference's HTK/audio readers,
    ``jyh/Utils.py:46-168``): ``binaryFile`` source yields (path,
    modificationTime, length, content binary); decode happens in the
    multimodal Arrow kernels."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
    )


def decode_fixed_width_frames(content: bytes) -> tuple[dict, "np.ndarray"]:
    """Decode one fixed-width binary feature file (the HTK parameter-file
    layout the reference reads, ``jyh/Utils.py:46-168``; format per the
    public HTK book): a 12-byte big-endian header
    ``(n_samples int32, samp_period int32, samp_size int16, parm_kind
    int16)`` followed by ``n_samples × (samp_size/4)`` float32 frames.

    Returns (header dict, (n, dim) float64 matrix). Pure numpy
    ``frombuffer`` — no per-value Python."""
    import struct as _struct

    import numpy as np

    if len(content) < 12:
        raise ValueError(f"truncated header: {len(content)} bytes")
    n_samples, samp_period, samp_size, parm_kind = _struct.unpack(
        ">iihh", content[:12]
    )
    dim = samp_size // 4
    need = 12 + n_samples * samp_size
    if len(content) < need:
        raise ValueError(f"truncated payload: {len(content)} < {need} bytes")
    mat = (
        np.frombuffer(content, dtype=">f4", count=n_samples * dim, offset=12)
        .astype(np.float64)
        .reshape(n_samples, dim)
    )
    header = {
        "n_samples": n_samples,
        "samp_period": samp_period,
        "samp_size": samp_size,
        "parm_kind": parm_kind,
    }
    return header, mat


def read_fixed_width_frames(
    spark: SparkSession, path: str, pattern: str = "*"
) -> DataFrame:
    """binaryFile scan + per-file fixed-width decode → long-form frame
    table ``(path, frame_idx, frame array<double>)`` — the S2 source made
    concrete: one Arrow batch of files in, frames out, zero per-row
    Python (numpy ``frombuffer`` per file)."""
    import pandas as pd

    files = read_binary_dir(spark, path, pattern)
    out_schema = T.StructType(
        [
            T.StructField("path", T.StringType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def fn(batches):
        for pdf in batches:
            paths, idxs, frames = [], [], []
            for p, buf in zip(pdf["path"], pdf["content"]):
                _, mat = decode_fixed_width_frames(bytes(buf))
                paths.extend([p] * len(mat))
                idxs.extend(range(len(mat)))
                frames.extend(list(mat))
            yield pd.DataFrame({"path": paths, "frame_idx": idxs, "frame": frames})

    return files.select("path", "content").mapInPandas(fn, schema=out_schema)
