"""Sources/sinks: partitioned layout, partition pruning, compaction, CSV."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from featureengineer_spark.sources import (
    compact_small_files,
    read_csv_spine,
    read_transcripts,
    write_transcripts_partitioned,
)

KEY = ["conv_id", "ts", "turn_idx"]


def test_partitioned_roundtrip_and_pruning(spark, transcripts, transcripts_pdf, tmp_path):
    path = str(tmp_path / "store")
    write_transcripts_partitioned(transcripts, path, conv_buckets=8)

    back = read_transcripts(spark, path)
    a = back.toPandas().sort_values(KEY, kind="mergesort").reset_index(drop=True)
    b = transcripts_pdf.sort_values(KEY, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False
    )

    # day filter must prune at the partition level, not post-scan
    pruned = spark.read.parquet(path).filter(F.col("ts_day") == "2024-01-01")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ts_day" in plan
    # and a conv-bucket point lookup prunes to 1/8 of the buckets
    one = spark.read.parquet(path).filter(F.col("conv_bucket") == 3)
    n_files = one.select(F.input_file_name()).distinct().count()
    all_files = spark.read.parquet(path).select(F.input_file_name()).distinct().count()
    assert n_files < all_files


def test_compaction(spark, transcripts, tmp_path):
    small = str(tmp_path / "small")
    transcripts.repartition(40).write.parquet(small)
    big = str(tmp_path / "big")
    n = compact_small_files(spark, small, big, target_files=4)
    assert n == transcripts.count()
    import glob

    assert len(glob.glob(big + "/*.parquet")) == 4


def test_csv_spine_regex_delimiter(spark, tmp_path):
    p = tmp_path / "keys.csv"
    p.write_text("spk1,seg1  10 20\nspk2,seg2  30 40\n")
    df = read_csv_spine(
        spark,
        str(p),
        schema="speaker string, segment string, start long, stop long",
        sep=r",|\s+",
    )
    rows = {tuple(r) for r in df.collect()}
    assert rows == {("spk1", "seg1", 10, 20), ("spk2", "seg2", 30, 40)}


def test_regex_csv_header_skipped_per_file(spark, tmp_path):
    """A glob input has one header line PER FILE; every one must be
    skipped (a single global first-row filter leaves the other files'
    headers as null-cast data rows)."""
    for i in range(3):
        (tmp_path / f"part{i}.csv").write_text(
            "id | name\n" + f"{i}1 | alpha{i}\n" + f"{i}2 | beta{i}\n"
        )
    df = read_csv_spine(
        spark,
        str(tmp_path / "*.csv"),
        "id int, name string",
        sep=r"\s*\|\s*",
        header=True,
    )
    rows = df.collect()
    assert len(rows) == 6
    assert all(r["id"] is not None for r in rows)
    assert sorted(r["id"] for r in rows) == [1, 2, 11, 12, 21, 22]


def test_fixed_width_binary_roundtrip(spark, tmp_path):
    """Synthesize fixed-width (HTK-layout) binary files, decode through
    the binaryFile source, and match the original matrices exactly."""
    import struct

    import numpy as np

    from featureengineer_spark.sources.io import read_fixed_width_frames

    rng = np.random.default_rng(4)
    expected = {}
    for i in range(3):
        n, dim = int(rng.integers(5, 40)), 13
        mat = rng.standard_normal((n, dim)).astype(">f4")
        header = struct.pack(">iihh", n, 100000, dim * 4, 6)
        p = tmp_path / f"f{i}.htk"
        p.write_bytes(header + mat.tobytes())
        expected[str(p)] = mat.astype(np.float64)

    out = read_fixed_width_frames(spark, str(tmp_path), "*.htk").toPandas()
    assert len(out) == sum(m.shape[0] for m in expected.values())
    for path, mat in expected.items():
        sub = out[out["path"].str.endswith(path.split("/")[-1])].sort_values("frame_idx")
        got = np.vstack(sub["frame"].to_numpy())
        np.testing.assert_allclose(got, mat, rtol=1e-7)


def test_orc_store_roundtrip_and_pruning(spark, transcripts, transcripts_pdf, tmp_path):
    """The Iceberg-layout store is format-agnostic: the ORC path must
    roundtrip identically and prune partitions just like parquet."""
    path = str(tmp_path / "store_orc")
    write_transcripts_partitioned(transcripts, path, conv_buckets=8, file_format="orc")

    back = read_transcripts(spark, path, file_format="orc")
    a = back.toPandas().sort_values(KEY, kind="mergesort").reset_index(drop=True)
    b = transcripts_pdf.sort_values(KEY, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False
    )

    pruned = spark.read.orc(path).filter(F.col("ts_day") == "2024-01-01")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ts_day" in plan

    # compaction works over ORC too
    big = str(tmp_path / "orc_compact")
    n = compact_small_files(spark, path, big, target_files=3, file_format="orc")
    assert n == transcripts.count()


def test_read_clustered_whole_file_splits(spark, tmp_path):
    """The REAL whole-file-split contract, pinned un-vacuously: under a
    session whose effective split size is smaller than the bucket files,
    the plain read MUST split files mid-conversation (asserted
    unconditionally — this is what makes the test meaningful), and
    read_clustered of the same store must still yield exactly one scan
    partition per file with zero clustering violations. Per-read
    DataFrameReader options cannot achieve this (Spark's file-split
    planning consults only the session confs spark.sql.files.*), which
    is why read_clustered executes under a conf-pinned child session."""
    from pyspark.sql import functions as F

    from featureengineer_spark.sources.io import read_clustered
    from featureengineer_spark.validation import partition_clustering_violations

    path = str(tmp_path / "clustered_store")
    (
        spark.range(200_000)
        .select(
            (F.col("id") % 4).cast("string").alias("conv_id"),
            (F.col("id") / 4).cast("int").alias("turn_idx"),
            F.sha2(F.col("id").cast("string"), 256).alias("text"),
        )
        .repartition(4, "conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.option("parquet.block.size", 64 * 1024)  # many row groups
        .mode("overwrite")
        .parquet(path)
    )
    # force the caller session's effective split size below the ~5 MB
    # files so a plain read is GUARANTEED to split them mid-conversation
    prev_max = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prev_open = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))
    try:
        plain = spark.read.parquet(path)
        assert plain.rdd.getNumPartitions() > 4  # files actually split…
        assert partition_clustering_violations(plain).count() > 0  # …mid-conv
        # read_clustered under the SAME hostile session: one partition per
        # file (openCost=cap stops multi-file packing, cap stops splitting)
        clustered = read_clustered(spark, path, validate=True)
        assert clustered.rdd.getNumPartitions() == 4
        assert partition_clustering_violations(clustered).count() == 0
        # caller session conf is untouched by the pinned child session
        assert spark.conf.get("spark.sql.files.maxPartitionBytes") == str(1024 * 1024)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_max)
        spark.conf.set("spark.sql.files.openCostInBytes", prev_open)
