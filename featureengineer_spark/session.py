"""SparkSession factory with scale-appropriate defaults.

The reference pipeline hand-tunes its physical execution (thread pools,
MPI chunking, batch sizes — ``mpiIV.py:184-214``, ``IVector.py:194-195``).
Here all of that is Spark configuration: AQE for runtime re-planning and
skew splitting, Arrow for vectorized Python boundaries, UTC session time
zone so timestamp semantics are identical between Spark, pandas oracles,
and DuckDB.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

_PROBE_TOKEN_ATTR = "_featureengineer_probe_token"
_probe_token_counter = 0


def probe_token(session: SparkSession) -> int:
    """Stable per-session cache token for the driver-side probe memos
    (``similarity._SMALL_PROBE_CACHE``, ``skew._HEAVY_PROBE_CACHE``).

    ``id(session)`` is NOT stable: after a session object is
    garbage-collected CPython can reuse the id for a new session, which
    would return a stale probe verdict for different data. A monotonic
    token stored ON the session object dies with it and is never
    reused; a fresh session (or a fresh Python wrapper of the same JVM
    session — conservative: one extra probe job) gets a fresh token."""
    global _probe_token_counter
    tok = getattr(session, _PROBE_TOKEN_ATTR, None)
    if tok is None:
        _probe_token_counter += 1
        tok = _probe_token_counter
        setattr(session, _PROBE_TOKEN_ATTR, tok)
    return tok


def _package_zip() -> str:
    """Zip this package so executors can import it — the programmatic
    equivalent of ``spark-submit --py-files`` (north-rule deployment
    mode). Grouped-map UDFs pickle by module reference; without this,
    Python workers launched outside the repo cwd fail to unpickle."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    out = os.path.join(tempfile.gettempdir(), "featureengineer_spark_pkg.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_STORED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    return out


def get_spark(
    master: str | None = None,
    app_name: str = "featureengineer-spark",
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the feature engine.

    On a real cluster this is invoked via ``spark-submit --py-files`` and
    ``master`` is left to the submitter; locally tests pass
    ``local[8]``/``local[32]`` to evidence scaling efficiency.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = {
        # Runtime re-planning: coalesce small shuffle partitions, split
        # skewed ones. At 100 TB this is what keeps reducers balanced.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # Arrow-vectorized pandas UDF boundary (input_hint requirement:
        # zero per-row Python). maxRecordsPerBatch bounds executor memory
        # per batch — graft of the reference's batch_size=300 discipline
        # (IVector.py:194-195).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "32768",
        # Deterministic timestamp semantics across Spark/pandas/DuckDB.
        "spark.sql.session.timeZone": "UTC",
        # Small dims broadcast automatically; explicit broadcast() hints
        # are still used at call sites for clarity.
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    try:
        spark.sparkContext.addPyFile(_package_zip())
    except Exception:
        pass  # e.g. Connect-only sessions; spark-submit --py-files covers it
    return spark
