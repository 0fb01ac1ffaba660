"""Progress / row-count instrumentation (X13 graft).

The reference threads global progress counters through workers
(``globalVar.py:19-22``) and prints per-batch counts
(``DataInteger.py:119-122``). Spark-native: ``df.observe`` named metrics
collected by a listener at action time — zero-cost columns, no extra
pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_metrics(df: DataFrame, name: str = "stage") -> tuple[DataFrame, Observation]:
    """Attach row-count / null-count observation to a DataFrame.

    After the next action on the returned frame, ``obs.get`` yields
    ``{"n_rows": ..., "n_convs": ...}`` — recorded into the checkpoint
    manifest by the pipeline. Works on any frame with a conv_id column;
    extra metrics can be added at call sites.
    """
    obs = Observation(name)
    cols = [F.count(F.lit(1)).alias("n_rows")]
    if "conv_id" in df.columns:
        cols.append(F.approx_count_distinct("conv_id").alias("n_convs_approx"))
    return df.observe(obs, *cols), obs
