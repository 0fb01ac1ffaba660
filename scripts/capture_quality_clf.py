"""Capture the sf0.01 trained hashed-ngram quality classifier as JSON
literals for the DuckDB value oracle of the `quality_clf_scores` query.

The training chain is bit-deterministic (pid-sorted partial folds, see
`classifier.train_quality_classifier`), so one capture stays valid for
the committed hyperparameters; weights are rounded to 12 decimals both
here and in the query itself so sub-1e-12 environment drift cannot
desync the literals.

Usage: python scripts/capture_quality_clf.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from featureengineer_spark import get_spark  # noqa: E402
from featureengineer_spark.operators.classifier import (  # noqa: E402
    train_quality_classifier,
)

# MUST match q_quality_clf_scores in __spark_entry__.py
N_BUCKETS = 512
N_ITER = 25
LR = 1.0
L2 = 1e-4
POS_SOURCES = ("src0", "src1", "src2", "src3")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "quality_clf_sf001.json",
        )
    )
    from pyspark.sql import functions as F

    spark = get_spark(master="local[8]", app_name="capture-quality-clf")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "__lab", F.col("source").isin(*POS_SOURCES).cast("int")
    )
    model = train_quality_classifier(
        docs, label_col="__lab", n_buckets=N_BUCKETS, n_iter=N_ITER,
        lr=LR, l2=L2,
    )
    blob = {
        "n_buckets": N_BUCKETS,
        "n_iter": N_ITER,
        "lr": LR,
        "l2": L2,
        "pos_sources": list(POS_SOURCES),
        "bias": round(float(model.bias), 12),
        "weights": [round(float(v), 12) for v in np.asarray(model.weights)],
        "final_loss": model.loss_history[-1],
    }
    with open(out, "w") as fh:
        json.dump(blob, fh)
    print(f"wrote {out}: bias={blob['bias']}, loss={blob['final_loss']:.6f}")
    spark.stop()


if __name__ == "__main__":
    main()
