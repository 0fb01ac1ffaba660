"""Capture the sf0.01 trained PQ codebooks as JSON literals for the
DuckDB value oracle of the `pq_topk` query. Centroids are rounded to
12 decimals here AND in the query (bit-deterministic training per
`em.reduce_partials`, rounding absorbs sub-1e-12 environment drift).

Usage: python scripts/capture_pq.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from featureengineer_spark import get_spark  # noqa: E402
from featureengineer_spark.operators.pq import train_pq  # noqa: E402

# MUST match q_pq_topk in __spark_entry__.py
M = 4
K = 8
N_ITER = 5
SEED = 0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "pq_sf001.json",
        )
    )
    spark = get_spark(master="local[8]", app_name="capture-pq")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = train_pq(emb, vec_col="embedding", m=M, k=K, n_iter=N_ITER, seed=SEED)
    cent = np.round(model.centroids, 12)
    blob = {
        "m": M,
        "k": K,
        "dsub": int(model.dsub),
        "n_iter": N_ITER,
        "seed": SEED,
        "centroids": [
            [[float(v) for v in cent[j, c]] for c in range(K)]
            for j in range(M)
        ],
    }
    with open(out, "w") as fh:
        json.dump(blob, fh)
    print(f"wrote {out}: m={M} k={K} dsub={model.dsub}")
    spark.stop()


if __name__ == "__main__":
    main()
