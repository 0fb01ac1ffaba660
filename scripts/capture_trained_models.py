"""Capture the bit-deterministic trained models at sf0.01 as literals.

The round-4 determinism contract (``__spark_entry__._deterministic_emb`` +
``em._stable_sum``'s pid-sorted partial fold) makes the trained UBM and TV
matrix a pure function of (input parquet file, seed) — independent of the
session's core count, shuffle partitions, or AQE settings (verified by
``tests/test_em.py::test_trained_model_bit_deterministic_across_configs``).
This script runs the same training the gate queries ``gmm_suff_stats`` /
``latent_factors`` run and dumps the converged parameters with full float
repr to ``trained_models_sf001.json`` (next to ``__spark_entry__.py``),
where the DuckDB oracle builders embed them as literal coefficients.

Re-run whenever the training chain or the sf0.01 embeddings table changes:

    python scripts/capture_trained_models.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

from featureengineer_spark import get_spark  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]", app_name="capture-trained-models")
    import __spark_entry__ as entry
    from featureengineer_spark.operators.em import sufficient_stats, train_gmm
    from featureengineer_spark.operators.tv import train_total_variability

    emb = entry._deterministic_emb(spark, sf)
    ubm = train_gmm(emb, n_components=3, n_iter=2, seed=3)
    stats = (
        sufficient_stats(emb, ubm)
        .repartition(2, "conv_id")
        .sortWithinPartitions("conv_id")
    )
    tv = train_total_variability(stats, ubm, rank=4, n_iter=2, seed=7)
    import numpy as np

    def _f(arr):
        return [repr(float(v)) for v in np.asarray(arr).ravel()]

    # LDA+WCCN: capture the EFFECTIVE projection E = proj @ L (64×8) —
    # final vector = Eᵀ(x − μ); the oracle replays projection + cosine
    _emb, lda_mu, lda_proj, wccn_l = entry._trained_lda_wccn(spark, sf)
    eff = np.asarray(lda_proj) @ np.asarray(wccn_l)

    # PLDA on raw embeddings
    plda = entry._trained_plda(spark, sf)

    # sphnorm chain + PLDA on the normalized embeddings
    _normed, sph_params, plda_sph = entry._trained_sphnorm_plda(spark, sf)

    ivf_cents = entry._trained_ivf_centroids(spark, sf)

    out = {
        "sf_dir": sf,
        "ivf_centroids": _f(ivf_cents),
        "lda_wccn": {
            "mu": _f(lda_mu),
            "eff": _f(eff),  # (d, r) row-major
            "r": int(eff.shape[1]),
        },
        "plda": {
            "mean": _f(plda.mean),
            "v_mat": _f(plda.v_mat),
            "sigma": _f(plda.sigma),
            "rank": int(plda.v_mat.shape[1]),
        },
        "sphnorm": {
            "params": [[_f(m), _f(w)] for m, w in sph_params],
        },
        "plda_sph": {
            "mean": _f(plda_sph.mean),
            "v_mat": _f(plda_sph.v_mat),
            "sigma": _f(plda_sph.sigma),
            "rank": int(plda_sph.v_mat.shape[1]),
        },
        "gmm": {
            "weights": [repr(float(v)) for v in ubm.weights],
            "means": [repr(float(v)) for v in ubm.means.ravel()],
            "variances": [repr(float(v)) for v in ubm.variances.ravel()],
            "k": int(ubm.means.shape[0]),
            "d": int(ubm.means.shape[1]),
        },
        "tv": {
            "f_mat": [repr(float(v)) for v in tv.F_mat.ravel()],
            "rank": int(tv.F_mat.shape[1]),
        },
    }
    path = os.path.join(os.path.dirname(entry.__file__), "trained_models_sf001.json")
    with open(path, "w") as fh:
        json.dump(out, fh)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
