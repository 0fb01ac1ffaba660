"""Hashed-ngram logistic quality classifier — the fastText-style
discriminative web filter of the published GPT-3 / LLaMA / RedPajama
pipelines: train a linear classifier to distinguish a trusted corpus
(positive class) from raw web text, then keep raw documents whose
predicted "looks trusted" probability is high.

Features are the same hashed word unigram+bigram bag DSIR uses
(``dsir._exploded_features`` — md5-bucketed so every stage replays in
DuckDB), l1-normalized per document (x_j = count_j / total_features:
the fastText mean-of-embeddings normalization). The model is plain
logistic regression trained with full-batch gradient descent.

Scale shape (the reason this is an operator and not sklearn):

- The per-doc feature frame is built once (explode -> two hash aggs,
  shuffle bounded by token count) and persisted; each training
  iteration is ONE Spark job over it.
- Each task accumulates its gradient contribution in numpy and emits a
  single (n_buckets+3)-double partial (``mapInArrow``); partials are
  reduced in-cluster by ``em.reduce_partials`` with the pid-sorted
  bit-deterministic fold, so the driver receives O(model) bytes per
  iteration and the trained weights are a pure function of (input,
  partitioning, hyperparameters) — which is what lets them be embedded
  as literals in a DuckDB value oracle (same contract as the GMM/TV
  chain, ``em.py:65-80``).
- Scoring is pure DataFrame expressions: explode -> broadcast weight
  join -> per-doc sum. Because x is l1-normalized,
  sum_j w_j x_j = (sum over occurrences of w[bucket]) / n_feats, so the
  scoring plan is the DSIR scoring plan with a different dimension
  table. No Python in the scoring path.

Reference analog: the reference's discriminative backends score trials
with fixed trained linear models applied via matrix products
(``IVector.py:1122-1135``); here the linear model is trained AND
applied corpus-side.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from featureengineer_spark.operators.dsir import _exploded_features
from featureengineer_spark.operators.em import reduce_partials


@dataclass
class LogisticModel:
    """Trained hashed-ngram logistic classifier."""

    weights: np.ndarray  # (n_buckets,)
    bias: float
    n_buckets: int
    loss_history: list[float] = field(default_factory=list)


def doc_feature_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    label_col: str | None = None,
) -> DataFrame:
    """Compact per-doc sparse features: (id, buckets array<int> sorted,
    xs array<double> l1-normalized, [y]). Docs with empty text keep
    empty arrays (they still train/score through the bias). The
    bucket-sorted struct sort plus ``sortWithinPartitions(id)`` make
    every downstream per-partition fold order-deterministic."""
    feats = _exploded_features(df, id_col, text_col, n_buckets)
    counts = feats.groupBy(id_col, "bucket").agg(
        F.count("*").alias("__cnt")
    )
    pairs = counts.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("bucket"), F.col("__cnt")))
        ).alias("__p")
    )
    cols = [F.col(id_col)]
    if label_col is not None:
        cols.append(F.col(label_col).cast("double").alias("__y"))
    base = df.select(*cols)
    out = (
        base.join(pairs, on=id_col, how="left")
        .withColumn(
            "__tot",
            # NULL __p (no features) -> NULL __tot; __tot is only read
            # inside transform(__p), which is NULL then too and falls to
            # the empty-array coalesce below
            F.aggregate(
                F.col("__p"),
                F.lit(0).cast("long"),
                lambda acc, t: acc + t["__cnt"],
            ),
        )
        .select(
            *(
                [F.col(id_col)]
                + ([F.col("__y")] if label_col is not None else [])
            ),
            F.coalesce(
                F.transform(F.col("__p"), lambda s: s["bucket"]).cast(
                    "array<int>"
                ),
                F.array().cast("array<int>"),
            ).alias("buckets"),
            F.coalesce(
                F.transform(
                    F.col("__p"), lambda s: s["__cnt"] / F.col("__tot")
                ).cast("array<double>"),
                F.array().cast("array<double>"),
            ).alias("xs"),
        )
    )
    return out.sortWithinPartitions(id_col)


def train_quality_classifier(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    n_iter: int = 30,
    lr: float = 1.0,
    l2: float = 1e-4,
) -> LogisticModel:
    """Full-batch gradient-descent logistic regression over hashed
    ngram features. One Spark job per iteration; each task emits one
    (grad, grad_bias, loss, n) partial, folded bit-deterministically.
    ``label_col`` must be 0/1 (castable to double)."""
    feats = doc_feature_vectors(
        df, id_col=id_col, text_col=text_col,
        n_buckets=n_buckets, label_col=label_col,
    ).select("__y", "buckets", "xs").persist()
    try:
        import pyarrow as pa

        sc = df.sparkSession.sparkContext
        part_schema = T.StructType(
            [
                T.StructField("grad", T.ArrayType(T.DoubleType())),
                T.StructField("gb", T.DoubleType()),
                T.StructField("loss", T.DoubleType()),
                T.StructField("n", T.DoubleType()),
            ]
        )
        w = np.zeros(n_buckets)
        b = 0.0
        losses: list[float] = []
        for _ in range(n_iter):
            bw = sc.broadcast((w, b))

            def estep(batches):
                wv, bv = bw.value
                nb = len(wv)
                grad = np.zeros(nb)
                gb = 0.0
                loss = 0.0
                n = 0.0
                seen = False
                for batch in batches:
                    y = batch.column("__y").to_numpy(zero_copy_only=False)
                    bl = batch.column("buckets")
                    xl = batch.column("xs")
                    offs = bl.offsets.to_numpy(zero_copy_only=False)
                    flat_idx = bl.flatten().to_numpy(zero_copy_only=False)
                    flat_x = xl.flatten().to_numpy(zero_copy_only=False)
                    lens = np.diff(offs)
                    ndocs = len(y)
                    doc_idx = np.repeat(np.arange(ndocs), lens)
                    z = np.full(ndocs, bv) + np.bincount(
                        doc_idx,
                        weights=wv[flat_idx] * flat_x,
                        minlength=ndocs,
                    )
                    p = 1.0 / (1.0 + np.exp(-z))
                    r = p - y
                    grad += np.bincount(
                        flat_idx, weights=flat_x * r[doc_idx], minlength=nb
                    )
                    gb += float(r.sum())
                    eps = 1e-12
                    loss -= float(
                        (
                            y * np.log(p + eps)
                            + (1.0 - y) * np.log(1.0 - p + eps)
                        ).sum()
                    )
                    n += float(ndocs)
                    seen = True
                if not seen:
                    return
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([grad.tolist()], type=pa.list_(pa.float64())),
                        pa.array([gb]),
                        pa.array([loss]),
                        pa.array([n]),
                    ],
                    names=["grad", "gb", "loss", "n"],
                )

            parts = reduce_partials(
                feats.mapInArrow(estep, schema=part_schema),
                {"grad": n_buckets, "gb": None, "loss": None, "n": None},
            )
            n = max(parts["n"], 1.0)
            w = w - lr * (parts["grad"] / n + l2 * w)
            b = b - lr * (parts["gb"] / n)
            losses.append(parts["loss"] / n)
        return LogisticModel(
            weights=w, bias=float(b), n_buckets=n_buckets, loss_history=losses
        )
    finally:
        feats.unpersist()


def score_quality(
    df: DataFrame,
    model: LogisticModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Add ``out_col`` = P(positive class) for every document. Pure
    DataFrame plan: explode features -> broadcast (bucket, weight) dim
    join -> per-doc sum(weight)/count + bias -> sigmoid. Docs with no
    features score sigmoid(bias)."""
    spark = df.sparkSession
    wdim = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(model.weights)],
        "bucket int, __wt double",
    )
    feats = _exploded_features(df, id_col, text_col, model.n_buckets)
    scored = (
        feats.join(F.broadcast(wdim), on="bucket", how="left")
        .groupBy(id_col)
        .agg(
            (
                F.sum(F.coalesce(F.col("__wt"), F.lit(0.0))) / F.count("*")
            ).alias("__dot")
        )
    )
    logit = F.lit(float(model.bias)) + F.coalesce(F.col("__dot"), F.lit(0.0))
    return (
        df.join(scored, on=id_col, how="left")
        .withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)))
        .drop("__dot")
    )


def quality_classifier_filter(
    df: DataFrame,
    model: LogisticModel,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep documents whose predicted quality probability is at least
    ``threshold`` (the GPT-3 pipeline additionally applies a stochastic
    Pareto keep — compose with ``curation.weighted_sample`` or a
    deterministic hash threshold for that variant)."""
    return score_quality(
        df, model, id_col=id_col, text_col=text_col
    ).filter(F.col("quality_prob") >= F.lit(float(threshold)))
