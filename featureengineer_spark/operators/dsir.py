"""DSIR — Data Selection with Importance Resampling
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" — public).

Select raw-corpus documents that look like a small TARGET corpus:
fit hashed-ngram bag models on both, and score every raw document by
the log importance ratio

    w(x) = Σ_features  count(f, x) · [ log p̂_target(f) − log p̂_raw(f) ]

over word unigrams + bigrams hashed into ``n_buckets`` buckets
(Laplace-smoothed). Reference analog: the UBM-vs-target likelihood
ratio that drives every verification score in ``IVector.py:1122-1135``
— same ratio discipline, hashed-ngram multinomials instead of GMMs.

Scale shape: the two bucket-count fits are plain hash aggregations
whose OUTPUT is bounded by ``n_buckets`` (a few thousand rows at any
corpus size), so the log-ratio table is always a broadcast dimension;
scoring is explode → broadcast join → per-doc sum. No driver-side
collect of anything proportional to the corpus. Hashing uses the
md5-prefix scheme (``dedup._md5_long``) so the whole chain replays in
DuckDB for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featureengineer_spark.operators.dedup import _md5_long, normalize_text


def _exploded_features(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket) — one row per unigram and bigram OCCURRENCE (not
    distinct: DSIR's multinomial counts repetitions), bucketed by
    md5-prefix hash. Normalize+split once per doc into a bound column;
    grams via transform (no per-element regex re-evaluation)."""
    words = F.col("__w_dsir")
    n = F.size(words)
    unigrams = words
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(words, i), F.lit(" "), F.element_at(words, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(
            F.col(id_col),
            F.split(
                normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " "
            ).alias("__w_dsir"),
        )
        .select(F.col(id_col), F.explode(F.concat(unigrams, bigrams)).alias("__g"))
        .filter(F.length("__g") > 0)
        .select(
            F.col(id_col), (_md5_long(F.col("__g")) % n_buckets).alias("bucket")
        )
    )


def dsir_bucket_logprobs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """(bucket, logp) — Laplace-smoothed log-probability of each hash
    bucket under the corpus's hashed-ngram multinomial. Output is
    ≤ n_buckets rows regardless of corpus size (buckets with zero count
    still appear via the smoothing denominator only when referenced —
    consumers must coalesce missing buckets to log(α / (total + α·B)))."""
    feats = _exploded_features(df, id_col, text_col, n_buckets)
    counts = feats.groupBy("bucket").agg(F.count("*").alias("cnt"))
    total = counts.agg(
        F.sum("cnt").alias("__tot")
    )  # 1-row dim — broadcast by AQE
    return counts.crossJoin(F.broadcast(total)).select(
        "bucket",
        F.log(
            (F.col("cnt") + F.lit(alpha))
            / (F.col("__tot") + F.lit(alpha * n_buckets))
        ).alias("logp"),
        F.col("__tot").alias("corpus_total"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-raw-document DSIR log importance weight:
    (id, n_feats, dsir_logweight). Buckets unseen in a corpus score the
    smoothing floor log(α / (total + α·B)) for that corpus."""
    t_probs = dsir_bucket_logprobs(
        target, id_col=id_col, text_col=text_col,
        n_buckets=n_buckets, alpha=alpha,
    )
    r_probs = dsir_bucket_logprobs(
        raw, id_col=id_col, text_col=text_col,
        n_buckets=n_buckets, alpha=alpha,
    )
    # the two ≤B-row tables join into one broadcast ratio dim; totals are
    # carried so the smoothing floor is computable for missing buckets
    t_tot = t_probs.agg(F.max("corpus_total").alias("t_tot"))
    r_tot = r_probs.agg(F.max("corpus_total").alias("r_tot"))
    ratio = (
        t_probs.select("bucket", F.col("logp").alias("t_logp"))
        .join(
            r_probs.select("bucket", F.col("logp").alias("r_logp")),
            on="bucket",
            how="full_outer",
        )
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            (
                F.coalesce(
                    F.col("t_logp"),
                    F.log(F.lit(alpha) / (F.col("t_tot") + F.lit(alpha * n_buckets))),
                )
                - F.coalesce(
                    F.col("r_logp"),
                    F.log(F.lit(alpha) / (F.col("r_tot") + F.lit(alpha * n_buckets))),
                )
            ).alias("log_ratio"),
        )
    )
    feats = _exploded_features(raw, id_col, text_col, n_buckets)
    scored = (
        feats.join(F.broadcast(ratio), on="bucket", how="left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("log_ratio").alias("dsir_logweight"),
        )
    )
    # docs with zero features (empty text) get weight 0, not dropped
    return raw.select(id_col).join(scored, on=id_col, how="left").select(
        id_col,
        F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
        F.coalesce(F.col("dsir_logweight"), F.lit(0.0)).alias("dsir_logweight"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Deterministic DSIR selection: the k raw documents with the
    highest log importance weight (ties to the lowest id) — the
    argmax-k variant of the paper's Gumbel resampling, chosen so the
    selection is bit-reproducible and oracle-checkable. Zero-feature
    (empty-text) documents are never selected — their sentinel weight of
    0.0 would otherwise outrank real documents with negative log
    ratios."""
    w = dsir_weights(
        raw, target, id_col=id_col, text_col=text_col,
        n_buckets=n_buckets, alpha=alpha,
    )
    return (
        w.filter(F.col("n_feats") > 0)
        .orderBy(F.col("dsir_logweight").desc(), F.col(id_col).asc())
        .limit(k)
    )
