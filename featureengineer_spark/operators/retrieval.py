"""BM25 lexical retrieval over document corpora.

Decontamination, RAG corpus prep, and query-based curation all need a
lexical top-k retriever; BM25 (Robertson-Sparck Jones probabilistic
relevance, the Okapi/Lucene formulation) is the published standard. The
reference engine's analog is its trial-scoring discipline — a bounded
probe side scored against a large corpus side (``IVector.py:1210-1230``
cosine scoring) — here the probe is a query-term table and the score is
the BM25 sum instead of a dot product.

Scale shape (the part that matters at 100 TB):

- The corpus is tokenized ONCE and immediately filtered by a BROADCAST
  of the query term set, so the posting lists that flow into the join
  are only those for terms some query mentions — corpus rows for
  irrelevant terms die map-side inside whole-stage codegen.
- Document frequencies for the surviving terms are computed from those
  same filtered postings (a term's df over the filtered postings equals
  its global df — the filter is per-term), so no second corpus pass.
- Terms with df > ``max_df_frac``·N are dropped (the stopword guard):
  an unpruned stopword posting list is O(corpus) rows for one term and
  would dominate the candidate join at web scale.
- Global N and avgdl are one tiny aggregate crossJoin-broadcast into
  the plan — no driver-side collect in the scoring path.
- The candidate space is Σ_t df(t) over query terms (df-capped), never
  |Q|×|C|; the per-query top-k window runs over that bounded set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from featureengineer_spark.operators.dedup import normalize_text
from featureengineer_spark.operators.similarity import _broadcast_if_small

#: Broadcast budget for the query-term side (rows after explode).
DEFAULT_MAX_QUERY_TERMS = 2_000_000


def _doc_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf, dl): one row per distinct term per document, with
    the term's in-document frequency and the document length in tokens.
    Tokenization = the package-wide ``normalize_text`` + whitespace
    split, bound to a column once (never re-evaluated per element)."""
    words = F.split(
        normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " "
    )
    # bind the split to a column first so no downstream expression
    # re-evaluates the normalize+split regexes per element
    base = df.select(F.col(id_col), words.alias("__w_ret"))
    with_dl = base.select(
        id_col,
        "__w_ret",
        F.when(F.array_join("__w_ret", "") == "", F.lit(0))
        .otherwise(F.size("__w_ret"))
        .alias("dl"),
    )
    return (
        with_dl.select(id_col, "dl", F.explode("__w_ret").alias("term"))
        .filter(F.length("term") > 0)
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def corpus_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row frame (n_docs, avgdl) — crossJoin-broadcast this into a
    scoring plan instead of collecting scalars on the driver."""
    words = F.split(
        normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " "
    )
    dl = F.when(F.array_join(words, "") == "", F.lit(0)).otherwise(
        F.size(words)
    )
    return df.select(dl.alias("__dl")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("__dl").alias("avgdl"),
    )


def bm25_idf(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """(term, df, idf) for every term inside the df band
    [``min_df``, ``max_df_frac``·N]. idf is the Lucene/Okapi
    always-positive form ln(1 + (N − df + 0.5)/(df + 0.5))."""
    postings = _doc_terms(corpus, id_col, text_col)
    stats = corpus_stats(corpus, text_col)
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    return (
        dfreq.crossJoin(F.broadcast(stats))
        .filter(
            (F.col("df") >= F.lit(min_df))
            & (F.col("df") <= F.col("n_docs") * F.lit(max_df_frac))
        )
        .select(
            "term",
            "df",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
        )
    )


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    min_df: int = 1,
    max_df_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """Top-``k`` BM25 documents per query →
    (query_id, doc_id, rank, score).

    score(q, d) = Σ_t qtf(t)·idf(t)·tf(t,d)·(k1+1) /
    (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl)); ties broken (score desc,
    doc_id asc) so results are deterministic. ``broadcast_queries=None``
    probes the query side with a limit-bounded count (memoized) and
    broadcasts only when it fits ``DEFAULT_MAX_QUERY_TERMS``."""
    qterms = (
        queries.select(
            F.col(query_id_col),
            F.explode(
                F.split(
                    normalize_text(
                        F.coalesce(F.col(query_text_col), F.lit(""))
                    ),
                    " ",
                )
            ).alias("term"),
        )
        .filter(F.length("term") > 0)
        .groupBy(query_id_col, "term")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )
    qterms = _broadcast_if_small(
        qterms,
        broadcast_queries,
        DEFAULT_MAX_QUERY_TERMS,
        count_on=queries,
        fanout=64,
    )

    # corpus pass: postings filtered to the queries' terms map-side;
    # df computed from the FILTERED postings (identical per-term)
    postings = _doc_terms(corpus, id_col, text_col)
    relevant = postings.join(
        qterms.select("term").distinct(), on="term", how="inner"
    )
    stats = corpus_stats(corpus, text_col)
    # relevant is unique per (doc, term) → count(1) IS the df
    dfreq = relevant.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = (
        dfreq.crossJoin(F.broadcast(stats))
        .filter(
            (F.col("df") >= F.lit(min_df))
            & (F.col("df") <= F.col("n_docs") * F.lit(max_df_frac))
        )
        .select(
            "term",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
            "avgdl",
        )
    )

    scored_terms = (
        relevant.join(F.broadcast(idf), on="term")
        .join(qterms, on="term")
        .select(
            query_id_col,
            id_col,
            (
                F.col("qtf")
                * F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("__s"),
        )
    )
    scores = scored_terms.groupBy(query_id_col, id_col).agg(
        F.sum("__s").alias("score")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "score")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    weights: list[float] | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009) of
    N per-query rankings into one: score(q, d) = Σ_i w_i / (k + rank_i)
    over the lists that ranked d, the published way to combine lexical
    (BM25) and semantic (embedding top-k) retrieval without score
    calibration — only ranks cross lists, so incomparable score scales
    (BM25 sums vs cosines) fuse cleanly. ``k`` (default 60, the paper's
    constant) damps the head; a document missing from a list simply
    contributes nothing for that list.

    Returns (query_col, id_col, rrf_score, rrf_rank), ties broken by
    id ascending so the fused order is deterministic; ``top_k`` keeps
    the best fused rows per query.

    Scale shape: each input is already a bounded per-query top-k, so
    the union holds ≤ Σ_i |Q|·k_i rows; one groupBy shuffle on
    (query, id) and a per-query window over ≤ Σ_i k_i rows — never a
    corpus scan, never |Q|×|C|. Reference analog: the score-fusion
    step of its multi-system trial scoring (``IVector.py:1226-1230``
    combines per-system scores post hoc).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if weights is None:
        weights = [1.0] * len(rankings)
    if len(weights) != len(rankings):
        raise ValueError(
            f"{len(weights)} weights for {len(rankings)} rankings"
        )
    parts = [
        r.select(
            F.col(query_col).alias("__q"),
            F.col(id_col).alias("__d"),
            (
                F.lit(float(w))
                / (F.lit(float(k)) + F.col(rank_col).cast("double"))
            ).alias("__c"),
        )
        for r, w in zip(rankings, weights)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("__q", "__d").agg(F.sum("__c").alias("rrf_score"))
    win = Window.partitionBy("__q").orderBy(
        F.col("rrf_score").desc(), F.col("__d").asc()
    )
    out = fused.withColumn("rrf_rank", F.row_number().over(win))
    if top_k is not None:
        out = out.filter(F.col("rrf_rank") <= top_k)
    return out.select(
        F.col("__q").alias(query_col),
        F.col("__d").alias(id_col),
        "rrf_score",
        "rrf_rank",
    )
