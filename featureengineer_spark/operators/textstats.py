"""Text analysis operators for training-data pipelines.

The transcript analog of the reference's per-frame acoustic featurization
(``FeaGet.py:219-232``): per-document scalar features — token counts,
quality scores, language-ID heuristic, fingerprints — all built-in
``pyspark.sql.functions`` expressions (whole-stage codegen; zero Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "en"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "in"],
}

# BPE-ish token pattern: word pieces, numbers, or single non-space symbols
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens + char length."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    ws = F.when(F.length(F.trim(t)) == 0, 0).otherwise(
        F.size(F.split(F.trim(t), r"\s+"))
    )
    bpe = F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0))
    return (
        df.withColumn("n_chars_computed", F.length(t).cast("long"))
        .withColumn("n_ws_tokens", ws.cast("long"))
        .withColumn("n_bpe_tokens", bpe.cast("long"))
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1]: length band, alpha ratio,
    mean word length band, punctuation ratio. Deterministic, composable
    with filters for corpus curation."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(t).cast("double")
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).cast("double")
    punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", "")).cast("double")
    words = F.when(F.length(F.trim(t)) == 0, 0).otherwise(
        F.size(F.split(F.trim(t), r"\s+"))
    ).cast("double")
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(0.0)
    punct_ratio = F.when(n > 0, punct / n).otherwise(0.0)
    mean_wlen = F.when(words > 0, alpha / words).otherwise(0.0)
    len_score = F.least(n / 200.0, F.lit(1.0))
    wlen_score = F.when((mean_wlen >= 3) & (mean_wlen <= 10), 1.0).otherwise(0.5)
    score = (
        0.35 * len_score
        + 0.35 * alpha_ratio
        + 0.15 * wlen_score
        + 0.15 * (1.0 - F.least(punct_ratio * 4, F.lit(1.0)))
    )
    return (
        df.withColumn("alpha_ratio", F.round(alpha_ratio, 6))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("mean_word_len", F.round(mean_wlen, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language heuristic: the language whose stopword list
    scores the most word hits wins (ties → lexicographic, 'und' if no
    hits). Pure map-side expressions — at 100 TB this is a free column."""
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    # one split per row: each per-language filter references the bound
    # __w_lid column, not its own copy of the regex+split expression
    words = F.col("__w_lid")
    hits = {
        lang: F.size(
            F.filter(words, lambda x: x.isin(*sw))
        )
        for lang, sw in STOPWORDS.items()
    }
    # hits = total stopword occurrences. Argmax with lexicographic tiebreak.
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in sorted(STOPWORDS, reverse=True):
        h = hits[lang]
        best_lang = F.when(h >= best_hits, F.lit(lang)).otherwise(best_lang)
        best_hits = F.greatest(h, best_hits)
    best_lang = F.when(best_hits > 0, best_lang).otherwise(F.lit("und"))
    return (
        df.withColumn("__w_lid", F.split(F.regexp_replace(F.trim(t), r"\s+", " "), " "))
        .withColumn("lang_pred", best_lang)
        .withColumn("lang_hits", best_hits.cast("long"))
        .drop("__w_lid")
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: md5 of normalized text (exact identity) and
    a winnowing-style min-shingle hash (rolling content fingerprint,
    robust to local edits)."""
    from featureengineer_spark.operators.dedup import _word_shingles, normalize_text

    norm = normalize_text(F.col(text_col))
    # bind the split words to a real column: expressions inside a
    # higher-order-function lambda are re-evaluated per element, so the
    # normalize+split must not ride into the shingle transform inline
    shingle_min = F.array_min(
        F.transform(_word_shingles("__w_fp", 3), lambda s: F.xxhash64(s))
    )
    return (
        df.withColumn("__w_fp", F.split(norm, " "))
        .withColumn("fingerprint_md5", F.md5(norm))
        .withColumn("fingerprint_shingle", shingle_min)
        .drop("__w_fp")
    )


#: PII-ish patterns for training-data redaction: email, URL, IPv4, and
#: long digit runs (phone/account numbers). Order matters — URL before
#: the digit run so "example.com/1234" redacts as one URL.
REDACTION_PATTERNS = (
    ("EMAIL", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("URL", r"https?://[^\s]+"),
    ("IP", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("NUMBER", r"\b\d{7,}\b"),
)


def with_redaction(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """PII-style redaction for training corpora: each pattern class is
    replaced by its ``<CLASS>`` tag, with a per-class match count emitted
    alongside (``n_redacted_email`` …) so a pipeline can quarantine
    high-PII documents instead of silently laundering them. Pure
    ``regexp_replace``/``regexp_count`` chain — whole-stage codegen, zero
    Python, free at 100 TB relative to the scan."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    out = df
    redacted = t
    for name, pat in REDACTION_PATTERNS:
        out = out.withColumn(
            f"n_redacted_{name.lower()}",
            F.regexp_count(redacted, F.lit(pat)).cast("long"),
        )
        redacted = F.regexp_replace(redacted, pat, f"<{name}>")
    return out.withColumn(out_col, redacted)


def with_repetition_stats(
    df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Intra-document repetition (the Gopher-style rep filter signal):
    the fraction of word n-gram instances that are duplicates of an
    earlier instance — ``1 − |distinct n-grams| / |n-grams|`` — plus the
    same for single words. Heavily repetitive machine-generated text
    scores high; 0 means all n-grams unique. JVM higher-order functions
    over a bound words column (no per-element rebinding)."""
    from featureengineer_spark.operators.dedup import normalize_text

    words = F.col("__w_rep")
    n_words = F.size(words)
    k = F.greatest(n_words - (n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), k), lambda i: F.array_join(F.slice(words, i, n), " ")
    )
    gram_rep = F.when(
        F.size(grams) > 0,
        1.0 - F.size(F.array_distinct(grams)) / F.size(grams),
    ).otherwise(0.0)
    word_rep = F.when(
        n_words > 0, 1.0 - F.size(F.array_distinct(words)) / n_words
    ).otherwise(0.0)
    return (
        df.withColumn(
            "__w_rep",
            F.split(normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " "),
        )
        .withColumn(f"rep_{n}gram_frac", gram_rep)
        .withColumn("rep_word_frac", word_rep)
        .drop("__w_rep")
    )


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    n: int = 8,
    min_shared: int = 1,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing ≥
    ``min_shared`` word ``n``-grams with any benchmark document — the
    standard n-gram-collision check run before training on scraped data
    (long n-grams ⇒ near-verbatim overlap). Returns one row per
    contaminated (corpus doc, benchmark doc) pair with the shared count.

    Physical shape: both sides explode to (id, shingle) and meet in ONE
    equi join on the shingle — shuffle bounded by the exploded sizes,
    never |corpus|×|benchmark|. ``max_shingle_df`` drops corpus shingles
    more frequent than the cap first (boilerplate phrases would otherwise
    fan out quadratically — same scale guard as ``ngram_jaccard_pairs``);
    benchmark sides are small by nature and stay uncapped."""
    from featureengineer_spark.operators.dedup import _exploded_shingles

    c = _exploded_shingles(corpus, id_col, text_col, n).withColumnRenamed(
        id_col, "corpus_id"
    )
    if max_shingle_df is not None:
        dfreq = c.groupBy("__sh").agg(F.count("*").alias("__df"))
        c = c.join(
            dfreq.filter(F.col("__df") <= max_shingle_df).select("__sh"), on="__sh"
        )
    b = _exploded_shingles(benchmark, bench_id_col, text_col, n).withColumnRenamed(
        bench_id_col, "bench_id"
    )
    return (
        c.join(b, on="__sh")
        .groupBy("corpus_id", "bench_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
        .filter(F.col("n_shared_ngrams") >= min_shared)
    )


def unigram_model(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus unigram model: (word, n, logp) with add-one smoothing over
    the observed vocabulary — one explode + one count aggregation
    (map-side combinable; shuffle bounded by |vocab|). The KenLM-proxy
    half of :func:`with_unigram_logprob`."""
    from featureengineer_spark.operators.dedup import normalize_text

    words = df.select(
        F.explode(
            F.split(normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " ")
        ).alias("word")
    ).filter(F.length("word") > 0)
    counts = words.groupBy("word").agg(F.count("*").alias("n"))
    if min_count > 1:
        counts = counts.filter(F.col("n") >= min_count)
    totals = counts.agg(
        F.sum("n").alias("__total"), F.count("*").alias("__vocab")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "word",
        "n",
        F.log((F.col("n") + 1.0) / (F.col("__total") + F.col("__vocab") + 1.0)).alias(
            "logp"
        ),
        "__total",
        "__vocab",
    )


#: vocab rows up to which the unigram model is broadcast by default —
#: ~2M (word, logp) rows is tens of MB, far under executor budgets, and
#: a min_count-capped natural-language vocab sits well below it.
MAX_BROADCAST_VOCAB_ROWS = 2_000_000


def with_unigram_logprob(
    df: DataFrame,
    model: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool | None = None,
    max_broadcast_vocab: int = MAX_BROADCAST_VOCAB_ROWS,
    salt_partitions: int = 0,
) -> DataFrame:
    """Per-document mean unigram log-probability — the classic cheap
    fluency/quality signal (a KenLM-score proxy): gibberish and
    vocabulary-mismatched documents score far below corpus-typical text.

    ``model`` defaults to a model fit on ``df`` itself (self-scoring);
    pass a model built on a reference corpus (``unigram_model``) to
    score against a domain. Out-of-vocabulary words take the smoothed
    floor ``log(1/(total+V+1))``. Physical shape: explode → equi join on
    the word → one per-doc aggregation; shuffle bounded by total token
    count.

    Zipf skew: ``word`` is a heavily skewed join key (the "the"/"of"
    partitions dwarf the tail), so a shuffle join on it is hot-partition
    bound at corpus scale. The model side is therefore BROADCAST
    whenever it fits ``max_broadcast_vocab`` rows (decided by a
    memoized limit-bounded probe when ``broadcast_model=None``; a
    ``min_count``-capped vocab always fits) — a broadcast hash join has
    no shuffle on ``word`` at all, eliminating the skew. For a vocab too
    large to broadcast, pass ``salt_partitions=S`` to replicate each
    model row across S salt values and hash-scatter the exploded words,
    splitting every head word across S reducers (cost: S× the model
    shuffle, which is the cheap side by assumption); otherwise the
    shuffle join relies on AQE skew-join splitting."""
    from featureengineer_spark.operators.dedup import normalize_text

    if model is None:
        model = unigram_model(df, text_col)
    doc_words = df.select(
        F.col(id_col),
        F.explode(
            F.split(normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " ")
        ).alias("word"),
    ).filter(F.length("word") > 0)
    totals = model.agg(
        F.first("__total").alias("__t"), F.first("__vocab").alias("__v")
    )
    oov = F.log(1.0 / (F.col("__t") + F.col("__v") + 1.0))
    vocab = model.select("word", "logp")
    if broadcast_model is None:
        from featureengineer_spark.operators.similarity import _fits_rows

        broadcast_model = _fits_rows(vocab, max_broadcast_vocab)
    if broadcast_model:
        scored = doc_words.join(F.broadcast(vocab), on="word", how="left")
    elif salt_partitions > 1:
        s = int(salt_partitions)
        vocab_s = vocab.withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(s)]))
        )
        doc_words = doc_words.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(s)).cast("int")
        )
        scored = doc_words.join(
            vocab_s, on=["word", "__salt"], how="left"
        ).drop("__salt")
    else:
        scored = doc_words.join(vocab, on="word", how="left")
    scored = scored.crossJoin(F.broadcast(totals))
    per_doc = scored.groupBy(id_col).agg(
        F.avg(F.coalesce(F.col("logp"), oov)).alias("mean_word_logprob"),
        F.count("*").alias("n_scored_words"),
    )
    return df.join(per_doc, on=id_col, how="left")


def quantile_thresholds(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    qs: tuple[float, ...] = (0.1, 0.5, 0.9, 0.99),
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantile thresholds of a quality signal — the cutoff
    table a corpus-filtering pass consumes ("drop the bottom decile of
    docs per language", "cap at the 99th-percentile length"): one row
    per group with a ``q<percent>`` column per requested quantile
    (``q10``, ``q50``, ``q99_9``, …).

    ``approx=False`` uses exact interpolated ``percentile`` — one
    sort-based aggregation buffering each group's values, the right call
    up to ~10⁸ rows per group and bit-identical to DuckDB's
    ``quantile_cont`` (oracle-checked). At 100 TB pass ``approx=True``:
    ``approx_percentile`` (KLL-style sketch) is partial-aggregating and
    constant-memory per group with rank error ~1/``accuracy`` — the
    honest scale trade-off, tested against the exact path."""
    def _name(q: float) -> str:
        pct = q * 100
        s = (f"{pct:.10f}").rstrip("0").rstrip(".").replace(".", "_")
        return f"q{s}"

    q_arr = "array(" + ", ".join(repr(float(q)) for q in qs) + ")"
    if approx:
        agg = F.expr(f"approx_percentile({value_col}, {q_arr}, {accuracy})")
    else:
        agg = F.expr(f"percentile({value_col}, {q_arr})")
    grouped = df.groupBy(group_col) if group_col else df.groupBy()
    out = grouped.agg(agg.alias("__qs"))
    cols = ([group_col] if group_col else []) + [
        F.element_at("__qs", i + 1).cast("double").alias(_name(q))
        for i, q in enumerate(qs)
    ]
    return out.select(*cols)


def bigram_model(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus bigram model: (prev, word, n, logp) with add-one smoothing
    — ``logp = log((n(prev,word)+1) / (n(prev)+V+1))`` where V is the
    corpus unigram vocabulary size. The conditional upgrade of
    :func:`unigram_model` (a closer KenLM-score proxy: word-salad text
    with plausible unigrams still scores low).

    Physical shape: ONE pair construction per document (a JVM
    ``transform`` over the bound words array — no self-join, no window)
    → explode → one count aggregation; shuffle bounded by token count.
    ``min_count`` caps the table for broadcasting (counts below it drop
    to the OOV floor, which :func:`with_bigram_logprob` reconstructs
    from the prev-totals)."""
    from featureengineer_spark.operators.dedup import normalize_text

    words = df.select(
        F.split(
            normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " "
        ).alias("__w")
    ).select(F.filter("__w", lambda w: F.length(w) > 0).alias("__w"))
    n = F.size("__w")
    pairs = words.select(
        F.explode(
            F.when(
                n >= 2,
                F.transform(
                    F.sequence(F.lit(2), F.greatest(n, F.lit(2))),
                    lambda i: F.struct(
                        F.element_at("__w", i - 1).alias("prev"),
                        F.element_at("__w", i).alias("word"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<prev:string,word:string>>"))
        ).alias("p")
    ).select("p.prev", "p.word")
    counts = pairs.groupBy("prev", "word").agg(F.count("*").alias("n"))
    if min_count > 1:
        counts = counts.filter(F.col("n") >= min_count)
    prev_totals = pairs.groupBy("prev").agg(F.count("*").alias("__n_prev"))
    vocab = words.select(F.explode("__w").alias("word")).agg(
        F.count_distinct("word").alias("__vocab")
    )
    return (
        counts.join(prev_totals, on="prev")
        .crossJoin(F.broadcast(vocab))
        .select(
            "prev",
            "word",
            "n",
            F.log(
                (F.col("n") + 1.0)
                / (F.col("__n_prev") + F.col("__vocab") + 1.0)
            ).alias("logp"),
            "__n_prev",
            "__vocab",
        )
    )


def with_bigram_logprob(
    df: DataFrame,
    model: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool | None = None,
    max_broadcast_vocab: int = MAX_BROADCAST_VOCAB_ROWS,
) -> DataFrame:
    """Per-document mean bigram conditional log-probability
    ``mean(log p(wᵢ | wᵢ₋₁))`` — the fluency signal that separates
    coherent text from plausible-unigram word salad. Documents with
    fewer than two tokens get null (no pairs to score).

    Unseen (prev, word) pairs with a KNOWN prev take the smoothed floor
    ``log(1/(n(prev)+V+1))``; pairs with an unseen prev take
    ``log(1/(V+1))``. Model side broadcast under the same Zipf-skew
    policy as :func:`with_unigram_logprob` (the join key ``prev,word``
    is head-heavy)."""
    from featureengineer_spark.operators.dedup import normalize_text

    if model is None:
        model = bigram_model(df, text_col)
    words = df.select(
        F.col(id_col),
        F.split(
            normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " "
        ).alias("__w"),
    ).select(
        id_col, F.filter("__w", lambda w: F.length(w) > 0).alias("__w")
    )
    n = F.size("__w")
    doc_pairs = words.select(
        F.col(id_col),
        F.explode(
            F.when(
                n >= 2,
                F.transform(
                    F.sequence(F.lit(2), F.greatest(n, F.lit(2))),
                    lambda i: F.struct(
                        F.element_at("__w", i - 1).alias("prev"),
                        F.element_at("__w", i).alias("word"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<prev:string,word:string>>"))
        ).alias("p"),
    ).select(id_col, "p.prev", "p.word")
    consts = model.agg(F.first("__vocab").alias("__v"))
    prev_totals = model.select("prev", "__n_prev").dropDuplicates(["prev"])
    pair_logp = model.select("prev", "word", "logp")
    if broadcast_model is None:
        from featureengineer_spark.operators.similarity import _fits_rows

        broadcast_model = _fits_rows(pair_logp, max_broadcast_vocab)
    if broadcast_model:
        pair_logp = F.broadcast(pair_logp)
        prev_totals = F.broadcast(prev_totals)
    scored = (
        doc_pairs.join(pair_logp, on=["prev", "word"], how="left")
        .join(prev_totals, on="prev", how="left")
        .crossJoin(F.broadcast(consts))
    )
    floor = F.log(
        1.0 / (F.coalesce(F.col("__n_prev"), F.lit(0)) + F.col("__v") + 1.0)
    )
    per_doc = scored.groupBy(id_col).agg(
        F.avg(F.coalesce(F.col("logp"), floor)).alias("mean_bigram_logprob"),
        F.count("*").alias("n_scored_pairs"),
    )
    return df.join(per_doc, on=id_col, how="left")


def with_perplexity_buckets(
    df: DataFrame,
    model: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = "lang",
    cuts: tuple[float, float] = (0.33, 0.67),
    approx: bool = False,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score each
    document with the corpus bigram LM (pseudo-perplexity
    ``exp(-mean_bigram_logprob)``, the KenLM stand-in this engine
    trains distributed), cut each group at the ``cuts`` quantiles of the
    perplexity distribution, and label documents ``head`` (lowest
    perplexity = most fluent), ``middle``, or ``tail`` — the three-way
    split CCNet uses to keep/inspect/drop web text.

    Documents the LM cannot score (< 2 tokens) get a null bucket.
    ``approx=True`` switches the cut computation to the
    ``approx_percentile`` sketch (constant memory per group — the
    100 TB path); the cut table is |groups| rows either way and is
    broadcast back, so the corpus is scanned twice (score, label) and
    never shuffled beyond the LM join."""
    if model is None:
        model = bigram_model(df, text_col=text_col)
    scored = with_bigram_logprob(
        df, model=model, text_col=text_col, id_col=id_col
    ).withColumn("perplexity", F.exp(-F.col("mean_bigram_logprob")))
    lo, hi = cuts

    def _name(q: float) -> str:
        pct = q * 100
        s = (f"{pct:.10f}").rstrip("0").rstrip(".").replace(".", "_")
        return f"q{s}"

    cuts_df = quantile_thresholds(
        scored.filter(F.col("perplexity").isNotNull()),
        "perplexity",
        group_col=group_col,
        qs=(lo, hi),
        approx=approx,
    )
    c_lo, c_hi = F.col(_name(lo)), F.col(_name(hi))
    if group_col:
        labeled = scored.join(F.broadcast(cuts_df), on=group_col, how="left")
    else:
        labeled = scored.crossJoin(F.broadcast(cuts_df))
    bucket = (
        F.when(F.col("perplexity").isNull(), F.lit(None).cast("string"))
        .when(F.col("perplexity") <= c_lo, F.lit("head"))
        .when(F.col("perplexity") <= c_hi, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return labeled.withColumn("ppl_bucket", bucket).drop(_name(lo), _name(hi))
