"""Gopher-style document-quality rule filters.

The published rule family from the Gopher / MassiveText curation
pipeline (Rae et al. 2021, Appendix A — public) re-expressed as pure
``pyspark.sql.functions`` column expressions: word-count band, mean
word length band, symbol-to-word ratio, bullet / ellipsis line ratios,
alphabetic-word ratio, and a minimum stop-word hit count. Reference
analog: the per-utterance validity gating before featurization
(``FeaGet.py:219-232`` drops frames failing the VAD/energy rules);
here the "frame" is a document and the rules are textual.

Every rule is a map-side expression — at 100 TB the whole rule stack
rides the parquet scan's whole-stage-codegen Project, with zero
shuffle and zero Python. Each rule emits its own boolean column so a
pipeline can audit WHICH rule dropped a document (the standard
curation-debugging need), plus an aggregate ``gopher_pass``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Gopher's stop-word list for the "contains at least 2" rule.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: Bullet glyphs for the leading-bullet line rule.
BULLET_REGEX = r"^\s*([-*•‣▪●]|\d+[.)])\s"


def with_gopher_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_ratio: float = 0.9,
    max_ellipsis_line_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Attach one boolean column per Gopher rule plus ``gopher_pass``.

    Columns added (all computable from the raw text in one Project):

    - ``r_word_count``      — word count in [min_words, max_words]
    - ``r_mean_word_len``   — mean word length in [3, 10]
    - ``r_symbol_ratio``    — ('#' + '…' occurrences) / words ≤ 0.1
    - ``r_bullet_lines``    — ≤ 90% of lines start with a bullet
    - ``r_ellipsis_lines``  — ≤ 30% of lines end with an ellipsis
    - ``r_alpha_words``     — ≥ 80% of words contain a letter
    - ``r_stopwords``       — ≥ 2 stop-word occurrences
    - ``gopher_pass``       — AND of all rules
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.when(
        F.length(F.trim(t)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(t), r"\s+"))
    n_words = F.size(words).cast("double")
    # mean word length over the word list (letters+digits+symbols count;
    # Gopher measures raw word length)
    total_wlen = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    ).cast("double")
    mean_wlen = F.when(n_words > 0, total_wlen / n_words).otherwise(0.0)

    n_hash = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    n_ellipsis = F.size(F.regexp_extract_all(t, F.lit(r"\.\.\.|…"), 0))
    symbol_ratio = F.when(
        n_words > 0, (n_hash + n_ellipsis) / n_words
    ).otherwise(0.0)

    lines = F.split(t, r"\n")
    n_lines = F.size(lines).cast("double")
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(BULLET_REGEX)))
    n_ell_end = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
    )
    bullet_ratio = F.when(n_lines > 0, n_bullet / n_lines).otherwise(0.0)
    ellipsis_ratio = F.when(n_lines > 0, n_ell_end / n_lines).otherwise(0.0)

    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))
    ).cast("double")
    alpha_word_ratio = F.when(
        n_words > 0, n_alpha_words / n_words
    ).otherwise(0.0)

    low_words = F.when(
        F.length(F.trim(t)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.lower(F.trim(t)), r"\s+"))
    stop_hits = F.size(
        F.filter(low_words, lambda w: w.isin(*GOPHER_STOPWORDS))
    )

    out = (
        df.withColumn(
            "r_word_count",
            (n_words >= min_words) & (n_words <= max_words),
        )
        .withColumn(
            "r_mean_word_len",
            (mean_wlen >= min_mean_word_len) & (mean_wlen <= max_mean_word_len),
        )
        .withColumn("r_symbol_ratio", symbol_ratio <= max_symbol_ratio)
        .withColumn("r_bullet_lines", bullet_ratio <= max_bullet_line_ratio)
        .withColumn(
            "r_ellipsis_lines", ellipsis_ratio <= max_ellipsis_line_ratio
        )
        .withColumn("r_alpha_words", alpha_word_ratio >= min_alpha_word_ratio)
        .withColumn("r_stopwords", stop_hits >= min_stopword_hits)
    )
    rules = [
        "r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words", "r_stopwords",
    ]
    gate = F.lit(True)
    for r in rules:
        gate = gate & F.col(r)
    return out.withColumn("gopher_pass", gate)


def gopher_filter(df: DataFrame, text_col: str = "text", **kwargs) -> DataFrame:
    """Rows passing every Gopher rule, original schema preserved."""
    flagged = with_gopher_flags(df, text_col=text_col, **kwargs)
    return flagged.filter(F.col("gopher_pass")).drop(
        "r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
        "r_stopwords", "gopher_pass",
    )
