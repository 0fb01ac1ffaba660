"""Paragraph-level deduplication (the CCNet / RefinedWeb sub-document
pass).

Document-level dedup (``operators/dedup.py``) misses boilerplate:
headers, footers, license blocks, navigation chrome repeated across
millions of pages. The published fix is paragraph-level: split each
document into paragraphs, hash them, and keep only the FIRST global
occurrence of any repeated paragraph. Reference analog: the per-segment
(not per-show) keying discipline of ``IVector.py:1090-1104`` — the unit
of dedup drops below the document exactly as the reference's unit of
processing drops below the show.

Scale shape: explode (map-side) → one hash-partitioned shuffle on the
paragraph hash (first-occurrence ranking; groups are tiny) → one
shuffle back on doc_id for reassembly. No pairwise anything — the
whole pass is two hash aggregations at 100 TB.

Two split modes:

- ``mode="regex"``: real paragraphs, split on a delimiter regex
  (default blank line).
- ``mode="blocks"``: fixed word-count blocks over normalized text, for
  corpora without layout (transcripts, OCR dumps) — same machinery,
  deterministic block boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featureengineer_spark.operators.dedup import normalize_text


def split_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "regex",
    delim: str = r"\n\s*\n",
    block_words: int = 16,
) -> DataFrame:
    """Explode documents into (id, para_idx, para, para_md5) rows.

    Pure map + explode — no shuffle; paragraph order is preserved in
    ``para_idx`` so the document can be reassembled byte-deterministically.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    if mode == "regex":
        paras = F.split(t, delim)
    elif mode == "blocks":
        words = F.col("__w_para")
        n_blocks = F.greatest(
            F.ceil(F.size(words) / F.lit(float(block_words))).cast("int"),
            F.lit(1),
        )
        paras = F.transform(
            F.sequence(F.lit(0), n_blocks - 1),
            lambda i: F.array_join(
                F.slice(words, i * block_words + 1, block_words), " "
            ),
        )
        df = df.withColumn("__w_para", F.split(normalize_text(t), " "))
    else:
        raise ValueError(f"mode must be 'regex' or 'blocks', got {mode!r}")
    out = (
        df.select(F.col(id_col), F.posexplode(paras).alias("para_idx", "para"))
        .withColumn("para_idx", F.col("para_idx").cast("long"))
        .withColumn("para_md5", F.md5(F.col("para")))
    )
    return out


def duplicated_paragraph_groups(
    paras: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Paragraphs occurring more than once corpus-wide:
    (para_md5, n_occurrences, n_docs, first_doc_id). One hash
    aggregation on the md5 — the boilerplate census."""
    return (
        paras.groupBy("para_md5")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
            F.min(id_col).alias("first_doc_id"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


def drop_duplicate_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "regex",
    delim: str = r"\n\s*\n",
    block_words: int = 16,
    join_sep: str | None = None,
) -> DataFrame:
    """Keep only the FIRST global occurrence of every paragraph (ordered
    by (id, para_idx)); rebuild each document from its surviving
    paragraphs.

    Returns (id, text, n_paras, n_kept): the deduped text (empty string
    when every paragraph was boilerplate — the row is NOT dropped, so
    downstream length filters see it), the original paragraph count, and
    the survivor count.
    """
    if join_sep is None:
        join_sep = "\n\n" if mode == "regex" else " "
    paras = split_paragraphs(
        df, id_col=id_col, text_col=text_col, mode=mode,
        delim=delim, block_words=block_words,
    )
    w = Window.partitionBy("para_md5").orderBy(id_col, "para_idx")
    kept = paras.withColumn("__rn", F.row_number().over(w))
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.count("*").alias("n_paras"),
            F.sum(F.when(F.col("__rn") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__rn") == 1,
                                F.struct("para_idx", "para"),
                            )
                        )
                    ),
                    lambda s: s["para"],
                ),
                join_sep,
            ).alias(text_col),
        )
    )
    return df.select(id_col).join(rebuilt, on=id_col, how="left").select(
        id_col,
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        F.coalesce(F.col("n_paras"), F.lit(0)).alias("n_paras"),
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
    )
