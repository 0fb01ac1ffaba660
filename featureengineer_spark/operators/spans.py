"""Exact-substring (duplicated-span) deduplication.

The published pass this grafts is ExactSubstr from Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better": any substring
that occurs more than once in the corpus is located and REMOVED IN PLACE,
keeping the unique remainder of each document — document- and
paragraph-level dedup cannot see a boilerplate license block pasted into
the middle of a million otherwise-distinct pages.

The paper builds one corpus-wide suffix array, which is inherently
single-machine. The distributed reformulation here detects duplication at
word-``l``-gram granularity instead: a maximal duplicated substring of
``>= l`` words is exactly a maximal run of duplicated ``l``-grams, so

1. every word position emits its ``l``-gram key hash (one bound-column
   ``transform``, no per-row Python),
2. one corpus-wide hash-agg counts occurrences per key (map-side
   combinable; the only shuffle, bounded by total word count),
3. positions whose key occurs ``> 1`` time are duplicated-run starts;
   runs closer than ``l`` words merge into one span extent per document
   (per-doc window over the duplicated positions only),
4. removal filters each document's word array against its merged extents
   (HOF ``exists`` over the per-doc extent list — extents per doc are
   few after merging) and reassembles the remainder.

Granularity tradeoff vs the suffix array: duplicated substrings shorter
than ``l`` words are not detected (the paper's 50-token threshold plays
the same role), and spans are word-aligned. Matching the paper, ALL
occurrences of a duplicated span are removed (no canonical copy is kept);
removal can splice previously non-adjacent words together, which is the
same artifact the paper documents.

Scale shape: explode is bounded by corpus word count; the count agg and
the position->key join shuffle the same bound; extent merge windows
partition by document (no mega-entity risk: a document is one training
unit, not a mega conversation). Nothing is ever pairwise.

Reference analog: the reference dedups only whole keys
(``PrepareData.py:647-658``); this is the sub-document generalization a
training corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import normalize_text


def _words_with_positions(
    df: DataFrame, id_col: str, text_col: str, l: int
) -> DataFrame:
    """(id, __w: array<string>, __npos: int) with __npos = number of
    l-gram start positions (0 when the doc is shorter than l words)."""
    out = df.select(
        F.col(id_col),
        F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
    )
    nwords = F.when(
        (F.size("__w") == 1) & (F.element_at("__w", 1) == ""), F.lit(0)
    ).otherwise(F.size("__w"))
    return out.withColumn("__npos", F.greatest(nwords - (l - 1), F.lit(0)))


def _position_keys(wp: DataFrame, id_col: str, l: int) -> DataFrame:
    """Explode every l-gram start position to (id, __pos, __key).

    __pos is 1-based (matches Spark ``slice`` and DuckDB list slicing);
    __key is the md5 of the space-joined l words so the DuckDB oracle
    replays it byte-identically."""
    pos = wp.filter(F.col("__npos") > 0).select(
        F.col(id_col),
        F.col("__w"),
        F.explode(F.sequence(F.lit(1), F.col("__npos"))).alias("__pos"),
    )
    return pos.select(
        F.col(id_col),
        F.col("__pos"),
        F.md5(F.array_join(F.slice("__w", F.col("__pos"), l), " ")).alias("__key"),
    )


def duplicated_span_extents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    l: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Merged extents of corpus-duplicated word spans per document.

    Returns (id, span_start, span_end, span_words, span_text): 1-based
    inclusive word indices of each maximal run of l-gram start positions
    whose l-gram occurs ``>= min_count`` times corpus-wide (intra-document
    repeats count — the paper's semantics), plus the covered text.
    """
    pk = _position_keys(_words_with_positions(df, id_col, text_col, l), id_col, l)
    counts = pk.groupBy("__key").agg(F.count("*").alias("__c"))
    dup = (
        pk.join(counts.filter(F.col("__c") >= min_count), on="__key", how="inner")
        .select(id_col, "__pos")
    )
    # Merge runs: two duplicated starts p < q belong to one span iff
    # q - p <= l (their covered intervals [p, p+l-1], [q, q+l-1] overlap
    # or touch seamlessly). Same-length intervals sorted by start have
    # ends in the same order, so the lag test is exact.
    w = Window.partitionBy(id_col).orderBy("__pos")
    grouped = dup.withColumn(
        "__new", (F.col("__pos") - F.lag("__pos", 1).over(w) > l).cast("int")
    ).withColumn(
        "__grp",
        F.sum(F.coalesce(F.col("__new"), F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    ext = grouped.groupBy(id_col, "__grp").agg(
        F.min("__pos").alias("span_start"),
        (F.max("__pos") + (l - 1)).alias("span_end"),
    )
    wp = _words_with_positions(df, id_col, text_col, l)
    return (
        ext.join(wp.select(id_col, "__w"), on=id_col, how="inner")
        .select(
            F.col(id_col),
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_end").cast("int").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1).cast("int").alias("span_words"),
            F.array_join(
                F.slice(
                    "__w",
                    F.col("span_start"),
                    (F.col("span_end") - F.col("span_start") + 1).cast("int"),
                ),
                " ",
            ).alias("span_text"),
        )
    )


def drop_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    l: int = 5,
    min_count: int = 2,
    out_col: str = "clean_text",
) -> DataFrame:
    """ExactSubstr removal: every word covered by a duplicated span is
    dropped from every document; the remainder is reassembled in order.

    Adds ``out_col`` (the cleaned normalized text; "" when the whole
    document was duplicated) and ``removed_words`` (count). Documents
    with no duplicated span pass through with the normalized text
    unchanged — the output column is always the NORMALIZED form, so
    downstream equality checks are well defined.
    """
    ext = duplicated_span_extents(df, id_col, text_col, l, min_count)
    per_doc = ext.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    wp = _words_with_positions(df, id_col, text_col, l)
    joined = wp.join(per_doc, on=id_col, how="left")
    # keep word j iff no extent covers it; extents per doc are few after
    # merging, so the exists() scan is O(words * extents-per-doc).
    spans = F.coalesce(F.col("__spans"), F.array())
    kept = F.filter(
        F.zip_with(
            F.col("__w"),
            F.sequence(F.lit(1), F.size("__w")),
            lambda word, j: F.struct(word.alias("w"), j.alias("j")),
        ),
        lambda s: ~F.exists(
            spans,
            lambda sp: (sp["span_start"] <= s["j"]) & (s["j"] <= sp["span_end"]),
        ),
    )
    nwords = F.when(
        (F.size("__w") == 1) & (F.element_at("__w", 1) == ""), F.lit(0)
    ).otherwise(F.size("__w"))
    return (
        df.join(
            joined.select(
                id_col,
                F.when(nwords == 0, F.lit("")).otherwise(
                    F.array_join(F.transform(kept, lambda s: s["w"]), " ")
                ).alias(out_col),
                F.when(nwords == 0, F.lit(0)).otherwise(nwords - F.size(kept))
                .cast("int")
                .alias("removed_words"),
            ),
            on=id_col,
            how="inner",
        )
    )
