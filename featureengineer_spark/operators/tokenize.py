"""Distributed BPE tokenizer training and encoding.

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units") learned the way scalable tokenizer
trainers (SentencePiece, HF tokenizers) do it: from the WORD-FREQUENCY
table, not the corpus. The corpus is touched exactly once (one hash agg
for word counts — map-side combinable, the only corpus-sized shuffle);
every merge round then runs over the vocabulary table, whose row count is
the number of DISTINCT words — Zipf-bounded millions at 100 TB, i.e.
thousands of times smaller than the corpus. Per round the driver receives
only the argmax pair (O(1) bytes); pair counting and merge application
stay distributed, JVM-side:

- pair counts: one bound-array ``transform`` producing adjacent symbol
  pairs + explode + hash agg, weighted by word frequency;
- merge application: a single ``aggregate`` (fold) over each word's
  symbol array — greedy left-to-right non-overlapping replacement, the
  paper's semantics (state = (rebuilt array, pending symbol)).

The expression tree is cut with an eager ``localCheckpoint`` every few
rounds so n_merges=10k does not accumulate a 10k-deep fold plan.

Symbolization follows the paper: characters plus a terminal ``</w>``
end-of-word symbol, so merges never cross word boundaries.

Encoding has two paths:
- :func:`encode_words` — join each document's words against the trained
  word->segmentation dimension (broadcast; it is the vocab table), with
  character fallback for OOV words. This is the precomputed-cache
  formulation fast encoders use, and is exactly reproducible in SQL.
- :func:`apply_bpe` — the general rank-merge encoder as an Arrow-batched
  pandas UDF (handles OOV words by replaying merges by rank, the GPT-2
  encoder algorithm), for corpora whose words were not all seen at
  training time.

Reference analog: the reference has no tokenizer; this is core
training-data-pipeline capability (the token counts every mixing /
packing / budget operator in ``curation.py`` consumes come from here).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text

EOW = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wcount) over the normalized corpus — the ONE corpus pass."""
    words = df.select(
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count("*").alias("wcount"))


def symbolize(words: DataFrame, word_col: str = "word") -> DataFrame:
    """Add ``syms``: the word's characters plus the terminal EOW symbol."""
    chars = F.split(F.col(word_col), "")
    return words.withColumn(
        "syms", F.concat(chars, F.array(F.lit(EOW)))
    )


def pair_counts(
    words: DataFrame, syms_col: str = "syms", count_col: str = "wcount"
) -> DataFrame:
    """(a, b, pcount): adjacent-symbol pair frequencies weighted by word
    frequency. One transform + explode + agg over the VOCAB table."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(syms_col) - 1, F.lit(1))),
        lambda i: F.struct(
            F.element_at(F.col(syms_col), i).alias("a"),
            F.element_at(F.col(syms_col), (i + 1).cast("int")).alias("b"),
        ),
    )
    ex = words.filter(F.size(syms_col) >= 2).select(
        F.col(count_col), F.explode(pairs).alias("p")
    )
    return (
        ex.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum(count_col).alias("pcount"))
    )


def _apply_merge(syms_col, a: str, b: str):
    """Greedy left-to-right non-overlapping replacement of the adjacent
    pair (a, b) with the merged symbol a+b, as one fold. The accumulator
    is (out: rebuilt array, prev: pending symbol; '' = none — symbols are
    never the empty string)."""
    merged = a + b

    def step(acc, x):
        hit = (acc["prev"] == a) & (x == b)
        return (
            F.when(
                hit,
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit("").alias("prev"),
                ),
            )
            .when(
                acc["prev"] == "",
                F.struct(acc["out"].alias("out"), x.alias("prev")),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["prev"])).alias("out"),
                    x.alias("prev"),
                )
            )
        )

    init = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit("").alias("prev")
    )
    return F.aggregate(
        syms_col,
        init,
        step,
        lambda acc: F.when(acc["prev"] == "", acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["prev"]))
        ),
    )


def train_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 4,
):
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns ``(merges, word_table)``: the ordered merge list
    ``[(a, b), ...]`` and the final (word, wcount, syms) DataFrame — the
    trained segmentation of every corpus word, i.e. the encode cache
    :func:`encode_words` consumes.

    Deterministic: the winning pair per round is (max pcount, then
    lexicographically smallest (a, b)) — a pure function of the corpus,
    so trained merges can be captured as literals for oracle replay
    (same contract as the trained-model queries).

    Stops early when no pair reaches ``min_pair_count``.
    """
    wt = symbolize(word_counts(df, text_col)).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for r in range(n_merges):
        best = (
            pair_counts(wt)
            .orderBy(F.desc("pcount"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["pcount"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        wt = wt.withColumn("syms", _apply_merge(F.col("syms"), a, b))
        if (r + 1) % checkpoint_every == 0:
            wt = wt.localCheckpoint()  # cut the fold-expression chain
    return merges, wt.localCheckpoint()


def encode_words(
    df: DataFrame,
    word_table: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents against the trained word->segmentation cache.

    Emits one row per (doc, word position): (id, word_idx, word, tokens,
    n_tokens). In-vocab words take their trained segmentation via a
    broadcast join (the word table IS the vocabulary — broadcast-sized by
    construction); OOV words fall back to character symbols, exactly what
    the merge replay would produce for a word sharing no trained pair.
    """
    w = df.select(
        F.col(id_col),
        F.posexplode(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "word_idx", "word"
        ),
    ).filter(F.col("word") != "")
    seg = word_table.select("word", F.col("syms").alias("__seg"))
    fallback = F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW)))
    return w.join(F.broadcast(seg), on="word", how="left").select(
        id_col,
        "word_idx",
        "word",
        F.coalesce(F.col("__seg"), fallback).alias("tokens"),
        F.size(F.coalesce(F.col("__seg"), fallback)).cast("int").alias("n_tokens"),
    )


def _encode_word_by_ranks(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference rank-merge encoder (GPT-2 algorithm): repeatedly apply
    the lowest-rank adjacent pair until none applies."""
    syms = list(word) + [EOW]
    while len(syms) >= 2:
        pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, (a, b) = min(ranked)
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def apply_bpe(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "tokens",
) -> DataFrame:
    """General encoder: replay the trained merges by rank per word
    (handles OOV words the join cache cannot). Arrow-batched pandas UDF
    with a per-batch word memo — Zipf duplication makes the memo hit rate
    the dominant term, so per-batch work is ~|distinct words in batch|."""
    from pyspark.sql.types import ArrayType, StringType

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def _encode_fn(texts):
        memo: dict[str, list[str]] = {}

        def enc(t):
            out: list[str] = []
            for w in (t or "").split(" "):
                if not w:
                    continue
                if w not in memo:
                    memo[w] = _encode_word_by_ranks(w, ranks)
                out.extend(memo[w])
            return out

        return texts.map(enc)

    _encode = F.pandas_udf(_encode_fn, ArrayType(StringType()))

    return (
        df.select(F.col(id_col), normalize_text(F.col(text_col)).alias("__norm"))
        .select(id_col, _encode(F.col("__norm")).alias(out_col))
        .withColumn("n_tokens", F.size(out_col).cast("int"))
    )
