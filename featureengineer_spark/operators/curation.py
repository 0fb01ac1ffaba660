"""Corpus curation operators: deterministic sampling and sequence packing.

The last mile of a training-data pipeline after dedup/quality/decontam:
pick a weighted mix of the surviving documents (reproducibly — a re-run
must select the same rows) and pack them into fixed-token-budget
training sequences. Both are pure DataFrame expressions: the sampler is
a hash threshold (the engine's seeded-random discipline,
``data/synth.py`` F9 — no ``rand()``, ever), the packer is one window
cumulative sum, so both scale as a map stage + one bounded window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: hash-threshold denominator: fractions resolve to ~1e-6 granularity
SAMPLE_DENOM = 1_000_000


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
    default_fraction: float = 0.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    ``hash(seed, id) mod 1e6 < fraction(stratum) · 1e6``.

    Unlike ``df.sample``/``sampleBy`` the decision is a pure function of
    (seed, id) — re-runs, retries, and different partitionings select
    EXACTLY the same rows (the property a resumable curation pipeline
    needs), and the same id keeps consistent fate across fraction
    *increases* (raising a stratum's fraction only ADDS rows — nested
    samples for scaling-law ladders). ``hash_fn='md5'`` uses the
    DuckDB-reproducible 60-bit md5 prefix for the oracle-checked variant;
    xxhash64 is the production default."""
    from featureengineer_spark.operators.dedup import _md5_long

    if hash_fn == "xxhash64":
        h = F.xxhash64(F.lit(seed), F.col(id_col))
    elif hash_fn == "md5":
        h = _md5_long(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    bucket = F.pmod(h, F.lit(SAMPLE_DENOM))
    thresh = F.coalesce(
        *(
            [
                F.when(
                    F.col(strata_col) == F.lit(k), F.lit(int(v * SAMPLE_DENOM))
                )
                for k, v in fractions.items()
            ]
            + [F.lit(int(default_fraction * SAMPLE_DENOM))]
        )
    )
    return df.filter(bucket < thresh)


#: unsharded ``pack_sequences`` refuses inputs beyond this row count —
#: a global concat-then-chunk packing is a single window partition, so
#: one task would hold the whole corpus. Pass ``shard_col`` (or raise
#: ``max_unsharded_rows``) past this point.
PACK_UNSHARDED_ROW_LIMIT = 5_000_000


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_col: str | None = None,
    max_unsharded_rows: int = PACK_UNSHARDED_ROW_LIMIT,
) -> DataFrame:
    """Greedy contiguous sequence packing: documents, in deterministic
    ``id_col`` order (per shard), fill training sequences of ``budget``
    tokens — the standard "sample packing" step before tokenized-corpus
    writes. Emits ``seq_idx`` (which sequence the doc starts in) and
    ``seq_offset`` (token offset inside it).

    Semantics: a doc starts in the sequence its exclusive cumulative sum
    falls in (``seq_idx = cumsum_excl div budget``, exact integer
    division — a double-division quotient's ULP can exceed 1/budget once
    a shard holds ~2^44·budget tokens and misplace boundary docs) — the
    concat-then-chunk packing (docs may straddle a boundary, exactly like
    concatenated-token training streams). One window cumulative sum per
    shard.

    Scale guard: with ``shard_col=None`` the whole input flows through
    ONE window partition (global contiguous packing needs a total
    order), so the unsharded path is gated by a limit-bounded count
    probe and raises past ``max_unsharded_rows`` rows — pass a
    ``shard_col`` (e.g. a hash bucket; :func:`shuffle_shards` with
    ``with_position=False`` derives exactly that deterministically) so
    no single partition holds the corpus; packing is then deterministic
    per shard, which is how training shards are consumed anyway."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if shard_col is None:
        # Limit-bounded probe: scans at most max_unsharded_rows+1 rows,
        # never the full input, and only on the unsharded path.
        probe = df.select(id_col).limit(max_unsharded_rows + 1).count()
        if probe > max_unsharded_rows:
            raise ValueError(
                f"pack_sequences(shard_col=None) would route >"
                f"{max_unsharded_rows:,} rows through a single window "
                "partition (global contiguous packing is a total order). "
                "Pass shard_col= (e.g. a hash bucket column) to pack per "
                "shard, or raise max_unsharded_rows if you accept the "
                "single-task cost."
            )
    w = (
        Window.partitionBy(shard_col) if shard_col else Window.partitionBy(F.lit(0))
    ).orderBy(F.col(id_col))
    cum_excl = F.coalesce(
        F.sum(F.col(token_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("long")
    return df.withColumn("__cum_excl", cum_excl).select(
        "*",
        F.expr(f"__cum_excl div {int(budget)}").alias("seq_idx"),
        F.pmod(F.col("__cum_excl"), F.lit(budget)).cast("long").alias("seq_offset"),
    ).drop("__cum_excl")


def conversation_quality(
    df: DataFrame,
    entity_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    user_role: str = "user",
    assistant_role: str = "assistant",
) -> DataFrame:
    """Per-conversation quality profile for chat-data curation — the
    conversation-level analog of the per-document quality score: one row
    per conversation with the gate signals a transcript-training pipeline
    filters on:

    * ``n_turns``, ``n_user_turns``, ``n_assistant_turns``
    * ``alternation_violations`` — adjacent same-role turn pairs in
      ``turn_idx`` order (user/assistant only; system/tool rows between
      them don't count as violations)
    * ``empty_text_frac`` — fraction of turns with blank text
    * ``mean_turn_chars``
    * ``starts_with_user`` — first non-system turn is a user turn

    One window pass (lag over the role sequence) + one aggregation —
    shuffle bounded by |turns| then |conversations|."""
    w = Window.partitionBy(entity_col).orderBy(F.col(idx_col))
    ua = F.col(role_col).isin(user_role, assistant_role)
    prev_ua_role = F.last(
        F.when(ua, F.col(role_col)), ignorenulls=True
    ).over(w.rowsBetween(Window.unboundedPreceding, -1))
    violation = (ua & (F.col(role_col) == prev_ua_role)).cast("long")
    first_ua = F.first(F.when(ua, F.col(role_col)), ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    t = F.coalesce(F.col(text_col), F.lit(""))
    return (
        df.select(
            entity_col,
            F.col(role_col),
            violation.alias("__viol"),
            first_ua.alias("__first_ua"),
            F.length(t).alias("__chars"),
            (F.length(F.trim(t)) == 0).cast("long").alias("__empty"),
        )
        .groupBy(entity_col)
        .agg(
            F.count("*").alias("n_turns"),
            F.sum((F.col(role_col) == user_role).cast("long")).alias("n_user_turns"),
            F.sum((F.col(role_col) == assistant_role).cast("long")).alias(
                "n_assistant_turns"
            ),
            F.sum("__viol").alias("alternation_violations"),
            (F.sum("__empty") / F.count("*")).alias("empty_text_frac"),
            F.avg("__chars").alias("mean_turn_chars"),
            (F.first("__first_ua") == user_role).alias("starts_with_user"),
        )
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xxhash64",
    with_position: bool = True,
) -> DataFrame:
    """Deterministic global training shuffle: every row gets a ``shard``
    (``pmod(hash(seed, id), n_shards)``) and, with ``with_position``, a
    ``shard_pos`` (rank by (hash, id) inside the shard) — the
    pseudorandom permutation a dataloader consumes, as a pure function
    of (seed, id): re-runs, retries, and any input partitioning produce
    the identical order (the same F9 seeded-hash discipline as
    :func:`stratified_sample`), and changing ``seed`` is a fresh epoch
    permutation with zero data movement beyond the reshuffle.

    Scale: the shard assignment is a map-only expression. The position
    rank is one window per shard — fine when corpus/n_shards fits a
    task (pick n_shards accordingly, e.g. 100k shards at 100 TB); for a
    writer that only needs physical order, skip the rank
    (``with_position=False``) and do
    ``.repartition(n_shards, "shard").sortWithinPartitions("__shuffle_key")``
    — same order, no window. ``hash_fn='md5'`` is the
    DuckDB-reproducible variant."""
    from pyspark.sql.window import Window

    from featureengineer_spark.operators.dedup import _md5_long

    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if hash_fn == "xxhash64":
        h = F.xxhash64(F.lit(seed), F.col(id_col))
    elif hash_fn == "md5":
        h = _md5_long(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    out = df.withColumn("__shuffle_key", h).withColumn(
        "shard", F.pmod(F.col("__shuffle_key"), F.lit(n_shards)).cast("int")
    )
    if with_position:
        w = Window.partitionBy("shard").orderBy(
            F.col("__shuffle_key"), F.col(id_col)
        )
        out = out.withColumn("shard_pos", F.row_number().over(w) - 1)
    return out.drop("__shuffle_key")


def token_budget_mix(
    df: DataFrame,
    targets: dict[str, int],
    domain_col: str = "lang",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: int = 0,
    default_tokens: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Domain-mixture curation by TOKEN budget: sample each domain down
    to ``targets[domain]`` tokens in expectation — the mixture-weighting
    step of a pretraining pipeline (a target token mix per source/
    language, not a per-document fraction, since document lengths differ
    across domains).

    Two passes: (1) one aggregation for per-domain token totals,
    (2) per-domain keep fraction ``min(1, target/total)`` applied as the
    same deterministic hash threshold as :func:`stratified_sample` —
    re-run/partitioning-invariant, and NESTED under budget increases
    (raising a domain's token target only ADDS documents, so scaling-law
    ladders reuse their smaller mixes). Domains absent from ``targets``
    get ``default_tokens``. The kept token count is the budget in
    expectation, not exactly (whole documents are kept or dropped);
    callers needing exact truncation chain :func:`pack_sequences` and
    cut at the budget boundary.

    Rows with a NULL domain form their own group (null-safe join), so
    they are sampled under ``default_tokens`` instead of being silently
    dropped by inner-join null semantics.

    Scale: one groupBy(domain) agg (|domains| rows — broadcast back) +
    one map-side filter; no shuffle of the corpus itself."""
    from featureengineer_spark.operators.dedup import _md5_long

    totals = df.groupBy(F.col(domain_col).alias("__mix_domain")).agg(
        F.sum(token_col).alias("__domain_tokens")
    )
    target_expr = F.coalesce(
        *(
            [
                F.when(F.col(domain_col) == F.lit(k), F.lit(int(v)))
                for k, v in targets.items()
            ]
            + [F.lit(int(default_tokens))]
        )
    )
    frac = F.least(
        F.lit(1.0), target_expr / F.greatest(F.col("__domain_tokens"), F.lit(1))
    )
    if hash_fn == "xxhash64":
        h = F.xxhash64(F.lit(seed), F.col(id_col))
    elif hash_fn == "md5":
        h = _md5_long(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    return (
        df.join(
            F.broadcast(totals),
            on=F.col(domain_col).eqNullSafe(F.col("__mix_domain")),
        )
        .filter(
            F.pmod(h, F.lit(SAMPLE_DENOM))
            < (frac * SAMPLE_DENOM).cast("long")
        )
        .drop("__mix_domain", "__domain_tokens")
    )


def temperature_mix(
    df: DataFrame,
    total_tokens: int,
    alpha: float = 0.7,
    domain_col: str = "lang",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Temperature-based domain mixture (the multilingual-pretraining
    sampler of mT5/XLM-R; ``alpha=1`` is proportional sampling,
    ``alpha→0`` approaches uniform-over-domains — UniMax-style tail
    boosting): each domain's token share of the ``total_tokens`` budget
    is ``p_d^alpha / Σ p^alpha`` where ``p_d`` is its natural token
    share, capped at one epoch of the domain (sampling is without
    replacement — a domain can contribute at most all of its tokens;
    re-spread of the clipped surplus is deliberately NOT done so the
    kept set stays NESTED under budget increases).

    Same determinism contract as :func:`token_budget_mix`: keep iff
    ``hash(seed, id) mod 1e6 < floor(frac·1e6)`` — rerun- and
    partitioning-invariant, md5 variant exactly replayable in SQL.

    Scale: one groupBy(domain) agg (|domains| rows), the normalizer
    computed over that tiny frame, broadcast back; the corpus itself is
    never shuffled."""
    from featureengineer_spark.operators.dedup import _md5_long

    totals = df.groupBy(F.col(domain_col).alias("__mix_domain")).agg(
        F.sum(token_col).alias("__domain_tokens")
    )
    w_expr = F.pow(F.col("__domain_tokens").cast("double"), F.lit(float(alpha)))
    weighted = totals.withColumn("__w", w_expr)
    norm = weighted.agg(F.sum("__w").alias("__wsum"))
    weighted = weighted.crossJoin(F.broadcast(norm))
    frac = F.least(
        F.lit(1.0),
        (F.col("__w") / F.col("__wsum"))
        * F.lit(float(total_tokens))
        / F.greatest(F.col("__domain_tokens"), F.lit(1)),
    )
    weighted = weighted.select(
        "__mix_domain", frac.alias("__frac")
    )
    if hash_fn == "xxhash64":
        h = F.xxhash64(F.lit(seed), F.col(id_col))
    elif hash_fn == "md5":
        h = _md5_long(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    return (
        df.join(
            F.broadcast(weighted),
            on=F.col(domain_col).eqNullSafe(F.col("__mix_domain")),
        )
        .filter(
            F.pmod(h, F.lit(SAMPLE_DENOM))
            < (F.col("__frac") * SAMPLE_DENOM).cast("long")
        )
        .drop("__mix_domain", "__frac")
    )


def with_chunks(
    df: DataFrame,
    text_col: str = "text",
    chunk_chars: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping fixed-size context chunking: one output row per
    (document, chunk) with ``chunk_idx``, ``chunk_text``, ``n_chunks`` —
    the context-window splitting step of a RAG / long-document training
    pipeline. Chunk ``i`` covers characters ``[i·step, i·step +
    chunk_chars)`` with ``step = chunk_chars − overlap``; every document
    emits at least one chunk (empty text → one empty chunk), and the
    last chunk is simply shorter.

    Pure JVM expressions (``sequence`` + ``explode`` + ``substring``) —
    whole-stage codegen, zero Python; output row count is
    Σ ceil((len−overlap)/step), so the explode is bounded by total
    character count / step."""
    if not 0 <= overlap < chunk_chars:
        raise ValueError(
            f"need 0 <= overlap < chunk_chars, got {overlap} / {chunk_chars}"
        )
    step = chunk_chars - overlap
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(t)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(step)).cast("long"), F.lit(1)
    )
    return (
        df.withColumn("__n_chunks", n_chunks)
        .select(
            "*",
            F.explode(F.sequence(F.lit(0), F.col("__n_chunks") - 1)).alias(
                "chunk_idx"
            ),
        )
        .withColumn(
            "chunk_text",
            F.substring(t, F.col("chunk_idx").cast("int") * step + 1, chunk_chars),
        )
        .withColumnRenamed("__n_chunks", "n_chunks")
    )


def render_conversations(
    df: DataFrame,
    entity_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
    role_sep: str = ": ",
) -> DataFrame:
    """Conversation → one training-text row: turns concatenated in
    ``idx_col`` order as ``role<role_sep>text`` joined by ``sep`` — the
    final render step before a chat corpus is tokenized/packed. Emits
    (entity, rendered, n_turns, n_chars).

    One aggregation: ``collect_list(struct(idx, line)) → array_sort →
    transform → array_join`` — the sort happens inside each group's
    collected array (deterministic, partitioning-independent), never as
    a global orderBy; shuffle bounded by |turns| then |conversations|."""
    line = F.struct(
        F.col(idx_col).cast("long").alias("i"),
        F.concat(
            F.coalesce(F.col(role_col), F.lit("")),
            F.lit(role_sep),
            F.coalesce(F.col(text_col), F.lit("")),
        ).alias("s"),
    )
    return (
        df.select(entity_col, line.alias("__line"))
        .groupBy(entity_col)
        .agg(F.array_sort(F.collect_list("__line")).alias("__lines"))
        .select(
            entity_col,
            F.array_join(
                F.transform("__lines", lambda x: x["s"]), sep
            ).alias("rendered"),
            F.size("__lines").cast("long").alias("n_turns"),
        )
        .withColumn("n_chars", F.length("rendered").cast("long"))
    )


def drop_repeated_turns(
    df: DataFrame,
    entity_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Transcript cleaning: drop a turn iff the IMMEDIATELY preceding
    turn of the same conversation (by ``idx_col``) has the same role and
    the same normalized text — the duplicated-message artifact retries
    and client resends leave in chat logs. Only consecutive repeats are
    dropped (a legitimately repeated message later in the conversation
    survives; use the dedup operators for corpus-level duplicates).

    One window lag per conversation — shuffle bounded by |turns|."""
    from pyspark.sql.window import Window

    from featureengineer_spark.operators.dedup import normalize_text

    w = Window.partitionBy(entity_col).orderBy(F.col(idx_col))
    norm = normalize_text(F.coalesce(F.col(text_col), F.lit("")))
    same = (
        (F.col(role_col).eqNullSafe(F.lag(F.col(role_col)).over(w)))
        & (norm == F.lag(norm).over(w))
    )
    return (
        df.withColumn("__rep", F.coalesce(same, F.lit(False)))
        .filter(~F.col("__rep"))
        .drop("__rep")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis-Spirakis A-ES scheme (IPL 2006): every row gets priority
    ``u^(1/w)`` for a uniform ``u``; the k largest priorities are a
    weighted sample without replacement. Here ``u`` derives from a
    seeded hash of the id, so the sample is a pure function of
    (seed, ids, weights): re-runs, retries, and repartitioning select
    exactly the same rows (the same property ``stratified_sample``
    guarantees), and quality-weighted subcorpus draws become
    reproducible artifacts instead of RNG lottery tickets.

    Ranking uses the monotone-equivalent key ``ln(u)/w`` (avoids the
    pow underflow at large weights). Rows with NULL, zero, or negative
    weight are never selected — A-ES is defined for positive weights.
    Returns the selected rows with their ``sample_rank`` (1 = highest
    priority). Scale shape: one map-side key projection + a global
    top-k (rank window over a k-bounded TakeOrdered-style sort) — at
    huge k prefer per-shard draws; the k here is a driver-chosen
    sample size, not the corpus.

    ``hash_fn='md5'`` makes u — and every selection verdict — replay
    byte-identically in DuckDB (graft of the reference's seeded
    subset draws, ``IVector.py:1090-1104``).
    """
    from featureengineer_spark.operators.dedup import _md5_long

    if hash_fn == "xxhash64":
        h = F.abs(F.xxhash64(F.lit(seed), F.col(id_col)))
        denom = float(1 << 63)
    elif hash_fn == "md5":
        h = _md5_long(
            F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
        )
        denom = float(1 << 60)
    else:
        raise ValueError(
            f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}"
        )
    # u in (0, 1]: (h + 1) / denom, never 0 so ln(u) is finite
    u = (h + F.lit(1).cast("double")) / F.lit(denom)
    w = F.col(weight_col).cast("double")
    keyed = df.filter(w.isNotNull() & (w > 0)).withColumn(
        "__aes_key", F.log(u) / w
    )
    # global sort+limit compiles to TakeOrderedAndProject — every task
    # keeps a k-bounded heap, no single-partition window over the
    # corpus; the rank window then runs over only k rows
    topk = keyed.orderBy(
        F.col("__aes_key").desc(), F.col(id_col).asc()
    ).limit(k)
    win = Window.orderBy(F.col("__aes_key").desc(), F.col(id_col).asc())
    return (
        topk.withColumn("sample_rank", F.row_number().over(win))
        .drop("__aes_key")
    )
