"""Deterministic synthetic transcript tables.

The reference builds its input spine from NIST SRE key archaeology
(``PrepareData.py``); our engine's input is the transcript table fixed by
``BASELINE.json:input_hint``::

    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

Two generators, both seeded and fully deterministic:

* :func:`synth_transcripts_pandas` — small scale, used as the golden
  fixture the single-node pandas oracle runs on.
* :func:`synth_transcripts_spark` — distributed via ``spark.range`` +
  hash-derived columns, no driver materialization; scales to 10^7+ turns
  locally and arbitrarily on a cluster (the 10^12-turn design point just
  raises ``n_convs``).

Skew is deliberate (graft of the reference's "very long signals" batching,
``FeaGet.py:211-217``): conversation lengths follow a Zipf-ish law plus a
few mega-conversations; ``tool`` is sparse (~10% non-null); inter-turn
gaps mix seconds-scale deltas with rare > idle-timeout gaps (exercises
sessionization) and duplicate-``ts`` pairs exist across conversations
(exercises stable tie-breaks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

ROLES = np.array(["user", "assistant", "system", "tool"])
ROLE_P = np.array([0.45, 0.45, 0.05, 0.05])
TOOLS = np.array(["bash", "search", "read", "edit"])
_WORDS = np.array(
    "the a spark window merge join sort agg batch stream table scan filter "
    "row column vector hash key value query part order data slow fast big "
    "small group line dup".split()
)
BASE_TS = np.datetime64("2024-01-01T00:00:00", "us")


def _conv_lengths(n_convs: int, rng: np.random.Generator, mega: int, mega_len: int) -> np.ndarray:
    # Zipf-ish: most convs 5-50 turns, heavy tail, plus `mega` giants.
    ln = np.clip((rng.pareto(1.5, n_convs) + 1.0) * 8.0, 5, 2000).astype(np.int64)
    ln[:mega] = mega_len
    if n_convs > mega:
        ln[mega] = 2  # one conv shorter than every test window (edge case)
    return ln


def synth_transcripts_pandas(
    n_convs: int = 60,
    seed: int = 7,
    mega: int = 1,
    mega_len: int = 800,
    idle_timeout_s: float = 1800.0,
) -> pd.DataFrame:
    """Small golden fixture; ~a few thousand turns."""
    rng = np.random.default_rng(seed)
    lengths = _conv_lengths(n_convs, rng, mega, mega_len)
    total = int(lengths.sum())

    conv = np.repeat(np.arange(n_convs), lengths)
    conv_id = np.char.add("conv_", conv.astype(str))
    turn_idx = np.concatenate([np.arange(n) for n in lengths]).astype(np.int32)

    role = rng.choice(ROLES, size=total, p=ROLE_P)
    n_words = rng.integers(0, 40, size=total)
    # deterministic pseudo-text: sample word ids then join
    word_ids = rng.integers(0, len(_WORDS), size=int(n_words.sum()))
    texts = np.empty(total, dtype=object)
    pos = 0
    for i, k in enumerate(n_words):
        texts[i] = " ".join(_WORDS[word_ids[pos : pos + k]])
        pos += k

    tool = np.where(rng.random(total) < 0.10, rng.choice(TOOLS, size=total), None)

    # gaps: mostly 1-120 s; ~2% are > idle timeout (session split)
    gaps = rng.uniform(1.0, 120.0, size=total)
    big = rng.random(total) < 0.02
    gaps[big] = idle_timeout_s * rng.uniform(1.1, 3.0, size=int(big.sum()))
    gaps[turn_idx == 0] = 0.0
    # per-conv start offsets are multiples of 1s so duplicate ts across
    # convs happen; truncate gaps to whole ms for cross-conv ts collisions
    starts = rng.integers(0, 3600, size=n_convs)[conv].astype("float64")
    offs = starts + np.concatenate(
        [np.cumsum(np.floor(g * 1000.0) / 1000.0) for g in np.split(gaps, np.cumsum(lengths)[:-1])]
    )
    ts = BASE_TS + (offs * 1_000_000).astype("timedelta64[us]")

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": ts.astype("datetime64[us]"),
        }
    )


def synth_anchors_pandas(transcripts: pd.DataFrame, seed: int = 11, per_conv: int = 3) -> pd.DataFrame:
    """Point-in-time probe table: (conv_id, anchor_ts) incl. boundary cases."""
    rng = np.random.default_rng(seed)
    rows: list[tuple[str, np.datetime64]] = []
    for conv_id, g in transcripts.groupby("conv_id", sort=True):
        tvals = g["ts"].to_numpy()
        lo, hi = tvals.min(), tvals.max()
        rows.append((conv_id, lo - np.timedelta64(1, "s")))  # before first → null match
        rows.append((conv_id, tvals[rng.integers(0, len(tvals))]))  # exactly at a turn
        rows.append((conv_id, hi + np.timedelta64(60, "s")))  # after last
        for _ in range(per_conv):
            span = (hi - lo) / np.timedelta64(1, "us")
            rows.append((conv_id, lo + np.timedelta64(int(rng.uniform(0, max(span, 1))), "us")))
    rows.append(("conv_missing", np.datetime64("2024-01-02T00:00:00", "us")))  # no such conv
    df = pd.DataFrame(rows, columns=["conv_id", "anchor_ts"])
    df["anchor_ts"] = df["anchor_ts"].astype("datetime64[us]")
    return df


def synth_transcripts_spark(
    spark: SparkSession,
    n_convs: int = 10_000,
    avg_turns: int = 30,
    mega: int = 3,
    mega_len: int = 200_000,
    seed: int = 7,
    idle_timeout_s: float = 1800.0,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic generator — no driver-side materialization.

    Every column is a pure function of ``(conv, turn_idx, seed)`` via
    ``xxhash64``, so the same arguments always produce the same table on
    any cluster size (the scale-invariance the reference gets from
    identical math across Pool/MPI backends, ``IVector.py:1023-1053``).
    """
    parts = partitions or spark.sparkContext.defaultParallelism
    convs = spark.range(0, n_convs, 1, parts).withColumnRenamed("id", "conv")
    h = lambda *cols: F.abs(F.xxhash64(F.lit(seed), *cols))  # noqa: E731

    # Zipf-ish lengths via inverse-CDF of pareto on a uniform hash draw.
    u = (h(F.col("conv"), F.lit("len")) % 1_000_000) / 1_000_000.0 + 1e-9
    pareto = (F.pow(u, F.lit(-1.0 / 1.5)) - 1.0 + 1.0) * 8.0
    length = F.least(F.greatest(pareto.cast("long"), F.lit(5)), F.lit(2000))
    length = F.when(F.col("conv") < mega, F.lit(mega_len)).otherwise(length)
    convs = convs.withColumn("n_turns", length).withColumn(
        "start_s", (h(F.col("conv"), F.lit("start")) % 3600).cast("double")
    )

    t = convs.select(
        "conv",
        "start_s",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    hh = h(F.col("conv"), F.col("turn_idx"), F.lit("g"))
    gap = 1.0 + (hh % 119_000) / 1000.0  # 1..120 s
    gap = F.when(
        (h(F.col("conv"), F.col("turn_idx"), F.lit("big")) % 100) < 2,
        F.lit(idle_timeout_s) * (1.1 + (hh % 1900) / 1000.0),
    ).otherwise(gap)
    gap = F.when(F.col("turn_idx") == 0, F.lit(0.0)).otherwise(gap)
    t = t.withColumn("gap_s", F.floor(gap * 1000) / 1000.0)

    w = Window.partitionBy("conv").orderBy("turn_idx").rowsBetween(Window.unboundedPreceding, 0)
    off = F.col("start_s") + F.sum("gap_s").over(w)
    rh = h(F.col("conv"), F.col("turn_idx"), F.lit("r")) % 100
    role = (
        F.when(rh < 45, "user").when(rh < 90, "assistant").when(rh < 95, "system").otherwise("tool")
    )
    th = h(F.col("conv"), F.col("turn_idx"), F.lit("t")) % 100
    tool = F.when(th < 10, F.element_at(F.array(*[F.lit(x) for x in TOOLS]), (th % 4 + 1).cast("int")))
    n_words = (h(F.col("conv"), F.col("turn_idx"), F.lit("nw")) % 40).cast("int")
    words = F.array(*[F.lit(w_) for w_ in _WORDS])
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.element_at(
                words,
                (F.abs(F.xxhash64(F.lit(seed), F.col("conv"), F.col("turn_idx"), i)) % len(_WORDS) + 1).cast("int"),
            ),
        ),
        " ",
    )

    return t.select(
        F.concat(F.lit("conv_"), F.col("conv")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.timestamp_micros((off * 1_000_000).cast("long") + F.lit(1704067200_000000)).alias("ts"),
    )
