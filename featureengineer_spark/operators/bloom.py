"""Bloom-filter ingest gate: memory-bounded probabilistic dedup.

An incremental crawl ingest wants to ask "have we EVER seen this key?"
against billions of historical keys without joining the history. The
published answer is a Bloom filter (Bloom 1970; double hashing per
Kirsch-Mitzenmacher 2006): m bits + k derived positions per key, no
false negatives, tunable false-positive rate (1−e^{−kn/m})^k. The
filter for 10⁹ keys at 1% FP is ~1.2 GB — broadcastable — while the
exact first-seen join (``dedup.near_dedup_incremental``'s exact tier)
must shuffle the store. This gate is the cheap FIRST tier: definitely-
new rows skip the expensive store join entirely; only might-contain
rows (a few percent) go on to the exact check.

Scale shape: the build is one pass — per-partition numpy bitmaps
OR-reduced treewise via RDD ``treeReduce`` (the driver receives
O(log partitions) arrays of m/8 bytes, never positions); the probe
side computes positions JVM-side (md5 double hashing, byte-identical
in DuckDB) and tests bits in a vectorized Arrow batch against the
broadcast bitmap — no per-row Python hashing.

Reference analog: the reference gates repeat feature extraction with
driver-side ``os.path.exists`` manifests (``FeaGet.py:117-125``); the
Bloom bitmap is that manifest made constant-size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featureengineer_spark.operators.dedup import _md5_long

DEFAULT_M_BITS = 1 << 23  # 1 MiB bitmap
DEFAULT_K = 5


def bloom_positions(
    col: F.Column, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K,
    seed: int = 42,
) -> F.Column:
    """Array of ``k`` bit positions for a key expression — double
    hashing ``g_i = (h1 + i·h2) mod m`` over two seeded 60-bit md5
    prefixes. Pure built-in expressions: replays byte-identically in
    DuckDB, and the probe side never runs Python to hash."""
    h1 = _md5_long(F.concat(F.lit(f"{seed}:"), col))
    h2 = _md5_long(F.concat(F.lit(f"{seed + 1}:"), col))
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.pmod(h1 + i * h2, F.lit(m_bits)),
    )


def build_bloom(
    df: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    seed: int = 42,
) -> bytes:
    """One-pass Bloom bitmap over ``df[key_col]`` (null keys are
    skipped). Per-partition numpy bitmaps are OR-combined with
    ``treeReduce`` so the driver cost is O(m), independent of row
    count and of partition count beyond the tree fan-in."""
    pos_df = df.select(
        F.explode(
            bloom_positions(F.col(key_col), m_bits, k, seed)
        ).alias("pos")
    ).filter(F.col("pos").isNotNull())

    n_bytes = (m_bits + 7) // 8

    def part_bitmap(batches):
        bm = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            p = pdf["pos"].to_numpy(dtype=np.int64)
            np.bitwise_or.at(bm, p >> 3, (1 << (p & 7)).astype(np.uint8))
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    parts = pos_df.mapInPandas(part_bitmap, schema="bm binary").rdd.map(
        lambda r: np.frombuffer(r.bm, dtype=np.uint8)
    )
    if parts.isEmpty():
        return np.zeros(n_bytes, dtype=np.uint8).tobytes()
    merged = parts.treeReduce(np.bitwise_or)
    return merged.tobytes()


def with_bloom_flag(
    df: DataFrame,
    key_col: str,
    bloom: bytes,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    seed: int = 42,
    out_col: str = "might_contain",
) -> DataFrame:
    """Boolean ``out_col``: True iff every one of the key's ``k`` bits
    is set in ``bloom`` (possible duplicate — no false negatives).
    Positions are computed JVM-side; the bit test is one vectorized
    Arrow batch against the broadcast bitmap."""
    sc = df.sparkSession.sparkContext
    b_bloom = sc.broadcast(np.frombuffer(bloom, dtype=np.uint8))

    @F.pandas_udf("boolean")
    def _test(pos: pd.Series) -> pd.Series:
        bm = b_bloom.value
        out = np.empty(len(pos), dtype=bool)
        for i, arr in enumerate(pos):
            # a NULL key yields a null positions array (conditional
            # projection still feeds the row through the UDF)
            if arr is None:
                out[i] = False
                continue
            p = np.asarray(arr)
            if p.dtype.kind not in "iu":
                out[i] = False
                continue
            out[i] = bool(
                np.all((bm[p >> 3] >> (p & 7).astype(np.uint8)) & 1)
            )
        return pd.Series(out)

    return df.withColumn(
        out_col,
        F.when(F.col(key_col).isNull(), F.lit(False)).otherwise(
            _test(bloom_positions(F.col(key_col), m_bits, k, seed))
        ),
    )


def bloom_gate(
    corpus: DataFrame,
    incoming: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    seed: int = 42,
) -> DataFrame:
    """Rows of ``incoming`` whose key is DEFINITELY absent from
    ``corpus`` (Bloom has no false negatives, so nothing genuinely new
    is lost; a tunable few percent of new rows are false-positive
    suspects and should fall through to an exact check)."""
    bloom = build_bloom(corpus, key_col, m_bits, k, seed)
    flagged = with_bloom_flag(
        incoming, key_col, bloom, m_bits, k, seed, "__bloom_hit"
    )
    return flagged.filter(~F.col("__bloom_hit")).drop("__bloom_hit")
