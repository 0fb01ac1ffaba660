"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content rides as a ``binary`` column with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` kernels. The decode step itself is STUBBED
(no image/audio libraries in this environment): ``fake_decode_features``
is a deterministic stand-in keyed on the payload bytes, and
``real_decode_features`` raises ``NotImplementedError`` behind an
import-try — the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) is real and tested.

This is the engine's generalization of the reference's audio scan →
MFCC front end (``FeaGet.py:171-285``): opaque per-item payload → fixed
per-item feature vector via a vectorized per-batch kernel.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

MEDIA_FEATURE_DIM = 16

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature_vec", T.ArrayType(T.DoubleType()), True),
    ]
)


def fake_decode_features(content: pd.Series, modality: pd.Series) -> np.ndarray:
    """Deterministic stand-in for decode + feature-extract: a fixed-dim
    vector derived from the payload bytes (per-batch vectorized). Swap in
    a real codec by passing a different ``decode_fn`` with the same
    signature — the Spark plumbing is unchanged."""
    out = np.zeros((len(content), MEDIA_FEATURE_DIM), dtype=np.float64)
    for i, (buf, mod) in enumerate(zip(content, modality)):
        if buf is None:
            continue
        arr = np.frombuffer(buf, dtype=np.uint8)
        if len(arr) == 0:
            continue
        chunks = np.array_split(arr.astype(np.float64), MEDIA_FEATURE_DIM - 2)
        out[i, : MEDIA_FEATURE_DIM - 2] = [c.mean() if len(c) else 0.0 for c in chunks]
        out[i, -2] = float(len(arr))
        # stable across processes (builtin hash() is salted per run)
        out[i, -1] = float(zlib.crc32(mod.encode()) % 997)
    return out


def real_decode_features(content: pd.Series, modality: pd.Series) -> np.ndarray:
    """Real decode path — requires image/audio codecs not present in this
    container. Gated behind import-try; raises with a clear message."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real media decode needs codec libraries (PIL/torchaudio/av) "
            "that are not installed; use fake_decode_features or install codecs"
        ) from e
    raise NotImplementedError("real decode not implemented in this environment")


def extract_media_features(
    df: DataFrame,
    decode_fn: Callable[[pd.Series, pd.Series], np.ndarray] = fake_decode_features,
    partitions: int | None = None,
) -> DataFrame:
    """media table → per-item feature vectors, Arrow-batched.

    Repartition by ``media_id`` hash spreads large payloads; each Arrow
    batch is decoded as one vectorized call. At cluster scale, payload
    bytes stay columnar Arrow buffers end-to-end (no per-row Python
    objects besides the decode loop the codec itself requires).
    """
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    prepped = df.repartition(parts, "media_id")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = decode_fn(pdf["content"], pdf["modality"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "modality": pdf["modality"].to_numpy(),
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature_vec": list(vecs),
                }
            )

    return prepped.mapInPandas(fn, schema=MEDIA_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling plumbing for video rows: explode a frame index grid
    from metadata (decode of the actual frame bytes is the stubbed step).
    Pure JVM explode — the 1→N expansion shape of the reference's frame
    loop (``FeaGet.py:211-232``)."""
    n = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    return df.select(
        id_col,
        "modality",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    ).filter(F.col("modality") == "video")


def resize_media(
    df: DataFrame,
    target_width: int = 224,
    target_height: int = 224,
    resize_fn: Callable | None = None,
) -> DataFrame:
    """Resize plumbing for image rows: Arrow-batched ``mapInPandas``
    preserving the media schema with updated (width, height) metadata.

    The pixel-level resample itself is the STUBBED step (no codec in
    this container): the default ``resize_fn`` deterministically
    subsamples payload bytes to a size proportional to the target area —
    the Spark-side contract (schema, batching, metadata rewrite) is real;
    swap in a PIL/av-backed ``resize_fn`` with the same signature to get
    true resampling.
    """

    def _fake_resize(buf: bytes, w0, h0) -> bytes:
        if buf is None:
            return None
        arr = np.frombuffer(buf, dtype=np.uint8)
        src_area = max((w0 or 1) * (h0 or 1), 1)
        keep = max(int(len(arr) * min(target_width * target_height / src_area, 1.0)), 1)
        stride = max(len(arr) // keep, 1)
        return arr[::stride][:keep].tobytes()

    fn_resize = resize_fn or _fake_resize

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            is_img = pdf["modality"].to_numpy() == "image"
            metas = []
            contents = []
            for img, content, meta in zip(is_img, pdf["content"], pdf["meta"]):
                if not img:
                    contents.append(content)
                    metas.append(meta)
                    continue
                m = dict(meta) if meta is not None else {}
                contents.append(fn_resize(content, m.get("width"), m.get("height")))
                m["width"], m["height"] = target_width, target_height
                metas.append(m)
            out = pdf.copy()
            out["content"] = contents
            out["meta"] = metas
            yield out

    return df.mapInPandas(fn, schema=MEDIA_SCHEMA)
