"""Multimodal plumbing: schema, batch shape, deterministic stub decode."""

from __future__ import annotations

import numpy as np
import pytest

from featureengineer_spark.operators.multimodal import (
    MEDIA_FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_media_features,
    real_decode_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(50):
        mod = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.integers(0, 256, size=int(rng.integers(10, 500))).tolist())
        meta = (64, 64, None, None, "image/png")
        if mod == "audio":
            meta = (None, None, 16000, None, "audio/wav")
        if mod == "video":
            meta = (320, 240, None, 100, "video/mp4")
        rows.append((i, mod, payload, meta))
    rows.append((99, "image", None, (None, None, None, None, None)))  # null payload
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA).cache()


def test_extract_media_features_shape_and_determinism(spark, media):
    a = extract_media_features(media).toPandas().sort_values("media_id")
    b = extract_media_features(media, partitions=3).toPandas().sort_values("media_id")
    assert len(a) == media.count()
    assert all(len(v) == MEDIA_FEATURE_DIM for v in a["feature_vec"])
    np.testing.assert_allclose(
        np.vstack(a["feature_vec"].to_numpy()),
        np.vstack(b["feature_vec"].to_numpy()),
        rtol=1e-12,
    )
    null_row = a[a["media_id"] == 99].iloc[0]
    assert null_row["n_bytes"] == 0
    assert np.allclose(null_row["feature_vec"], 0.0)


def test_fake_decode_matches_naive_per_row_reference(media):
    """The vectorized reduceat kernel must equal a literal per-row
    array_split implementation (the semantics the DuckDB oracle mirrors)."""
    import pandas as pd

    from featureengineer_spark.operators.multimodal import (
        MODALITIES,
        fake_decode_features,
    )

    pdf = media.toPandas().sort_values("media_id")
    got = fake_decode_features(pdf["content"], pdf["modality"])
    k = MEDIA_FEATURE_DIM - 2
    exp = np.zeros((len(pdf), MEDIA_FEATURE_DIM))
    for i, (buf, mod) in enumerate(zip(pdf["content"], pdf["modality"])):
        if buf is None or len(buf) == 0:
            continue
        arr = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
        for j, c in enumerate(np.array_split(arr, k)):
            exp[i, j] = c.mean() if len(c) else 0.0
        exp[i, k] = float(len(arr))
        exp[i, k + 1] = float(MODALITIES.index(mod)) if mod in MODALITIES else -1.0
    np.testing.assert_allclose(got, exp, rtol=0, atol=1e-12)


def test_arrow_and_pandas_decode_paths_agree(spark, media):
    """mapInArrow default path == mapInPandas custom-fn path, including a
    multi-partition layout that slices the Arrow arrays."""
    from featureengineer_spark.operators.multimodal import fake_decode_features

    a = extract_media_features(media).toPandas().sort_values("media_id")
    b = (
        extract_media_features(media, decode_fn=fake_decode_features, partitions=5)
        .toPandas()
        .sort_values("media_id")
    )
    np.testing.assert_allclose(
        np.vstack(a["feature_vec"].to_numpy()),
        np.vstack(b["feature_vec"].to_numpy()),
        rtol=0,
        atol=1e-12,
    )
    assert (a["n_bytes"].to_numpy() == b["n_bytes"].to_numpy()).all()


def test_resize_arrow_matches_per_row_stub(spark, media):
    """Default vectorized resize == a literal per-row arr[::stride][:keep]."""
    tw = th = 32
    out = {
        r["media_id"]: r for r in resize_media_import()(media, tw, th).collect()
    }
    src = {r["media_id"]: r for r in media.collect()}
    for mid, row in src.items():
        exp = row["content"]
        if row["modality"] == "image" and exp is not None:
            arr = np.frombuffer(exp, dtype=np.uint8)
            m = row["meta"]
            area = max((m["width"] or 1) * (m["height"] or 1), 1)
            keep = max(int(len(arr) * min(tw * th / area, 1.0)), 1)
            stride = max(len(arr) // keep, 1)
            exp = arr[::stride][:keep].tobytes()
        got = out[mid]["content"]
        got = bytes(got) if got is not None else None
        assert got == exp, f"media_id={mid}"


def resize_media_import():
    from featureengineer_spark.operators.multimodal import resize_media

    return resize_media


def test_real_decode_is_cleanly_stubbed(media):
    import pandas as pd

    with pytest.raises(NotImplementedError, match="codec"):
        real_decode_features(pd.Series([b"x"]), pd.Series(["image"]))


def test_sample_frames_grid(spark, media):
    frames = sample_frames(media, every_n=10).toPandas()
    vids = media.filter("modality = 'video'").count()
    assert set(frames["modality"]) == {"video"}
    assert len(frames) == vids * 10  # 100 frames sampled every 10
    assert frames.groupby("media_id")["frame_idx"].max().eq(90).all()


def test_resize_media_updates_meta_and_shrinks(spark):
    from featureengineer_spark.operators.multimodal import MEDIA_SCHEMA, resize_media

    rows = [
        (1, "image", bytes(range(256)) * 40, (64, 64, None, None, "image/raw")),
        (2, "audio", b"\x01\x02" * 100, (None, None, 16000, None, "audio/raw")),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in resize_media(df, 32, 32).collect()}
    img = out[1]
    assert img["meta"]["width"] == 32 and img["meta"]["height"] == 32
    assert len(img["content"]) < 256 * 40  # subsampled payload
    aud = out[2]
    assert aud["meta"]["sample_rate"] == 16000  # non-image untouched
    assert bytes(aud["content"]) == b"\x01\x02" * 100


def test_resize_fn_gets_source_dims_and_only_image_rows(spark):
    """Custom-codec regression: resize_fn must receive the ORIGINAL
    width/height (meta is rewritten to target dims before the batch),
    and must never be invoked on audio/video/null-content rows."""
    from featureengineer_spark.operators.multimodal import MEDIA_SCHEMA, resize_media

    rows = [
        (1, "image", b"\xaa" * 100, (64, 48, None, None, "image/raw")),
        (2, "audio", b"\x01\x02" * 50, (None, None, 16000, None, "audio/raw")),
        (3, "image", None, (10, 10, None, None, "image/raw")),
        (4, "video", b"\x07" * 30, (320, 240, None, 100, "video/raw")),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)

    def fake_codec(buf, w0, h0):
        # a codec that scales by source area; blows up on non-image input
        assert buf is not None and w0 is not None and h0 is not None
        return bytes([int(w0) % 256, int(h0) % 256]) + bytes(buf[:4])

    out = {r["media_id"]: r for r in resize_media(df, 32, 32, resize_fn=fake_codec).collect()}
    # image row: codec saw SOURCE dims (64, 48), not target (32, 32)
    assert bytes(out[1]["content"])[:2] == bytes([64, 48])
    assert out[1]["meta"]["width"] == 32 and out[1]["meta"]["height"] == 32
    # audio/video/null rows pass through untouched, codec never called on them
    assert bytes(out[2]["content"]) == b"\x01\x02" * 50
    assert out[3]["content"] is None
    assert bytes(out[4]["content"]) == b"\x07" * 30


def test_chunk_means_adversarial_lengths():
    """Every payload length 0..3k+1 must match per-row array_split means
    exactly — the reduceat boundary bug class (empty trailing segments,
    sentinel clipping) lives at these edges."""
    import numpy as np

    from featureengineer_spark.operators.multimodal import _chunk_means

    k = 14
    rng = np.random.default_rng(0)
    payloads = [rng.integers(0, 256, size=n).astype(np.uint8) for n in range(0, 3 * k + 2)]
    lens = np.array([len(p) for p in payloads], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    data = np.concatenate(payloads) if lens.sum() else np.empty(0, np.uint8)
    got = _chunk_means(offsets, data, k)
    for i, p in enumerate(payloads):
        exp = np.zeros(k)
        if len(p):
            for j, c in enumerate(np.array_split(p.astype(np.float64), k)):
                exp[j] = c.mean() if len(c) else 0.0
        np.testing.assert_allclose(got[i], exp, rtol=0, atol=1e-12, err_msg=f"len={len(p)}")
