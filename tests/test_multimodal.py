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


def test_wav_pcm_roundtrip_vs_stdlib_writer():
    """_parse_wav_pcm must recover exactly what the stdlib `wave` module
    wrote — 16-bit mono, 16-bit stereo (downmixed by channel mean), and
    8-bit unsigned (bias 128)."""
    import io
    import wave

    import numpy as np

    from featureengineer_spark.operators.multimodal import _parse_wav_pcm

    rng = np.random.default_rng(7)
    mono = rng.integers(-32768, 32768, size=501).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        w.writeframes(mono.tobytes())
    np.testing.assert_array_equal(_parse_wav_pcm(buf.getvalue()), mono.astype(np.float64))

    stereo = rng.integers(-32768, 32768, size=(200, 2)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2); w.setsampwidth(2); w.setframerate(8000)
        w.writeframes(stereo.tobytes())
    np.testing.assert_allclose(
        _parse_wav_pcm(buf.getvalue()), stereo.astype(np.float64).mean(axis=1)
    )

    u8 = rng.integers(0, 256, size=77).astype(np.uint8)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(1); w.setframerate(8000)
        w.writeframes(u8.tobytes())
    np.testing.assert_array_equal(
        _parse_wav_pcm(buf.getvalue()), u8.astype(np.float64) - 128.0
    )


def test_pnm_decode_variants():
    import numpy as np

    from featureengineer_spark.operators.multimodal import _parse_pnm, synth_pgm

    # binary PGM with a comment line in the header
    pix = np.arange(12, dtype=np.uint8)
    buf = b"P5\n# a comment\n4 3\n255\n" + pix.tobytes()
    np.testing.assert_array_equal(_parse_pnm(buf), pix.astype(np.float64))
    # binary PPM downmixes RGB by pixel mean
    rgb = np.arange(4 * 3, dtype=np.uint8)
    buf = b"P6 2 2 255 " + rgb.tobytes()
    np.testing.assert_allclose(
        _parse_pnm(buf), rgb.reshape(-1, 3).astype(np.float64).mean(axis=1)
    )
    # ASCII PGM
    buf = b"P2\n3 1\n255\n10 20 30\n"
    np.testing.assert_array_equal(_parse_pnm(buf), [10.0, 20.0, 30.0])
    # deterministic generator parses back to its formula
    got = _parse_pnm(synth_pgm(42, 5, 4))
    exp = (42 * 31 + np.arange(20) * 7) % 256
    np.testing.assert_array_equal(got, exp.astype(np.float64))


def test_real_decode_features_end_to_end(spark):
    """extract_media_features(decode_fn=real_decode_features) over
    synthetic WAV + PGM payloads: chunk means over DECODED values match
    a per-row numpy oracle; unknown magic raises NotImplementedError."""
    import numpy as np
    import pandas as pd

    from featureengineer_spark.operators.multimodal import (
        MEDIA_FEATURE_DIM,
        MEDIA_SCHEMA,
        extract_media_features,
        real_decode_features,
        synth_pgm,
        synth_wav_pcm16,
    )

    k = MEDIA_FEATURE_DIM - 2
    rows, expected = [], {}
    for mid in range(1, 9):
        if mid % 2:
            payload = synth_wav_pcm16(mid, mid * 13 + 5)
            vals = (mid * 2654435761 + np.arange(mid * 13 + 5) * 40503) % 65536 - 32768
            modality = "audio"
        else:
            w, h = mid % 5 + 2, mid % 3 + 2
            payload = synth_pgm(mid, w, h)
            vals = (mid * 31 + np.arange(w * h) * 7) % 256
            modality = "image"
        rows.append((mid, modality, payload, (None, None, None, None, None)))
        expected[mid] = np.array(
            [c.mean() if len(c) else 0.0 for c in np.array_split(vals.astype(float), k)]
            + [float(len(vals)), 1.0 if modality == "audio" else 0.0]
        )
    rows.append((99, "audio", None, (None, None, None, None, None)))  # null → zeros
    expected[99] = np.zeros(MEDIA_FEATURE_DIM)

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r["media_id"]: np.array(r["feature_vec"])
        for r in extract_media_features(df, decode_fn=real_decode_features).collect()
    }
    for mid, exp in expected.items():
        np.testing.assert_allclose(out[mid], exp, err_msg=f"media_id={mid}")

    with pytest.raises(NotImplementedError, match="codec"):
        real_decode_features(pd.Series([b"\xff\xd8JPEG..."]), pd.Series(["image"]))


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


def test_bmp_decode_variants():
    """Uncompressed-BMP decoder: bottom-up stride-padded 24-bit roundtrip
    against the synth formula, hand-built top-down and 8-bit-palette
    variants, and clean rejection of compressed/unsupported forms."""
    import numpy as np
    import pytest

    from featureengineer_spark.operators.multimodal import _parse_bmp, synth_bmp

    for mid, w, h in [(3, 10, 7), (99, 4, 4), (7, 13, 1), (0, 1, 1)]:
        x = _parse_bmp(synth_bmp(mid, w, h))
        i = np.arange(w * h)
        np.testing.assert_array_equal(x, ((mid * 17 + i * 11) % 256).astype(float))

    def hdr24(w, h, raster_len, bits=24, compression=0, n_colors=0, off=54):
        return (
            b"BM" + (off + raster_len).to_bytes(4, "little")
            + (0).to_bytes(4, "little") + off.to_bytes(4, "little")
            + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little") + h.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little") + bits.to_bytes(2, "little")
            + compression.to_bytes(4, "little") + raster_len.to_bytes(4, "little")
            + (2835).to_bytes(4, "little") * 2
            + n_colors.to_bytes(4, "little") + (0).to_bytes(4, "little")
        )

    # top-down (negative height): rows arrive in image order, no flip
    w, h = 5, 3
    i = np.arange(w * h)
    v = ((85 + i * 11) % 256).astype(np.uint8).reshape(h, w)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = np.repeat(v, 3, axis=1)
    got = _parse_bmp(hdr24(w, -h, h * stride) + rows.tobytes())
    np.testing.assert_array_equal(got, (85 + i * 11) % 256)

    # 8-bit palette: indices resolve through BGRA palette channel means
    w, h = 6, 2
    pal = np.zeros((256, 4), dtype=np.uint8)
    pal[:, :3] = np.arange(256)[:, None]
    idx = ((np.arange(w * h) * 13) % 256).astype(np.uint8).reshape(h, w)
    stride8 = (w + 3) // 4 * 4
    rows8 = np.zeros((h, stride8), dtype=np.uint8)
    rows8[:, :w] = idx[::-1]
    got = _parse_bmp(
        hdr24(w, h, h * stride8, bits=8, n_colors=256, off=54 + 1024)
        + pal.tobytes() + rows8.tobytes()
    )
    np.testing.assert_array_equal(got, (np.arange(w * h) * 13) % 256)

    with pytest.raises(NotImplementedError, match="biCompression"):
        _parse_bmp(hdr24(4, 4, 64, compression=1) + b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="32-bit"):
        _parse_bmp(hdr24(4, 4, 64, bits=32) + b"\x00" * 64)
    with pytest.raises(ValueError, match="not a BMP"):
        _parse_bmp(b"XX" + b"\x00" * 60)
    with pytest.raises(ValueError, match="truncated"):
        _parse_bmp(hdr24(8, 8, 0))
