"""Multimodal real decoders (numpy/stdlib): BMP, PPM/PGM, WAV, frame
container — roundtrip goldens plus the Spark-side feature/resize/sample
operators over them."""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np
import pytest

from apache___solr_spark.pipeline.multimodal import (
    decode_bmp,
    decode_frames,
    decode_image,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_frames,
    encode_png,
    encode_ppm,
    encode_wav,
    extract_audio_features,
    extract_image_features,
    resize_images,
    resize_nearest,
    sample_video_frames,
)


def _rgb(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_bmp_roundtrip_exact():
    for h, w in [(1, 1), (3, 5), (7, 2), (16, 16)]:  # odd widths hit padding
        px = _rgb(h, w, seed=h * 31 + w)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_ppm_pgm_roundtrip_exact():
    px = _rgb(4, 6, seed=9)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)
    gray = px[:, :, 0]
    assert np.array_equal(decode_ppm(encode_ppm(gray)), gray)


def test_decode_image_luma_and_dispatch():
    px = np.zeros((2, 2, 3), np.uint8)
    px[0, 0] = (255, 255, 255)
    g = decode_image(encode_bmp(px), "image/bmp")
    assert g.shape == (2, 2) and g.dtype == np.float32
    assert math.isclose(float(g[0, 0]), 1.0, rel_tol=1e-5)
    assert float(g[1, 1]) == 0.0
    # ppm and png dispatch by magic bytes, no mime needed
    assert decode_image(encode_ppm(px)).shape == (2, 2)
    assert decode_image(encode_png(px)).shape == (2, 2)
    # baseline JPEG now decodes for real (pipeline/jpeg.py); a corrupt
    # stream raises, and unknown formats still refuse honestly
    from apache___solr_spark.pipeline.jpeg import encode_jpeg

    jg = decode_image(encode_jpeg(px, quality=95), "image/jpeg")
    assert jg.shape == (2, 2) and jg.dtype == np.float32
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0junk", "image/jpeg")
    with pytest.raises(NotImplementedError, match="decoder"):
        decode_image(b"\x00\x00unknown", "application/octet-stream")


def test_png_roundtrip_exact():
    for shape in [(1, 1, 3), (3, 5, 3), (7, 2, 4), (16, 16, 3)]:
        rng = np.random.default_rng(sum(shape))
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px)
    gray = _rgb(6, 9, seed=3)[:, :, 0]
    assert np.array_equal(decode_png(encode_png(gray)), gray)


def test_png_all_filter_types_and_palette():
    """Decode a hand-filtered PNG exercising every spec filter (0-4) and a
    palette (color type 3) image — the paths a filter-0-only encoder
    roundtrip can't reach."""
    rng = np.random.default_rng(11)
    h, w, ch = 6, 8, 3
    px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    raw = bytearray()
    prior = np.zeros(w * ch, np.int32)
    for y in range(h):  # row y uses filter y % 5
        cur = px[y].reshape(-1).astype(np.int32)
        f = y % 5
        raw.append(f)
        line = cur.copy()
        for x in range(len(cur)):
            a = int(cur[x - ch]) if x >= ch else 0
            b = int(prior[x])
            c = int(prior[x - ch]) if x >= ch else 0
            if f == 1:
                line[x] = (cur[x] - a) & 0xFF
            elif f == 2:
                line[x] = (cur[x] - b) & 0xFF
            elif f == 3:
                line[x] = (cur[x] - (a + b) // 2) & 0xFF
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (cur[x] - pred) & 0xFF
        raw += bytes(line.astype(np.uint8))
        prior = cur

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    png = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), px)

    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (4, 7), dtype=np.uint8)
    raw2 = b"".join(b"\x00" + bytes(idx[y]) for y in range(4))
    png2 = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 4, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte.tobytes())
        + chunk(b"IDAT", zlib.compress(raw2))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png2), plte[idx])


def test_resize_nearest_shapes():
    px = _rgb(10, 20, seed=3)
    small = resize_nearest(px, 5, 4)
    assert small.shape == (5, 4, 3)
    # upscale keeps exact source values (pure index arithmetic)
    up = resize_nearest(px, 20, 40)
    assert np.array_equal(up[::2, ::2], px)


def test_wav_roundtrip_and_features():
    rate = 8000
    t = np.arange(rate, dtype=np.float64) / rate
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    s, r = decode_wav(encode_wav(tone, rate))
    assert r == rate and len(s) == rate
    assert float(np.abs(s - tone).max()) < 1e-3  # 16-bit quantization
    # 8-bit path
    s8, _ = decode_wav(encode_wav(tone, rate, sampwidth=1))
    assert float(np.abs(s8 - tone).max()) < 2e-2


def test_extract_audio_features_spark(spark):
    rate = 8000
    t = np.arange(rate, dtype=np.float64) / rate
    clips = [
        (1, encode_wav(np.sin(2 * np.pi * 440.0 * t), rate)),   # A4 tone
        (2, encode_wav(np.sin(2 * np.pi * 1760.0 * t), rate)),  # A6 tone
        (3, encode_wav(np.zeros(rate // 2), rate)),             # silence
    ]
    df = spark.createDataFrame(clips, "media_id long, content binary")
    rows = {r["media_id"]: r.asDict() for r in extract_audio_features(df).collect()}
    assert math.isclose(rows[1]["duration_sec"], 1.0, rel_tol=1e-9)
    assert math.isclose(rows[3]["duration_sec"], 0.5, rel_tol=1e-9)
    # sine RMS = 1/sqrt(2)
    assert math.isclose(rows[1]["rms"], 1 / math.sqrt(2), rel_tol=1e-2)
    assert rows[3]["rms"] == 0.0
    # spectral centroid tracks the tone frequency
    assert abs(rows[1]["spectral_centroid_hz"] - 440.0) < 25.0
    assert abs(rows[2]["spectral_centroid_hz"] - 1760.0) < 25.0
    # zcr of the higher tone is ~4x the lower
    assert rows[2]["zero_crossing_rate"] > 3 * rows[1]["zero_crossing_rate"]


def test_image_features_real_decode_spark(spark):
    imgs = [
        (1, encode_bmp(_rgb(6, 8, seed=1)), "image/bmp", 8, 6),
        (2, encode_ppm(_rgb(4, 4, seed=2)), "image/x-portable-pixmap", 4, 4),
        (3, encode_png(_rgb(5, 7, seed=3)), "image/png", 7, 5),
    ]
    df = spark.createDataFrame(
        imgs, "media_id long, content binary, mime string, width int, height int"
    )
    rows = {r["media_id"]: r.asDict() for r in extract_image_features(df).collect()}
    assert rows[1]["height"] == 6 and rows[1]["width"] == 8
    assert len(rows[1]["feature"]) == 8
    assert all(0.0 <= v <= 1.0 for v in rows[2]["feature"])
    # matches a local decode exactly
    local = decode_image(imgs[1][1])
    pooled = np.array_split(local.mean(axis=1), 8)
    want = [float(np.float32(p.mean() if p.size else 0.0)) for p in pooled]
    got = [float(v) for v in rows[2]["feature"]]
    assert all(math.isclose(a, b, rel_tol=1e-6) for a, b in zip(got, want))
    assert rows[3]["height"] == 5 and rows[3]["width"] == 7


def test_resize_images_spark_chains(spark):
    imgs = [(i, encode_bmp(_rgb(10, 12, seed=i)), "image/bmp", 12, 10) for i in range(4)]
    df = spark.createDataFrame(
        imgs, "media_id long, content binary, mime string, width int, height int"
    )
    out = resize_images(df, 5, 6)
    rows = out.collect()
    assert all(r["width"] == 6 and r["height"] == 5 for r in rows)
    px = decode_bmp(bytes(rows[0]["content"]))
    assert px.shape == (5, 6, 3)
    # chains into the feature extractor (MEDIA_SCHEMA preserved)
    feats = extract_image_features(out).collect()
    assert len(feats) == 4 and all(len(r["feature"]) == 8 for r in feats)


def test_sample_video_frames_spark(spark):
    frames = [encode_bmp(_rgb(4, 4, seed=s)) for s in range(10)]
    clips = [(7, encode_frames(frames))]
    df = spark.createDataFrame(clips, "media_id long, content binary")
    out = sample_video_frames(df, every_n=3).collect()
    assert [r["frame_idx"] for r in out] == [0, 3, 6, 9]
    assert all(r["media_id"] == 7 for r in out)
    # sampled frames decode to the original pixels
    assert np.array_equal(
        decode_bmp(bytes(out[1]["content"])), decode_bmp(frames[3])
    )
    # container roundtrip
    assert decode_frames(encode_frames(frames)) == frames
