"""Baseline JPEG codec tests (pure numpy, no Spark session needed).

The decoder is verified two independent ways: round-trip against our own
encoder (separate forward/inverse implementations), and against a
HAND-CONSTRUCTED single-block JPEG whose decoded value follows from the
T.81 math alone (DC-only block: pixel = S00·q00/8 + 128), so a shared
zigzag/table bug in the codec pair cannot hide.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from apache___solr_spark.pipeline.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)
from apache___solr_spark.pipeline.multimodal import decode_image


def _gradient_rgb(h: int = 40, w: int = 56) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 / w, yy * 255 / h, (xx + yy) * 255 / (h + w)], axis=-1
    ).astype(np.uint8)


def test_zigzag_is_a_permutation_with_known_entries():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # first entries of the T.81 Figure-5 scan: (0,0) (0,1) (1,0) (2,0) (1,1)
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[-1] == 63


def test_roundtrip_rgb_444():
    img = _gradient_rgb()
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert np.abs(dec.astype(float) - img.astype(float)).max() <= 8


def test_roundtrip_grayscale():
    yy, xx = np.mgrid[0:40, 0:56]
    g = ((xx * 255 / 56 + yy * 255 / 40) / 2).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=95))
    assert dec.shape == g.shape and dec.ndim == 2
    assert np.abs(dec.astype(float) - g.astype(float)).max() <= 4


def test_roundtrip_420_subsampling_and_odd_dims():
    img = _gradient_rgb()[:37, :53]
    dec = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    assert dec.shape == img.shape
    # chroma is quarter-resolution: luma stays tight, chroma within the
    # 2x2-average + replication error envelope on a gradient
    luma = img @ np.array([0.299, 0.587, 0.114])
    dluma = dec @ np.array([0.299, 0.587, 0.114])
    assert np.abs(dluma - luma).max() <= 8
    assert np.abs(dec.astype(float) - img.astype(float)).mean() <= 4


def test_roundtrip_restart_markers():
    img = _gradient_rgb()
    data = encode_jpeg(img, quality=95, restart_interval=3)
    assert b"\xff\xd0" in data or b"\xff\xd1" in data
    dec = decode_jpeg(data)
    assert np.abs(dec.astype(float) - img.astype(float)).max() <= 8


def test_flat_block_exact():
    tiny = np.full((8, 8), 77, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg(tiny, quality=90)) == 77).all()


def test_hand_built_dc_only_jpeg():
    """Independent fixture: bytes assembled by hand from the T.81 spec.
    One 8x8 gray block, q00=16, Huffman DC table {category 2 -> code '0'},
    AC table {EOB -> code '0'}; bitstream 0|11|0 encodes DC diff=+3, EOB.
    IDCT of a DC-only block is flat S00/8, so every pixel must equal
    3*16/8 + 128 = 134."""
    q = bytes([16] + [1] * 63)
    dqt = b"\xff\xdb" + struct.pack(">HB", 67, 0) + q
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes(
        [1, 0x11, 0]
    )
    dc_bits = bytes([1] + [0] * 15)  # one 1-bit code
    dht_dc = b"\xff\xc4" + struct.pack(">HB", 20, 0x00) + dc_bits + bytes([2])
    dht_ac = b"\xff\xc4" + struct.pack(">HB", 20, 0x10) + dc_bits + bytes([0])
    sos = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + bytes(
        [0, 63, 0]
    )
    entropy = bytes([0b01101111])  # 0 (cat 2), 11 (mag 3), 0 (EOB), pad 1s
    jpg = b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + entropy + b"\xff\xd9"
    out = decode_jpeg(jpg)
    assert out.shape == (8, 8)
    assert (out == 134).all(), out


def test_negative_dc_extend():
    """Same hand-built block with DC diff = -3 (magnitude bits '00'):
    EXTEND(0, 2) = -3 -> pixels = 128 - 6 = 122."""
    q = bytes([16] + [1] * 63)
    dqt = b"\xff\xdb" + struct.pack(">HB", 67, 0) + q
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes(
        [1, 0x11, 0]
    )
    dc_bits = bytes([1] + [0] * 15)
    dht_dc = b"\xff\xc4" + struct.pack(">HB", 20, 0x00) + dc_bits + bytes([2])
    dht_ac = b"\xff\xc4" + struct.pack(">HB", 20, 0x10) + dc_bits + bytes([0])
    sos = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + bytes(
        [0, 63, 0]
    )
    entropy = bytes([0b00001111])  # 0 (cat 2), 00 (mag 0 -> -3), 0 (EOB)
    jpg = b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + entropy + b"\xff\xd9"
    out = decode_jpeg(jpg)
    assert (out == 122).all(), out


def test_unsupported_sof_and_corrupt_raise():
    img = _gradient_rgb(16, 16)
    data = bytearray(encode_jpeg(img))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC3  # rewrite SOF0 -> SOF3 (lossless)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def _textured(h: int, w: int) -> np.ndarray:
    """Gradient + high-frequency checker + a few flat patches, so AC bands
    carry real coefficients at every successive-approximation level and
    EOB runs span multiple all-zero blocks."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = _gradient_rgb(h, w).astype(np.float64)
    base[..., 0] += 40 * ((xx + yy) % 2)
    base[..., 1] += 25 * ((xx // 3 + yy // 5) % 2)
    base[8:16, 8:16] = 128.0  # flat patch -> all-zero AC blocks
    return np.clip(base, 0, 255).astype(np.uint8)


def test_progressive_matches_baseline_rgb():
    """The progressive scan script transmits the quantized coefficients
    losslessly, so SOF2 decode must match SOF0 decode of the same frame
    (up to IDCT float rounding)."""
    img = _textured(40, 56)
    base = decode_jpeg(encode_jpeg(img, quality=90)).astype(int)
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=90)).astype(int)
    assert prog.shape == base.shape
    assert np.abs(prog - base).max() <= 1


def test_progressive_roundtrip_grayscale():
    yy, xx = np.mgrid[0:40, 0:56]
    g = np.clip(
        (xx * 255 / 56 + yy * 255 / 40) / 2 + 30 * ((xx + yy) % 2), 0, 255
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_progressive(g, quality=95))
    assert dec.shape == g.shape and dec.ndim == 2
    base = decode_jpeg(encode_jpeg(g, quality=95))
    assert np.abs(dec.astype(int) - base.astype(int)).max() <= 1


def test_progressive_420_odd_dims():
    img = _textured(37, 53)
    base = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=90, subsample=True)
    )
    assert prog.shape == img.shape
    assert np.abs(prog.astype(int) - base.astype(int)).max() <= 1


def test_progressive_restart_markers():
    img = _textured(40, 56)
    data = encode_jpeg_progressive(img, quality=90, restart_interval=3)
    assert b"\xff\xdd" in data and b"\xff\xd0" in data
    base = decode_jpeg(encode_jpeg(img, quality=90))
    prog = decode_jpeg(data)
    assert np.abs(prog.astype(int) - base.astype(int)).max() <= 1


def test_decode_image_dispatches_jpeg():
    img = _gradient_rgb(24, 24)
    gray = decode_image(encode_jpeg(img, quality=95), mime="image/jpeg")
    assert gray.shape == (24, 24) and gray.dtype == np.float32
    want = (img @ np.array([0.299, 0.587, 0.114])) / 255.0
    assert np.abs(gray - want).max() < 0.05
    # header sniffing without a mime hint
    gray2 = decode_image(encode_jpeg(img, quality=95))
    assert np.allclose(gray, gray2)
