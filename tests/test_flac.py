"""FLAC codec (pipeline/flac.py): encoder/decoder round-trips for the
paths the fixture encoder emits, plus HAND-ASSEMBLED streams for the
paths it cannot (LPC subframes, mid/side stereo, wasted bits) — byte
fixtures built from the spec with the writer primitives, so the decoder
is checked against the format, not against itself."""

from __future__ import annotations

import numpy as np
import pytest

from apache___solr_spark.pipeline.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _write_rice,
    decode_flac,
    encode_flac,
    flac_to_float_mono,
)


def _roundtrip(samples, rate=44100, bps=16, blocksize=4096):
    out, r, b = decode_flac(encode_flac(samples, rate, bps, blocksize))
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    assert r == rate and b == bps
    assert np.array_equal(out, arr), "lossless round-trip"


def test_roundtrip_random_and_smooth():
    rng = np.random.default_rng(7)
    _roundtrip(rng.integers(-30000, 30000, size=10000), 22050, 16, 1000)
    t = np.arange(6000)
    l = (np.sin(t / 30) * 12000).astype(np.int64)
    r = (np.cos(t / 45) * 9000).astype(np.int64)
    _roundtrip(np.stack([l, r], 1))
    _roundtrip(np.full(5000, 123, np.int64), 8000)
    _roundtrip(np.array([5, -7]), 8000)  # verbatim path (block of 2)
    _roundtrip(rng.integers(-100, 100, size=9000), 48000, 16, 192)


def test_compresses_smooth_signals():
    t = np.arange(20000)
    sig = (np.sin(t / 25) * 15000).astype(np.int64)
    assert len(encode_flac(sig)) < 0.45 * (len(sig) * 2)


def test_corruption_detected():
    b = bytearray(encode_flac(np.arange(-500, 500, dtype=np.int64)))
    bad = bytearray(b)
    bad[-1] ^= 0xFF  # the frame CRC-16 itself
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    bad = bytearray(b)
    bad[-30] ^= 0xFF  # mid-residual flip: CRC or a decode error, never data
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        decode_flac(b"RIFFxxxx")


def _streaminfo(rate, nch, bps, total, blocksize):
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    body = si.bytes() + bytes(34 - len(si.bytes()))
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame(header_fields, body_bits):
    bw = _BitWriter()
    for v, n in header_fields:
        bw.write(v, n)
    bw.align()
    header = bw.bytes()
    bw2 = _BitWriter()
    for v, n in body_bits:
        bw2.write(v, n)
    bw2.align()
    body = bw2.bytes()
    pre = header + bytes([_crc8(header)]) + body
    return pre + _crc16(pre).to_bytes(2, "big")


def test_hand_assembled_lpc_subframe():
    """Order-1 LPC, coeff 1 at shift 0 (i.e. s[i] = s[i-1] + resid):
    hand-built per spec; the fixture encoder never emits LPC."""
    n, rate, bps = 8, 8000, 16
    warm = 100
    resid = [3, -2, 5, 0, -1, 4, 2]  # n-1 residuals
    expect = [warm]
    for r in resid:
        expect.append(expect[-1] + r)
    header = [
        (0b11111111111110, 14), (0, 1), (0, 1),
        (7, 4),   # blocksize: 16-bit field
        (0, 4),   # rate from streaminfo
        (0, 4),   # 1 channel, independent
        (4, 3),   # 16-bit samples
        (0, 1),
        (0, 8),   # frame number 0
        (n - 1, 16),
    ]
    body = [(0, 1), (32, 6), (0, 1)]          # LPC order 1 (type 0b100000)
    body.append((warm, bps))                   # warmup
    body.append((0, 4))                        # precision-1 = 0 -> 1 bit?
    # precision code 0 means 1-bit coeffs — too narrow for coeff 1; use
    # 4 bits (code 3) so the coefficient +1 fits comfortably
    body[-1] = (3, 4)
    body.append((0, 5))                        # shift 0
    body.append((1, 4))                        # qlp coeff = +1 (4 bits)
    body.append((0, 2))                        # residual method 0
    body.append((0, 4))                        # partition order 0
    body.append((2, 4))                        # rice param 2
    rice = _BitWriter()
    _write_rice(rice, np.array(resid, dtype=np.int64), 2)
    rice_bits = []
    for byte in rice.out:
        rice_bits.append((byte, 8))
    if rice.nbits:
        rice_bits.append((rice.acc, rice.nbits))
    body.extend(rice_bits)
    stream = _streaminfo(rate, 1, bps, n, n) + _frame(header, body)
    out, r, b = decode_flac(stream)
    assert r == rate and b == bps
    assert out[:, 0].tolist() == expect


def test_hand_assembled_mid_side_and_wasted_bits():
    """Mid/side stereo (channel code 10, side at bps+1) with a wasted
    bit on the mid subframe — both untouched by the fixture encoder."""
    rate, bps = 8000, 16
    left = [400, 402, 404, 406]
    right = [100, 98, 96, 94]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    side = [l - r for l, r in zip(left, right)]
    n = len(left)
    header = [
        (0b11111111111110, 14), (0, 1), (0, 1),
        (7, 4), (0, 4),
        (10, 4),  # mid/side
        (4, 3), (0, 1), (0, 8), (n - 1, 16),
    ]
    body = []
    # mid subframe: all values even -> emit with 1 wasted bit, VERBATIM
    body.append((0, 1))
    body.append((1, 6))     # VERBATIM
    body.append((1, 1))     # wasted-bits flag
    # unary count-1: first 1-bit terminates -> wasted = 1
    body.append((1, 1))
    for m in mid:
        body.append(((m >> 1) & ((1 << (bps - 1)) - 1), bps - 1))
    # side subframe: bps+1 bits, CONSTANT? values differ -> VERBATIM
    body.append((0, 1))
    body.append((1, 6))
    body.append((0, 1))
    for s in side:
        body.append((s & ((1 << (bps + 1)) - 1), bps + 1))
    stream = _streaminfo(rate, 2, bps, n, n) + _frame(header, body)
    out, _, _ = decode_flac(stream)
    assert out[:, 0].tolist() == left
    assert out[:, 1].tolist() == right


def test_audio_features_dispatch_flac(spark):
    """extract_audio_features accepts FLAC next to WAV and produces the
    same features for the same signal."""
    from apache___solr_spark.pipeline.multimodal import (
        encode_wav,
        extract_audio_features,
    )

    t = np.arange(4000)
    sig = (np.sin(t / 20) * 0.5).astype(np.float32)
    wav = encode_wav(sig, 16000)
    flac = encode_flac(
        (sig * 32767).astype(np.int64), 16000, 16
    )
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(flac))],
        "media_id long, content binary",
    )
    got = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    assert got[2]["sample_rate"] == got[1]["sample_rate"] == 16000
    assert got[2]["n_samples"] == got[1]["n_samples"] == 4000
    assert abs(got[2]["rms"] - got[1]["rms"]) < 1e-4
    assert (
        abs(got[2]["spectral_centroid_hz"] - got[1]["spectral_centroid_hz"])
        < 1.0
    )
