"""FLAC (Free Lossless Audio Codec) decode + a fixture encoder, pure
Python/numpy — extends the audio column support beyond PCM WAV
(pipeline/multimodal.py) with the common lossless interchange format.

Decoder covers the format as actually emitted by mainstream encoders:
STREAMINFO metadata, fixed+variable blocksize frames, all four channel
assignments (independent, left/side, right/side, mid/side), subframe
types CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32), wasted bits, both
Rice residual methods (4- and 5-bit parameters, partitioned, escape
codes), UTF-8-coded frame numbers, and the CRC-8 (header) + CRC-16
(frame) integrity checks — corrupt frames raise, never mis-decode.

The encoder exists so tests are self-contained (no third-party golden
files): it writes CONSTANT / VERBATIM / FIXED(order 2) subframes with
single-partition Rice residuals, independent channels, correct CRCs —
enough to exercise every decoder path except LPC, which is covered by a
hand-assembled stream in the tests.

Like the image codecs, decode is per-file Python inside an Arrow batch
(`extract_audio_features` dispatches on the fLaC magic): the scalable
unit is the file, the batch moves as Arrow columns, the pass is
map-only.
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        while n:
            if self.byte >= len(self.data):
                raise ValueError("flac: truncated stream")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            out = (out << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n == 0 or n > 6:
        raise ValueError("flac: bad UTF-8 coded number")
    val = b0 & (mask - 1)
    for _ in range(n):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("flac: bad UTF-8 continuation")
        val = (val << 6) | (b & 0x3F)
    return val


def _read_residual(br: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("flac: partition order does not divide blocksize")
    out = np.empty(blocksize - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for _ in range(count):
                out[idx] = br.read_signed(raw) if raw else 0
                idx += 1
        else:
            for _ in range(count):
                q = br.read_unary()
                r = br.read(param) if param else 0
                v = (q << param) | r
                out[idx] = (v >> 1) ^ -(v & 1)  # zigzag
                idx += 1
    return out


def _read_subframe(br: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("flac: subframe sync bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        samples = np.full(blocksize, br.read_signed(eff), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        samples = np.array(
            [br.read_signed(eff) for _ in range(blocksize)], dtype=np.int64
        )
    elif 8 <= stype <= 12:  # FIXED, order = stype - 8
        order = stype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        samples = np.empty(blocksize, dtype=np.int64)
        samples[:order] = warm
        coefs = _FIXED_COEFFS[order]
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * samples[i - 1 - j]
            samples[i] = resid[i - order] + pred
    elif stype >= 32:  # LPC, order = stype - 31
        order = stype - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("flac: invalid qlp precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        samples = np.empty(blocksize, dtype=np.int64)
        samples[:order] = warm
        for i in range(order, blocksize):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * samples[i - 1 - j]
            samples[i] = resid[i - order] + (acc >> shift)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    if wasted:
        samples = samples << wasted
    return samples


def decode_flac(content: bytes) -> tuple[np.ndarray, int, int]:
    """FLAC stream -> (int32 samples shaped (n, channels), sample_rate,
    bits_per_sample).  Raises ValueError on malformed/corrupt input."""
    data = bytes(content)
    if data[:4] != b"fLaC":
        raise ValueError("flac: bad magic")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + size]
        if btype == 0:
            streaminfo = body
        pos += 4 + size
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("flac: missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)
    si.read(24)
    sample_rate = si.read(20)
    n_channels = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)

    chans: list[list[np.ndarray]] = [[] for _ in range(n_channels)]
    while pos < len(data):
        frame_start = pos
        br = _BitReader(data, pos)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("flac: reserved blocksize code")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZES[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("flac: invalid sample-rate code")
        fbps = _SAMPLE_SIZES.get(ss_code, bps) if ss_code else bps
        br.align()
        header_bytes = data[frame_start : br.byte]
        if _crc8(header_bytes) != br.read(8):
            raise ValueError("flac: frame header CRC mismatch")

        if ch_code < 8:
            if ch_code + 1 != n_channels:
                raise ValueError("flac: channel count mismatch")
            subs = [
                _read_subframe(br, blocksize, fbps) for _ in range(n_channels)
            ]
        elif ch_code in (8, 9, 10):
            if n_channels != 2:
                raise ValueError("flac: stereo decorrelation needs 2 channels")
            if ch_code == 8:  # left/side
                left = _read_subframe(br, blocksize, fbps)
                side = _read_subframe(br, blocksize, fbps + 1)
                subs = [left, left - side]
            elif ch_code == 9:  # right/side
                side = _read_subframe(br, blocksize, fbps + 1)
                right = _read_subframe(br, blocksize, fbps)
                subs = [right + side, right]
            else:  # mid/side
                mid = _read_subframe(br, blocksize, fbps)
                side = _read_subframe(br, blocksize, fbps + 1)
                m2 = (mid << 1) | (side & 1)
                subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"flac: reserved channel assignment {ch_code}")
        br.align()
        frame_bytes = data[frame_start : br.byte]
        crc = br.read(16)
        if _crc16(frame_bytes) != crc:
            raise ValueError("flac: frame CRC mismatch")
        pos = br.byte
        for c in range(n_channels):
            chans[c].append(subs[c])

    if not chans[0]:
        raise ValueError("flac: no frames")
    out = np.stack(
        [np.concatenate(parts) for parts in chans], axis=1
    ).astype(np.int32)
    if total and len(out) > total:
        out = out[:total]
    return out, sample_rate, bps


# ---------------------------------------------------------------------------
# fixture encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        value &= (1 << n) - 1 if n else 0
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _write_rice(bw: _BitWriter, resid: np.ndarray, param: int) -> None:
    for v in resid:
        v = int(v)
        u = (abs(v) << 1) - (1 if v < 0 else 0)  # zigzag
        q = u >> param
        bw.write(0, q)  # q zeros
        bw.write(1, 1)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _best_rice_param(resid: np.ndarray) -> int:
    best, best_bits = 0, None
    for p in range(15):
        u = np.abs(resid.astype(np.int64)) * 2 - (resid < 0)
        bits = int(np.sum(u >> p)) + len(resid) * (1 + p)
        if best_bits is None or bits < best_bits:
            best, best_bits = p, bits
    return best


def encode_flac(
    samples: np.ndarray, sample_rate: int = 44100, bps: int = 16,
    blocksize: int = 4096,
) -> bytes:
    """int samples shaped (n,) or (n, channels) -> FLAC bytes.  Fixture
    encoder: independent channels, CONSTANT / FIXED(2) / VERBATIM
    subframes with single-partition Rice residuals."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, n_channels = arr.shape
    lim = 1 << (bps - 1)
    if arr.min() < -lim or arr.max() >= lim:
        raise ValueError("samples exceed bits-per-sample range")

    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    streaminfo = si.bytes() + bytes(34 - len(si.bytes()))

    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    frame_no = 0
    for off in range(0, n, blocksize):
        block = arr[off : off + blocksize]
        bsz = len(block)
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # blocksize: 16-bit field
        bw.write(0, 4)  # sample rate: from STREAMINFO
        bw.write(n_channels - 1, 4)
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        bw.write(0, 1)
        # UTF-8 frame number (fits 7 bits for fixtures beyond which the
        # 2-byte form is used)
        if frame_no < 0x80:
            bw.write(frame_no, 8)
        else:
            bw.write(0xC0 | (frame_no >> 6), 8)
            bw.write(0x80 | (frame_no & 0x3F), 8)
        bw.write(bsz - 1, 16)
        bw.align()
        header = bw.bytes()
        bw2 = _BitWriter()
        for ch in range(n_channels):
            sig = block[:, ch]
            bw2.write(0, 1)
            if np.all(sig == sig[0]):
                bw2.write(0, 6)  # CONSTANT
                bw2.write(0, 1)
                bw2.write(int(sig[0]) & ((1 << bps) - 1), bps)
            elif bsz > 2:
                bw2.write(8 + 2, 6)  # FIXED order 2
                bw2.write(0, 1)
                bw2.write(int(sig[0]) & ((1 << bps) - 1), bps)
                bw2.write(int(sig[1]) & ((1 << bps) - 1), bps)
                resid = sig[2:] - (2 * sig[1:-1] - sig[:-2])
                param = _best_rice_param(resid)
                bw2.write(0, 2)  # method 0: 4-bit params
                bw2.write(0, 4)  # partition order 0
                if param < 14:
                    bw2.write(param, 4)
                    _write_rice(bw2, resid, param)
                else:  # escape to raw
                    bw2.write(15, 4)
                    raw = (
                        int(np.abs(resid).max()).bit_length() + 1
                        if len(resid)
                        else 1
                    )
                    bw2.write(raw, 5)
                    for v in resid:
                        bw2.write(int(v) & ((1 << raw) - 1), raw)
            else:
                bw2.write(1, 6)  # VERBATIM
                bw2.write(0, 1)
                for v in sig:
                    bw2.write(int(v) & ((1 << bps) - 1), bps)
        bw2.align()
        body = bw2.bytes()
        crc8 = _crc8(header)
        frame_wo_crc16 = header + bytes([crc8]) + body
        crc16 = _crc16(frame_wo_crc16)
        out += frame_wo_crc16 + crc16.to_bytes(2, "big")
        frame_no += 1
    return bytes(out)


def flac_to_float_mono(content: bytes) -> tuple[np.ndarray, int]:
    """FLAC -> (float32 mono samples in [-1, 1], sample_rate) — the same
    contract as multimodal.decode_wav, for feature extraction."""
    samples, rate, bps = decode_flac(content)
    mono = samples.mean(axis=1)
    return (mono / float(1 << (bps - 1))).astype(np.float32), rate
