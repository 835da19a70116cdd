"""Baseline + progressive JPEG codec in pure numpy + stdlib (no PIL in the
container).

Implements the ITU-T T.81 baseline sequential DCT process: marker parsing
(SOI/APPn/DQT/SOF0/DHT/DRI/SOS/EOI), canonical Huffman entropy decoding with
byte-stuffing and restart markers, zigzag + dequantization, the exact
separable 8x8 inverse DCT, chroma upsampling for arbitrary JFIF sampling
factors (4:4:4, 4:2:0, 4:2:2, ...), and the JFIF YCbCr->RGB transform.

Progressive DCT (SOF2, T.81 G.2) is decoded too: coefficients accumulate
across scans — DC first/refine (interleaved or not), AC first/refine with
spectral selection bands, successive-approximation bit planes, and EOB-run
coding — and one vectorized dequant+IDCT reconstructs the image at EOI.

The matching encoders exist so the pipeline can produce test fixtures and
round-trip goldens without any external imaging dependency; they write valid
baseline and progressive JFIF files (custom flat canonical Huffman tables —
valid per T.81, merely less compact than the Annex K defaults).

This module is the real-decode backend `pipeline/multimodal.py` previously
stubbed for entropy-coded images; the Spark-side plumbing (mapInPandas
feature extraction, schema, batching) is unchanged — decode_jpeg slots in as
a per-cell call inside the existing Arrow-batched UDFs.

Scale note: decoding is per-document CPU inside mapInPandas — embarrassingly
parallel, no shuffle; at 100 TB the executor-side cost is the decode itself,
which a production deployment would swap for a native decoder via the same
UDF seam (the interface, not the inner loop, is the contract here).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: ZIGZAG[i] = raster index of the i-th coefficient in
# zigzag order (T.81 Figure 5)
_zz = []
for s in range(15):
    ks = range(max(0, s - 7), min(s, 7) + 1)
    diag = [(k, s - k) for k in ks]
    if s % 2 == 0:
        diag.reverse()  # even diagonals run bottom-left -> top-right
    _zz.extend(diag)
ZIGZAG = np.array([r * 8 + c for r, c in _zz], dtype=np.int64)

# 8x8 DCT-II basis matrix A: A[k, n] = c(k)/2 * cos((2n+1) k pi / 16)
# forward: S = A @ f @ A.T ; inverse: f = A.T @ S @ A
_n = np.arange(8)
_A = np.cos((2 * _n[None, :] + 1) * _n[:, None] * np.pi / 16) / 2.0
_A[0, :] *= 1.0 / np.sqrt(2.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


class _HuffTable:
    """Canonical Huffman decode per T.81 F.2.2.3 (MINCODE/MAXCODE/VALPTR)."""

    def __init__(self, bits: list[int], vals: bytes):
        # bits[i] = number of codes of length i+1 (16 entries)
        self.vals = np.frombuffer(bytes(vals), dtype=np.uint8)
        self.mincode = np.zeros(17, dtype=np.int64)
        self.maxcode = np.full(17, -1, dtype=np.int64)
        self.valptr = np.zeros(17, dtype=np.int64)
        code = 0
        k = 0
        for ln in range(1, 17):
            self.valptr[ln] = k
            self.mincode[ln] = code
            n = bits[ln - 1]
            code += n
            k += n
            self.maxcode[ln] = code - 1 if n else -1
            code <<= 1


class _BitReader:
    """MSB-first reader over unstuffed entropy-coded bytes."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("JPEG entropy stream truncated")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ValueError("JPEG entropy stream truncated")
        v = 0
        for b in self.bits[self.pos : self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v

    def decode_huff(self, t: _HuffTable) -> int:
        code = self.read_bit()
        ln = 1
        while code > t.maxcode[ln]:
            ln += 1
            if ln > 16:
                raise ValueError("invalid Huffman code")
            code = (code << 1) | self.read_bit()
        return int(t.vals[t.valptr[ln] + code - t.mincode[ln]])


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s-bit magnitude to a signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Slice the entropy-coded segment beginning at ``start`` into restart
    intervals (split on RSTn), un-stuffing 0xFF00 -> 0xFF.  Returns the
    segments and the offset of the terminating marker."""
    segs: list[bytearray] = [bytearray()]
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            segs[-1].append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            segs[-1].append(0xFF)
            i += 2
        elif m == 0xFF:  # fill byte
            i += 1
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytearray())
            i += 2
        else:  # a real marker terminates the scan
            break
    return [bytes(s) for s in segs], i


def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode a baseline-sequential or progressive JPEG to uint8 pixels —
    (H, W) for a single-component (grayscale) image, (H, W, 3) RGB
    otherwise.

    Supports: SOF0 (baseline DCT, 8-bit) and SOF2 (progressive DCT, 8-bit:
    spectral selection + successive approximation, DC/AC first and
    refinement scans, EOB runs), 1- or 3-component frames with any JFIF
    sampling factors, multiple DQT/DHT segments, restart intervals.
    Arithmetic coding, hierarchical/lossless SOFs, and 12-bit precision
    raise."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    progressive = False
    coefs: dict[int, np.ndarray] | None = None
    dri = 0
    i = 2
    n = len(content)
    while i < n:
        if content[i] != 0xFF:
            i += 1
            continue
        marker = content[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", content[i : i + 2])
        seg = content[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq:  # 16-bit precision
                    tbl = np.frombuffer(
                        seg[j : j + 128], dtype=">u2"
                    ).astype(np.int32)
                    j += 128
                else:
                    tbl = np.frombuffer(
                        seg[j : j + 64], dtype=np.uint8
                    ).astype(np.int32)
                    j += 64
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                vals = seg[j + 17 : j + 17 + nv]
                huff[(tc, th)] = _HuffTable(bits, vals)
                j += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (non-baseline) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if not progressive:
                scan = {}
                for c in range(ns):
                    cs, tt = seg[1 + 2 * c : 3 + 2 * c]
                    scan[cs] = (tt >> 4, tt & 15)
                segs, end = _split_entropy(content, i + seglen)
                return _decode_scan(frame, scan, qt, huff, segs, dri)
            scan_list = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c : 3 + 2 * c]
                scan_list.append((cs, tt >> 4, tt & 15))
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            if coefs is None:
                hmax = max(c[1] for c in frame[2])
                vmax = max(c[2] for c in frame[2])
                mcux = -(-frame[1] // (8 * hmax))
                mcuy = -(-frame[0] // (8 * vmax))
                coefs = {
                    cid: np.zeros((mcuy * v, mcux * hh, 64), dtype=np.int64)
                    for cid, hh, v, _ in frame[2]
                }
            segs, end = _split_entropy(content, i + seglen)
            _decode_prog_scan(
                frame, scan_list, ss, se, a >> 4, a & 15, huff, coefs,
                dri, segs,
            )
            i = end
            continue
        i += seglen
    if progressive and coefs is not None:
        return _reconstruct_progressive(frame, coefs, qt)
    raise ValueError("no SOS marker found")


def _decode_scan(frame, scan, qt, huff, segs, dri) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        cid: np.zeros((mcuy * 8 * v, mcux * 8 * hh), dtype=np.float64)
        for cid, hh, v, _ in comps
    }
    n_mcu = mcux * mcuy
    mcu_i = 0
    seg_idx = 0
    reader = _BitReader(segs[0])
    pred = {cid: 0 for cid, *_ in comps}
    per_seg = dri if dri else n_mcu
    zz = ZIGZAG
    while mcu_i < n_mcu:
        if dri and mcu_i and mcu_i % per_seg == 0:
            seg_idx += 1
            reader = _BitReader(segs[seg_idx])
            pred = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(mcu_i, mcux)
        for cid, hh, v, tq in comps:
            tdc, tac = scan[cid]
            dct = huff[(0, tdc)]
            act = huff[(1, tac)]
            q = qt[tq]
            plane = planes[cid]
            for by in range(v):
                for bx in range(hh):
                    coef = np.zeros(64, dtype=np.int64)
                    s = reader.decode_huff(dct)
                    diff = _extend(reader.read(s), s)
                    pred[cid] += diff
                    coef[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = reader.decode_huff(act)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        coef[k] = _extend(reader.read(s), s)
                        k += 1
                    block = np.zeros(64, dtype=np.float64)
                    block[zz] = coef * q
                    px = _idct2(block.reshape(8, 8)) + 128.0
                    y0 = (my * v + by) * 8
                    x0 = (mx * hh + bx) * 8
                    plane[y0 : y0 + 8, x0 : x0 + 8] = px
        mcu_i += 1
    return _assemble(planes, comps, h, w, hmax, vmax)


def _assemble(planes, comps, h, w, hmax, vmax) -> np.ndarray:
    """Upsample component planes to full resolution, crop, color-transform
    (shared by the baseline and progressive reconstruction paths)."""
    full = []
    for cid, hh, v, _ in comps:
        p = planes[cid]
        if hh < hmax or v < vmax:
            p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // hh, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ----------------------------------------------------- progressive decode
# T.81 G.2: coefficients accumulate across scans; each scan covers one
# spectral band (Ss..Se) at one successive-approximation bit position
# (Ah = prior precision, Al = this scan's bit).  DC scans may interleave
# components over MCUs; AC scans are single-component over that
# component's own (unpadded) block grid in raster order.


def _comp_block_grid(frame, cid) -> tuple[int, int]:
    """(block rows, block cols) of a component's NON-interleaved scan grid:
    ceil(comp_dim / 8) on the component's true sampled dimensions (not the
    MCU-padded grid used by interleaved scans)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    hh, v = next((c[1], c[2]) for c in comps if c[0] == cid)
    cw = -(-w * hh // hmax)
    ch = -(-h * v // vmax)
    return -(-ch // 8), -(-cw // 8)


def _prog_dc(reader, dct, blk, ah, al, pred, cid) -> None:
    """One block of a DC scan: first pass decodes a Huffman diff at bit
    position Al; refinement passes read one raw bit into position Al."""
    if ah == 0:
        s = reader.decode_huff(dct)
        diff = _extend(reader.read(s), s)
        pred[cid] += diff
        blk[0] = pred[cid] << al
    elif reader.read_bit():
        blk[0] |= 1 << al


def _prog_ac_first(reader, act, blk, ss, se, al, state) -> None:
    """One block of a first AC scan (Ah=0): run/size coding of the band
    with EOBn run-length codes spanning all-zero blocks."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode_huff(act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: sixteen zero coefficients
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += reader.read(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(reader.read(s), s) << al
        k += 1


def _prog_ac_refine(reader, act, blk, ss, se, al, state) -> None:
    """One block of a refinement AC scan (Ah>0): newly-nonzero coefficients
    arrive as ±1<<Al; already-nonzero ones receive one correction bit each
    (read during the zero-run walk, and for the rest of the band while an
    EOB run is active)."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = reader.decode_huff(act)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:  # EOBn: run of blocks ending here
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += reader.read(r)
                    break
                # ZRL: pass over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad AC refinement symbol")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if reader.read_bit() and not (blk[k] & p1):
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                blk[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if blk[k] != 0 and reader.read_bit() and not (blk[k] & p1):
                blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def _decode_prog_scan(
    frame, scan, ss, se, ah, al, huff, coefs, dri, segs
) -> None:
    """Decode one progressive scan into the per-component zigzag coefficient
    arrays.  ``scan`` = [(cid, dc_table, ac_table), ...] in scan order."""
    h, w, comps = frame
    byc = {cid: (hh, v) for cid, hh, v, _ in comps}
    if ss == 0 and se != 0:
        raise ValueError("progressive scan mixing DC and AC coefficients")
    if ss > 0 and len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if ss == 0 and ah == 0 and not all(
        (0, td) in huff for _, td, _ in scan
    ):
        raise ValueError("missing DC Huffman table")
    interleaved = len(scan) > 1
    if interleaved:
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = -(-w // (8 * hmax))
        n_units = mcux * -(-h // (8 * vmax))
    else:
        bh, bw = _comp_block_grid(frame, scan[0][0])
        n_units = bh * bw
    per_seg = dri if dri else n_units
    seg_idx = 0
    reader = _BitReader(segs[0])
    pred = {cid: 0 for cid, *_ in scan}
    state = {"eobrun": 0}
    for u in range(n_units):
        if dri and u and u % per_seg == 0:
            seg_idx += 1
            reader = _BitReader(segs[seg_idx])
            pred = {cid: 0 for cid, *_ in scan}
            state["eobrun"] = 0
        if interleaved:  # DC scans only (ss == 0)
            my, mx = divmod(u, mcux)
            for cid, td, _ in scan:
                hh, v = byc[cid]
                dct = huff.get((0, td))
                for by in range(v):
                    for bx in range(hh):
                        _prog_dc(
                            reader, dct, coefs[cid][my * v + by, mx * hh + bx],
                            ah, al, pred, cid,
                        )
        else:
            cid, td, ta = scan[0]
            by, bx = divmod(u, bw)
            blk = coefs[cid][by, bx]
            if ss == 0:
                _prog_dc(reader, huff.get((0, td)), blk, ah, al, pred, cid)
            elif ah == 0:
                _prog_ac_first(reader, huff[(1, ta)], blk, ss, se, al, state)
            else:
                _prog_ac_refine(reader, huff[(1, ta)], blk, ss, se, al, state)


def _reconstruct_progressive(frame, coefs, qt) -> np.ndarray:
    """Dequantize + inverse-DCT every accumulated block at once (one einsum
    per component) and assemble the image."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = {}
    for cid, hh, v, tq in comps:
        zig = coefs[cid].astype(np.float64) * qt[tq][None, None, :]
        raster = np.zeros_like(zig)
        raster[..., ZIGZAG] = zig
        bh, bw = raster.shape[:2]
        blocks = raster.reshape(bh, bw, 8, 8)
        px = np.einsum("ij,yxjk,kl->yxil", _A.T, blocks, _A) + 128.0
        planes[cid] = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return _assemble(planes, comps, h, w, hmax, vmax)


# ---------------------------------------------------------------- encoder

# Annex K.1 luminance quantization table (quality 50 base), raster order
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
# Annex K.2 chrominance table
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


class _FlatHuff:
    """Canonical table with every symbol at one code length — valid per
    T.81 (an incomplete code tree; no all-ones code), trivially built."""

    def __init__(self, symbols: list[int], length: int):
        assert len(symbols) < (1 << length)
        self.bits = [0] * 16
        self.bits[length - 1] = len(symbols)
        self.symbols = list(symbols)
        self.codes = {
            sym: (i, length) for i, sym in enumerate(symbols)
        }


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self) -> None:
        if self.nacc:
            self.acc <<= 8 - self.nacc
            self.acc |= (1 << (8 - self.nacc)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nacc = 0


_DC_SYMS = list(range(12))
# run/size symbols + ZRL + the EOBn run-length symbols ((r<<4)|0, r=1..14)
# that progressive AC scans emit for runs of all-zero blocks (T.81 G.1.2.2)
_AC_SYMS = [0x00, 0xF0] + [r << 4 for r in range(1, 15)] + [
    (r << 4) | s for r in range(16) for s in range(1, 12)
]
_DC_TABLE = _FlatHuff(_DC_SYMS, 4)
_AC_TABLE = _FlatHuff(_AC_SYMS, 8)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _prep_frame(pixels: np.ndarray, quality: int, subsample: bool):
    """Color-transform, subsample, edge-pad to the MCU grid, and
    forward-DCT-quantize every 8x8 block in one einsum per component.

    Returns ``(h, w, comps, tables, coefs, mcux, mcuy)`` where ``comps`` is
    ``[(cid, hh, v, tq)]``, ``tables`` maps table id -> raster-order
    quantization table, and ``coefs`` maps cid -> an ``(rows, cols, 64)``
    int64 array of quantized coefficients in ZIGZAG order over the
    MCU-padded block grid (shared by the baseline and progressive
    encoders)."""
    pixels = np.asarray(pixels, dtype=np.float64)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    qy = _scale_q(_Q_LUMA, quality)
    qc = _scale_q(_Q_CHROMA, quality)
    if gray:
        planes = [(1, 1, 1, 0, pixels - 128.0)]
        tables = {0: qy}
    else:
        r, g, b = pixels[..., 0], pixels[..., 1], pixels[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # 4:2:0 — average 2x2 neighborhoods (pad odd dims by edge)
            def down(p):
                ph = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                            mode="edge")
                return (
                    ph[0::2, 0::2] + ph[1::2, 0::2]
                    + ph[0::2, 1::2] + ph[1::2, 1::2]
                ) / 4.0
            planes = [
                (1, 2, 2, 0, y - 128.0),
                (2, 1, 1, 1, down(cb) - 128.0),
                (3, 1, 1, 1, down(cr) - 128.0),
            ]
        else:
            planes = [
                (1, 1, 1, 0, y - 128.0),
                (2, 1, 1, 1, cb - 128.0),
                (3, 1, 1, 1, cr - 128.0),
            ]
        tables = {0: qy, 1: qc}
    hmax = max(c[1] for c in planes)
    vmax = max(c[2] for c in planes)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comps = []
    coefs = {}
    for cid, hh, v, tq, plane in planes:
        comps.append((cid, hh, v, tq))
        th, tw = mcuy * 8 * v, mcux * 8 * hh
        p = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        bh, bw = th // 8, tw // 8
        blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        s_ = np.einsum("ij,yxjk,kl->yxil", _A, blocks, _A.T)
        zc = np.round(
            s_.reshape(bh, bw, 64) / tables[tq].astype(np.float64)
        ).astype(np.int64)
        coefs[cid] = zc[..., ZIGZAG]  # raster -> zigzag order
    return h, w, comps, tables, coefs, mcux, mcuy


def _emit_headers(
    out: bytearray, h: int, w: int, comps, tables, sof_marker: int,
    restart_interval: int,
) -> None:
    """APP0/DQT/SOFn/DHT/DRI shared by the baseline and progressive
    encoders.  DQT bytes are emitted in ZIGZAG order per T.81 B.2.4.1
    (``tables`` holds raster-order arrays; quantization divided raster
    coefficients by the raster table, so the stream stays consistent)."""
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)
    for tid, tbl in tables.items():
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(x) for x in tbl[ZIGZAG])
    nc = len(comps)
    out += bytes([0xFF, sof_marker]) + struct.pack(
        ">HBHHB", 8 + 3 * nc, 8, h, w, nc
    )
    for cid, hh, v, tq in comps:
        out += struct.pack(">BBB", cid, (hh << 4) | v, tq)
    # DHT — one DC + one AC table shared by all components
    for tc, tbl in ((0, _DC_TABLE), (1, _AC_TABLE)):
        nv = len(tbl.symbols)
        out += b"\xff\xc4" + struct.pack(">HB", 19 + nv, (tc << 4) | 0)
        out += bytes(tbl.bits) + bytes(tbl.symbols)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)


def _emit_dc_diff(wtr: _BitWriter, diff: int) -> None:
    s = _category(diff)
    code, ln = _DC_TABLE.codes[s]
    wtr.write(code, ln)
    if s:
        mag = diff if diff >= 0 else diff + (1 << s) - 1
        wtr.write(mag & ((1 << s) - 1), s)


def encode_jpeg(
    pixels: np.ndarray, quality: int = 90, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 pixels as a baseline
    JFIF JPEG.  ``subsample=True`` uses 4:2:0 chroma; ``restart_interval``
    emits DRI/RSTn markers every that many MCUs."""
    h, w, comps, tables, coefs, mcux, mcuy = _prep_frame(
        pixels, quality, subsample
    )
    out = bytearray(b"\xff\xd8")  # SOI
    _emit_headers(out, h, w, comps, tables, 0xC0, restart_interval)
    # SOS
    nc = len(comps)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for cid, *_ in comps:
        out += struct.pack(">BB", cid, 0x00)
    out += b"\x00\x3f\x00"

    wtr = _BitWriter()
    pred = {cid: 0 for cid, *_ in comps}
    n_mcu = mcux * mcuy
    rst = 0
    for mcu_i in range(n_mcu):
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            wtr.flush()
            out += wtr.out
            wtr = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            pred = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(mcu_i, mcux)
        for cid, hh, v, tq in comps:
            for by in range(v):
                for bx in range(hh):
                    zcoef = coefs[cid][my * v + by, mx * hh + bx]
                    dc = int(zcoef[0])
                    _emit_dc_diff(wtr, dc - pred[cid])
                    pred[cid] = dc
                    run = 0
                    last_nz = int(np.max(np.nonzero(zcoef)[0])) if np.any(
                        zcoef[1:]
                    ) else 0
                    for k in range(1, 64):
                        v_ = int(zcoef[k])
                        if v_ == 0:
                            run += 1
                            continue
                        while run > 15:
                            c, ln = _AC_TABLE.codes[0xF0]
                            wtr.write(c, ln)
                            run -= 16
                        s = _category(v_)
                        c, ln = _AC_TABLE.codes[(run << 4) | s]
                        wtr.write(c, ln)
                        mag = v_ if v_ >= 0 else v_ + (1 << s) - 1
                        wtr.write(mag & ((1 << s) - 1), s)
                        run = 0
                    if last_nz < 63:
                        c, ln = _AC_TABLE.codes[0x00]
                        wtr.write(c, ln)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------- progressive encoder
# T.81 G.1.2: scans carry one spectral band at one successive-approximation
# bit position.  DC uses an arithmetic point transform (>> Al) + the
# baseline diff coder; AC uses sign-magnitude (|v| >> Al) with EOBn codes
# spanning runs of blocks that have no newly-visible coefficient and
# buffered correction bits for already-visible ones (the emission
# discipline mirrors T.81 figure G.7: ZRLs flush pending correction bits,
# EOB runs accumulate them).


def _sos_header(out: bytearray, scan_comps, ss: int, se: int, ah: int,
                al: int) -> None:
    ns = len(scan_comps)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
    for cid in scan_comps:
        out += struct.pack(">BB", cid, 0x00)  # DC/AC table 0
    out += bytes([ss, se, (ah << 4) | al])


def _prog_dc_scan(out: bytearray, comps, coefs, mcux: int, mcuy: int,
                  ah: int, al: int, ri: int) -> None:
    """One DC scan, all components interleaved.  First pass (Ah=0) diff-codes
    the arithmetically point-transformed DC; refinement writes one raw bit
    per block."""
    _sos_header(out, [c[0] for c in comps], 0, 0, ah, al)
    wtr = _BitWriter()
    pred = {cid: 0 for cid, *_ in comps}
    rst = 0
    for u in range(mcux * mcuy):
        if ri and u and u % ri == 0:
            wtr.flush()
            out += wtr.out
            wtr = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            pred = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(u, mcux)
        for cid, hh, v, _tq in comps:
            for by in range(v):
                for bx in range(hh):
                    d = int(coefs[cid][my * v + by, mx * hh + bx, 0])
                    if ah == 0:
                        val = d >> al  # arithmetic shift per G.1.2.1
                        _emit_dc_diff(wtr, val - pred[cid])
                        pred[cid] = val
                    else:
                        wtr.write((d >> al) & 1, 1)
    wtr.flush()
    out += wtr.out


def _prog_ac_scan(out: bytearray, frame, coefs_c, cid: int, ss: int,
                  se: int, ah: int, al: int, ri: int) -> None:
    """One single-component AC scan over the component's own (unpadded)
    block grid in raster order."""
    _sos_header(out, [cid], ss, se, ah, al)
    bh, bw = _comp_block_grid(frame, cid)
    wtr = _BitWriter()
    eobrun = 0
    runbits: list[int] = []  # correction bits owned by the open EOB run
    rst = 0

    def emit_sym(sym: int) -> None:
        code, ln = _AC_TABLE.codes[sym]
        wtr.write(code, ln)

    def flush_eobrun() -> None:
        nonlocal eobrun, runbits
        if eobrun:
            r = eobrun.bit_length() - 1
            emit_sym(r << 4)
            if r:
                wtr.write(eobrun - (1 << r), r)
            eobrun = 0
        for b in runbits:
            wtr.write(b, 1)
        runbits = []

    for u in range(bh * bw):
        if ri and u and u % ri == 0:
            flush_eobrun()
            wtr.flush()
            out += wtr.out
            wtr = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
        by, bx = divmod(u, bw)
        blk = coefs_c[by, bx]
        if ah == 0:  # first scan for this band
            r = 0
            for k in range(ss, se + 1):
                v = int(blk[k])
                a = abs(v) >> al  # sign-magnitude point transform
                if a == 0:
                    r += 1
                    continue
                flush_eobrun()
                while r > 15:
                    emit_sym(0xF0)
                    r -= 16
                s = a.bit_length()
                emit_sym((r << 4) | s)
                sv = a if v >= 0 else -a
                mag = sv if sv >= 0 else sv + (1 << s) - 1
                wtr.write(mag & ((1 << s) - 1), s)
                r = 0
            if r > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eobrun()
        else:  # refinement scan
            mags = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
            eob_k = ss - 1
            for j, a in enumerate(mags):
                if a == 1:
                    eob_k = ss + j
            r = 0  # run of zero-HISTORY coefficients only
            pend: list[int] = []  # correction bits since last emission
            for k in range(ss, se + 1):
                a = mags[k - ss]
                if a == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob_k:
                    flush_eobrun()
                    emit_sym(0xF0)
                    r -= 16
                    for b in pend:
                        wtr.write(b, 1)
                    pend = []
                if a > 1:  # already visible: buffer one correction bit
                    pend.append(a & 1)
                    continue
                flush_eobrun()  # newly visible: ±1 at bit Al
                emit_sym((r << 4) | 1)
                wtr.write(1 if int(blk[k]) >= 0 else 0, 1)
                for b in pend:
                    wtr.write(b, 1)
                pend = []
                r = 0
            if r > 0 or pend:
                eobrun += 1
                runbits.extend(pend)
                if eobrun == 0x7FFF:
                    flush_eobrun()
    flush_eobrun()
    wtr.flush()
    out += wtr.out


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 90, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 pixels as a
    progressive (SOF2) JFIF JPEG using a libjpeg-style scan script:
    DC first at Al=1, per-component AC bands (1-5, 6-63) at Al=2, an AC
    refinement sweep to Al=1, the DC refinement bit, and a final AC
    refinement to Al=0 — so the decoded image equals the baseline encoding
    of the same quantized coefficients."""
    h, w, comps, tables, coefs, mcux, mcuy = _prep_frame(
        pixels, quality, subsample
    )
    frame = (h, w, comps)
    out = bytearray(b"\xff\xd8")  # SOI
    _emit_headers(out, h, w, comps, tables, 0xC2, restart_interval)
    ri = restart_interval
    _prog_dc_scan(out, comps, coefs, mcux, mcuy, 0, 1, ri)
    for cid, *_ in comps:
        _prog_ac_scan(out, frame, coefs[cid], cid, 1, 5, 0, 2, ri)
        _prog_ac_scan(out, frame, coefs[cid], cid, 6, 63, 0, 2, ri)
    for cid, *_ in comps:
        _prog_ac_scan(out, frame, coefs[cid], cid, 1, 63, 2, 1, ri)
    _prog_dc_scan(out, comps, coefs, mcux, mcuy, 1, 0, ri)
    for cid, *_ in comps:
        _prog_ac_scan(out, frame, coefs[cid], cid, 1, 63, 1, 0, ri)
    out += b"\xff\xd9"  # EOI
    return bytes(out)
