"""PDF text extraction — the text-based-PDF subset of Solr's extraction
module (Tika-backed `ExtractingRequestHandler`:
solr/modules/extraction/src/java/org/apache/solr/handler/extraction/
ExtractingRequestHandler.java,
ExtractingDocumentLoader.java:51 routes rich documents through Tika and
indexes the extracted text).  Tika is a JVM dependency we don't ship;
this module implements the honest subset pure-Python: PDFs whose page
content streams are raw or FlateDecode (zlib), with text drawn through
the standard `Tj` / `TJ` / `'` / `"` show operators using simple
(byte-mapped) fonts.  Encrypted documents under the PDF standard
security handler decrypt when the user password is empty — the common
"owner-locked" web PDF — for RC4 (/V 1-2 /R 2-3) and AES-128-CBC
(/V 4 /R 4 /AESV2, own FIPS-197 AES); the /U entry is verified first,
so a real user password (or AES-256 /V 5) raises `NotImplementedError`
honestly, as do exotic filters (DCT, JBIG2, LZW, CID-keyed composite
fonts), rather than emitting garbage.

Everything here is driver-/executor-side plain Python over bytes —
stdlib ``zlib`` + ``re`` only — invoked per file from an Arrow-batched
``mapInPandas`` (see ``sources.loaders.read_pdf_docs``), so the unit of
parallelism is the file, the same shape as the JavaBin/CBOR loaders.
"""

from __future__ import annotations

import hashlib
import re
import struct
import zlib

__all__ = ["extract_pdf_text", "extract_pdf_pages"]

_STREAM_RE = re.compile(
    rb"(?:(\d+)\s+(\d+)\s+obj\s*)?<<(.*?)>>\s*stream(?:\r\n|\n)", re.S
)
_UNSUPPORTED_FILTERS = (
    b"/DCTDecode",
    b"/JPXDecode",
    b"/JBIG2Decode",
    b"/CCITTFaxDecode",
    b"/LZWDecode",
    b"/RunLengthDecode",
    b"/ASCII85Decode",
    b"/ASCIIHexDecode",
)

# text-showing / positioning operators inside BT..ET; strings are either
# literal (...) with escapes or hex <..>
_TOKEN_RE = re.compile(
    rb"""
    (?P<lit>\((?:\\.|[^()\\])*(?:\((?:\\.|[^()\\])*\)(?:\\.|[^()\\])*)*\))
    | (?P<hex><[0-9A-Fa-f\s]*>)
    | (?P<num>[-+]?\d+(?:\.\d+)?|[-+]?\.\d+)
    | (?P<op>[A-Za-z'"*]+)
    | (?P<arr>[\[\]])
    """,
    re.X,
)

_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _decode_literal(raw: bytes) -> bytes:
    """PDF literal string body (between parens) -> bytes, applying the
    escape rules of spec §7.3.4.2 (named escapes, 1-3 digit octal,
    backslash-EOL line continuation, lone backslash dropped)."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        i += 1
        if i >= n:
            break
        e = raw[i : i + 1]
        if e in _ESCAPES:
            out += _ESCAPES[e]
            i += 1
        elif e in (b"\n", b"\r"):
            i += 1
            if e == b"\r" and raw[i : i + 1] == b"\n":
                i += 1
        elif e.isdigit():
            j = i
            while j < n and j - i < 3 and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i:j], 8) & 0xFF)
            i = j
        else:
            out += e
            i += 1
    return bytes(out)


def _pdf_bytes_to_str(b: bytes) -> str:
    """PDF string bytes -> text: UTF-16BE when BOM-tagged, else
    PDFDocEncoding (Latin-1 superset — exact for ASCII, the overwhelming
    case for simple fonts)."""
    if b[:2] == b"\xfe\xff":
        return b[2:].decode("utf-16-be", errors="replace")
    return b.decode("latin-1")


def _extract_stream_text(content: bytes) -> str:
    """Text-show operators of one decoded content stream -> plain text.
    `Tj`/`'`/`"` append their string; `TJ` appends its array's strings,
    inserting a space for kerning gaps <= -180 thousandths of an em
    (standard word-gap heuristic); `Td`/`TD`/`T*`/`'`/`"` break lines."""
    pieces: list[str] = []
    pending: list[str] = []  # strings seen since the last operator
    in_array = False
    arr_parts: list[str] = []
    last_num = 0.0

    def flush_line() -> None:
        if pieces and pieces[-1] != "\n":
            pieces.append("\n")

    for m in _TOKEN_RE.finditer(content):
        if m.group("lit") is not None:
            s = _pdf_bytes_to_str(_decode_literal(m.group("lit")[1:-1]))
            (arr_parts if in_array else pending).append(s)
        elif m.group("hex") is not None:
            h = re.sub(rb"\s", b"", m.group("hex")[1:-1])
            if len(h) % 2:
                h += b"0"
            s = _pdf_bytes_to_str(bytes.fromhex(h.decode("ascii")))
            (arr_parts if in_array else pending).append(s)
        elif m.group("num") is not None:
            last_num = float(m.group("num"))
            if in_array and arr_parts and last_num <= -180:
                arr_parts.append(" ")
        elif m.group("arr") is not None:
            if m.group("arr") == b"[":
                in_array, arr_parts = True, []
            else:
                in_array = False
                pending.append("".join(arr_parts))
        else:
            op = m.group("op")
            if op == b"Tj":
                pieces.extend(pending)
            elif op == b"TJ":
                pieces.extend(pending)
            elif op in (b"'", b'"'):
                flush_line()
                pieces.extend(pending)
            elif op in (b"Td", b"TD", b"T*"):
                flush_line()
            pending = []
    text = "".join(pieces)
    # normalize: collapse trailing spaces per line, strip outer blank lines
    lines = [ln.rstrip() for ln in text.split("\n")]
    return "\n".join(lines).strip("\n")


def _iter_streams(data: bytes):
    """Yield (obj_num, gen_num, dict_bytes, raw_stream_bytes) for every
    stream object (obj/gen None when the object wrapper isn't visible)."""
    for m in _STREAM_RE.finditer(data):
        body_start = m.end()
        end = data.find(b"endstream", body_start)
        if end < 0:
            continue
        raw = data[body_start:end]
        # spec: an EOL may precede `endstream`
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n") or raw.endswith(b"\r"):
            raw = raw[:-1]
        num = int(m.group(1)) if m.group(1) else None
        gen = int(m.group(2)) if m.group(2) else None
        yield num, gen, m.group(3), raw


# -- RC4 standard security handler (PDF 32000-1 §7.6.3, /V 1-2 /R 2-3) ------

_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# -- AES-128 (FIPS-197) for the V4/AESV2 crypt filter ----------------------

_AES_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_AES_INV_SBOX = bytes(256)
_AES_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_AES_SBOX):
    _AES_INV_SBOX[_v] = _i
_AES_INV_SBOX = bytes(_AES_INV_SBOX)
_AES_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p


def _aes_expand_key(key: bytes) -> list[bytes]:
    """AES-128 or AES-256 key schedule (Nk=4/8, Nr=10/14)."""
    nk = len(key) // 4
    nr = nk + 6
    words = [key[i : i + 4] for i in range(0, len(key), 4)]
    for i in range(nk, 4 * (nr + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = bytes(
                _AES_SBOX[b] for b in (t[1], t[2], t[3], t[0])
            )
            t = bytes([t[0] ^ _AES_RCON[i // nk - 1], t[1], t[2], t[3]])
        elif nk > 6 and i % nk == 4:
            t = bytes(_AES_SBOX[b] for b in t)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], t)))
    return [b"".join(words[r * 4 : r * 4 + 4]) for r in range(nr + 1)]


def _aes_encrypt_block(rk: list[bytes], block: bytes) -> bytes:
    nr = len(rk) - 1
    s = bytes(a ^ b for a, b in zip(block, rk[0]))
    for rnd in range(1, nr + 1):
        s = bytes(_AES_SBOX[b] for b in s)  # SubBytes
        # ShiftRows (column-major state: byte i is row i%4, col i//4)
        s = bytes(s[(i + (i % 4) * 4) % 16] for i in range(16))
        if rnd < nr:  # MixColumns
            out = bytearray(16)
            for c in range(4):
                col = s[c * 4 : c * 4 + 4]
                out[c * 4 + 0] = (
                    _gmul(col[0], 2) ^ _gmul(col[1], 3) ^ col[2] ^ col[3]
                )
                out[c * 4 + 1] = (
                    col[0] ^ _gmul(col[1], 2) ^ _gmul(col[2], 3) ^ col[3]
                )
                out[c * 4 + 2] = (
                    col[0] ^ col[1] ^ _gmul(col[2], 2) ^ _gmul(col[3], 3)
                )
                out[c * 4 + 3] = (
                    _gmul(col[0], 3) ^ col[1] ^ col[2] ^ _gmul(col[3], 2)
                )
            s = bytes(out)
        s = bytes(a ^ b for a, b in zip(s, rk[rnd]))
    return s


def _aes_decrypt_block(rk: list[bytes], block: bytes) -> bytes:
    nr = len(rk) - 1
    s = bytes(a ^ b for a, b in zip(block, rk[nr]))
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows
        s = bytes(s[(i - (i % 4) * 4) % 16] for i in range(16))
        s = bytes(_AES_INV_SBOX[b] for b in s)  # InvSubBytes
        s = bytes(a ^ b for a, b in zip(s, rk[rnd]))
        if rnd > 0:  # InvMixColumns
            out = bytearray(16)
            for c in range(4):
                col = s[c * 4 : c * 4 + 4]
                out[c * 4 + 0] = (
                    _gmul(col[0], 14) ^ _gmul(col[1], 11)
                    ^ _gmul(col[2], 13) ^ _gmul(col[3], 9)
                )
                out[c * 4 + 1] = (
                    _gmul(col[0], 9) ^ _gmul(col[1], 14)
                    ^ _gmul(col[2], 11) ^ _gmul(col[3], 13)
                )
                out[c * 4 + 2] = (
                    _gmul(col[0], 13) ^ _gmul(col[1], 9)
                    ^ _gmul(col[2], 14) ^ _gmul(col[3], 11)
                )
                out[c * 4 + 3] = (
                    _gmul(col[0], 11) ^ _gmul(col[1], 13)
                    ^ _gmul(col[2], 9) ^ _gmul(col[3], 14)
                )
            s = bytes(out)
    return s


def _aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2 stream: 16-byte IV prefix, PKCS#5-padded CBC body."""
    if len(data) < 32 or len(data) % 16:
        raise NotImplementedError("encrypted PDF: malformed AES stream")
    rk = _aes_expand_key(key)
    iv = data[:16]
    out = bytearray()
    prev = iv
    for i in range(16, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(
            a ^ b for a, b in zip(_aes_decrypt_block(rk, blk), prev)
        )
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16:
        raise NotImplementedError("encrypted PDF: bad AES padding")
    return bytes(out[:-pad])


def _aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt with PKCS#5 padding (the test fixtures' direction)."""
    rk = _aes_expand_key(key)
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _aes_encrypt_block(rk, blk)
        out += prev
    return bytes(out)


def _hash_r6(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """PDF 2.0 algorithm 2.B hardened hash (revision 6): iterated
    SHA-256/384/512 driven by an AES-128-CBC mixing step."""
    k = hashlib.sha256(pwd + salt + udata).digest()
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        rk = _aes_expand_key(k[:16])
        prev = k[16:32]
        e = bytearray()
        for j in range(0, len(k1), 16):
            blk = bytes(a ^ b for a, b in zip(k1[j : j + 16], prev))
            prev = _aes_encrypt_block(rk, blk)
            e += prev
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](
            bytes(e)
        ).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _aes_cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    rk = _aes_expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(
            a ^ b for a, b in zip(_aes_decrypt_block(rk, blk), prev)
        )
        prev = blk
    return bytes(out)


def _pdf_string_entry(dct: bytes, name: bytes) -> bytes | None:
    """Value of ``/name (...)`` or ``/name <hex>`` in a dict body."""
    m = re.search(name + rb"\s*\(((?:\\.|[^()\\])*)\)", dct, re.S)
    if m:
        return _decode_literal(m.group(1))
    m = re.search(name + rb"\s*<([0-9A-Fa-f\s]*)>", dct, re.S)
    if m:
        h = re.sub(rb"\s", b"", m.group(1))
        return bytes.fromhex(h.decode("ascii"))
    return None


def _parse_encryption(data: bytes):
    """Parse the /Encrypt dictionary; returns the 40-128 bit file key for
    an EMPTY user password, or raises NotImplementedError for AES or a
    real password."""
    em = re.search(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R", data)
    if not em:
        raise NotImplementedError("encrypted PDF with inline /Encrypt dict")
    num, gen = int(em.group(1)), int(em.group(2))
    om = re.search(
        rb"(?<![0-9])" + str(num).encode() + rb"\s+" + str(gen).encode()
        + rb"\s+obj\s*<<",
        data,
        re.S,
    )
    if not om:
        raise NotImplementedError("encrypted PDF: /Encrypt object not found")
    # balanced << >> scan: the dict nests (/CF << /StdCF << ... >> >>)
    i = om.end()
    depth = 1
    while i < len(data) and depth:
        if data[i : i + 2] == b"<<":
            depth += 1
            i += 2
        elif data[i : i + 2] == b">>":
            depth -= 1
            i += 2
        else:
            i += 1
    enc = data[om.end() : i - 2]
    v = int(re.search(rb"/V\s+(\d+)", enc).group(1)) if re.search(rb"/V\s+(\d+)", enc) else 0
    r = int(re.search(rb"/R\s+(\d+)", enc).group(1)) if re.search(rb"/R\s+(\d+)", enc) else 2
    method = "rc4"
    if v == 5 and r in (5, 6):
        # AES-256 (AESV3): U = hash(32) + validation salt(8) + key
        # salt(8); the file key is the AES-256-CBC decryption of /UE
        # under the key-salt hash.  Revision 6 uses the hardened 2.B
        # hash; the withdrawn revision 5 a single SHA-256.
        u_entry = _pdf_string_entry(enc, rb"/U")
        ue_entry = _pdf_string_entry(enc, rb"/UE")
        if u_entry is None or len(u_entry) < 48 or ue_entry is None:
            raise NotImplementedError(
                "encrypted PDF: incomplete V5 /Encrypt dict"
            )
        vsalt, ksalt = u_entry[32:40], u_entry[40:48]
        if r == 6:
            hfn = _hash_r6
        else:
            hfn = lambda pwd, salt, udata=b"": hashlib.sha256(
                pwd + salt + udata
            ).digest()
        if hfn(b"", vsalt) != u_entry[:32]:
            raise NotImplementedError(
                "encrypted PDF: non-empty user password required"
            )
        ik = hfn(b"", ksalt)
        file_key = _aes_cbc_decrypt_nopad(ik, bytes(16), ue_entry[:32])
        return file_key, "aes"
    if v == 4 and r == 4:
        # V4 names a crypt filter: /CFM /AESV2 (AES-128-CBC) or /V2 (RC4)
        cfm = re.search(rb"/CFM\s*/(\w+)", enc)
        if not cfm or cfm.group(1) not in (b"AESV2", b"V2"):
            raise NotImplementedError(
                "encrypted PDF: V4 crypt filter "
                f"{cfm.group(1).decode() if cfm else '?'} unsupported "
                "(AESV2 and V2 only)"
            )
        method = "aes" if cfm.group(1) == b"AESV2" else "rc4"
    elif v not in (1, 2) or r not in (2, 3):
        raise NotImplementedError(
            f"encrypted PDF: only RC4 /V 1-2 /R 2-3, AES-128 /V 4 /R 4, "
            f"and AES-256 /V 5 /R 5-6 supported (V={v} R={r})"
        )
    lm = re.search(rb"/Length\s+(\d+)", enc)
    nbytes = (int(lm.group(1)) // 8) if lm else (16 if v == 4 else 5)
    if r == 2:
        nbytes = 5
    o_entry = _pdf_string_entry(enc, rb"/O")
    u_entry = _pdf_string_entry(enc, rb"/U")
    pm = re.search(rb"/P\s+(-?\d+)", enc)
    if o_entry is None or u_entry is None or pm is None:
        raise NotImplementedError("encrypted PDF: incomplete /Encrypt dict")
    p = int(pm.group(1))
    # first file-identifier string from the trailer /ID array
    idm = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f\s]*)>", data)
    if idm:
        id0 = bytes.fromhex(
            re.sub(rb"\s", b"", idm.group(1)).decode("ascii")
        )
    else:
        idm = re.search(rb"/ID\s*\[\s*\(((?:\\.|[^()\\])*)\)", data, re.S)
        id0 = _decode_literal(idm.group(1)) if idm else b""
    # Algorithm 2 with the empty user password
    seed = _PAD + o_entry[:32] + struct.pack("<i", p) + id0
    if r >= 4 and re.search(rb"/EncryptMetadata\s+false", enc):
        seed += b"\xff\xff\xff\xff"
    h = hashlib.md5(seed).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:nbytes]).digest()
    key = h[:nbytes]
    # Algorithm 6: verify /U so a REAL user password raises instead of
    # silently decoding garbage
    if r == 2:
        ok = _rc4(key, _PAD) == u_entry[:32]
    else:
        u = _rc4(key, hashlib.md5(_PAD + id0).digest())
        for i in range(1, 20):
            u = _rc4(bytes(b ^ i for b in key), u)
        ok = u == u_entry[:16]
    if not ok:
        raise NotImplementedError(
            "encrypted PDF: non-empty user password required"
        )
    return key, method


def _object_key(
    file_key: bytes, num: int, gen: int, aes: bool = False
) -> bytes:
    h = hashlib.md5(
        file_key
        + struct.pack("<I", num)[:3]
        + struct.pack("<I", gen)[:2]
        + (b"sAlT" if aes else b"")  # AESV2 salt (spec algorithm 1)
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


def extract_pdf_pages(data: bytes) -> list[str]:
    """PDF bytes -> list of per-content-stream extracted texts (streams
    that contain no text operators are skipped).  Raises ValueError for
    non-PDF input, NotImplementedError for encrypted files or streams
    with entropy/exotic filters that carry text."""
    data = bytes(data)
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF stream")
    file_key = method = None
    if re.search(rb"/Encrypt\b", data):
        file_key, method = _parse_encryption(data)
    out: list[str] = []
    for num, gen, dct, raw in _iter_streams(data):
        is_xref = b"/XRef" in dct
        is_objstm = b"/ObjStm" in dct
        if file_key is not None and not is_xref:
            # PDF 1.5+ cross-reference streams are stored UNENCRYPTED
            # (ISO 32000-1 7.5.8.2) — decrypting them corrupts the bytes;
            # object streams and content streams decrypt normally
            if num is None:
                raise NotImplementedError(
                    "encrypted PDF: stream without an object wrapper"
                )
            # V5/AES-256 uses the file key for every object; the earlier
            # revisions derive a per-object key
            okey = (
                file_key
                if len(file_key) == 32
                else _object_key(
                    file_key, num, gen or 0, aes=(method == "aes")
                )
            )
            raw = (
                _aes_cbc_decrypt(okey, raw)
                if method == "aes"
                else _rc4(okey, raw)
            )
        if b"/FlateDecode" in dct:
            try:
                content = zlib.decompress(raw)
            except zlib.error as e:
                if is_xref or is_objstm:
                    # xref/object streams carry no Tj text operators; a
                    # predictor-filtered xref stream must not abort the
                    # extraction of the decryptable content streams
                    continue
                raise NotImplementedError(
                    f"undecodable FlateDecode stream ({e}); predictor or "
                    "multi-filter chains not supported"
                ) from e
        elif any(f in dct for f in _UNSUPPORTED_FILTERS):
            # image/entropy streams carry no extractable text; skip unless
            # they claim to be text-bearing (they can't — Tj lives in
            # content streams, which are raw or Flate in practice)
            continue
        else:
            content = raw
        if b"BT" not in content:
            continue
        text = _extract_stream_text(content)
        if text:
            out.append(text)
    return out


def extract_pdf_text(data: bytes) -> str:
    """PDF bytes -> one extracted text blob (pages joined by form feed,
    mirroring Tika's page separator)."""
    return "\f".join(extract_pdf_pages(data))
