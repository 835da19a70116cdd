"""PDF text extraction (the text-based subset of the reference's
extraction module — ExtractingDocumentLoader.java:51 routes rich docs
through Tika; we implement raw/FlateDecode content streams + simple-font
text operators pure-Python).  Fixtures are synthesized in-test, so every
byte of the input is known."""

from __future__ import annotations

import zlib

import pytest

from apache___solr_spark.sources.pdf_extract import (
    extract_pdf_pages,
    extract_pdf_text,
)


def make_pdf(contents: list[bytes], compress: bool = False) -> bytes:
    """Minimal syntactically-valid PDF: one page per content stream."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    n_pages = len(contents)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))

    def obj(num: int, body: bytes) -> None:
        offsets.append(len(out))
        out.extend(f"{num} 0 obj\n".encode() + body + b"\nendobj\n")

    obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    obj(
        2,
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
    )
    for i, content in enumerate(contents):
        page_num = 3 + 2 * i
        stream_num = page_num + 1
        obj(
            page_num,
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {stream_num} 0 R >>"
            ).encode(),
        )
        data = zlib.compress(content) if compress else content
        filt = b" /Filter /FlateDecode" if compress else b""
        obj(
            stream_num,
            b"<< /Length "
            + str(len(data)).encode()
            + filt
            + b" >>\nstream\n"
            + data
            + b"\nendstream",
        )
    xref_at = len(out)
    out.extend(f"xref\n0 {len(offsets) + 1}\n".encode())
    out.extend(b"0000000000 65535 f \n")
    for off in offsets:
        out.extend(f"{off:010d} 00000 n \n".encode())
    out.extend(
        f"trailer\n<< /Size {len(offsets) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n".encode()
    )
    return bytes(out)


SIMPLE = b"BT /F1 12 Tf 72 720 Td (Hello world) Tj ET"


def test_simple_tj():
    assert extract_pdf_text(make_pdf([SIMPLE])) == "Hello world"


def test_flate_stream():
    assert extract_pdf_text(make_pdf([SIMPLE], compress=True)) == "Hello world"


def test_multiline_td_and_quote():
    content = (
        b"BT 72 720 Td (line one) Tj 0 -14 Td (line two) Tj "
        b"(line three)' ET"
    )
    assert extract_pdf_text(make_pdf([content])).split("\n") == [
        "line one",
        "line two",
        "line three",
    ]


def test_tj_array_kerning_space():
    # gaps <= -180/1000 em read as word gaps; smaller ones are kerning
    content = b"BT [(Hel) -20 (lo) -250 (world)] TJ ET"
    assert extract_pdf_text(make_pdf([content])) == "Hello world"


def test_escapes_and_octal():
    content = rb"BT (paren \( close \) back\\slash \101\102\103) Tj ET"
    assert (
        extract_pdf_text(make_pdf([content]))
        == "paren ( close ) back\\slash ABC"
    )


def test_hex_string_and_utf16():
    content = b"BT <48 65 78> Tj ( ) Tj <FEFF00E9> Tj ET"
    assert extract_pdf_text(make_pdf([content])) == "Hex \xe9"


def test_pages_join_with_formfeed():
    pdf = make_pdf(
        [b"BT (page one) Tj ET", b"BT (page two) Tj ET"], compress=True
    )
    assert extract_pdf_pages(pdf) == ["page one", "page two"]
    assert extract_pdf_text(pdf) == "page one\fpage two"


def test_non_pdf_raises():
    with pytest.raises(ValueError, match="not a PDF"):
        extract_pdf_text(b"GIF89a...")


def _encrypt_pdf(pdf: bytes, r: int = 3, owner_pwd: bytes = b"owner") -> bytes:
    """Standard-security encrypt (PDF spec algorithms 2/3/4/5) with an
    EMPTY user password — an independent implementation of the spec, so
    the extractor's decryption is tested against the format.  r=2/3:
    RC4 (40/128-bit); r=4: the V4 /AESV2 crypt filter (AES-128-CBC,
    deterministic per-object IVs)."""
    import hashlib
    import re as _re
    import struct

    from apache___solr_spark.sources.pdf_extract import (
        _PAD,
        _aes_cbc_encrypt,
        _rc4,
    )

    nbytes = 5 if r == 2 else 16
    p = -4  # modify-restricted, the common owner-locked flag word shape
    id0 = hashlib.md5(pdf).digest()

    def pad(pw: bytes) -> bytes:
        return (pw + _PAD)[:32]

    # Algorithm 3: the /O entry
    h = hashlib.md5(pad(owner_pwd)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    okey = h[:nbytes]
    o = _rc4(okey, pad(b""))
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in okey), o)
    # Algorithm 2: the file key (empty user password)
    h = hashlib.md5(pad(b"") + o + struct.pack("<i", p) + id0).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:nbytes]).digest()
    key = h[:nbytes]
    # Algorithms 4/5: the /U entry
    if r == 2:
        u = _rc4(key, _PAD)
    else:
        u = _rc4(key, hashlib.md5(_PAD + id0).digest())
        for i in range(1, 20):
            u = _rc4(bytes(b ^ i for b in key), u)
        u = u + b"\x00" * 16
    # encrypt every stream body with its per-object key
    out = bytearray()
    pos = 0
    stream_re = _re.compile(
        rb"(\d+)\s+(\d+)\s+obj\s*<<.*?>>\s*stream\n", _re.S
    )
    for m in stream_re.finditer(pdf):
        if b"/XRef" in m.group(0):
            continue  # producers store cross-reference streams plaintext
        body_start = m.end()
        end = pdf.find(b"\nendstream", body_start)
        num, gen = int(m.group(1)), int(m.group(2))
        okey2 = hashlib.md5(
            key + struct.pack("<I", num)[:3] + struct.pack("<I", gen)[:2]
            + (b"sAlT" if r == 4 else b"")
        ).digest()[: min(nbytes + 5, 16)]
        out += pdf[pos:body_start]
        if r == 4:
            iv = hashlib.md5(b"iv" + struct.pack("<I", num)).digest()
            out += _aes_cbc_encrypt(okey2, iv, pdf[body_start:end])
        else:
            out += _rc4(okey2, pdf[body_start:end])
        pos = end
    out += pdf[pos:]
    n_obj = max(
        int(m.group(1)) for m in _re.finditer(rb"(\d+)\s+\d+\s+obj", pdf)
    )
    enc_num = n_obj + 1
    v = {2: 1, 3: 2, 4: 4}[r]
    cf = (
        " /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
        "/StmF /StdCF /StrF /StdCF"
        if r == 4
        else ""
    )
    enc_obj = (
        f"{enc_num} 0 obj\n<< /Filter /Standard /V {v} /R {r} "
        f"/Length {nbytes * 8} /P {p}{cf} /O <{o.hex()}> /U <{u.hex()}> >>\n"
        f"endobj\n"
    ).encode()
    out = bytes(out).replace(b"xref\n", enc_obj + b"xref\n", 1)
    return out.replace(
        b"/Root 1 0 R",
        f"/Root 1 0 R /Encrypt {enc_num} 0 R /ID [<{id0.hex()}> <{id0.hex()}>]".encode(),
        1,
    )


@pytest.mark.parametrize("r", [2, 3, 4])
@pytest.mark.parametrize("compress", [False, True])
def test_encrypted_pdf_decrypts(r, compress):
    """Owner-locked (empty user password) encrypted PDFs decrypt and
    extract the same text as their plaintext twins — R=2 (40-bit RC4),
    R=3 (128-bit RC4), and R=4 (V4 /AESV2 AES-128-CBC), raw and Flate
    streams."""
    plain = make_pdf([SIMPLE], compress=compress)
    enc = _encrypt_pdf(plain, r=r)
    assert extract_pdf_text(enc) == extract_pdf_text(plain) == "Hello world"


def test_encrypted_with_user_password_raises():
    plain = make_pdf([SIMPLE])
    enc = _encrypt_pdf(plain, r=3)
    # corrupt /U so the empty-password check fails -> must raise, never
    # emit garbage
    import re as _re

    m = _re.search(rb"/U <([0-9a-f]+)>", enc)
    bad = enc.replace(m.group(1), m.group(1)[::-1], 1)
    with pytest.raises(NotImplementedError, match="password"):
        extract_pdf_text(bad)


def test_unknown_revision_raises():
    plain = make_pdf([SIMPLE])
    enc = _encrypt_pdf(plain, r=3)
    bad = enc.replace(b"/V 2 /R 3", b"/V 6 /R 7", 1)
    with pytest.raises(NotImplementedError, match="supported"):
        extract_pdf_text(bad)
    enc4 = _encrypt_pdf(plain, r=4)
    bad4 = enc4.replace(b"/CFM /AESV2", b"/CFM /AESV3", 1)
    with pytest.raises(NotImplementedError, match="crypt filter"):
        extract_pdf_text(bad4)


def test_image_stream_skipped():
    # a DCT (JPEG) XObject stream contributes nothing and doesn't fail
    img = (
        b"<< /Type /XObject /Subtype /Image /Filter /DCTDecode "
        b"/Length 4 >>\nstream\n\xff\xd8\xff\xd9\nendstream"
    )
    pdf = make_pdf([SIMPLE])
    pdf = pdf.replace(b"xref\n", b"9 0 obj\n" + img + b"\nendobj\nxref\n", 1)
    assert extract_pdf_text(pdf) == "Hello world"


def test_encrypted_pdf_with_xref_stream():
    """PDF 1.5+ cross-reference streams are stored UNENCRYPTED (ISO
    32000-1 7.5.8.2); the extractor must not 'decrypt' (corrupt) them —
    regression: an encrypted PDF using xref streams failed extraction
    entirely because the bogusly-decrypted xref stream no longer
    inflated.  A predictor-filtered (undecodable) xref or object stream
    must be skipped, not abort the decryptable content streams."""
    import zlib as _zlib

    plain = make_pdf([SIMPLE], compress=True)
    # unencrypted predictor-filtered xref stream, as a 1.5+ producer
    # writes it (our inflater has no predictor support — it must skip)
    xref = (
        b"8 0 obj\n<< /Type /XRef /Filter /FlateDecode /W [1 2 1] "
        b"/Size 9 /DecodeParms << /Predictor 12 /Columns 4 >> >>\n"
        b"stream\n" + _zlib.compress(bytes(range(40))) + b"\nendstream\nendobj\n"
    )
    # plus an ENCRYPTED object stream whose payload our inflater cannot
    # decode (simulates predictor chains) — tolerated, not fatal
    objstm = (
        b"9 0 obj\n<< /Type /ObjStm /Filter /FlateDecode /N 1 >>\n"
        b"stream\nnot-zlib-bytes\nendstream\nendobj\n"
    )
    pdf = plain.replace(b"xref\n", xref + objstm + b"xref\n", 1)
    for r in (3, 4):
        enc = _encrypt_pdf(pdf, r=r)
        assert extract_pdf_text(enc) == "Hello world"
    enc5 = _encrypt_pdf_v5(pdf, r=6)
    assert extract_pdf_text(enc5) == "Hello world"


def test_read_pdf_docs_loader(spark, tmp_path):
    from apache___solr_spark.sources.loaders import read_pdf_docs

    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "a.pdf").write_bytes(make_pdf([b"BT (doc A) Tj ET"], compress=True))
    (d / "b.pdf").write_bytes(
        make_pdf([b"BT (doc B p1) Tj ET", b"BT (doc B p2) Tj ET"])
    )
    (d / "broken.pdf").write_bytes(b"not really a pdf")
    df = read_pdf_docs(spark, str(d)).orderBy("id")
    rows = {r["id"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert rows["a.pdf"]["text"] == "doc A"
    assert rows["a.pdf"]["n_pages"] == 1 and rows["a.pdf"]["err"] is None
    assert rows["b.pdf"]["text"] == "doc B p1\fdoc B p2"
    assert rows["b.pdf"]["n_pages"] == 2
    assert rows["broken.pdf"]["text"] is None
    assert "ValueError" in rows["broken.pdf"]["err"]


def _encrypt_pdf_v5(pdf: bytes, r: int = 6) -> bytes:
    """AES-256 (V5/AESV3) encrypt with an empty user password: U carries
    the validation/key salts, UE the file key wrapped under the key-salt
    hash (algorithm 8); streams AES-256-CBC with IV prefix + PKCS#5."""
    import hashlib
    import re as _re
    import struct

    from apache___solr_spark.sources.pdf_extract import (
        _aes_cbc_encrypt,
        _aes_expand_key,
        _aes_encrypt_block,
        _hash_r6,
    )

    vsalt = hashlib.md5(b"vs").digest()[:8]
    ksalt = hashlib.md5(b"ks").digest()[:8]
    file_key = hashlib.sha256(b"the file key").digest()
    if r == 6:
        hfn = _hash_r6
    else:
        hfn = lambda pwd, salt: hashlib.sha256(pwd + salt).digest()
    u = hfn(b"", vsalt) + vsalt + ksalt
    ik = hfn(b"", ksalt)
    # wrap the file key: AES-256-CBC, zero IV, NO padding (algorithm 8)
    rk = _aes_expand_key(ik)
    prev = bytes(16)
    ue = bytearray()
    for i in range(0, 32, 16):
        blk = bytes(a ^ b for a, b in zip(file_key[i : i + 16], prev))
        prev = _aes_encrypt_block(rk, blk)
        ue += prev
    out = bytearray()
    pos = 0
    stream_re = _re.compile(rb"(\d+)\s+(\d+)\s+obj\s*<<.*?>>\s*stream\n", _re.S)
    for m in stream_re.finditer(pdf):
        if b"/XRef" in m.group(0):
            continue  # producers store cross-reference streams plaintext
        body_start = m.end()
        end = pdf.find(b"\nendstream", body_start)
        num = int(m.group(1))
        iv = hashlib.md5(b"iv5" + struct.pack("<I", num)).digest()
        out += pdf[pos:body_start]
        out += _aes_cbc_encrypt(file_key, iv, pdf[body_start:end])
        pos = end
    out += pdf[pos:]
    n_obj = max(int(m.group(1)) for m in _re.finditer(rb"(\d+)\s+\d+\s+obj", pdf))
    enc_num = n_obj + 1
    enc_obj = (
        f"{enc_num} 0 obj\n<< /Filter /Standard /V 5 /R {r} /Length 256 "
        f"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF "
        f"/StrF /StdCF /P -4 /U <{bytes(u).hex()}> /UE <{bytes(ue).hex()}> "
        f"/O <{'00' * 48}> /OE <{'00' * 32}> >>\nendobj\n"
    ).encode()
    out = bytes(out).replace(b"xref\n", enc_obj + b"xref\n", 1)
    return out.replace(
        b"/Root 1 0 R", f"/Root 1 0 R /Encrypt {enc_num} 0 R".encode(), 1
    )


@pytest.mark.parametrize("r", [5, 6])
@pytest.mark.parametrize("compress", [False, True])
def test_aes256_encrypted_pdf_decrypts(r, compress):
    """AES-256 owner-locked PDFs (V5: withdrawn revision 5's plain
    SHA-256 and revision 6's hardened 2.B hash) decrypt byte-identical
    to their plaintext twins."""
    plain = make_pdf([SIMPLE], compress=compress)
    enc = _encrypt_pdf_v5(plain, r=r)
    assert extract_pdf_text(enc) == extract_pdf_text(plain) == "Hello world"


def test_aes256_wrong_password_raises():
    plain = make_pdf([SIMPLE])
    enc = _encrypt_pdf_v5(plain, r=6)
    import re as _re

    m = _re.search(rb"/U <([0-9a-f]+)>", enc)
    bad = enc.replace(m.group(1), m.group(1)[::-1], 1)
    with pytest.raises(NotImplementedError, match="password"):
        extract_pdf_text(bad)
