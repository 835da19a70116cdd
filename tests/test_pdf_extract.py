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


def test_encrypted_raises():
    pdf = make_pdf([SIMPLE])
    pdf = pdf.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    with pytest.raises(NotImplementedError, match="encrypted"):
        extract_pdf_text(pdf)


def test_image_stream_skipped():
    # a DCT (JPEG) XObject stream contributes nothing and doesn't fail
    img = (
        b"<< /Type /XObject /Subtype /Image /Filter /DCTDecode "
        b"/Length 4 >>\nstream\n\xff\xd8\xff\xd9\nendstream"
    )
    pdf = make_pdf([SIMPLE])
    pdf = pdf.replace(b"xref\n", b"9 0 obj\n" + img + b"\nendobj\nxref\n", 1)
    assert extract_pdf_text(pdf) == "Hello world"


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
