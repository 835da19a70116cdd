"""JavaBin and CBOR update-payload codecs, pure Python.

The reference ingests update payloads in two binary formats besides
JSON/XML/CSV:

- JavaBin (solr/solrj/src/java/org/apache/solr/common/util/
  JavaBinCodec.java; handler/loader/JavabinLoader.java): Solr's own
  tagged binary serialization.  An update request is a marshalled
  NamedList {params, delByQ, docs: Iterator<SolrInputDocument>}
  (client/solrj/request/JavaBinUpdateRequestCodec.java:56-88).
- CBOR (RFC 8949; handler/loader/CborLoader.java): a stream of doc maps
  or one array of doc maps, parsed by Jackson's CBORParser.

Both decoders here are implemented from the public wire formats (the
JavaBinCodec tag table and RFC 8949), not ports: decode happens inside an
Arrow-batched UDF over ``spark.read.format("binaryFile")``, so a directory
of payload files decodes in parallel across executors — the 100 TB shape
is "many files, one task each", identical to the parquet loaders.

Scope: the decoders cover every tag an update payload can contain
(primitives, strings incl. extern-string back-references, dates, byte
arrays, maps, named lists, arrays, iterators, SolrInputDocuments with
child documents, map entries, enum field values, primitive arrays), plus
the query-RESPONSE structures SOLRDOC / SOLRDOCLST
(JavaBinCodec.readSolrDocument / readSolrDocumentList) so a stored query
response re-ingests as documents.  The encoders exist so tests can build
golden payloads without SolrJ; they emit the same subset.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from datetime import datetime, timezone

__all__ = [
    "NamedList",
    "SolrInputDoc",
    "SolrDoc",
    "SolrDocList",
    "JavaBinIterator",
    "javabin_dumps",
    "javabin_loads",
    "javabin_update_payload",
    "javabin_extract_docs",
    "cbor_dumps",
    "cbor_loads",
    "END_OBJ",
]

# -- JavaBin tag table (JavaBinCodec.java:84-114) ---------------------------
_NULL = 0
_BOOL_TRUE = 1
_BOOL_FALSE = 2
_BYTE = 3
_SHORT = 4
_DOUBLE = 5
_INT = 6
_LONG = 7
_FLOAT = 8
_DATE = 9
_MAP = 10
_SOLRDOC = 11
_SOLRDOCLST = 12
_BYTEARR = 13
_ITERATOR = 14
_END = 15
_SOLRINPUTDOC = 16
_MAP_ENTRY_ITER = 17
_ENUM_FIELD_VALUE = 18
_MAP_ENTRY = 19
_UUID = 20
_PRIMITIVE_ARR = 21
_STR = 1 << 5
_SINT = 2 << 5
_SLONG = 3 << 5
_ARR = 4 << 5
_ORDERED_MAP = 5 << 5
_NAMED_LST = 6 << 5
_EXTERN_STRING = 7 << 5

_VERSION = 2  # JavaBinCodec.java:119


class END_OBJ:  # sentinel mirroring JavaBinCodec.END_OBJ
    pass


class NamedList(list):
    """Ordered (name, value) pairs — names may repeat (NamedList.java)."""

    def get(self, name, default=None):
        for k, v in self:
            if k == name:
                return v
        return default

    def asdict(self) -> dict:
        return {k: v for k, v in self}


class JavaBinIterator(list):
    """A list marshalled as the streaming ITERATOR tag (END-terminated)."""


@dataclass
class SolrInputDoc:
    """SolrInputDocument: fields + optional nested child documents."""

    fields: dict = field(default_factory=dict)
    children: list = field(default_factory=list)

    def as_plain(self) -> dict:
        out = dict(self.fields)
        if self.children:
            out["_childDocuments_"] = [c.as_plain() for c in self.children]
        return out


@dataclass
class SolrDoc:
    """SolrDocument — the query-RESPONSE document shape (SOLRDOC tag,
    JavaBinCodec.readSolrDocument): fields + optional child documents."""

    fields: dict = field(default_factory=dict)
    children: list = field(default_factory=list)

    def as_plain(self) -> dict:
        out = dict(self.fields)
        if self.children:
            out["_childDocuments_"] = [c.as_plain() for c in self.children]
        return out


class SolrDocList(list):
    """SolrDocumentList (SOLRDOCLST tag): docs plus the result header
    [numFound, start, maxScore, numFoundExact] JavaBinCodec marshals
    ahead of the document array (readSolrDocumentList)."""

    num_found: int = 0
    start: int = 0
    max_score: float | None = None
    num_found_exact: bool = True


def _write_vint(out: bytearray, i: int) -> None:
    while i & ~0x7F:
        out.append((i & 0x7F) | 0x80)
        i >>= 7
    out.append(i)


class _JavaBinWriter:
    def __init__(self) -> None:
        self.out = bytearray([_VERSION])
        self._externs: dict[str, int] = {}

    def _tag(self, tag: int, size: int = 0) -> None:
        # JavaBinCodec.writeTag: small tags carry size in a vint; the
        # tag+len family packs size into the low 5 bits with 0x1f overflow
        if tag & 0xE0:
            if size < 0x1F:
                self.out.append(tag | size)
            else:
                self.out.append(tag | 0x1F)
                _write_vint(self.out, size - 0x1F)
        else:
            self.out.append(tag)
            _write_vint(self.out, size)

    def _extern_string(self, s: str) -> None:
        idx = self._externs.get(s, 0)
        self._tag(_EXTERN_STRING, idx)
        if idx == 0:
            self._str(s)
            self._externs[s] = len(self._externs) + 1

    def _str(self, s: str) -> None:
        b = s.encode("utf-8")
        self._tag(_STR, len(b))
        self.out.extend(b)

    def write(self, v) -> None:
        if v is None:
            self.out.append(_NULL)
        elif v is True:
            self.out.append(_BOOL_TRUE)
        elif v is False:
            self.out.append(_BOOL_FALSE)
        elif isinstance(v, str):
            self._str(v)
        elif isinstance(v, int):
            # writeInt: positive ints pack low nibble into SINT; others
            # fall back to fixed-width INT/LONG big-endian
            if 0 <= v < (1 << 63):
                tag = _SLONG if v > 0x7FFFFFFF else _SINT
                b = tag | (v & 0x0F)
                if v >= 0x0F:
                    self.out.append(b | 0x10)
                    _write_vint(self.out, v >> 4)
                else:
                    self.out.append(b)
            elif -(1 << 31) <= v < (1 << 31):
                self.out.append(_INT)
                self.out.extend(struct.pack(">i", v))
            else:
                self.out.append(_LONG)
                self.out.extend(struct.pack(">q", v))
        elif isinstance(v, float):
            self.out.append(_DOUBLE)
            self.out.extend(struct.pack(">d", v))
        elif isinstance(v, datetime):
            self.out.append(_DATE)
            self.out.extend(struct.pack(">q", int(v.timestamp() * 1000)))
        elif isinstance(v, (bytes, bytearray)):
            self.out.append(_BYTEARR)
            _write_vint(self.out, len(v))
            self.out.extend(v)
        elif isinstance(v, SolrInputDoc):
            self._tag(_SOLRINPUTDOC, len(v.fields) + len(v.children))
            self.out.append(_FLOAT)
            self.out.extend(struct.pack(">f", 1.0))  # doc boost, always 1
            for name, val in v.fields.items():
                self._extern_string(name)
                self.write(val)
            for child in v.children:
                self.write(child)
        elif isinstance(v, SolrDoc):
            # writeSolrDocument: SOLRDOC tag, then an ORDERED_MAP sized
            # fields+children — children follow the entries, untagged by name
            self.out.append(_SOLRDOC)
            self._tag(_ORDERED_MAP, len(v.fields) + len(v.children))
            for name, val in v.fields.items():
                self._extern_string(name)
                self.write(val)
            for child in v.children:
                self.write(child)
        elif isinstance(v, SolrDocList):
            # writeSolrDocumentList: SOLRDOCLST tag, header array, doc array
            self.out.append(_SOLRDOCLST)
            self.write(
                [v.num_found, v.start, v.max_score, v.num_found_exact]
            )
            self.write(list(v))
        elif isinstance(v, NamedList):
            self._tag(_ORDERED_MAP, len(v))
            for name, val in v:
                self._extern_string(name)
                self.write(val)
        elif isinstance(v, JavaBinIterator):
            self.out.append(_ITERATOR)
            for item in v:
                self.write(item)
            self.out.append(_END)
        elif isinstance(v, dict):
            self._tag(_MAP, len(v))
            for k, val in v.items():
                if isinstance(k, str):
                    self._extern_string(k)
                else:
                    self.write(k)
                self.write(val)
        elif isinstance(v, (list, tuple)):
            self._tag(_ARR, len(v))
            for item in v:
                self.write(item)
        else:
            raise NotImplementedError(f"cannot marshal {type(v).__name__}")


def javabin_dumps(obj) -> bytes:
    """Marshal ``obj`` as a JavaBin stream (version byte + tagged value)."""
    w = _JavaBinWriter()
    w.write(obj)
    return bytes(w.out)


def javabin_update_payload(
    docs: list[dict], params: dict | None = None
) -> bytes:
    """Build the update-request payload JavabinLoader consumes
    (JavaBinUpdateRequestCodec.marshal: NamedList{params, delByQ,
    docs: iterator-of-SolrInputDocument})."""
    nl = NamedList(
        [
            ("params", NamedList(sorted((params or {}).items()))),
            ("delByQ", None),
            (
                "docs",
                JavaBinIterator(
                    SolrInputDoc(
                        {k: v for k, v in d.items() if k != "_childDocuments_"},
                        [
                            SolrInputDoc(c)
                            for c in d.get("_childDocuments_", [])
                        ],
                    )
                    for d in docs
                ),
            ),
        ]
    )
    return javabin_dumps(nl)


class _JavaBinReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.externs: list[str] = []

    def _byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def _take(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated JavaBin stream")
        self.pos += n
        return b

    def _vint(self) -> int:
        b = self._byte()
        i = b & 0x7F
        shift = 7
        while b & 0x80:
            b = self._byte()
            i |= (b & 0x7F) << shift
            shift += 7
        return i

    def _size(self, tag: int) -> int:
        sz = tag & 0x1F
        if sz == 0x1F:
            sz += self._vint()
        return sz

    def read(self):
        tag = self._byte()
        top = tag >> 5
        if top == _STR >> 5:
            return self._take(self._size(tag)).decode("utf-8")
        if top == _SINT >> 5:
            v = tag & 0x0F
            if tag & 0x10:
                v = (self._vint() << 4) | v
            return v
        if top == _SLONG >> 5:
            v = tag & 0x0F
            if tag & 0x10:
                v = (self._vint() << 4) | v
            return v
        if top == _ARR >> 5:
            return [self.read() for _ in range(self._size(tag))]
        if top in (_ORDERED_MAP >> 5, _NAMED_LST >> 5):
            return NamedList(
                (self.read(), self.read()) for _ in range(self._size(tag))
            )
        if top == _EXTERN_STRING >> 5:
            idx = self._size(tag)
            if idx:
                return self.externs[idx - 1]
            s = self.read()  # a STR follows
            self.externs.append(s)
            return s
        if tag == _NULL:
            return None
        if tag == _BOOL_TRUE:
            return True
        if tag == _BOOL_FALSE:
            return False
        if tag == _BYTE:
            return struct.unpack(">b", self._take(1))[0]
        if tag == _SHORT:
            return struct.unpack(">h", self._take(2))[0]
        if tag == _INT:
            return struct.unpack(">i", self._take(4))[0]
        if tag == _LONG:
            return struct.unpack(">q", self._take(8))[0]
        if tag == _FLOAT:
            return struct.unpack(">f", self._take(4))[0]
        if tag == _DOUBLE:
            return struct.unpack(">d", self._take(8))[0]
        if tag == _DATE:
            ms = struct.unpack(">q", self._take(8))[0]
            return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)
        if tag == _BYTEARR:
            return bytes(self._take(self._vint()))
        if tag == _MAP:
            return {self.read(): self.read() for _ in range(self._vint())}
        if tag == _ITERATOR or tag == _MAP_ENTRY_ITER:
            items = []
            while True:
                v = self.read()
                if v is END_OBJ:
                    break
                if tag == _MAP_ENTRY_ITER:
                    items.append((v, self.read()))
                else:
                    items.append(v)
            return dict(items) if tag == _MAP_ENTRY_ITER else items
        if tag == _END:
            return END_OBJ
        if tag == _SOLRINPUTDOC:
            sz = self._vint()
            boost = self.read()  # doc boost float, ignored (always 1 now)
            assert isinstance(boost, float)
            doc = SolrInputDoc()
            for _ in range(sz):
                obj = self.read()
                if isinstance(obj, float):
                    obj = self.read()  # ignored field boost, name follows
                if isinstance(obj, SolrInputDoc):
                    doc.children.append(obj)
                    continue
                doc.fields[obj] = self.read()
            return doc
        if tag == _MAP_ENTRY:
            return (self.read(), self.read())
        if tag == _ENUM_FIELD_VALUE:
            self.read()  # int ordinal
            return self.read()  # string value
        if tag == _PRIMITIVE_ARR:
            elem_tag = self._byte()
            n = self._vint()
            fmt = {
                _INT: ">i",
                _LONG: ">q",
                _FLOAT: ">f",
                _DOUBLE: ">d",
                _BYTE: ">b",
                _SHORT: ">h",
            }.get(elem_tag)
            if fmt is None:
                raise NotImplementedError(
                    f"primitive array element tag {elem_tag}"
                )
            w = struct.calcsize(fmt)
            return [
                struct.unpack(fmt, self._take(w))[0] for _ in range(n)
            ]
        if tag == _SOLRDOC:
            # readSolrDocument: the ORDERED_MAP tag byte + size follow; each
            # slot is either a field name (then its value) or a child doc
            inner = self._byte()
            sz = self._size(inner)
            doc = SolrDoc()
            for _ in range(sz):
                obj = self.read()
                if isinstance(obj, SolrDoc):
                    doc.children.append(obj)
                    continue
                doc.fields[obj] = self.read()
            return doc
        if tag == _SOLRDOCLST:
            # readSolrDocumentList: header array then the document array
            header = self.read()
            docs = SolrDocList(self.read())
            docs.num_found = header[0]
            docs.start = header[1]
            docs.max_score = header[2]
            docs.num_found_exact = (
                bool(header[3]) if len(header) > 3 else True
            )
            return docs
        raise ValueError(f"unknown JavaBin tag {tag}")


def javabin_loads(data: bytes):
    """Unmarshal one JavaBin stream (checks the version byte)."""
    r = _JavaBinReader(data)
    version = r._byte()
    if version != _VERSION:
        raise ValueError(f"JavaBin version {version}, expected {_VERSION}")
    return r.read()


def javabin_extract_docs(obj) -> list[dict]:
    """Pull plain doc dicts out of a decoded payload: an update-request
    NamedList ("docs" iterator / "docsMap" entries), a query response
    (its "response" SolrDocList), a bare list of docs, or a single
    document."""
    if isinstance(obj, (SolrInputDoc, SolrDoc)):
        return [obj.as_plain()]
    if isinstance(obj, NamedList):
        resp = obj.get("response")
        if isinstance(resp, SolrDocList):
            return javabin_extract_docs(resp)
        docs = obj.get("docs") or []
        out = [d.as_plain() if isinstance(d, SolrInputDoc) else d for d in docs]
        for entry in obj.get("docsMap") or []:
            d = entry[0] if isinstance(entry, tuple) else entry
            out.append(d.as_plain() if isinstance(d, SolrInputDoc) else d)
        return out
    if isinstance(obj, list):
        return [
            d.as_plain()
            if isinstance(d, (SolrInputDoc, SolrDoc))
            else d
            for d in obj
        ]
    raise ValueError(f"no documents in JavaBin payload ({type(obj).__name__})")


# -- CBOR (RFC 8949) ---------------------------------------------------------

_CBOR_BREAK = object()


class _CborReader:
    """RFC 8949 decoder with stringref support (tags 256/25 — the
    Jackson CBORGenerator.Feature.STRINGREF the reference's writer can
    emit; http://cbor.schmorp.de/stringref assignment thresholds)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._refs: list | None = None

    def at_end(self) -> bool:
        return self.pos >= len(self.data)

    def _byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def _take(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated CBOR stream")
        self.pos += n
        return b

    def _length(self, info: int) -> int | None:
        if info < 24:
            return info
        if info == 24:
            return self._byte()
        if info == 25:
            return struct.unpack(">H", self._take(2))[0]
        if info == 26:
            return struct.unpack(">I", self._take(4))[0]
        if info == 27:
            return struct.unpack(">Q", self._take(8))[0]
        if info == 31:
            return None  # indefinite
        raise ValueError(f"reserved CBOR additional info {info}")

    def _maybe_ref(self, s, raw_len: int) -> None:
        # stringref spec: a decoded string enters the table iff encoding a
        # reference to it would be shorter than re-encoding the string
        if self._refs is None:
            return
        n = len(self._refs)
        need = (
            3
            if n < 24
            else 4 if n < 256 else 5 if n < 65536 else 7 if n < 2**32 else 11
        )
        if raw_len >= need:
            self._refs.append(s)

    def read(self):
        ib = self._byte()
        major, info = ib >> 5, ib & 0x1F
        if major in (0, 1):
            n = self._length(info)
            if n is None:
                raise ValueError(
                    f"indefinite length invalid for major type {major}"
                )
            return n if major == 0 else -1 - n
        if major in (2, 3):
            ln = self._length(info)
            if ln is None:  # indefinite: chunks until break
                chunks = []
                while True:
                    nxt = self.data[self.pos]
                    if nxt == 0xFF:
                        self.pos += 1
                        break
                    chunks.append(self.read())
                return (b"" if major == 2 else "").join(chunks)
            raw = self._take(ln)
            s = raw if major == 2 else raw.decode("utf-8")
            self._maybe_ref(s, ln)
            return s
        if major == 4:
            ln = self._length(info)
            out = []
            if ln is None:
                while True:
                    v = self.read()
                    if v is _CBOR_BREAK:
                        break
                    out.append(v)
            else:
                out = [self.read() for _ in range(ln)]
            return out
        if major == 5:
            ln = self._length(info)
            out = {}
            if ln is None:
                while True:
                    k = self.read()
                    if k is _CBOR_BREAK:
                        break
                    out[k] = self.read()
            else:
                for _ in range(ln):
                    k = self.read()
                    out[k] = self.read()
            return out
        if major == 6:
            tag = self._length(info)
            if tag == 256:  # stringref namespace: fresh table for scope
                saved, self._refs = self._refs, []
                try:
                    return self.read()
                finally:
                    self._refs = saved
            if tag == 25:  # stringref
                idx = self.read()
                if self._refs is None or not (0 <= idx < len(self._refs)):
                    raise ValueError(f"dangling stringref {idx}")
                return self._refs[idx]
            if tag == 1:  # epoch timestamp
                v = self.read()
                return datetime.fromtimestamp(v, tz=timezone.utc)
            return self.read()  # other tags: unwrap (incl. tag 0 strings)
        # major 7: simple values / floats / break
        if info == 20:
            return False
        if info == 21:
            return True
        if info in (22, 23):
            return None
        if info == 25:
            return struct.unpack(">e", self._take(2))[0]
        if info == 26:
            return struct.unpack(">f", self._take(4))[0]
        if info == 27:
            return struct.unpack(">d", self._take(8))[0]
        if info == 31:
            return _CBOR_BREAK
        if info == 24:
            return self._byte()  # simple value, pass through
        return info  # unassigned simple value


def cbor_loads(data: bytes, stream: bool = False):
    """Decode CBOR.  ``stream=True`` decodes a SEQUENCE of top-level items
    (the CborLoader contract: one doc map after another, or one array)."""
    r = _CborReader(data)
    if not stream:
        return r.read()
    out = []
    while not r.at_end():
        out.append(r.read())
    return out


def _cbor_head(out: bytearray, major: int, n: int) -> None:
    if n < 24:
        out.append((major << 5) | n)
    elif n < 256:
        out.append((major << 5) | 24)
        out.append(n)
    elif n < 65536:
        out.append((major << 5) | 25)
        out.extend(struct.pack(">H", n))
    elif n < 2**32:
        out.append((major << 5) | 26)
        out.extend(struct.pack(">I", n))
    else:
        out.append((major << 5) | 27)
        out.extend(struct.pack(">Q", n))


def _cbor_write(out: bytearray, v) -> None:
    if v is None:
        out.append(0xF6)
    elif v is True:
        out.append(0xF5)
    elif v is False:
        out.append(0xF4)
    elif isinstance(v, int):
        if v >= 0:
            _cbor_head(out, 0, v)
        else:
            _cbor_head(out, 1, -1 - v)
    elif isinstance(v, float):
        out.append(0xFB)
        out.extend(struct.pack(">d", v))
    elif isinstance(v, str):
        b = v.encode("utf-8")
        _cbor_head(out, 3, len(b))
        out.extend(b)
    elif isinstance(v, (bytes, bytearray)):
        _cbor_head(out, 2, len(v))
        out.extend(v)
    elif isinstance(v, datetime):
        _cbor_head(out, 6, 1)
        _cbor_write(out, v.timestamp())
    elif isinstance(v, (list, tuple)):
        _cbor_head(out, 4, len(v))
        for item in v:
            _cbor_write(out, item)
    elif isinstance(v, dict):
        _cbor_head(out, 5, len(v))
        for k, val in v.items():
            _cbor_write(out, k)
            _cbor_write(out, val)
    else:
        raise NotImplementedError(f"cannot encode {type(v).__name__}")


def cbor_dumps(obj) -> bytes:
    """Encode ``obj`` as definite-length CBOR (RFC 8949)."""
    out = bytearray()
    _cbor_write(out, obj)
    return bytes(out)
