"""Main-content extraction: block-level boilerplate removal for web pages.

The reference extracts page text wholesale (Tika / HTMLStripCharFilter —
solr/modules/extraction, solr/core/.../analysis/TokenizerChain.java:37);
a training-data pipeline additionally needs to separate the ARTICLE text
from navigation menus, headers, footers, and link farms before any
quality scoring or dedup.  This module implements the jusText algorithm
(Pomikálek 2011, "Removing boilerplate and duplicate content from web
corpora" — the published heuristic used by cleaned Common-Crawl corpora)
from its public description:

1. Segment the HTML into BLOCKS at block-level tag boundaries
   (p/div/h*/li/td/…), tracking per block its visible text, the number of
   characters inside <a> links, and whether it is a heading.
2. Context-free classification per block:
   - link_density > max_link_density            -> bad
   - contains a copyright sign (© / &copy;)     -> bad
   - len < length_low: any link chars ? bad : short
   - stopword density >= stopwords_high: len > length_high ? good
     : neargood
   - stopword density >= stopwords_low          -> neargood
   - otherwise                                  -> bad
3. Context-sensitive revision: `short` and `neargood` blocks take their
   class from the nearest fully-classified neighbours (edges count as
   bad) — short between two good blocks becomes good, neargood between
   two bad blocks becomes bad, the published mixed-neighbour rules in
   between; headings within ``max_heading_distance`` characters of a
   good block are promoted.
4. The page's main content is the concatenation of good blocks.

This is a fresh implementation from the published algorithm, NOT a port
of the justext library (which is GPL): the block segmenter is built on
this package's own HTML handling (analysis/html_strip.py regexes), and
the default stopword list is the package's English analysis list
(analysis/stopwords.py) so the whole pipeline shares one vocabulary.

Scale shape (100 TB): one Arrow-batched ``mapInPandas`` pass — the same
shape as the analysis chain the north rule prescribes ("vectorized
Arrow UDFs"); HTML parsing is inherently per-document, but batches move
as Arrow columns and the pass is map-only (no shuffle, no driver data).
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache___solr_spark.analysis.html_strip import (
    _CDATA,
    _COMMENT,
    _SCRIPT_STYLE,
    html_strip,
)
from apache___solr_spark.analysis.stopwords import ENGLISH_STOP_WORDS

# tags that open/close a text block (HTML5 flow-content structure tags)
_BLOCK_TAGS = frozenset(
    """address article aside blockquote body caption center col colgroup
    dd div dl dt fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6
    head header hr html li main menu nav ol p pre section table tbody td
    tfoot th thead tr ul""".split()
)
# a RUN of 2+ <br> acts as a paragraph boundary (the old-web idiom for
# separating paragraphs inside one <div>); a single <br> is just a line
# break within the block — flushing on every <br> would fragment prose
# into per-line "short" blocks and misclassify it as boilerplate
_BR_RUN = re.compile(r"(?:<br\b[^>]*>\s*){2,}", re.IGNORECASE)
_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
_TAG_RE = re.compile(r"<(/?)([A-Za-z][A-Za-z0-9]*)[^>]*?(/?)>|<![^>]*>|<\?[^>]*\?>")
_WORD_RE = re.compile(r"\w+", re.UNICODE)


class _Block:
    __slots__ = ("text", "link_chars", "heading", "cls")

    def __init__(self, text: str, link_chars: int, heading: bool):
        self.text = text
        self.link_chars = link_chars
        self.heading = heading
        self.cls = ""


def _segment_blocks(html_text: str | bytes | None) -> list[_Block]:
    """Split an HTML document into visible-text blocks.

    One pass over the tag stream: block-level tags flush the current
    buffer; ``<a>``/``</a>`` toggle link-character counting; text nodes
    are entity-decoded through the shared html_strip machinery (script/
    style/comment removal happens up front with the same regexes, so a
    page run through :func:`extract_main_content` and one run through
    ``html_strip`` see identical visible text)."""
    if html_text is None:
        return []
    if isinstance(html_text, (bytes, bytearray)):
        html_text = bytes(html_text).decode("utf-8", errors="replace")
    s = _COMMENT.sub(" ", html_text)
    s = _SCRIPT_STYLE.sub(" ", s)
    s = _CDATA.sub(lambda m: m.group(1), s)
    s = _BR_RUN.sub("<p>", s)  # double-<br> = paragraph boundary

    import html as _html

    blocks: list[_Block] = []
    buf: list[str] = []
    link_chars = 0
    link_depth = 0
    heading_depth = 0
    cur_heading = False

    def flush() -> None:
        nonlocal buf, link_chars, cur_heading
        text = " ".join("".join(buf).split())
        if text:
            blocks.append(_Block(text, link_chars, cur_heading))
        buf = []
        link_chars = 0
        cur_heading = heading_depth > 0

    pos = 0
    for m in _TAG_RE.finditer(s):
        raw = s[pos : m.start()]
        if raw:
            txt = _html.unescape(raw)
            buf.append(txt)
            if link_depth > 0:
                link_chars += len(txt.strip())
        pos = m.end()
        name = (m.group(2) or "").lower()
        closing = m.group(1) == "/"
        if name == "a":
            link_depth = max(0, link_depth - 1) if closing else link_depth + 1
        elif name in _BLOCK_TAGS:
            if name in _HEADING_TAGS:
                if closing:
                    flush()
                    heading_depth = max(0, heading_depth - 1)
                    cur_heading = heading_depth > 0
                else:
                    flush()
                    heading_depth += 1
                    cur_heading = True
            else:
                flush()
        # void/self-closing and unknown tags act as plain separators: the
        # buffer gets a space so "a<b>c" stays two words (html_strip rule)
        buf.append(" ")
    tail = s[pos:]
    if tail:
        txt = _html.unescape(tail)
        buf.append(txt)
        if link_depth > 0:
            link_chars += len(txt.strip())
    flush()
    return blocks


def _classify_free(
    blocks: list[_Block],
    stopwords: frozenset[str],
    length_low: int,
    length_high: int,
    stopwords_low: float,
    stopwords_high: float,
    max_link_density: float,
) -> None:
    for b in blocks:
        n = len(b.text)
        density = (b.link_chars / n) if n else 0.0
        words = _WORD_RE.findall(b.text.lower())
        sw = (
            sum(1 for w in words if w in stopwords) / len(words)
            if words
            else 0.0
        )
        if density > max_link_density:
            b.cls = "bad"
        elif "©" in b.text or "&copy;" in b.text:
            b.cls = "bad"
        elif n < length_low:
            b.cls = "bad" if b.link_chars > 0 else "short"
        elif sw >= stopwords_high:
            b.cls = "good" if n > length_high else "neargood"
        elif sw >= stopwords_low:
            b.cls = "neargood"
        else:
            b.cls = "bad"


def _neighbour(
    blocks: list[_Block], i: int, step: int, ignore_neargood: bool
) -> str:
    """Class of the nearest neighbour in direction ``step``, skipping
    ``short`` (and, when ``ignore_neargood``, also ``neargood``) blocks;
    the page edge counts as bad (jusText's revision rules)."""
    j = i + step
    while 0 <= j < len(blocks):
        c = blocks[j].cls
        if c == "good" or c == "bad":
            return c
        if c == "neargood" and not ignore_neargood:
            return c
        j += step
    return "bad"


def _revise(blocks: list[_Block], max_heading_distance: int) -> None:
    # heading promotion pass 1 (pre-revision, per the published order):
    # a short heading within max_heading_distance chars of a good block
    # becomes neargood
    for i, b in enumerate(blocks):
        if not (b.heading and b.cls == "short"):
            continue
        dist = 0
        for j in range(i + 1, len(blocks)):
            if dist >= max_heading_distance:
                break
            if blocks[j].cls == "good":
                b.cls = "neargood"
                break
            dist += len(blocks[j].text)

    new_cls = [b.cls for b in blocks]
    for i, b in enumerate(blocks):
        if b.cls == "short":
            prev = _neighbour(blocks, i, -1, ignore_neargood=True)
            nxt = _neighbour(blocks, i, +1, ignore_neargood=True)
            if prev == nxt == "good":
                new_cls[i] = "good"
            elif prev == nxt == "bad":
                new_cls[i] = "bad"
            elif (
                prev == "bad"
                and _neighbour(blocks, i, -1, ignore_neargood=False)
                == "neargood"
            ) or (
                nxt == "bad"
                and _neighbour(blocks, i, +1, ignore_neargood=False)
                == "neargood"
            ):
                new_cls[i] = "good"
            else:
                new_cls[i] = "bad"
        elif b.cls == "neargood":
            prev = _neighbour(blocks, i, -1, ignore_neargood=True)
            nxt = _neighbour(blocks, i, +1, ignore_neargood=True)
            new_cls[i] = "bad" if prev == nxt == "bad" else "good"
    for b, c in zip(blocks, new_cls):
        b.cls = c

    # heading promotion pass 2: a (still) bad heading right before good
    # content within the distance window is rescued as good
    for i, b in enumerate(blocks):
        if not (b.heading and b.cls == "bad"):
            continue
        dist = 0
        for j in range(i + 1, len(blocks)):
            if dist >= max_heading_distance:
                break
            if blocks[j].cls == "good":
                b.cls = "good"
                break
            dist += len(blocks[j].text)


def extract_blocks(
    html_text: str | bytes | None,
    stopwords: frozenset[str] | None = None,
    length_low: int = 70,
    length_high: int = 200,
    stopwords_low: float = 0.30,
    stopwords_high: float = 0.32,
    max_link_density: float = 0.2,
    max_heading_distance: int = 200,
) -> list[tuple[str, str]]:
    """Classified blocks of one page: ``[(class, text), ...]`` in document
    order, class in {good, bad} after revision.  The pure per-document
    kernel — the Spark surface and the tests' oracle both call it."""
    sw = ENGLISH_STOP_WORDS if stopwords is None else stopwords
    blocks = _segment_blocks(html_text)
    _classify_free(
        blocks,
        frozenset(sw),
        length_low,
        length_high,
        stopwords_low,
        stopwords_high,
        max_link_density,
    )
    _revise(blocks, max_heading_distance)
    return [(b.cls, b.text) for b in blocks]


def extract_main_content(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "main_text",
    stopwords: frozenset[str] | None = None,
    length_low: int = 70,
    length_high: int = 200,
    stopwords_low: float = 0.30,
    stopwords_high: float = 0.32,
    max_link_density: float = 0.2,
    max_heading_distance: int = 200,
) -> DataFrame:
    """Add ``out_col`` (the page's main content: good blocks joined with
    newlines), ``n_blocks_good`` and ``n_blocks_total`` to every row.

    Map-only Arrow-batched pass over ``html_col`` (binary or string);
    all other columns pass through unchanged.
    """
    sw = frozenset(ENGLISH_STOP_WORDS if stopwords is None else stopwords)
    params = dict(
        stopwords=sw,
        length_low=length_low,
        length_high=length_high,
        stopwords_low=stopwords_low,
        stopwords_high=stopwords_high,
        max_link_density=max_link_density,
        max_heading_distance=max_heading_distance,
    )
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [
            f"`{out_col}` string",
            "`n_blocks_good` int",
            "`n_blocks_total` int",
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            texts, goods, totals = [], [], []
            for raw in pdf[html_col]:
                cls_blocks = extract_blocks(raw, **params)
                kept = [t for c, t in cls_blocks if c == "good"]
                texts.append("\n".join(kept))
                goods.append(len(kept))
                totals.append(len(cls_blocks))
            pdf = pdf.copy()
            pdf[out_col] = texts
            pdf["n_blocks_good"] = goods
            pdf["n_blocks_total"] = totals
            yield pdf

    return df.mapInPandas(run, schema=schema)


__all__ = [
    "extract_blocks",
    "extract_main_content",
    "html_strip",
]
