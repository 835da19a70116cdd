"""HTML stripping char filter.

Reproduces the *capability* of Lucene's HTMLStripCharFilter as used by the
reference (charFilter slot, solr/core/src/java/org/apache/solr/analysis/
TokenizerChain.java:37,110-118; HTMLStripFieldUpdateProcessorFactory.java:63-72):
remove tags, drop <script>/<style> content and comments/CDATA wrappers,
decode character entities, and keep the visible text.

This is a fresh single-pass regex/state implementation, NOT a port of the
Lucene JFlex grammar.  Its output defines this engine's golden semantics
(the north-rule invariant is *byte-identical extracted text per url between
the distributed engine and the single-process oracle*, both of which call
this same deterministic function).

Rules (deterministic, documented):
- ``<script ...>...</script>`` and ``<style ...>...</style>`` blocks are
  removed entirely (case-insensitive, unterminated blocks drop to EOF).
- ``<!-- ... -->`` comments removed (unterminated drops to EOF).
- ``<![CDATA[ ... ]]>`` wrappers removed, inner text kept.
- Any other ``<...>`` tag (incl. ``</x>``, ``<x/>``, ``<!DOCTYPE..>``,
  ``<? .. ?>``) is replaced by a single space, so ``a<b>c`` tokenizes as two
  words (Lucene's stripper likewise acts as a token boundary).
- A lone ``<`` not followed by a plausible tag is kept as literal text.
- Entities: ``&#NNN;`` / ``&#xHH;`` numeric and the HTML5 named set are
  decoded; a bare ``&`` stays literal.
- No whitespace normalization beyond the tag->space substitution: the
  tokenizer downstream is whitespace-insensitive anyway.
"""

from __future__ import annotations

import html as _html
import re

_SCRIPT_STYLE = re.compile(
    r"<(script|style)\b[^>]*>.*?(</\1\s*>|\Z)", re.IGNORECASE | re.DOTALL
)
_COMMENT = re.compile(r"<!--.*?(-->|\Z)", re.DOTALL)
_CDATA = re.compile(r"<!\[CDATA\[(.*?)(\]\]>|\Z)", re.DOTALL)
_TAG = re.compile(r"</?[A-Za-z][^>]*>|<![A-Za-z][^>]*>|<\?[^>]*\?>")


def html_strip(html_text: str | bytes | None) -> str:
    """Strip markup from an HTML document, returning visible text."""
    if html_text is None:
        return ""
    if isinstance(html_text, (bytes, bytearray)):
        html_text = bytes(html_text).decode("utf-8", errors="replace")
    s = _COMMENT.sub(" ", html_text)
    s = _SCRIPT_STYLE.sub(" ", s)
    s = _CDATA.sub(lambda m: m.group(1), s)
    s = _TAG.sub(" ", s)
    s = _html.unescape(s)
    return s
