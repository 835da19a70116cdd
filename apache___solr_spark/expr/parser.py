"""Parser for the streaming-expression surface syntax.

Same grammar as the reference's prefix-notation parser
(solr/solrj-streaming/src/java/org/apache/solr/client/solrj/io/stream/expr/
StreamExpressionParser.java:35-215): an expression is
``functionName(param, ..., name=value, nested(...))`` where

- parameters split on commas at paren depth 0, outside quotes;
- a parameter containing ``name=...`` (with ``=`` at depth 0, outside
  quotes) is a *named* parameter whose value may itself be an expression,
  a quoted string, or a bare value;
- double- or single-quoted values may contain commas, parens and the other
  quote kind; a backslash escapes the active quote char;
- lines starting with ``#`` are comments (StreamExpressionParser.java:45).

The output is a small AST (:class:`StreamExpression` / :class:`NamedParam` /
plain ``str`` values) consumed by :mod:`apache___solr_spark.expr.lower`.
This is a fresh recursive-descent implementation — only the *language* is
shared with the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class NamedParam:
    name: str
    value: "StreamExpression | str"


@dataclass
class StreamExpression:
    name: str
    params: list = field(default_factory=list)

    def named(self, name: str, default=None):
        """The value of named parameter ``name`` (str or StreamExpression)."""
        for p in self.params:
            if isinstance(p, NamedParam) and p.name == name:
                return p.value
        return default

    def positionals(self) -> list:
        """Positional params in order (strings and sub-expressions)."""
        return [p for p in self.params if not isinstance(p, NamedParam)]

    def sub_expressions(self) -> list["StreamExpression"]:
        return [p for p in self.params if isinstance(p, StreamExpression)]


_WORD_EXTRA = set("_.-*")


def _is_word(tok: str) -> bool:
    return bool(tok) and all(c.isalnum() or c in _WORD_EXTRA for c in tok)


def _strip_comments(src: str) -> str:
    return "\n".join(
        line for line in src.splitlines() if not line.lstrip().startswith("#")
    )


def _split_top(src: str, sep: str) -> list[str]:
    """Split on ``sep`` at paren depth 0 outside quotes (splitOn semantics,
    StreamExpressionParser.java:258-303)."""
    parts: list[str] = []
    depth = 0
    quote: str | None = None
    buf: list[str] = []
    i = 0
    while i < len(src):
        c = src[i]
        if quote is not None:
            buf.append(c)
            if c == "\\" and i + 1 < len(src):
                buf.append(src[i + 1])
                i += 2
                continue
            if c == quote:
                quote = None
        elif c in "\"'":
            quote = c
            buf.append(c)
        elif c == "(":
            depth += 1
            buf.append(c)
        elif c == ")":
            depth -= 1
            buf.append(c)
        elif c == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    parts.append("".join(buf))
    return parts


def _find_top(src: str, ch: str) -> int:
    """Index of first ``ch`` at depth 0 outside quotes, or -1."""
    depth = 0
    quote: str | None = None
    i = 0
    while i < len(src):
        c = src[i]
        if quote is not None:
            if c == "\\":
                i += 2
                continue
            if c == quote:
                quote = None
        elif c in "\"'":
            quote = c
        elif c == "(":
            if ch == "(" and depth == 0:
                return i
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == ch and depth == 0:
            return i
        i += 1
    return -1


def _matching_close(src: str, op: int) -> int:
    """Index of the ')' matching the '(' at ``op`` (quote-aware), or -1."""
    depth = 0
    quote: str | None = None
    i = op
    while i < len(src):
        c = src[i]
        if quote is not None:
            if c == "\\":
                i += 2
                continue
            if c == quote:
                quote = None
        elif c in "\"'":
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


def _is_expression(src: str) -> bool:
    src = src.strip()
    if not src.endswith(")"):
        return False
    op = _find_top(src, "(")
    if op <= 0:
        return False
    head = src[:op].strip()
    # the paren opened after the head must close exactly at the final char
    return _is_word(head) and _matching_close(src, op) == len(src) - 1


def _unquote(v: str) -> str:
    v = v.strip()
    if len(v) >= 2 and v[0] == v[-1] and v[0] in "\"'":
        inner = v[1:-1]
        return inner.replace("\\" + v[0], v[0])
    return v


def parse_expression(src: str) -> StreamExpression:
    """Parse one streaming expression string into the AST."""
    working = _strip_comments(src).strip()
    if not _is_expression(working):
        raise ValueError(f"not a streaming expression: {working!r}")
    op = _find_top(working, "(")
    name = working[:op].strip()
    body = working[op + 1 : -1].strip()
    expr = StreamExpression(name)
    if not body:
        return expr
    for raw in _split_top(body, ","):
        part = raw.strip()
        if not part:
            continue
        if _is_expression(part):
            expr.params.append(parse_expression(part))
            continue
        eq = _find_top(part, "=")
        # an '=' inside a sort/on spec like on="a=b" is quoted, so a depth-0
        # '=' really does delimit a named parameter
        if eq > 0 and _is_word(part[:eq].strip()):
            pname = part[:eq].strip()
            pval = part[eq + 1 :].strip()
            if _is_expression(pval):
                expr.params.append(NamedParam(pname, parse_expression(pval)))
            else:
                expr.params.append(NamedParam(pname, _unquote(pval)))
            continue
        expr.params.append(_unquote(part))
    return expr
