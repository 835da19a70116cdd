"""ICU rule-based transliterator: the ``Transliterator.createFromRules``
engine behind ICUTransformFilter.

The reference's ICUTransformFilterFactory
(lucene/analysis/icu/src/java/org/apache/lucene/analysis/icu/
ICUTransformFilterFactory.java:55 — ``Transliterator.getInstance(id)``)
runs transforms that are themselves written in the ICU transform rule
language (UTS #35 part 2); this module implements that language's core
so custom rule sets (and compact definitions of additional system
transforms) run without ICU:

    $vowel = [aeiou] ;          variable definition (items: literals,
                                UnicodeSets, other variables)
    γ } [γκξχ] > n ;            conversion rule with post-context
    [aeiou] { s > z ;           pre-context (matches the buffer, so it
                                can see already-converted text)
    ab > x | y ;                '|' cursor: re-scan resumes before 'y'
    ^ { a > X ;   a } $ > Y ;   start / end anchors in contexts
    ::NFD ;  ::Any-Lower ;      chain steps — each '::' line is one
                                sequential pass over the whole text
    'lit''eral'                 quoting ('' = one apostrophe), \\uXXXX
    [^a-z \\u0300-\\u036F :Nd:]   sets: ranges, negation, general
                                categories ([:Lu:] or inline :Lu:)
    # comment                   to end of line

Matching is ICU's: at each buffer position try rules in definition
order, first match replaces and the cursor moves past the replacement
(or to '|'); unmatched positions advance by one.  Chain-step ids map to
the built-in transforms (Any-Lower/Upper, NFC/NFD/NFKC/NFKD, Null, and
every id `analysis.filters.icu_transform` knows).  Segments capture in
the key — ``([bc]) a > $1 ;`` — AND in contexts (capture-only there:
context text is never replaced, but its captures feed the output, e.g.
``([a-z]) {x} > $1 ;``), numbered by '(' order across the whole rule
(pre-context, key, post-context; nesting allowed) and substituted by
``$1``-``$9`` in the replacement.
``&Id($1 lit)`` in a replacement applies a chain-step transform (same
id namespace as '::id;') to the materialized argument — ICU's function
calls, e.g. ``(a[bc]) > &Any-Upper($1) ;``.  ``::[set];`` sets the
GLOBAL FILTER for what follows (ICU places it first, scoping the whole
transform): rule replacements may only modify in-filter characters
(contexts still see everything), and builtin chain steps apply per
maximal in-filter run; ``::[set] Id;`` is a filtered chain step
(``:: [:Lu:] Any-Lower ;``).  ``compile_transform(rules, "reverse")``
compiles the REVERSE reading: statements in reverse order, ``<``/``<>``
rules replacing rhs with the lhs key under the rhs's contexts, chain
steps inverted (Lower↔Upper, NFC↔NFD, NFKC↔NFKD); chain ids without a
registered inverse, and global filters under reverse, raise — never
mis-transform.
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Long ICU category aliases -> general-category codes (short codes like
# Lu/Nd/P are matched by prefix against unicodedata.category directly).
_CAT_ALIASES = {
    "letter": "L",
    "uppercase letter": "Lu",
    "lowercase letter": "Ll",
    "nonspacing mark": "Mn",
    "mark": "M",
    "decimal number": "Nd",
    "number": "N",
    "punctuation": "P",
    "symbol": "S",
    "separator": "Z",
    "white_space": "Z",  # approximation: separator categories
}


class _USet:
    """UnicodeSet matcher: explicit chars, ranges, category prefixes."""

    __slots__ = ("chars", "ranges", "cats", "negated")

    def __init__(self, chars, ranges, cats, negated):
        self.chars = chars
        self.ranges = ranges
        self.cats = cats
        self.negated = negated

    def match(self, ch: str) -> bool:
        hit = (
            ch in self.chars
            or any(lo <= ch <= hi for lo, hi in self.ranges)
            or any(unicodedata.category(ch).startswith(c) for c in self.cats)
        )
        return hit != self.negated


_ANCHOR_START = object()  # '^' in a pre-context
_ANCHOR_END = object()  # '$' at the end of a post-context
_SEG_OPEN = object()  # '(' in a key: start a capture segment
_SEG_CLOSE = object()  # ')' in a key: close the innermost segment


class _BackRef:
    """``$n`` in a replacement: substitute capture segment n."""

    __slots__ = ("n",)

    def __init__(self, n: int):
        self.n = n


class _FnCall:
    """``&Id(args)`` in a replacement: apply a chain-step transform to
    the materialized argument atoms (strs and capture indexes)."""

    __slots__ = ("fn", "parts")

    def __init__(self, fn, parts):
        self.fn = fn
        self.parts = parts


def _parse_uset(src: str, i: int) -> tuple[_USet, int]:
    """Parse a ``[...]`` set starting at ``src[i] == '['``; returns the
    matcher and the index one past the closing ']'."""
    i += 1
    negated = False
    if i < len(src) and src[i] == "^":
        negated = True
        i += 1
    chars: set[str] = set()
    ranges: list[tuple[str, str]] = []
    cats: list[str] = []
    pending: str | None = None  # candidate left end of an a-b range

    def flush():
        nonlocal pending
        if pending is not None:
            chars.add(pending)
            pending = None

    while i < len(src):
        ch = src[i]
        if ch == "]":
            flush()
            return _USet(frozenset(chars), tuple(ranges), tuple(cats),
                         negated), i + 1
        if ch == ":":  # [:Lu:] or inline :Lu: category item
            end = src.find(":", i + 1)
            if end < 0:
                raise ValueError(f"unterminated category in set at {i}")
            flush()
            name = src[i + 1 : end].strip()
            code = _CAT_ALIASES.get(name.lower(), name)
            if not (1 <= len(code) <= 2 and code[0].isalpha()):
                raise NotImplementedError(
                    f"unsupported set property [:{name}:] (general "
                    "categories only)"
                )
            cats.append(code)
            i = end + 1
            continue
        if ch.isspace():
            flush()
            i += 1
            continue
        if ch == "-" and pending is not None and i + 1 < len(src) \
                and src[i + 1] != "]":
            lo = pending
            pending = None
            hi, i = _parse_one_char(src, i + 1)
            if hi < lo:
                raise ValueError(f"reversed range {lo!r}-{hi!r} in set")
            ranges.append((lo, hi))
            continue
        flush()
        pending, i = _parse_one_char(src, i)
    raise ValueError("unterminated '[' set")


def _parse_one_char(src: str, i: int) -> tuple[str, int]:
    """One (possibly escaped/quoted) character at ``src[i]``."""
    ch = src[i]
    if ch == "\\":
        if src[i + 1] == "u":
            return chr(int(src[i + 2 : i + 6], 16)), i + 6
        return src[i + 1], i + 2
    if ch == "'":
        if src[i + 1 : i + 2] == "'":
            return "'", i + 2
        end = src.find("'", i + 1)
        if end == i + 2:
            return src[i + 1], end + 1
        raise ValueError("multi-char quote inside a set item")
    return ch, i + 1


def _tokenize_side(src: str, variables: dict, *, output: bool):
    """Parse one side of a rule (or a variable body) into a list of
    matcher atoms — literal chars, _USet, anchors — or, for ``output``,
    plain characters plus the cursor marker."""
    atoms: list = []
    i, n = 0, len(src)
    while i < n:
        ch = src[i]
        if ch.isspace():
            i += 1
            continue
        if ch == "'":
            end = src.find("'", i + 1)
            if end < 0:
                raise ValueError("unterminated quote")
            if end == i + 1:  # '' = literal apostrophe
                atoms.append("'")
                i += 2
                continue
            atoms.extend(src[i + 1 : end])
            i = end + 1
            continue
        if ch == "\\":
            c, i = _parse_one_char(src, i)
            atoms.append(c)
            continue
        if ch == "$":
            if output and i + 1 < n and src[i + 1].isdigit():
                num = int(src[i + 1])
                if num == 0:
                    raise ValueError("back-references are numbered from $1")
                atoms.append(_BackRef(num))
                i += 2
                continue
            m = re.match(r"\$([A-Za-z_][A-Za-z0-9_]*)", src[i:])
            if m:
                name = m.group(1)
                if name not in variables:
                    raise ValueError(f"undefined variable ${name}")
                atoms.extend(variables[name])
                i += m.end()
                continue
            if output:
                raise ValueError("bare '$' in replacement")
            atoms.append(_ANCHOR_END)
            i += 1
            continue
        if ch == "^" and not output:
            atoms.append(_ANCHOR_START)
            i += 1
            continue
        if ch == "[":
            if output:
                raise ValueError("UnicodeSet in a replacement")
            uset, i = _parse_uset(src, i)
            atoms.append(uset)
            continue
        if ch == "|" and output:
            atoms.append(_CURSOR)
            i += 1
            continue
        if ch == "(":
            if output:
                raise ValueError("'(' in a replacement (quote literals)")
            atoms.append(_SEG_OPEN)
            i += 1
            continue
        if ch == ")":
            if output:
                raise ValueError("')' in a replacement (quote literals)")
            atoms.append(_SEG_CLOSE)
            i += 1
            continue
        if ch == "&":
            if not output:
                raise ValueError("'&Id()' calls belong in replacements")
            m = re.match(r"&\s*([A-Za-z][A-Za-z0-9_-]*)\s*\(", src[i:])
            if not m:
                raise ValueError(f"malformed '&' function call at {i}")
            fn = _builtin_pass(m.group(1))  # unknown ids raise here
            j = i + m.end()
            # find the matching ')' (quotes respected; no nested calls)
            k = j
            while k < n:
                if src[k] == "'":
                    end = src.find("'", k + 1)
                    if end < 0:
                        raise ValueError("unterminated quote in '&' args")
                    k = end + 1
                    continue
                if src[k] == "\\":
                    k += 2
                    continue
                if src[k] == ")":
                    break
                if src[k] in "(&":
                    raise NotImplementedError(
                        "nested '&' calls / '(' inside call args"
                    )
                k += 1
            if k >= n:
                raise ValueError("unterminated '&Id(' call")
            inner = _tokenize_side(src[j:k], variables, output=True)
            for a in inner:
                if not isinstance(a, (str, _BackRef)):
                    raise ValueError(
                        "'&' call args must be literals/back-references"
                    )
            atoms.append(_FnCall(fn, inner))
            i = k + 1
            continue
        atoms.append(ch)
        i += 1
    return atoms


_CURSOR = object()


class _Rule:
    """``parts`` is the replacement as literal strings and int capture
    indexes; ``cursor`` is a part index ('|' position), or None for the
    default move-past-replacement."""

    __slots__ = ("pre", "key", "post", "parts", "cursor", "pre_len")

    def __init__(self, pre, key, post, parts, cursor):
        self.pre = pre
        self.key = key
        self.post = post
        self.parts = parts
        self.cursor = cursor
        # every consuming atom (literal char / UnicodeSet) matches exactly
        # one char, so the pre-context has a FIXED width — which lets the
        # capture-recording forward matcher serve the pre-context too
        # (match at i - pre_len), instead of a separate backward walker
        self.pre_len = sum(
            0
            if (
                a is _ANCHOR_START
                or a is _ANCHOR_END
                or a is _SEG_OPEN
                or a is _SEG_CLOSE
            )
            else 1
            for a in pre
        )


def _match_key(buf: str, i: int, atoms) -> tuple[int, list[str]] | None:
    """Match a rule key at buf[i], recording segment captures.  Returns
    (end index, captures) or None."""
    caps: list[str] = []
    stack: list[tuple[int, int]] = []
    for a in atoms:
        if a is _SEG_OPEN:
            stack.append((len(caps), i))
            caps.append("")
            continue
        if a is _SEG_CLOSE:
            idx, start = stack.pop()
            caps[idx] = buf[start:i]
            continue
        if a is _ANCHOR_END:
            if i != len(buf):
                return None
            continue
        if a is _ANCHOR_START:
            if i != 0:
                return None
            continue
        if i >= len(buf):
            return None
        if isinstance(a, _USet):
            if not a.match(buf[i]):
                return None
        elif buf[i] != a:
            return None
        i += 1
    return i, caps




def _filtered_builtin(fn, flt):
    """Apply a builtin chain-step transform under a global filter: only
    maximal runs of in-filter characters are transformed; out-of-filter
    characters pass through untouched (ICU filter semantics — for the
    per-char transforms this is exact; normalization steps normalize each
    filtered run independently, documented)."""
    if flt is None:
        return fn

    def run(text: str) -> str:
        out: list[str] = []
        i = 0
        n = len(text)
        while i < n:
            j = i
            while j < n and flt.match(text[j]):
                j += 1
            if j > i:
                out.append(fn(text[i:j]))
                i = j
            else:
                out.append(text[i])
                i += 1
        return "".join(out)

    return run


class _RulePass:
    def __init__(self, rules: list[_Rule], flt: "_USet | None" = None):
        self.rules = rules
        self.flt = flt

    def __call__(self, text: str) -> str:
        buf = text
        i = 0
        ops = 0
        limit = 64 * (len(text) + 16)  # runaway-rule guard
        while i < len(buf):
            for r in self.rules:
                m = _match_key(buf, i, r.key)
                if m is None:
                    continue
                end, key_caps = m
                if self.flt is not None and any(
                    not self.flt.match(c) for c in buf[i:end]
                ):
                    # global filter: only filtered chars may be MODIFIED
                    # (contexts may still see unfiltered text)
                    continue
                post_caps: list[str] = []
                if r.post:
                    pm = _match_key(buf, end, r.post)
                    if pm is None:
                        continue
                    post_caps = pm[1]
                pre_caps: list[str] = []
                if r.pre:
                    if i < r.pre_len:
                        continue
                    pm = _match_key(buf, i - r.pre_len, r.pre)
                    if pm is None or pm[0] != i:
                        continue
                    pre_caps = pm[1]
                # global segment numbering: pre, then key, then post
                caps = pre_caps + key_caps + post_caps
                pieces = []
                for p in r.parts:
                    if isinstance(p, str):
                        pieces.append(p)
                    elif isinstance(p, int):
                        pieces.append(caps[p])
                    else:  # _FnCall: transform the materialized argument
                        pieces.append(p.fn("".join(
                            x if isinstance(x, str) else caps[x]
                            for x in p.parts
                        )))
                repl = "".join(pieces)
                buf = buf[:i] + repl + buf[end:]
                i += (
                    sum(len(x) for x in pieces[: r.cursor])
                    if r.cursor is not None
                    else len(repl)
                )
                i = max(i, 0)
                ops += 1
                if ops > limit:
                    raise ValueError(
                        "transform rules do not terminate on this input"
                    )
                break
            else:
                i += 1
        return buf


def _builtin_pass(tid: str):
    from apache___solr_spark.analysis.filters import _TRANSFORMS

    norm = {
        "nfc": lambda t: unicodedata.normalize("NFC", t),
        "nfd": lambda t: unicodedata.normalize("NFD", t),
        "nfkc": lambda t: unicodedata.normalize("NFKC", t),
        "nfkd": lambda t: unicodedata.normalize("NFKD", t),
        "any-nfc": lambda t: unicodedata.normalize("NFC", t),
        "any-nfd": lambda t: unicodedata.normalize("NFD", t),
        "any-nfkc": lambda t: unicodedata.normalize("NFKC", t),
        "any-nfkd": lambda t: unicodedata.normalize("NFKD", t),
        "lower": str.lower,
        "upper": str.upper,
        "null": lambda t: t,
    }
    fn = norm.get(tid.lower()) or _TRANSFORMS.get(tid)
    if fn is None:
        raise NotImplementedError(
            f"'::{tid};' chain step: unknown transform id"
        )
    return fn


def _split_statements(rules: str) -> list[str]:
    """Split on top-level ';' (quotes respected), dropping # comments."""
    out: list[str] = []
    cur: list[str] = []
    i, n = 0, len(rules)
    while i < n:
        ch = rules[i]
        if ch == "#":
            nl = rules.find("\n", i)
            i = n if nl < 0 else nl + 1
            continue
        if ch == "'":
            end = rules.find("'", i + 1)
            if end < 0:
                raise ValueError("unterminated quote")
            cur.append(rules[i : end + 1])
            i = end + 1
            continue
        if ch == "\\" and i + 1 < n:
            cur.append(rules[i : i + 2])
            i += 2
            continue
        if ch == ";":
            stmt = "".join(cur).strip()
            if stmt:
                out.append(stmt)
            cur = []
            i += 1
            continue
        cur.append(ch)
        i += 1
    if "".join(cur).strip():
        raise ValueError("rule text must end with ';'")
    return out


def _split_rule(stmt: str) -> tuple[str, str, str]:
    """Split a statement at its top-level operator (quotes respected).
    Returns (lhs, op, rhs)."""
    i, n = 0, len(stmt)
    depth = 0
    while i < n:
        ch = stmt[i]
        if ch == "'":
            end = stmt.find("'", i + 1)
            i = (end if end > i else n) + 1
            continue
        if ch == "\\":
            i += 2
            continue
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif depth == 0 and ch in "<>=":
            op = ch
            j = i + 1
            if ch == "<" and stmt[j : j + 1] == ">":
                op = "<>"
                j += 1
            return stmt[:i], op, stmt[j:]
        i += 1
    raise ValueError(f"statement without '>', '<' or '=': {stmt!r}")


def _split_contexts(side: str) -> tuple[str, str, str]:
    """``pre { key } post`` (both braces optional) -> source substrings."""
    pre_src = key_src = post_src = ""
    b1 = _find_top(side, "{")
    b2 = _find_top(side, "}")
    if b1 is not None and b2 is not None:
        pre_src, key_src, post_src = side[:b1], side[b1 + 1 : b2], side[b2 + 1 :]
    elif b1 is not None:
        pre_src, key_src = side[:b1], side[b1 + 1 :]
    elif b2 is not None:
        key_src, post_src = side[:b2], side[b2 + 1 :]
    else:
        key_src = side
    return pre_src, key_src, post_src


def _parse_contexted(side: str, variables: dict):
    """Parse ``pre { key } post`` (both braces optional) into atom lists."""
    pre_src, key_src, post_src = _split_contexts(side)
    pre = _tokenize_side(pre_src, variables, output=False)
    key = _tokenize_side(key_src, variables, output=False)
    post = _tokenize_side(post_src, variables, output=False)

    def count_segs(atoms) -> int:
        # segments may appear in contexts too (ICU: capture-only — the
        # context text is not replaced but its captures feed the output);
        # each side's parens must balance independently
        depth = 0
        n = 0
        for a in atoms:
            if a is _SEG_OPEN:
                depth += 1
                n += 1
            elif a is _SEG_CLOSE:
                depth -= 1
                if depth < 0:
                    raise ValueError(f"unbalanced ')' in {side!r}")
        if depth != 0:
            raise ValueError(f"unbalanced '(' in {side!r}")
        return n

    nsegs = (count_segs(pre), count_segs(key), count_segs(post))
    skip = (_ANCHOR_START, _ANCHOR_END, _SEG_OPEN, _SEG_CLOSE)
    if not key or all(any(a is s for s in skip) for a in key):
        raise ValueError(f"rule key matches nothing: {side!r}")
    return pre, key, post, nsegs


def _find_top(src: str, target: str) -> int | None:
    i, n = 0, len(src)
    depth = 0
    while i < n:
        ch = src[i]
        if ch == "'":
            end = src.find("'", i + 1)
            i = (end if end > i else n) + 1
            continue
        if ch == "\\":
            i += 2
            continue
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif ch == target and depth == 0:
            return i
        i += 1
    return None


def _build_rule(src_side: str, out_src: str, variables: dict) -> _Rule:
    """Compile one rule from its source side (``pre { key } post``) and
    output side into a _Rule (shared by forward and reverse compiles)."""
    pre, key, post, per_side = _parse_contexted(src_side, variables)
    # ICU numbers segments by '(' order across the WHOLE rule:
    # pre-context captures first, then key, then post-context
    nsegs = sum(per_side)
    out_atoms = _tokenize_side(out_src, variables, output=True)
    cursor = None
    parts: list[str | int] = []
    for a in out_atoms:
        if a is _CURSOR:
            if cursor is not None:
                raise ValueError("two '|' cursors in one rule")
            cursor = len(parts)
            continue
        if isinstance(a, _BackRef):
            if a.n > nsegs:
                raise ValueError(
                    f"${a.n} but the rule has only {nsegs} segment(s)"
                )
            parts.append(a.n - 1)
            continue
        if isinstance(a, _FnCall):
            inner: list[str | int] = []
            for x in a.parts:
                if isinstance(x, _BackRef):
                    if x.n > nsegs:
                        raise ValueError(
                            f"${x.n} but the rule has only "
                            f"{nsegs} segment(s)"
                        )
                    inner.append(x.n - 1)
                else:
                    inner.append(x)
            parts.append(_FnCall(a.fn, tuple(inner)))
            continue
        if not isinstance(a, str):
            raise ValueError(
                "replacement must be literal text / back-references"
            )
        parts.append(a)
    return _Rule(pre, key, post, tuple(parts), cursor)


_BUILTIN_INVERSES = {
    "lower": "upper", "upper": "lower",
    "any-lower": "upper", "any-upper": "lower",
    "nfc": "nfd", "nfd": "nfc", "nfkc": "nfkd", "nfkd": "nfkc",
    "any-nfc": "any-nfd", "any-nfd": "any-nfc",
    "any-nfkc": "any-nfkd", "any-nfkd": "any-nfkc",
    "null": "null",
}


class Transliterator:
    """Compiled transform: a sequence of passes applied left to right.

    ``direction="reverse"`` compiles the rule set's REVERSE reading
    (Transliterator.createFromRules REVERSE): statements run in reverse
    order; ``a <> b`` / ``a < b`` rules replace ``b`` with ``a`` using
    the RIGHT side's contexts (the left side's contexts are
    forward-only, its key region is the reverse output); ``a > b``
    forward-only rules are skipped; ``::id;`` chain steps invert
    (Any-Lower↔Any-Upper, NFC↔NFD, NFKC↔NFKD, Null) — table transforms
    without a registered inverse, and global filters (whose scope is
    inherently forward-directional), raise.  Variable definitions are
    collected first (last definition wins — documented divergence from
    forward's sequential redefinition)."""

    def __init__(self, rules: str, direction: str = "forward"):
        if direction not in ("forward", "reverse"):
            raise ValueError(f"direction must be forward|reverse: {direction}")
        self.rules = rules
        self.direction = direction
        variables: dict[str, list] = {}
        self.passes: list = []
        pending: list[_Rule] = []
        cur_filter: _USet | None = None

        def close_rule_pass():
            nonlocal pending
            if pending:
                self.passes.append(_RulePass(pending, cur_filter))
                pending = []

        stmts = _split_statements(rules)
        if direction == "reverse":
            # variables are global in the reverse reading: collect every
            # definition first (last wins), then process statements in
            # reverse order
            for stmt in stmts:
                if stmt.startswith("::"):
                    continue
                lhs, op, rhs = _split_rule(stmt)
                if op == "=":
                    name = lhs.strip()
                    if not re.fullmatch(r"\$[A-Za-z_][A-Za-z0-9_]*", name):
                        raise ValueError(f"bad variable name {name!r}")
                    variables[name[1:]] = _tokenize_side(
                        rhs, variables, output=False
                    )
            for stmt in reversed(stmts):
                if stmt.startswith("::"):
                    close_rule_pass()
                    tid = stmt[2:].strip()
                    if tid.startswith("["):
                        raise NotImplementedError(
                            "reverse compile: global filters are "
                            "forward-directional"
                        )
                    inv = _BUILTIN_INVERSES.get(tid.lower())
                    if inv is None:
                        raise NotImplementedError(
                            f"'::{tid};' has no registered inverse"
                        )
                    self.passes.append(_builtin_pass(inv))
                    continue
                lhs, op, rhs = _split_rule(stmt)
                if op in ("=", ">"):
                    continue  # definitions collected; forward-only skipped
                # 'a < b' / 'a <> b': reverse replaces b with a, using the
                # RIGHT side's contexts; the LEFT side's contexts are
                # forward-only and its key region is the reverse output
                _, out_src, _ = _split_contexts(lhs)
                pending.append(_build_rule(rhs, out_src, variables))
            close_rule_pass()
            if not self.passes:
                raise ValueError("empty transform rule set (reverse)")
            return

        for stmt in stmts:
            if stmt.startswith("::"):
                close_rule_pass()  # closes with the filter in effect
                tid = stmt[2:].strip()
                if tid.startswith("["):
                    # '::[set];' = the global filter for everything that
                    # follows (ICU puts it first, so it scopes the whole
                    # transform); '::[set] Id;' = a FILTERED chain step
                    # (':: [:Greek:] Lower;' lowercases Greek runs only)
                    flt, j = _parse_uset(tid, 0)
                    rest_id = tid[j:].strip()
                    if rest_id:
                        self.passes.append(
                            _filtered_builtin(_builtin_pass(rest_id), flt)
                        )
                    else:
                        cur_filter = flt
                    continue
                self.passes.append(_filtered_builtin(
                    _builtin_pass(tid), cur_filter
                ))
                continue
            lhs, op, rhs = _split_rule(stmt)
            if op == "=":
                name = lhs.strip()
                if not re.fullmatch(r"\$[A-Za-z_][A-Za-z0-9_]*", name):
                    raise ValueError(f"bad variable name {name!r}")
                variables[name[1:]] = _tokenize_side(
                    rhs, variables, output=False
                )
                continue
            if op == "<":  # reverse-only rule: skipped when running forward
                continue
            # '<>' runs its forward half here, same as '>'
            pending.append(_build_rule(lhs, rhs, variables))
        close_rule_pass()
        if not self.passes:
            raise ValueError("empty transform rule set")

    def transliterate(self, text: str) -> str:
        for p in self.passes:
            text = p(text)
        return text

    __call__ = transliterate


@lru_cache(maxsize=64)
def compile_transform(
    rules: str, direction: str = "forward"
) -> Transliterator:
    return Transliterator(rules, direction=direction)


def icu_transform_rules(token: str, rules: str) -> str:
    """One-shot rule transform (compiled transliterator cached)."""
    return compile_transform(rules)(token)


def transform_rules_col(col: Column | str, rules: str) -> Column:
    """Rule-transformed string column — the Spark face of a custom-rules
    ICUTransformFilter (Arrow-batched; compiled once per executor via the
    lru_cache, not per batch)."""
    compile_transform(rules)  # validate on the driver, fail fast

    @pandas_udf("string")
    def _tr(s: pd.Series) -> pd.Series:
        t = compile_transform(rules)
        return s.map(lambda x: None if x is None else t(x))

    return _tr(F.col(col) if isinstance(col, str) else col)
