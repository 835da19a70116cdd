"""ICU rule-based transliterator engine (Transliterator.createFromRules
analog) — pure-Python tests plus one Spark column test."""

from __future__ import annotations

import pytest

from apache___solr_spark.analysis.transform_rules import (
    Transliterator,
    compile_transform,
    icu_transform_rules,
)


def t(rules: str, text: str) -> str:
    return icu_transform_rules(text, rules)


def test_simple_replacement_and_order():
    # First-match-wins in definition order.
    assert t("ab > X ; a > y ;", "aab") == "yX"
    assert t("a > y ; ab > X ;", "aab") == "yyb"


def test_variables_and_sets():
    rules = "$v = [aeiou] ; $v > V ;"
    assert t(rules, "hello world") == "hVllV wVrld"
    # Variables compose (a variable used inside another).
    rules2 = "$c = [bcd] ; $cv = $c ; $cv > '#' ;"
    assert t(rules2, "abcde") == "a###e"


def test_set_ranges_negation_escapes():
    assert t(r"[a-c] > x ;", "abcd") == "xxxd"
    assert t(r"[^a-c ] > x ;", "abcd") == "abcx"
    assert t("\\u0041 > z ;", "ABA") == "zBz"


def test_category_sets():
    assert t("[:Nd:] > '#' ;", "a1b22") == "a#b##"
    assert t("[:Lu:] > _ ;", "aXbY") == "a_b_"
    # Long alias form.
    assert t("[:Decimal Number:] > '#' ;", "x9") == "x#"


def test_contexts():
    # Post-context: s before a vowel becomes z.
    assert t("s } [aeiou] > z ;", "sa se st s") == "za ze st s"
    # Pre-context: s after a vowel becomes z.
    assert t("[aeiou] { s > z ;", "as is ks") == "az iz ks"
    # Pre-context sees already-converted text: first rule rewrites 'a' to
    # 'e', then 's' after that 'e' still z-ifies.
    assert t("a > e ; [e] { s > z ;", "as") == "ez"


def test_anchors():
    assert t("^ { a > X ;", "aba") == "Xba"
    assert t("a } $ > Y ;", "aba") == "abY"


def test_cursor_rescan():
    # '|' puts the cursor before 'y', so the 'yz' rule still fires.
    assert t("ab > x | y ; yz > w ;", "abz") == "xw"
    # Without the cursor the second rule is never reached.
    assert t("ab > xy ; yz > w ;", "abz") == "xyz"


def test_chain_steps():
    assert t("::Any-Lower ;", "MiXeD") == "mixed"
    # NFD + mark stripping as two passes.
    rules = "::NFD ; [:Mn:] > ;"
    assert t(rules, "café résumé") == "cafe resume"
    # Built-in table transforms are callable as chain steps too.
    assert t("::Cyrillic-Latin ;", "щука") == "ŝuka"


def test_greek_latin_gamma_nasal():
    """The ISO 843 digraph rule the table-based Greek-Latin transform
    lacks: gamma before a velar transcribes as n."""
    rules = (
        "::Any-Lower ; ::NFD ; [:Mn:] > ;"
        "γ } [γκξχ] > n ; γ > g ; α > a ; ε > e ; λ > l ; ο > o ; σ > s ;"
        "ς > s ;"
    )
    assert t(rules, "άγγελος") == "angelos"
    assert t(rules, "γάλα") == "gala"


def test_quoting():
    assert t("'>' > gt ;", "a>b") == "agtb"
    assert t("'' > q ;", "a'b") == "aqb"


def test_bidirectional_and_reverse_rules():
    # '<>' applies forward; '<' is reverse-only and skipped.
    assert t("a <> b ; x < y ;", "ax") == "bx"


def test_empty_replacement_deletes():
    assert t("[aeiou] > ;", "hello") == "hll"


def test_segments_and_backrefs():
    # Double a captured set match.
    assert t("([bc]) > $1$1 ;", "abc") == "abbcc"
    # Swap two captures.
    assert t("(a)([xy]) > $2$1 ;", "ax ay ab") == "xa ya ab"
    # Nested segments number by '(' order.
    assert t("((a)b) > $2'-'$1 ;", "ab") == "a-ab"
    # Literal text mixes with back-references.
    assert t("([0-9]) > 'n('$1')' ;", "a7") == "an(7)"


def test_segment_backref_with_cursor():
    # Cursor at 0 re-scans the substituted text, so the second rule fires
    # on the 'w' the first rule wrote; without it the cursor skips past.
    assert t("(ab)z > |$1w ; w > V ;", "abz") == "abV"
    assert t("(ab)z > $1w ; w > V ;", "abz") == "abw"


def test_function_calls():
    # Apply a chain-step transform to a captured segment.
    assert t("(a[bc]) > &Any-Upper($1) ;", "ab xy") == "AB xy"
    # Literals mix with back-references inside the call.
    assert t("([bc]) > &Upper('<'$1'>') ;", "b") == "<B>"
    # NFD inside a call decomposes just the argument.
    out = t("(é) > &NFD($1) ;", "é")
    assert out == "é"


def test_function_call_errors():
    with pytest.raises(NotImplementedError):
        compile_transform("(a) > &NoSuch($1) ;")
    with pytest.raises(ValueError):
        compile_transform("(a) > &Upper($1 ;")  # unterminated
    with pytest.raises(NotImplementedError):
        compile_transform("(a) > &Upper(&Lower($1)) ;")  # nested
    with pytest.raises(ValueError):
        compile_transform("&Upper(a) > x ;")  # call on the match side


def test_segment_errors():
    with pytest.raises(ValueError):
        compile_transform("(a) > $2 ;")  # only one segment
    with pytest.raises(ValueError):
        compile_transform("(a > x ;")  # unbalanced
    with pytest.raises(ValueError):
        compile_transform("(a) > $0 ;")  # numbered from 1


def test_segments_in_contexts():
    """Segments capture inside pre/post contexts (capture-only: context
    text survives, its capture feeds the output) with GLOBAL '(' -order
    numbering pre -> key -> post."""
    t = lambda rules, s: compile_transform(rules)(s)
    # pre-context capture: double the preceding letter in place of x
    assert t("([a-z]) { x > $1 ;", "ax bx") == "aa bb"
    # the context char itself is untouched, non-matching x unchanged
    assert t("([ab]) { x > $1 ;", "ax cx") == "aa cx"
    # post-context capture
    assert t("x } ([a-z]) > $1 ;", "xa xb") == "aa bb"
    # global numbering across pre, key and post
    assert t("([0-9]) { (x) } ([a-z]) > $3 '-' $1 ;", "1xa") == "1a-1a"
    assert t("([0-9]) { (x) } ([a-z]) > $2$2 ;", "1xa") == "1xxa"
    # anchored pre-context with capture only fires at the start
    assert t("^ ([a-z]) { x > $1 ;", "ax ax") == "aa ax"
    # a context capture inside a function call
    assert t("([a-z]) { x > &Upper($1) ;", "ax") == "aA"
    # backref bound counts ALL segments in the rule
    with pytest.raises(ValueError):
        compile_transform("(a) { b > $2 ;")  # only one segment total
    # unbalanced parens in a context still rejected
    with pytest.raises(ValueError):
        compile_transform("(a { b > c ;")


def test_errors():
    with pytest.raises(ValueError):
        compile_transform("a > b")  # missing ';'
    with pytest.raises(ValueError):
        compile_transform("$undefined > x ;")
    with pytest.raises(NotImplementedError):
        compile_transform(":: [a-z] Remove ;")  # unknown filtered step id
    with pytest.raises(NotImplementedError):
        compile_transform("::NoSuchTransform ;")
    with pytest.raises(ValueError):
        compile_transform("> x ;")  # empty key
    # Non-terminating rule set is cut off with a clear error.
    with pytest.raises(ValueError):
        Transliterator("a > | a ;").transliterate("a")


def test_column_udf(spark):
    from apache___solr_spark.analysis.transform_rules import (
        transform_rules_col,
    )

    df = spark.createDataFrame(
        [("Российская",), ("щука",), (None,)], "w string"
    )
    rules = "::Cyrillic-Latin ;"
    got = [
        r["t"]
        for r in df.select(
            transform_rules_col("w", rules).alias("t")
        ).collect()
    ]
    assert got == ["Rossijskaâ", "ŝuka", None]
    with pytest.raises(NotImplementedError):
        transform_rules_col("w", "::[a-z] Remove ;")


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))


def test_global_filter_sets():
    """'::[set];' global filter: rule replacements only touch in-filter
    characters (contexts still see everything); builtin steps apply per
    in-filter run; '::[set] Id;' is a filtered chain step."""
    t = lambda rules, s: compile_transform(rules)(s)
    # rule pass under a filter: only a-m chars may change
    assert t(":: [a-m] ; a > X ;", "aza") == "XzX"
    # key containing any out-of-filter char never fires
    assert t(":: [a-m] ; az > Y ;", "az") == "az"
    # out-of-filter text still serves as context
    assert t(":: [a-m] ; z { a > Q ;", "za ba") == "zQ ba"
    # filtered builtin chain step: uppercase only vowels
    assert t(":: [aeiou] Any-Upper ;", "banana") == "bAnAnA"
    # bare filter scopes the builtin that FOLLOWS it
    assert t(":: [b-z] ; ::Any-Upper ;", "abc") == "aBC"
    # a filter statement closes the pending rule pass with the OLD scope
    assert t("a > b ; :: [^b] ; b > c ;", "ab") == "bb"


def test_reverse_direction():
    """compile_transform(rules, 'reverse'): '<>' rules run right-to-left
    with rhs contexts, '<' reverse-only rules activate, '>' rules are
    skipped, chain steps invert and run in reverse statement order."""
    rev = lambda rules, s: compile_transform(rules, "reverse")(s)
    # bidirectional pair runs backwards
    assert rev("a <> b ;", "ab") == "aa"
    # reverse-only rule activates; forward-only skipped
    assert rev("x < y ; p > q ;", "yp") == "xp"
    # rhs contexts gate the reverse match: only 'b' after 'c' maps back
    assert rev("a <> c { b ;", "cb ab") == "ca ab"
    # lhs context is forward-only: its key region is the reverse output
    assert rev("z { a } w <> b ;", "b") == "a"
    # chain steps invert and reverse order: forward lower-then-rule
    # becomes reverse rule-then-upper
    assert rev("::Any-Lower ; B <> q ;", "q") == "B"
    # segments on the rhs capture for the reverse output
    assert rev("$1 '-' <> ([xy]) z ;", "xz yz") == "x- y-"
    # no inverse for table transforms; filters are forward-directional
    with pytest.raises(NotImplementedError):
        compile_transform("::Cyrillic-Latin ;", "reverse")
    with pytest.raises(NotImplementedError):
        compile_transform(":: [a-z] ; a <> b ;", "reverse")
    # round-trip property on a bijective pair set
    rules = "a <> '1' ; b <> '2' ; c <> '3' ;"
    fwd = compile_transform(rules)
    bwd = compile_transform(rules, "reverse")
    for s in ("abc", "cab", "bbb"):
        assert bwd(fwd(s)) == s
