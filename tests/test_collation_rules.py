"""Custom collation tailoring rules (ICUCollationField custom= analog)."""

from __future__ import annotations

import pytest

from apache___solr_spark.analysis.collation_rules import (
    RuleCollator,
    custom_collation_key,
    parse_collation_rules,
)


def _order(rules: str, words: list[str], strength: str = "identical"):
    return sorted(words, key=lambda w: custom_collation_key(w, rules, strength))


def test_parse_chains():
    chains = parse_collation_rules("&z < å < ä < ö  &v << w")
    assert chains == [
        ("z", [(1, "å", ""), (1, "ä", ""), (1, "ö", "")], 0),
        ("v", [(2, "w", "")], 0),
    ]


def test_parse_comments_and_quotes():
    chains = parse_collation_rules("# Swedish-ish\n&z < 'å'  # post-z\n")
    assert chains == [("z", [(1, "å", "")], 0)]
    # '' inside rules is a literal apostrophe element.
    chains2 = parse_collation_rules("&z < ''")
    assert chains2 == [("z", [(1, "'", "")], 0)]


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_collation_rules("< a")  # relation before any reset
    with pytest.raises(ValueError):
        parse_collation_rules("&a")  # reset with no relations
    with pytest.raises(NotImplementedError):
        # a [before n] chain only accepts the level-n relation and '='
        parse_collation_rules("&[before 2] a < b")
    with pytest.raises(ValueError):
        parse_collation_rules("&a < b /")  # expansion missing extension
    with pytest.raises(NotImplementedError):
        parse_collation_rules("[caseFirst upper] &a < b")  # other settings


def test_before2_places_secondary_before_anchor():
    rules = "&[before 2] a << à"
    # Primary-equal to 'a'; secondary below the root base AND below every
    # root accented a-form: à < a < á (root acute) at full strength.
    assert custom_collation_key("à", rules, "primary") == custom_collation_key(
        "a", rules, "primary"
    )
    assert _order(rules, ["á", "a", "à"]) == ["à", "a", "á"]
    # Still after every primary-smaller string.
    assert _order(rules, ["àb", "ab", "_b"]) == ["_b", "àb", "ab"]
    # Chained insertions stay in order, all before the anchor.
    got = _order("&[before 2] e << x << y", ["x", "y", "e", "d"])
    assert got == ["d", "x", "y", "e"]


def test_before3_places_tertiary_before_anchor():
    rules = "&[before 3] b <<< β"
    for strength in ("primary", "secondary"):
        assert custom_collation_key(
            "β", rules, strength
        ) == custom_collation_key("b", rules, strength)
    assert _order(rules, ["B", "b", "β"]) == ["β", "b", "B"]


def test_before2_equal_shares_weights():
    rules = "&[before 2] a << x = w"
    assert custom_collation_key("w", rules) == custom_collation_key(
        "x", rules
    )
    assert _order(rules, ["a", "w"]) == ["w", "a"]


def test_parse_expansion_operator():
    assert parse_collation_rules("&c < k / h  &a << ä/e") == [
        ("c", [(1, "k", "h")], 0),
        ("a", [(2, "ä", "e")], 0),
    ]


def test_before1_places_primary_before_anchor():
    assert parse_collation_rules("&[before 1] b < ω") == [
        ("b", [(1, "ω", "")], 1)
    ]
    rules = "&[before 1] b < ω"
    # ω lands between every a-continuation and b.
    got = _order(rules, ["az", "ωz", "bz", "a"])
    assert got == ["a", "az", "ωz", "bz"]
    # Secondary relations after [before 1] are out of scope, loudly.
    with pytest.raises(NotImplementedError):
        RuleCollator("&[before 1] b << ω")


def test_swedish_primary_tailoring():
    rules = "&z < å < ä < ö"
    got = _order(rules, ["äpple", "öga", "zebra", "arm", "ång"])
    assert got == ["arm", "zebra", "ång", "äpple", "öga"]
    # Root (untailored) order for comparison: ång folds to 'ang' and
    # sorts inside the a's ('ang' < 'arm'), not after z.
    assert _order("&y < q", ["ång", "arm", "zebra"]) == ["ång", "arm", "zebra"]


def test_contraction_slovak_ch():
    rules = "&h < ch"
    # 'ch' is one element after h: cz < ch? No — ch sorts after h, so any
    # c-initial word without the contraction precedes, and ch-words sit
    # between h and i.
    got = _order(rules, ["ha", "ia", "cha", "ca"])
    assert got == ["ca", "ha", "cha", "ia"]


def test_expansion_equality():
    rules = "&ae = ä"
    assert custom_collation_key("ä", rules, "primary") == custom_collation_key(
        "ae", rules, "primary"
    )
    got = _order(rules, ["ad", "ä", "af"], strength="primary")
    assert got == ["ad", "ä", "af"]


def test_expansion_operator_primary():
    # &c < k / h: k sorts as (position after c) followed by 'h'.  In this
    # mini-UCA the tailored step byte sorts above every root continuation,
    # so k lands after all c-words and before d; the extension's weights
    # tie-break among k-words.
    rules = "&c < k / h"
    got = _order(rules, ["ca", "cha", "k", "da"])
    assert got == ["ca", "cha", "k", "da"]
    # The extension's weights are real: 'ka' (k + a) vs 'kb'.
    assert _order(rules, ["kb", "ka"]) == ["ka", "kb"]


def test_expansion_operator_secondary_german_dict():
    # &a << ä / e: ä sorts as a secondary step after 'a' followed by 'e' —
    # primary-equal to "ae" (German dictionary order via the expansion
    # operator instead of expansion-by-equality).
    rules = "&a << ä / e"
    assert custom_collation_key("ä", rules, "primary") == custom_collation_key(
        "ae", rules, "primary"
    )
    got = _order(rules, ["ad", "ä", "af", "ae"])
    assert got == ["ad", "ae", "ä", "af"]


def test_expansion_extension_uses_tailored_char():
    # Extension chars that are themselves tailored expand with their
    # TAILORED weights: å is post-z, so b/å sorts after "aå"-style runs.
    rules = "&z < å  &a < b / å"
    got = _order(rules, ["ad", "aå", "b", "c"])
    assert got == ["ad", "aå", "b", "c"]


def test_tertiary_relation():
    rules = "&b < q <<< Q"
    assert custom_collation_key("q", rules, "primary") == custom_collation_key(
        "Q", rules, "primary"
    )
    got = _order(rules, ["c", "Q", "b", "q"])
    assert got == ["b", "q", "Q", "c"]


def test_secondary_relation():
    rules = "&v << w"
    assert custom_collation_key("v", rules, "primary") == custom_collation_key(
        "w", rules, "primary"
    )
    got = _order(rules, ["va", "wa", "vx"])
    # Primary level compares first: wa == va at primary, then vx.
    assert got == ["va", "wa", "vx"]
    # Full-strength tiebreak: w after v.
    assert _order(rules, ["w", "v"]) == ["v", "w"]


def test_case_partner_auto_cover():
    rules = "&z < å"
    assert custom_collation_key("Å", rules, "primary") == custom_collation_key(
        "å", rules, "primary"
    )
    # Lowercase sorts before uppercase on the tertiary tiebreak.
    assert _order(rules, ["Åbo", "åbo"]) == ["åbo", "Åbo"]
    # And both sort post-z, not with root 'a'.
    assert _order(rules, ["Åbo", "zebra", "arm"]) == ["arm", "zebra", "Åbo"]


def test_chained_reset_reuses_tailored_anchor():
    # Second chain anchors on an element tailored by the first.
    rules = "&z < å  &å < ω"
    got = _order(rules, ["ω", "å", "zebra"])
    assert got == ["zebra", "å", "ω"]


def test_strength_truncation_prefix():
    rules = "&z < å"
    c = RuleCollator(rules)
    k_id = c.key("Åå", "identical")
    for strength in ("primary", "secondary", "tertiary"):
        assert k_id.startswith(c.key("Åå", strength))


def test_none_and_empty():
    rules = "&z < å"
    assert custom_collation_key(None, rules) == b""
    assert custom_collation_key("", rules, "primary") == b""


def test_reorder_scripts():
    # Default (no reorder): UTF-8 primary order — Latin < Greek < Cyrillic.
    words = ["алма", "apple", "μήλο"]
    assert _order("&z < å", words) == ["apple", "μήλο", "алма"]
    # [reorder Cyrl Grek]: Cyrillic first, then Greek, then everything else.
    assert _order("[reorder Cyrl Grek] &z < å", words) == [
        "алма", "μήλο", "apple",
    ]


def test_reorder_settings_only_and_none():
    words = ["beta", "альфа"]
    assert _order("[reorder Cyrl]", words) == ["альфа", "beta"]
    assert _order("[reorder none]", words) == ["beta", "альфа"]


def test_reorder_others_marker():
    # 'others' marks where every unlisted group goes: Latin sorts last.
    words = ["zzz", "яяя", "ωωω"]
    assert _order("[reorder others Latn]", words) == ["ωωω", "яяя", "zzz"]


def test_reorder_special_groups():
    words = ["42", "zeta", "alpha"]
    assert _order("[reorder Latn digit]", words) == ["alpha", "zeta", "42"]
    assert _order("[reorder none]", words) == ["42", "alpha", "zeta"]


def test_reorder_composes_with_tailoring():
    # Script reordering + a tailored chain: å still sorts after z inside
    # the (now second) Latin group.
    words = ["ålesund", "zebra", "арбуз"]
    assert _order("[reorder Cyrl] &z < å", words) == [
        "арбуз", "zebra", "ålesund",
    ]


def test_alternate_shifted_ignores_variables_through_tertiary():
    rules = "[alternate shifted] &z < å"
    # Space/punct drop out of levels 1-3: the three forms tie exactly.
    for strength in ("primary", "secondary", "tertiary"):
        k = lambda w: custom_collation_key(w, rules, strength)
        assert k("de luge") == k("de-luge") == k("deluge")
    # ...and reappear at quaternary: space < hyphen < no-separator.
    assert _order(rules, ["deluge", "de-luge", "de luge"], "quaternary") == [
        "de luge", "de-luge", "deluge",
    ]
    # Tailoring still applies to the non-variable letters.
    assert _order(rules, ["ål", "zz", "a-l"], "quaternary") == [
        "a-l", "zz", "ål",
    ]


def test_alternate_non_ignorable_is_default():
    words = ["de luge", "de-luge", "deluge"]
    assert _order("[alternate non-ignorable] &z < å", words) == _order(
        "&z < å", words
    )
    # Without shifted, punctuation differences surface at primary.
    k = lambda w: custom_collation_key(w, "&z < å", "primary")
    assert k("de luge") != k("deluge")


def test_import_locale_tailorings():
    # Danish: z < æ < ø < å with aa == å ('ålen' < 'aargang' on the
    # letters after the equal å/aa prefix).
    words = ["zebra", "æble", "øje", "ålen", "aargang", "arm"]
    assert _order("[import da]", words) == [
        "arm", "zebra", "æble", "øje", "ålen", "aargang",
    ]
    # German phonebook: umlauts expand to base+e at all levels.
    k = lambda w: custom_collation_key(w, "[import de_phonebook]")
    assert k("ä") == k("ae") and k("ö") == k("oe")
    assert _order("[import de_phonebook]", ["öl", "of", "oz"]) == [
        "öl", "of", "oz",
    ]


def test_import_composes_with_rules_and_settings():
    got = _order("[import sv] &v << w", ["wåg", "våg", "zebra", "äpple"])
    assert got == ["våg", "wåg", "zebra", "äpple"]


def test_import_unknown_and_other_settings_raise():
    with pytest.raises(NotImplementedError):
        custom_collation_key("x", "[import fr] &a < b")
    with pytest.raises(NotImplementedError):
        custom_collation_key("x", "[caseFirst upper] &a < b")


def test_alternate_errors():
    with pytest.raises(ValueError):
        custom_collation_key("x", "[alternate sideways] &a < b")


def test_reorder_errors():
    with pytest.raises(NotImplementedError):
        custom_collation_key("x", "[reorder Klingon] &a < b")
    with pytest.raises(ValueError):
        custom_collation_key("x", "[reorder]")
    with pytest.raises(ValueError):
        custom_collation_key("x", "[reorder Latn Latn]")


def test_column_udf(spark):
    from apache___solr_spark.analysis.collation_rules import (
        custom_collation_key_col,
    )

    df = spark.createDataFrame(
        [("äpple",), ("öga",), ("zebra",), ("arm",)], ["w"]
    )
    got = [
        r["w"]
        for r in df.orderBy(
            custom_collation_key_col("w", "&z < å < ä < ö")
        ).collect()
    ]
    assert got == ["arm", "zebra", "äpple", "öga"]
    # Invalid rules fail fast on the driver.
    with pytest.raises(NotImplementedError):
        custom_collation_key_col("w", "[backwards 2] &z < a")


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
