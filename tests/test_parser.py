"""Pure-Python parser unit tests (no Spark): the classic grammar surface
(solr/core/src/java/org/apache/solr/parser/QueryParser.jj)."""

from __future__ import annotations

import pytest

from apache___solr_spark.query.parser import (
    BoolQuery,
    NotFlatQuery,
    PhraseNode,
    TermNode,
    parse_query,
    parse_query_tree,
)


def test_default_operator_or():
    pq = parse_query("alpha beta")
    assert pq.should == ["alpha", "beta"] and not pq.must


def test_and_binds_adjacent_only():
    pq = parse_query("a1 AND b1 c1")
    assert pq.must == ["a1", "b1"]
    assert pq.should == ["c1"]


def test_plus_minus_not():
    pq = parse_query("+a1 -b1 NOT c1 d1")
    assert pq.must == ["a1"]
    assert sorted(pq.must_not) == ["b1", "c1"]
    assert pq.should == ["d1"]


def test_phrase_roles_and_slop():
    pq = parse_query('"alpha beta" +"gamma delta" -"x1 y1"')
    assert pq.should_phrases == [["alpha", "beta"]]
    assert pq.must_phrases == [["gamma", "delta"]]
    assert pq.must_not_phrases == [["x1", "y1"]]
    sl = parse_query('"alpha beta"~2 "gamma delta"')
    assert sl.slops == {'"alpha beta"': 2}
    assert sl.should_phrases == [["alpha", "beta"], ["gamma", "delta"]]


def test_single_token_phrase_is_term():
    pq = parse_query('"alpha"')
    assert pq.should == ["alpha"] and not pq.should_phrases


def test_boosts():
    pq = parse_query('alpha^2 "beta gamma"^3.5 delta')
    assert pq.boosts["alpha"] == 2.0
    assert pq.boosts['"beta gamma"'] == 3.5
    assert "delta" not in pq.boosts


def test_field_prefix():
    pq = parse_query("text:alpha")
    assert pq.should == ["alpha"]
    with pytest.raises(NotImplementedError):
        parse_query("title:alpha")


def test_multi_term_clauses():
    pq = parse_query("pre* w?ld fuzz~1 fuzzy~ [aa TO bb] {cc TO dd}")
    kinds = [(c.kind, c.occur) for c in pq.expand]
    assert kinds == [
        ("prefix", "SHOULD"),
        ("wildcard", "SHOULD"),
        ("fuzzy", "SHOULD"),
        ("fuzzy", "SHOULD"),
        ("range", "SHOULD"),
        ("range", "SHOULD"),
    ]
    assert pq.expand[0].value == "pre*"
    assert pq.expand[2].fuzz == 1 and pq.expand[3].fuzz == 2
    assert pq.expand[4].inclusive and not pq.expand[5].inclusive
    assert pq.expand[4].lo == "aa" and pq.expand[4].hi == "bb"


def test_multi_term_roles():
    pq = parse_query("+pre* -suf* NOT mid?dle")
    assert [(c.kind, c.occur) for c in pq.expand] == [
        ("prefix", "MUST"),
        ("prefix", "MUST_NOT"),
        ("wildcard", "MUST_NOT"),
    ]


def test_range_star_bounds():
    pq = parse_query("[alpha TO *]")
    assert pq.expand[0].lo == "alpha" and pq.expand[0].hi is None


def test_flat_or_parens_supported_nested_not():
    pq = parse_query("(a1 OR b1) AND c1")
    assert pq.expand[0].kind == "group" and pq.expand[0].occur == "MUST"
    assert pq.must == ["c1"]
    # a group containing a phrase cannot flatten -> NotFlatQuery (the
    # engine routes these to the tree evaluator)
    with pytest.raises(NotFlatQuery):
        parse_query('("x1 y1" z1) d1')


def test_stopwords_vanish_from_queries():
    pq = parse_query("the alpha")  # 'the' is a stopword in the std chain
    assert pq.should == ["alpha"]


def test_dedup_keeps_first():
    pq = parse_query("alpha beta alpha")
    assert pq.should == ["alpha", "beta"]


def test_paren_groups():
    pq = parse_query("(alpha beta) AND gamma")
    assert len(pq.expand) == 1
    g = pq.expand[0]
    assert g.kind == "group" and g.occur == "MUST"
    assert g.terms == ["alpha", "beta"]
    assert pq.must == ["gamma"]
    pq2 = parse_query("+(alpha OR beta) -(x1 y1)")
    assert [(c.kind, c.occur) for c in pq2.expand] == [
        ("group", "MUST"),
        ("group", "MUST_NOT"),
    ]
    with pytest.raises(NotFlatQuery):
        parse_query("(a AND b) c")
    with pytest.raises(NotFlatQuery):
        parse_query("((a1 b1) AND c1) d1")


def test_group_boost():
    pq = parse_query("(alpha beta)^2 gamma")
    g = pq.expand[0]
    assert g.kind == "group" and g.boost == 2.0
    assert g.terms == ["alpha", "beta"]
    assert pq.should == ["gamma"]


def test_nested_tree_structure():
    t = parse_query_tree("(a1 AND b1) OR (c1 AND d1)")
    assert len(t.children) == 2
    for ch, terms in zip(t.children, (["a1", "b1"], ["c1", "d1"])):
        assert ch.occur == "SHOULD"
        assert isinstance(ch.node, BoolQuery)
        assert [c.occur for c in ch.node.children] == ["MUST", "MUST"]
        assert [c.node.term for c in ch.node.children] == terms


def test_nested_tree_deep_and_mixed():
    t = parse_query_tree('-(p1 AND (q1 r1)) +s1 ("x1 y1" z1)^3')
    assert [c.occur for c in t.children] == ["MUST_NOT", "MUST", "SHOULD"]
    neg = t.children[0].node
    assert isinstance(neg, BoolQuery)
    assert isinstance(neg.children[1].node, BoolQuery)
    grp = t.children[2].node
    assert grp.boost == 3.0
    assert isinstance(grp.children[0].node, PhraseNode)
    assert isinstance(grp.children[1].node, TermNode)


def test_tree_unbalanced_parens_raise():
    with pytest.raises(ValueError):
        parse_query_tree("(a1 b1")
    with pytest.raises(ValueError):
        parse_query_tree("a1 b1)")


def test_empty_group_dropped():
    pq = parse_query("alpha () beta")
    assert pq.should == ["alpha", "beta"] and not pq.expand


def test_default_op_and():
    """q.op=AND (QueryParserBase AND_OPERATOR): bare clauses bind MUST; OR
    demotes BOTH neighbors to SHOULD; explicit +/- and AND unchanged;
    nested groups inherit the operator."""
    t = parse_query_tree("a1 b1", default_op="AND")
    assert [c.occur for c in t.children] == ["MUST", "MUST"]
    t = parse_query_tree("a1 b1 OR c1", default_op="AND")
    assert [c.occur for c in t.children] == ["MUST", "SHOULD", "SHOULD"]
    t = parse_query_tree("a1 OR b1 c1", default_op="AND")
    assert [c.occur for c in t.children] == ["SHOULD", "SHOULD", "MUST"]
    t = parse_query_tree("-a1 +b1 c1", default_op="AND")
    assert [c.occur for c in t.children] == ["MUST_NOT", "MUST", "MUST"]
    t = parse_query_tree("(a1 b1) OR c1", default_op="AND")
    assert [c.occur for c in t.children] == ["SHOULD", "SHOULD"]
    assert [c.occur for c in t.children[0].node.children] == ["MUST", "MUST"]
    with pytest.raises(ValueError):
        parse_query_tree("a1", default_op="XOR")


def test_calculate_mm_spec():
    """SolrPluginUtils.calculateMinShouldMatch grammar: plain ints,
    negative ints, percentages (truncate toward zero), negative
    percentages, and ordered conditional 'upper<spec' clauses."""
    from apache___solr_spark.query.localparams import calculate_mm

    assert calculate_mm("3", 5) == 3
    assert calculate_mm("3", 2) == 2          # clamped to optional count
    assert calculate_mm("-2", 5) == 3
    assert calculate_mm("-7", 5) == 0         # floor at 0
    assert calculate_mm("75%", 4) == 3
    assert calculate_mm("75%", 5) == 3        # int(3.75) truncates
    assert calculate_mm("-25%", 5) == 4       # 5 + int(-1.25) = 5 - 1
    assert calculate_mm("0%", 5) == 0
    assert calculate_mm("100%", 5) == 5
    # conditionals: n<=2 all required; 3..9 -> all but 25%; >9 -> all but 3
    spec = "2<-25% 9<-3"
    assert calculate_mm(spec, 2) == 2
    assert calculate_mm(spec, 5) == 4
    assert calculate_mm(spec, 12) == 9
    assert calculate_mm(spec, 10) == 7
