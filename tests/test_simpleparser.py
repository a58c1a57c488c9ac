"""SimpleQueryParser analog: vectors derived from the reference's documented
semantics (Simple/SimpleQueryParser.cs:19-165 doc examples) plus the
never-fails error-recovery rules, and an end-to-end search equivalence."""

import pyarrow as pa
import pytest

from lucene_net_ray.pipelines.build import build_index_from_table
from lucene_net_ray.pipelines.search import Searcher
from lucene_net_ray.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    SIMPLE_NOT_OPERATOR,
    SIMPLE_PHRASE_OPERATOR,
    SIMPLE_PREFIX_OPERATOR,
    SIMPLE_WHITESPACE_OPERATOR,
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    parse_query,
    parse_simple,
)


def T(t, f="content"):
    return TermQuery(field=f, term=t)


def test_single_term():
    assert parse_simple("foo") == T("foo")


def test_default_or():
    q = parse_simple("token1 token2")
    assert q == BooleanQuery(clauses=(BooleanClause(T("token1"), SHOULD),
                                      BooleanClause(T("token2"), SHOULD)))


def test_explicit_and_or():
    q = parse_simple("token1+token2")
    assert q == BooleanQuery(clauses=(BooleanClause(T("token1"), MUST),
                                      BooleanClause(T("token2"), MUST)))
    q = parse_simple("token1|token2")
    assert q == BooleanQuery(clauses=(BooleanClause(T("token1"), SHOULD),
                                      BooleanClause(T("token2"), SHOULD)))


def test_right_to_left_precedence():
    # doc example: token1 | token2 + token3 -> (token1 OR token2) AND token3
    q = parse_simple("token1 | token2 + token3")
    inner = BooleanQuery(clauses=(BooleanClause(T("token1"), SHOULD),
                                  BooleanClause(T("token2"), SHOULD)))
    assert q == BooleanQuery(clauses=(BooleanClause(inner, MUST),
                                      BooleanClause(T("token3"), MUST)))


def test_parens_precedence():
    # doc example: token1 + (token2 | token3)
    q = parse_simple("token1 + (token2 | token3)")
    inner = BooleanQuery(clauses=(BooleanClause(T("token2"), SHOULD),
                                  BooleanClause(T("token3"), SHOULD)))
    assert q == BooleanQuery(clauses=(BooleanClause(T("token1"), MUST),
                                      BooleanClause(inner, MUST)))


def test_negation_wraps_with_matchall():
    q = parse_simple("-token0")
    assert q == BooleanQuery(clauses=(BooleanClause(T("token0"), MUST_NOT),
                                      BooleanClause(MatchAllDocsQuery(), SHOULD)))
    # double negation cancels
    assert parse_simple("--token0") == T("token0")
    q2 = parse_simple("alpha -beta")
    assert isinstance(q2, BooleanQuery)
    assert q2.clauses[0].query == T("alpha")
    assert isinstance(q2.clauses[1].query, BooleanQuery)  # negated wrapper
    # stopword-only token yields no branch; the negation applies to nothing
    assert parse_simple("-the alpha") == T("alpha")


def test_phrase_and_near():
    q = parse_simple('"term1 term2"')
    assert q == PhraseQuery(terms=("term1", "term2"), slop=0, positions=(0, 1))
    q = parse_simple('"term1 term2"~5 x')
    assert isinstance(q, BooleanQuery)
    assert q.clauses[0].query.slop == 5


def test_prefix_and_fuzzy():
    assert parse_simple("term1*") == PrefixQuery(prefix="term1")
    assert parse_simple("term~1") == FuzzyQuery(term="term", max_edits=1)
    # edit distance capped at 2 (LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE)
    assert parse_simple("term~9") == FuzzyQuery(term="term", max_edits=2)
    # fuzziness 0 / unparseable -> plain analyzed term
    assert parse_simple("term~0") == T("term")
    assert parse_simple("term~x") == T("term")


def test_escaping():
    # the escape affects OPERATOR interpretation; the raw token still runs
    # through the analysis chain afterwards ("examples consider the terms
    # before text processing", SimpleQueryParser.cs:162)
    # \-term1: not a negation (and the standard chain then strips the dash)
    assert parse_simple(r"\-term1") == T("term1")
    assert not isinstance(parse_simple(r"\-term1"), BooleanQuery)
    # term1\*: not a prefix query
    assert parse_simple(r"term1\*") == T("term1")
    assert not isinstance(parse_simple(r"term1\*"), PrefixQuery)
    # mid-token dash/star are never operators, escaped or not
    assert parse_simple(r"term\-1") == parse_simple("term-1") == T("term-1")
    assert parse_simple("term*1") == parse_simple(r"term\*1")
    assert not isinstance(parse_simple("term*1"), PrefixQuery)


def test_error_recovery_never_raises():
    # unmatched paren/quote are extraneous
    assert parse_simple("(foo bar") == parse_simple("foo bar")
    assert parse_simple('"foo bar') == parse_simple("foo bar")
    assert parse_simple(")") is None
    assert parse_simple("") is None
    assert parse_simple("()") is None
    assert parse_simple("+") is None
    # leading operator with no prior token is ignored
    assert parse_simple("+foo") == T("foo")
    assert parse_simple("| foo") == T("foo")


def test_multifield_weights():
    q = parse_simple("foo", fields={"title": 2.0, "body": 1.0})
    assert isinstance(q, BooleanQuery)
    (c1, c2) = q.clauses
    assert c1.query == TermQuery(boost=2.0, field="title", term="foo")
    assert c2.query == TermQuery(field="body", term="foo")
    assert {c1.occur, c2.occur} == {SHOULD}
    # single field simplifies
    assert parse_simple("foo", fields={"title": 1.0}) == T("foo", "title")


def test_default_operator_must():
    q = parse_simple("alpha beta", default_operator=MUST)
    assert all(c.occur == MUST for c in q.clauses)
    with pytest.raises(ValueError):
        parse_simple("a", default_operator=MUST_NOT)


def test_flags_disable_features():
    # phrase operator off: quotes are just characters (analyzer strips them)
    q = parse_simple('"a b"', flags=SIMPLE_WHITESPACE_OPERATOR)
    assert q is not None and not isinstance(q, PhraseQuery)
    # prefix off: trailing * is part of the raw token, analyzer drops punct
    q = parse_simple("term*", flags=SIMPLE_WHITESPACE_OPERATOR | SIMPLE_PHRASE_OPERATOR)
    assert not isinstance(q, PrefixQuery)
    # NOT off: '-' binds into the term
    q = parse_simple("-foo", flags=SIMPLE_WHITESPACE_OPERATOR)
    assert not isinstance(q, BooleanQuery)


def test_analyzed_multiword_token():
    # one ws token analyzed into several terms joins with the default operator
    q = parse_simple("can't")
    assert isinstance(q, (TermQuery, BooleanQuery))


# -- end-to-end -------------------------------------------------------------

DOCS = [
    "sunny bright morning walk",
    "rainy cold evening walk",
    "sunny warm afternoon run",
    "cloudy cool morning run",
    "bright sunny sunny day",
]


@pytest.fixture(scope="module")
def simple_idx(tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("simple_idx"))
    build_index_from_table(
        pa.table({"content": DOCS}), idx, target_rows_per_segment=3,
        index_options="positions",
    )
    return Searcher(idx, use_actors=False)


def test_end_to_end_equivalence(simple_idx):
    pairs = [
        ("sunny+morning", "+sunny +morning"),
        ("sunny | rainy", "sunny OR rainy"),
        ('"sunny bright"', '"sunny bright"'),
    ]
    for simple_s, classic_s in pairs:
        hs = simple_idx.search(parse_simple(simple_s), k=10)
        hc = simple_idx.search(parse_query(classic_s), k=10)
        assert [d for d, _ in hs] == [d for d, _ in hc], (simple_s, classic_s)
        assert [s for _, s in hs] == pytest.approx([s for _, s in hc])


def test_end_to_end_negation(simple_idx):
    # 'sunny + -run' -> MUST(sunny) AND MUST(not-run wrapper)
    hits = simple_idx.search(parse_simple("sunny + -run"), k=10)
    ids = {d for d, _ in hits}
    assert ids == {0, 4}  # sunny docs without "run"
    # with the default OR, negation is a union (reference semantics):
    # sunny OR (NOT run) = everything except the sunny-less run docs
    hits_or = simple_idx.search(parse_simple("sunny -run"), k=10)
    assert {d for d, _ in hits_or} == {0, 1, 2, 4}


# -- property: the parser NEVER raises (SimpleQueryParser.cs:30 'any errors
# in query syntax will be ignored') ----------------------------------------

from hypothesis import given, strategies as st


@given(st.text(max_size=120))
def test_parse_simple_never_raises(s):
    q = parse_simple(s)
    assert q is None or hasattr(q, "boost")


@given(st.text(alphabet='ab("|)+-~*\\ \t', max_size=60))
def test_parse_simple_operator_soup_never_raises(s):
    parse_simple(s)


@given(st.text(alphabet="ab(|+-~*\" ", max_size=40), st.integers(0, 1023))
def test_parse_simple_flag_combinations(s, flags):
    parse_simple(s, flags=flags)
