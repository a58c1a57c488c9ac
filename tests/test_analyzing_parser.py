"""AnalyzingQueryParser analog (reference
QueryParser/Analyzing/AnalyzingQueryParser.cs): fuzzy/prefix/range/wildcard
operands go through the analyzer; wildcard chars survive; each chunk must
analyze to exactly one token."""

import pytest

from lucene_net_ray.functions.analysis import Analyzer
from lucene_net_ray.query import (
    FuzzyQuery,
    PrefixQuery,
    QueryParseError,
    TermRangeQuery,
    WildcardQuery,
    parse_query,
    parse_query_analyzing,
)


def test_wildcard_chunks_folded():
    # GetWildcardQuery: each non-wildcard chunk analyzed, * / ? preserved
    q = parse_query_analyzing("FOO*BAR?Baz")
    assert isinstance(q, WildcardQuery)
    assert q.pattern == "foo*bar?baz"


def test_wildcard_run_preserved():
    # [?*]+ runs are kept verbatim (the reference's wildcardPattern groups
    # consecutive wildcards into one unanalyzed run)
    q = parse_query_analyzing("Ho**?Use")
    assert isinstance(q, WildcardQuery)
    assert q.pattern == "ho**?use"


def test_prefix_analyzed():
    q = parse_query_analyzing("TraBi*")
    assert isinstance(q, PrefixQuery)
    assert q.prefix == "trabi"


def test_prefix_stemmed_analyzer():
    # a stemming analyzer applies to the prefix operand (the reference's
    # documented behavior — including its documented caveat that stemming
    # can over-shorten)
    an = Analyzer(kind="catalan")
    q = parse_query_analyzing("Cases*", analyzer=an)
    assert isinstance(q, PrefixQuery)
    assert q.prefix == "cas"


def test_fuzzy_analyzed():
    an = Analyzer(kind="catalan")
    q = parse_query_analyzing("Cases~1", analyzer=an)
    assert isinstance(q, FuzzyQuery)
    assert q.term == "cas" and q.max_edits == 1


def test_range_bounds_analyzed():
    # SetAnalyzeRangeTerms(true) in the reference constructor
    an = Analyzer(kind="catalan")
    q = parse_query_analyzing("[Cases TO Gossos]", analyzer=an)
    assert isinstance(q, TermRangeQuery)
    assert q.lower == "cas" and q.upper == "gos"


def test_range_open_bound_star_survives():
    q = parse_query_analyzing("[Alpha TO *]")
    assert isinstance(q, TermRangeQuery)
    assert q.lower == "alpha" and q.upper is None


def test_multiple_tokens_chunk_raises():
    # AnalyzeSingleChunk: >1 output token is a ParseException
    with pytest.raises(QueryParseError, match="multiple terms"):
        parse_query_analyzing("foo-bar*")


def test_stopword_chunk_raises():
    # nothing returned by the analyzer (stopword chunk) is a ParseException
    an = Analyzer(stop_words=frozenset({"the"}))
    with pytest.raises(QueryParseError, match="returned nothing"):
        parse_query_analyzing("the*", analyzer=an)


def test_leading_wildcard_rejected_by_default():
    with pytest.raises(QueryParseError, match="first character"):
        parse_query_analyzing("*Foo")
    with pytest.raises(QueryParseError, match="first character"):
        parse_query_analyzing("?Foo")


def test_leading_wildcard_opt_in():
    q = parse_query_analyzing("*Foo", allow_leading_wildcard=True)
    assert isinstance(q, WildcardQuery)
    assert q.pattern == "*foo"


def test_field_and_boost_still_parse():
    q = parse_query_analyzing("title:FOO*Bar^2")
    assert isinstance(q, WildcardQuery)
    assert q.field == "title" and q.pattern == "foo*bar" and q.boost == 2.0


def test_classic_mode_unchanged():
    # the plain parser keeps its verbatim-lowercase multiterm behavior
    q = parse_query("foo-bar*")
    assert isinstance(q, PrefixQuery)
    assert q.prefix == "foo-bar"
    q2 = parse_query("*foo")  # leading wildcard allowed in classic mode
    assert isinstance(q2, WildcardQuery)
