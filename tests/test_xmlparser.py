"""XML query parser (CoreParser analog): tree construction + end-to-end
equivalence with the programmatic Query API, mirroring the reference's
TestParser.cs approach of parsing an XML document and running it."""

import pyarrow as pa
import pytest

from lucene_net_ray.pipelines.build import build_index_from_table
from lucene_net_ray.pipelines.search import Searcher
from lucene_net_ray.pipelines.spans import (
    PayloadTermQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
)
from lucene_net_ray.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    BoostingQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FilteredQuery,
    MatchAllDocsQuery,
    TermQuery,
)
from lucene_net_ray.xmlparser import XmlParseError, XmlQueryParser, parse_xml_query


@pytest.fixture(scope="module")
def parser():
    return XmlQueryParser(default_field="content")


def test_term_query_raw_text_and_boost(parser):
    q = parser.parse('<TermQuery fieldName="title" boost="2.5">Running</TermQuery>')
    # TermQueryBuilder does NOT analyze: the raw text survives
    assert q == TermQuery(boost=2.5, field="title", term="Running")


def test_term_query_blank_text_fails(parser):
    with pytest.raises(XmlParseError):
        parser.parse("<TermQuery>  </TermQuery>")


def test_terms_query_analyzes(parser):
    q = parser.parse(
        '<TermsQuery fieldName="t" minimumNumberShouldMatch="2">The Quick Foxes</TermsQuery>'
    )
    assert isinstance(q, BooleanQuery)
    assert q.min_should_match == 2
    terms = [c.query.term for c in q.clauses]
    assert terms == ["quick", "foxes"]  # stopword dropped, lowercased
    assert all(c.occur == SHOULD for c in q.clauses)


def test_boolean_query_occurs_and_inheritance(parser):
    q = parser.parse(
        """
        <BooleanQuery fieldName="body" minimumNumberShouldMatch="1">
          <Clause occurs="must"><TermQuery>alpha</TermQuery></Clause>
          <Clause occurs="mustNot"><TermQuery>beta</TermQuery></Clause>
          <Clause><TermQuery fieldName="title">gamma</TermQuery></Clause>
        </BooleanQuery>
        """
    )
    assert isinstance(q, BooleanQuery)
    assert q.min_should_match == 1
    (c1, c2, c3) = q.clauses
    assert (c1.occur, c1.query.field, c1.query.term) == (MUST, "body", "alpha")
    assert (c2.occur, c2.query.field) == (MUST_NOT, "body")
    # explicit fieldName on the leaf overrides the inherited one
    assert (c3.occur, c3.query.field, c3.query.term) == (SHOULD, "title", "gamma")


def test_boolean_query_bad_occurs(parser):
    with pytest.raises(XmlParseError):
        parser.parse(
            '<BooleanQuery><Clause occurs="sometimes"><TermQuery>x</TermQuery></Clause></BooleanQuery>'
        )


def test_dismax_and_constant_score(parser):
    q = parser.parse(
        """
        <DisjunctionMaxQuery tieBreaker="0.3">
          <TermQuery fieldName="a">x</TermQuery>
          <ConstantScoreQuery boost="1.5"><TermQuery fieldName="b">y</TermQuery></ConstantScoreQuery>
        </DisjunctionMaxQuery>
        """
    )
    assert isinstance(q, DisjunctionMaxQuery)
    assert q.tie_breaker == pytest.approx(0.3)
    d1, d2 = q.disjuncts
    assert d1 == TermQuery(field="a", term="x")
    assert isinstance(d2, ConstantScoreQuery) and d2.boost == 1.5
    assert d2.query == TermQuery(field="b", term="y")


def test_match_all(parser):
    assert parser.parse("<MatchAllDocsQuery/>") == MatchAllDocsQuery()


def test_user_query_classic_syntax(parser):
    q = parser.parse('<UserQuery fieldName="content">alpha AND beta</UserQuery>')
    assert isinstance(q, BooleanQuery)
    assert {c.occur for c in q.clauses} == {MUST}


def test_boosting_query_default_demote(parser):
    q = parser.parse(
        """
        <BoostingQuery>
          <Query><TermQuery>good</TermQuery></Query>
          <BoostQuery><TermQuery>bad</TermQuery></BoostQuery>
        </BoostingQuery>
        """
    )
    assert isinstance(q, BoostingQuery)
    assert q.match == TermQuery(term="good")
    assert q.context == TermQuery(term="bad")
    assert q.demote == pytest.approx(0.01)  # BoostingQueryBuilder.DEFAULT_BOOST


def test_boosting_term_query(parser):
    q = parser.parse('<BoostingTermQuery fieldName="f">payloadterm</BoostingTermQuery>')
    assert q == PayloadTermQuery(field="f", term="payloadterm", func="avg")


def test_filtered_query_range_filter(parser):
    q = parser.parse(
        """
        <FilteredQuery>
          <Filter>
            <RangeFilter fieldName="date" lowerTerm="20020101" upperTerm="20030101"
                         includeUpper="false"/>
          </Filter>
          <Query><TermQuery>money</TermQuery></Query>
        </FilteredQuery>
        """
    )
    assert isinstance(q, FilteredQuery)
    assert q.query == TermQuery(term="money")
    f = q.filter
    assert (f.field, f.lower, f.upper) == ("date", "20020101", "20030101")
    assert f.include_lower is True and f.include_upper is False


def test_numeric_range_query_types(parser):
    q = parser.parse(
        '<NumericRangeQuery fieldName="age" lowerTerm="10" upperTerm="20" type="long"/>'
    )
    assert isinstance(q, ConstantScoreQuery)
    inner = q.query
    assert isinstance(inner, FilteredQuery) and isinstance(inner.query, MatchAllDocsQuery)
    assert inner.filter.lower == 10 and inner.filter.upper == 20
    qf = parser.parse(
        '<NumericRangeQuery fieldName="score" lowerTerm="1.5" upperTerm="2.5" type="double"/>'
    )
    assert qf.query.filter.lower == pytest.approx(1.5)
    with pytest.raises(XmlParseError):
        parser.parse('<NumericRangeQuery fieldName="x" lowerTerm="1" upperTerm="2" type="decimal"/>')
    with pytest.raises(XmlParseError):
        parser.parse('<NumericRangeQuery fieldName="x" lowerTerm="1"/>')


def test_span_tree(parser):
    q = parser.parse(
        """
        <SpanNear fieldName="s" slop="2" inOrder="true">
          <SpanTerm>quick</SpanTerm>
          <SpanOrTerms>fox jumps</SpanOrTerms>
          <SpanNot>
            <Include><SpanFirst end="3"><SpanTerm>lazy</SpanTerm></SpanFirst></Include>
            <Exclude><SpanTerm>dog</SpanTerm></Exclude>
          </SpanNot>
        </SpanNear>
        """
    )
    assert isinstance(q, SpanNearQuery)
    assert q.slop == 2 and q.in_order is True and q.field == "s"
    t, orq, notq = q.clauses
    assert t == SpanTermQuery(field="s", term="quick")
    assert isinstance(orq, SpanOrQuery)
    assert [c.term for c in orq.clauses] == ["fox", "jumps"]
    assert isinstance(notq, SpanNotQuery)
    assert isinstance(notq.include, SpanFirstQuery) and notq.include.end == 3
    assert notq.exclude == SpanTermQuery(field="s", term="dog")


def test_span_near_requires_slop(parser):
    with pytest.raises(XmlParseError):
        parser.parse("<SpanNear><SpanTerm>a</SpanTerm></SpanNear>")


def test_unknown_element_and_bad_xml(parser):
    with pytest.raises(XmlParseError):
        parser.parse("<FrobQuery>x</FrobQuery>")
    with pytest.raises(XmlParseError):
        parser.parse("<TermQuery>unclosed")


def test_builder_registry_extension():
    p = XmlQueryParser()
    p.builders["MyQuery"] = lambda self, e, field: TermQuery(field=field, term="custom")
    assert p.parse('<MyQuery fieldName="z"/>') == TermQuery(field="z", term="custom")


# -- end-to-end: XML query == programmatic query on a real index ------------

DOCS = [
    "sunny bright morning walk",
    "rainy cold evening walk",
    "sunny warm afternoon run",
    "cloudy cool morning run",
    "bright sunny sunny day",
]
YEARS = [2001, 2002, 2003, 2004, 2005]


@pytest.fixture(scope="module")
def xml_index(tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("xml_idx"))
    build_index_from_table(
        pa.table({"content": DOCS, "year": YEARS}),
        idx,
        target_rows_per_segment=3,
        stored_columns=("year",),
    )
    return Searcher(idx, use_actors=False)


def _ids(hits):
    return [d for d, _ in hits]


def test_end_to_end_boolean(xml_index):
    xml_q = parse_xml_query(
        """
        <BooleanQuery>
          <Clause occurs="must"><TermQuery>sunny</TermQuery></Clause>
          <Clause occurs="mustNot"><TermQuery>run</TermQuery></Clause>
        </BooleanQuery>
        """
    )
    prog_q = BooleanQuery(
        clauses=(
            __import__("lucene_net_ray.query", fromlist=["BooleanClause"]).BooleanClause(
                TermQuery(term="sunny"), MUST
            ),
            __import__("lucene_net_ray.query", fromlist=["BooleanClause"]).BooleanClause(
                TermQuery(term="run"), MUST_NOT
            ),
        )
    )
    xh = xml_index.search(xml_q, k=10)
    ph = xml_index.search(prog_q, k=10)
    assert _ids(xh) == _ids(ph) and _ids(xh) != []
    assert [s for _, s in xh] == pytest.approx([s for _, s in ph])


def test_end_to_end_numeric_filter_exclusive(xml_index):
    # year in (2002, 2004]: excludes doc1 (2002), keeps doc2/doc3 (2003/2004)
    q = parse_xml_query(
        """
        <FilteredQuery>
          <Filter><NumericRangeFilter fieldName="year" lowerTerm="2002" upperTerm="2004"
                                      includeLower="false"/></Filter>
          <Query><MatchAllDocsQuery/></Query>
        </FilteredQuery>
        """
    )
    hits = xml_index.search(q, k=10)
    assert sorted(_ids(hits)) == [2, 3]


# -- QueryWrapperFilter / TermsFilter / BooleanFilter ------------------------

def test_terms_filter_xml(parser):
    q = parser.parse(
        """
        <FilteredQuery>
          <Filter><TermsFilter fieldName="content">Sunny Rainy</TermsFilter></Filter>
          <Query><TermQuery>walk</TermQuery></Query>
        </FilteredQuery>
        """
    )
    from lucene_net_ray.query import QueryFilter

    assert isinstance(q.filter, QueryFilter)
    terms = [c.query.term for c in q.filter.query.clauses]
    assert terms == ["sunny", "rainy"]  # analyzed


def test_boolean_filter_semantics():
    from lucene_net_ray.query import (
        FieldRangeFilter,
        QueryFilter,
        boolean_filter,
        terms_filter,
    )

    f = boolean_filter(
        [
            (terms_filter("content", ["x"]), SHOULD),
            (terms_filter("content", ["y"]), SHOULD),
            (FieldRangeFilter(field="year", lower=2000, upper=2010), MUST),
            (terms_filter("content", ["z"]), MUST_NOT),
        ]
    )
    assert isinstance(f, QueryFilter)
    # SHOULDs forced when MUST present (BooleanFilter AND semantics)
    assert f.query.min_should_match == 1
    # only-NOT input becomes complement
    f2 = boolean_filter([(terms_filter("content", ["z"]), MUST_NOT)])
    occurs = [c.occur for c in f2.query.clauses]
    assert occurs == [MUST_NOT, SHOULD]
    assert isinstance(f2.query.clauses[1].query, MatchAllDocsQuery)


def test_end_to_end_terms_and_boolean_filter(xml_index):
    from lucene_net_ray.query import FilteredQuery as FQ
    from lucene_net_ray.query import boolean_filter, terms_filter

    # walk docs restricted to those containing sunny or rainy
    q = FQ(query=TermQuery(term="walk"), filter=terms_filter("content", ["sunny", "rainy"]))
    ids = sorted(d for d, _ in xml_index.search(q, k=10))
    assert ids == [0, 1]
    # scores identical to the unfiltered query on surviving docs
    base = dict(xml_index.search(TermQuery(term="walk"), k=10))
    for d, s in xml_index.search(q, k=10):
        assert s == pytest.approx(base[d])
    # BooleanFilter: (sunny OR rainy) AND year-range, NOT bright
    f = boolean_filter(
        [
            (terms_filter("content", ["sunny", "rainy"]), SHOULD),
            (
                __import__("lucene_net_ray.query", fromlist=["FieldRangeFilter"]).FieldRangeFilter(
                    field="year", lower=2001, upper=2004
                ),
                MUST,
            ),
            (terms_filter("content", ["bright"]), MUST_NOT),
        ]
    )
    q2 = FQ(query=MatchAllDocsQuery(), filter=f)
    ids2 = sorted(d for d, _ in xml_index.search(q2, k=10))
    # docs 0-3 in year range; sunny/rainy = 0,1,2; not bright removes 0 -> [1,2]
    assert ids2 == [1, 2]


# -- property: arbitrary input raises XmlParseError or parses, never crashes

from hypothesis import given, strategies as st


@given(st.text(max_size=200))
def test_xml_parser_arbitrary_text_never_crashes(s):
    p = XmlQueryParser()
    try:
        p.parse(s)
    except XmlParseError:
        pass  # the only permitted failure mode


@given(st.sampled_from([
    "TermQuery", "TermsQuery", "BooleanQuery", "DisjunctionMaxQuery",
    "ConstantScoreQuery", "BoostingQuery", "UserQuery", "FilteredQuery",
    "SpanNear", "SpanOr", "SpanNot", "SpanFirst", "NumericRangeQuery",
]), st.text(alphabet="ab<> /\"=", max_size=40))
def test_xml_parser_fuzzed_elements_never_crash(tag, junk):
    p = XmlQueryParser()
    try:
        p.parse(f"<{tag}>{junk}</{tag}>")
    except XmlParseError:
        pass
