"""XML query parser — the CoreParser analog (§2.8 extension surface).

Parses the reference's XML query language into this engine's Query tree.
Element vocabulary, attribute names, defaults and nesting rules mirror
/root/reference/src/Lucene.Net.QueryParser/Xml/CoreParser.cs:62-99 and its
Builders/ directory (file:line cited per element below); the builder
registry is a plain dict so user extensions slot in the same way
QueryBuilderFactory.AddBuilder does.

Supported elements (reference builder):
  TermQuery            TermQueryBuilder.cs:26 — fieldName (inherited), raw text
  TermsQuery           TermsQueryBuilder.cs:33 — analyzed text -> SHOULD bool,
                       minimumNumberShouldMatch
  MatchAllDocsQuery    MatchAllDocsQueryBuilder.cs
  BooleanQuery         BooleanQueryBuilder.cs:25 — Clause children with
                       occurs = must | mustNot | should (default should),
                       minimumNumberShouldMatch (disableCoord accepted and
                       ignored: BM25 has no coord factor)
  DisjunctionMaxQuery  DisjunctionMaxQueryBuilder.cs:31 — tieBreaker,
                       element children are the disjuncts
  ConstantScoreQuery   ConstantScoreQueryBuilder.cs:31 — wraps the child
                       (the reference wraps a filter; queries accepted too)
  BoostingQuery        BoostingQueryBuilder.cs:34 — <Query>main</Query> +
                       <BoostQuery boost=demote>context</BoostQuery>
                       (demote default 0.01, BoostingQueryBuilder.cs:22)
  BoostingTermQuery    BoostingTermBuilder.cs:27 — PayloadTermQuery with the
                       AveragePayloadFunction
  UserQuery            UserInputQueryBuilder.cs:53 — classic-syntax text,
                       optional fieldName
  FilteredQuery        FilteredQueryBuilder.cs:35 — <Query> + <Filter>
  RangeFilter          RangeFilterBuilder.cs:25 — lowerTerm/upperTerm,
                       includeLower/includeUpper (string compare)
  NumericRangeFilter   NumericRangeFilterBuilder.cs — lowerTerm/upperTerm,
                       type = int|long|float|double
  NumericRangeQuery    NumericRangeQueryBuilder.cs:91 — the filter served as
                       a constant-score query (the reference query's own
                       CONSTANT_SCORE rewrite)
  SpanTerm / SpanNear / SpanOr / SpanOrTerms / SpanNot / SpanFirst
                       Span*Builder.cs — SpanNear: slop (required),
                       inOrder default false; SpanNot: <Include>/<Exclude>;
                       SpanFirst: end default 1

  TermsFilter          TermsFilterBuilder.cs:34 — analyzed text, any-term match
  BooleanFilter        BooleanFilterBuilder.cs:30 — Clause children of filters

Scoped out (CorePlusExtensionsParser extras, not CoreParser's core set):
CachedFilter, DuplicateFilter, LikeThisQuery, FuzzyLikeThisQuery.

fieldName inheritance (DOMUtils.GetAttributeWithInheritance walks ancestor
elements) is reproduced by threading the nearest ancestor's fieldName down
the recursive build; the parser's default_field is the root fallback.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import replace

from .functions.analysis import Analyzer
from .pipelines.spans import (
    PayloadTermQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
)
from .query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanClause,
    BooleanQuery,
    BoostingQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FieldRangeFilter,
    FilteredQuery,
    MatchAllDocsQuery,
    Query,
    QueryFilter,
    TermQuery,
    boolean_filter,
    parse_query,
    terms_filter,
)


class XmlParseError(ValueError):
    """ParserException analog (Xml/ParserException.cs)."""


_NUMERIC_TYPES = {"int": int, "long": int, "float": float, "double": float}

_OCCURS = {"must": MUST, "mustnot": MUST_NOT, "should": SHOULD, "": SHOULD}


def _attr_float(e: ET.Element, name: str, default: float) -> float:
    v = e.get(name)
    return default if v is None else float(v)


def _attr_int(e: ET.Element, name: str, default: int) -> int:
    v = e.get(name)
    return default if v is None else int(v)


def _attr_bool(e: ET.Element, name: str, default: bool) -> bool:
    v = e.get(name)
    if v is None:
        return default
    return v.strip().lower() == "true"


def _text_or_fail(e: ET.Element) -> str:
    """DOMUtils.GetNonBlankTextOrFail (Xml/DOMUtils.cs)."""
    t = (e.text or "").strip()
    if not t:
        raise XmlParseError(f"Element <{e.tag}> requires non-blank text")
    return t


def _child_elements(e: ET.Element) -> list[ET.Element]:
    return list(e)


def _first_child_or_fail(e: ET.Element) -> ET.Element:
    kids = _child_elements(e)
    if not kids:
        raise XmlParseError(f"Element <{e.tag}> requires a child element")
    return kids[0]


def _child_by_tag_or_fail(e: ET.Element, tag: str) -> ET.Element:
    for kid in e:
        if kid.tag == tag:
            return kid
    raise XmlParseError(f"Element <{e.tag}> requires a <{tag}> child")


def _boosted(q: Query, e: ET.Element) -> Query:
    b = _attr_float(e, "boost", 1.0)
    return q if b == 1.0 else replace(q, boost=q.boost * b)


class XmlQueryParser:
    """CoreParser analog: ``parse(xml) -> Query``.

    The builder registries are plain dicts keyed by element tag, mutable by
    callers exactly like QueryBuilderFactory.AddBuilder /
    SpanQueryBuilderFactory.AddBuilder (Xml/QueryBuilderFactory.cs:28).
    Builder signature: ``fn(parser, element, inherited_field) -> Query``.
    """

    def __init__(self, default_field: str = "content", analyzer: Analyzer | None = None):
        self.default_field = default_field
        self.analyzer = analyzer or Analyzer()
        self.builders = {
            "TermQuery": XmlQueryParser._term_query,
            "TermsQuery": XmlQueryParser._terms_query,
            "MatchAllDocsQuery": XmlQueryParser._match_all,
            "BooleanQuery": XmlQueryParser._boolean_query,
            "DisjunctionMaxQuery": XmlQueryParser._dismax_query,
            "ConstantScoreQuery": XmlQueryParser._constant_score,
            "BoostingQuery": XmlQueryParser._boosting_query,
            "BoostingTermQuery": XmlQueryParser._boosting_term,
            "UserQuery": XmlQueryParser._user_query,
            "FilteredQuery": XmlQueryParser._filtered_query,
            "NumericRangeQuery": XmlQueryParser._numeric_range_query,
        }
        self.span_builders = {
            "SpanTerm": XmlQueryParser._span_term,
            "SpanNear": XmlQueryParser._span_near,
            "SpanOr": XmlQueryParser._span_or,
            "SpanOrTerms": XmlQueryParser._span_or_terms,
            "SpanNot": XmlQueryParser._span_not,
            "SpanFirst": XmlQueryParser._span_first,
        }
        self.filter_builders = {
            "RangeFilter": XmlQueryParser._range_filter,
            "NumericRangeFilter": XmlQueryParser._numeric_range_filter,
            "TermsFilter": XmlQueryParser._terms_filter,
            "BooleanFilter": XmlQueryParser._boolean_filter,
        }

    # -- entry points -------------------------------------------------------

    def parse(self, xml: str) -> Query:
        try:
            root = ET.fromstring(xml)
        except ET.ParseError as exc:  # CoreParser.Parse wraps SAX errors
            raise XmlParseError(f"Error parsing XML: {exc}") from exc
        return self._build(root, self.default_field)

    # -- dispatch -----------------------------------------------------------

    def _build(self, e: ET.Element, field: str) -> Query:
        field = e.get("fieldName") or field
        fn = self.builders.get(e.tag) or self.span_builders.get(e.tag)
        if fn is None:
            raise XmlParseError(f"No builder for element <{e.tag}>")
        return fn(self, e, field)

    def _build_span(self, e: ET.Element, field: str) -> Query:
        field = e.get("fieldName") or field
        fn = self.span_builders.get(e.tag)
        if fn is None:
            raise XmlParseError(f"No span builder for element <{e.tag}>")
        return fn(self, e, field)

    def _build_filter(self, e: ET.Element, field: str) -> "FieldRangeFilter | QueryFilter":
        field = e.get("fieldName") or field
        fn = self.filter_builders.get(e.tag)
        if fn is None:
            raise XmlParseError(f"No filter builder for element <{e.tag}>")
        return fn(self, e, field)

    # -- query builders -----------------------------------------------------

    def _term_query(self, e: ET.Element, field: str) -> Query:
        # TermQueryBuilder.cs:26 — the text is a raw (pre-analyzed) term
        return _boosted(TermQuery(field=field, term=_text_or_fail(e)), e)

    def _terms_query(self, e: ET.Element, field: str) -> Query:
        # TermsQueryBuilder.cs:33 — analyze the text, one SHOULD TermQuery
        # per token (disableCoord accepted and ignored)
        toks = self.analyzer(_text_or_fail(e))
        bq = BooleanQuery(
            clauses=tuple(
                BooleanClause(TermQuery(field=field, term=t), SHOULD) for t in toks
            ),
            min_should_match=_attr_int(e, "minimumNumberShouldMatch", 0),
        )
        return _boosted(bq, e)

    def _match_all(self, e: ET.Element, field: str) -> Query:
        return _boosted(MatchAllDocsQuery(), e)

    def _boolean_query(self, e: ET.Element, field: str) -> Query:
        # BooleanQueryBuilder.cs:25 — Clause children; GetOccursValue
        clauses = []
        for kid in e:
            if kid.tag != "Clause":
                continue
            occurs = _OCCURS.get((kid.get("occurs") or "").lower())
            if occurs is None:
                raise XmlParseError(
                    f'Invalid value for "occurs" attribute of clause: {kid.get("occurs")}'
                )
            clause_field = kid.get("fieldName") or field
            clauses.append(
                BooleanClause(self._build(_first_child_or_fail(kid), clause_field), occurs)
            )
        bq = BooleanQuery(
            clauses=tuple(clauses),
            min_should_match=_attr_int(e, "minimumNumberShouldMatch", 0),
        )
        return _boosted(bq, e)

    def _dismax_query(self, e: ET.Element, field: str) -> Query:
        # DisjunctionMaxQueryBuilder.cs:31 — every element child a disjunct
        dq = DisjunctionMaxQuery(
            disjuncts=tuple(self._build(kid, field) for kid in e),
            tie_breaker=_attr_float(e, "tieBreaker", 0.0),
        )
        return _boosted(dq, e)

    def _constant_score(self, e: ET.Element, field: str) -> Query:
        # ConstantScoreQueryBuilder.cs:31 — reference wraps a filter; here a
        # filter child lowers to FilteredQuery(MatchAll) and query children
        # are accepted directly
        kid = _first_child_or_fail(e)
        if kid.tag in self.filter_builders:
            inner: Query = FilteredQuery(
                query=MatchAllDocsQuery(), filter=self._build_filter(kid, field)
            )
        else:
            inner = self._build(kid, field)
        return _boosted(ConstantScoreQuery(query=inner), e)

    def _boosting_query(self, e: ET.Element, field: str) -> Query:
        # BoostingQueryBuilder.cs:34 — demote default 0.01 (DEFAULT_BOOST)
        main_elem = _child_by_tag_or_fail(e, "Query")
        boost_elem = _child_by_tag_or_fail(e, "BoostQuery")
        demote = _attr_float(boost_elem, "boost", 0.01)
        q = BoostingQuery(
            match=self._build(_first_child_or_fail(main_elem), field),
            context=self._build(_first_child_or_fail(boost_elem), field),
            demote=demote,
        )
        return _boosted(q, e)

    def _boosting_term(self, e: ET.Element, field: str) -> Query:
        # BoostingTermBuilder.cs:27 — PayloadTermQuery + AveragePayloadFunction
        return _boosted(
            PayloadTermQuery(field=field, term=_text_or_fail(e), func="avg"), e
        )

    def _user_query(self, e: ET.Element, field: str) -> Query:
        # UserInputQueryBuilder.cs:53 — classic syntax through parse_query;
        # parser errors wrap into the XML ParserException like the
        # reference's catch (ParseException e1) { throw new ParserException }
        from .query import QueryParseError

        try:
            q = parse_query(_text_or_fail(e), default_field=field, analyzer=self.analyzer)
        except QueryParseError as exc:
            raise XmlParseError(f"Error parsing UserQuery: {exc}") from exc
        return _boosted(q, e)

    def _filtered_query(self, e: ET.Element, field: str) -> Query:
        # FilteredQueryBuilder.cs:35
        filter_elem = _child_by_tag_or_fail(e, "Filter")
        query_elem = _child_by_tag_or_fail(e, "Query")
        q = FilteredQuery(
            query=self._build(_first_child_or_fail(query_elem), field),
            filter=self._build_filter(_first_child_or_fail(filter_elem), field),
        )
        return _boosted(q, e)

    def _numeric_range_query(self, e: ET.Element, field: str) -> Query:
        # NumericRangeQueryBuilder.cs:91 — served constant-score like the
        # reference query's own rewrite
        f = self._numeric_range_filter(e, field)
        return _boosted(
            ConstantScoreQuery(query=FilteredQuery(query=MatchAllDocsQuery(), filter=f)),
            e,
        )

    # -- filter builders ----------------------------------------------------

    def _range_filter(self, e: ET.Element, field: str) -> FieldRangeFilter:
        # RangeFilterBuilder.cs:25 — string-compare bounds
        return FieldRangeFilter(
            field=field,
            lower=e.get("lowerTerm"),
            upper=e.get("upperTerm"),
            include_lower=_attr_bool(e, "includeLower", True),
            include_upper=_attr_bool(e, "includeUpper", True),
        )

    def _numeric_range_filter(self, e: ET.Element, field: str) -> FieldRangeFilter:
        # NumericRangeFilterBuilder.cs / NumericRangeQueryBuilder.cs:91 —
        # lowerTerm/upperTerm parsed per the type attribute (default int)
        ty = (e.get("type") or "int").lower()
        conv = _NUMERIC_TYPES.get(ty)
        if conv is None:
            raise XmlParseError(f"Invalid numeric type: {ty}")
        lo, hi = e.get("lowerTerm"), e.get("upperTerm")
        if lo is None or hi is None:
            raise XmlParseError(
                f"Element <{e.tag}> requires lowerTerm and upperTerm attributes"
            )
        return FieldRangeFilter(
            field=field,
            lower=conv(lo),
            upper=conv(hi),
            include_lower=_attr_bool(e, "includeLower", True),
            include_upper=_attr_bool(e, "includeUpper", True),
        )

    def _terms_filter(self, e: ET.Element, field: str) -> QueryFilter:
        # TermsFilterBuilder.cs:34 — analyzed text, docs matching ANY term
        toks = self.analyzer(_text_or_fail(e))
        return terms_filter(field, toks)

    def _boolean_filter(self, e: ET.Element, field: str) -> QueryFilter:
        # BooleanFilterBuilder.cs:30 — Clause children of filters
        clauses = []
        for kid in e:
            if kid.tag != "Clause":
                continue
            occurs = _OCCURS.get((kid.get("occurs") or "").lower())
            if occurs is None:
                raise XmlParseError(
                    f'Invalid value for "occurs" attribute of clause: {kid.get("occurs")}'
                )
            clause_field = kid.get("fieldName") or field
            clauses.append(
                (self._build_filter(_first_child_or_fail(kid), clause_field), occurs)
            )
        return boolean_filter(clauses)

    # -- span builders ------------------------------------------------------

    def _span_term(self, e: ET.Element, field: str) -> Query:
        # SpanTermBuilder.cs:25 — raw term text
        return _boosted(SpanTermQuery(field=field, term=_text_or_fail(e)), e)

    def _span_near(self, e: ET.Element, field: str) -> Query:
        # SpanNearBuilder.cs:33 — slop required, inOrder default false
        slop = e.get("slop")
        if slop is None:
            raise XmlParseError("SpanNear requires a slop attribute")
        q = SpanNearQuery(
            clauses=tuple(self._build_span(kid, field) for kid in e),
            slop=int(slop),
            in_order=_attr_bool(e, "inOrder", False),
            field=field,
        )
        return _boosted(q, e)

    def _span_or(self, e: ET.Element, field: str) -> Query:
        # SpanOrBuilder.cs:31
        q = SpanOrQuery(
            clauses=tuple(self._build_span(kid, field) for kid in e), field=field
        )
        return _boosted(q, e)

    def _span_or_terms(self, e: ET.Element, field: str) -> Query:
        # SpanOrTermsBuilder.cs:38 — analyze the text into SpanTerm disjuncts
        toks = self.analyzer(_text_or_fail(e))
        q = SpanOrQuery(
            clauses=tuple(SpanTermQuery(field=field, term=t) for t in toks),
            field=field,
        )
        return _boosted(q, e)

    def _span_not(self, e: ET.Element, field: str) -> Query:
        # SpanNotBuilder.cs:32 — <Include>/<Exclude> wrappers
        inc = _first_child_or_fail(_child_by_tag_or_fail(e, "Include"))
        exc = _first_child_or_fail(_child_by_tag_or_fail(e, "Exclude"))
        q = SpanNotQuery(
            include=self._build_span(inc, field),
            exclude=self._build_span(exc, field),
            field=field,
        )
        return _boosted(q, e)

    def _span_first(self, e: ET.Element, field: str) -> Query:
        # SpanFirstBuilder.cs:32 — end default 1
        q = SpanFirstQuery(
            match=self._build_span(_first_child_or_fail(e), field),
            end=_attr_int(e, "end", 1),
            field=field,
        )
        return _boosted(q, e)


def parse_xml_query(
    xml: str, default_field: str = "content", analyzer: Analyzer | None = None
) -> Query:
    """One-shot convenience wrapper over XmlQueryParser."""
    return XmlQueryParser(default_field=default_field, analyzer=analyzer).parse(xml)
