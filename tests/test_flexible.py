"""Flexible query parser analog (StandardQueryParser + PrecedenceQueryParser).

Vectors pinned from the reference's semantics:
  Flexible/Standard/StandardQueryParser.cs (config surface),
  Flexible/Standard/Processors/BooleanQuery2ModifierNodeProcessor.cs
    (precedence flattened unless a group intervenes; exact-type check means
    analyzer multi-token expansions keep OR under default-AND),
  Flexible/Precedence/Processors/BooleanModifiersQueryNodeProcessor.cs
    (precedence preserved),
  Tests.QueryParser/Flexible/Standard/TestStandardQP.cs and
  Tests.QueryParser/Flexible/Precedence/TestPrecedenceQueryParser.cs
    (behavioral examples).
"""

import pyarrow as pa
import pytest

from lucene_net_ray.flexible import (
    PrecedenceQueryParser,
    StandardQueryParser,
    parse_flexible,
)
from lucene_net_ray.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanClause,
    BooleanQuery,
    FieldRangeFilter,
    FilteredQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    QueryParseError,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    parse_query,
)


def T(t, f="content", boost=1.0):
    return TermQuery(field=f, term=t, boost=boost)


def B(*clauses):
    return BooleanQuery(clauses=tuple(clauses))


# ---------------------------------------------------------------------------
# Basic leaves
# ---------------------------------------------------------------------------


def test_single_term():
    assert parse_flexible("foo") == T("foo")


def test_default_or():
    assert parse_flexible("token1 token2") == B(
        BooleanClause(T("token1"), SHOULD), BooleanClause(T("token2"), SHOULD)
    )


def test_default_and():
    assert parse_flexible("token1 token2", default_operator="and") == B(
        BooleanClause(T("token1"), MUST), BooleanClause(T("token2"), MUST)
    )


def test_modifiers():
    q = parse_flexible("+apple -banana cherry")
    assert q == B(
        BooleanClause(T("apple"), MUST),
        BooleanClause(T("banana"), MUST_NOT),
        BooleanClause(T("cherry"), SHOULD),
    )


def test_not_keyword_is_modifier():
    # Flexible treats NOT like '-' (a modifier), unlike classic's rewrite.
    assert parse_flexible("apple NOT banana") == parse_flexible("apple -banana")


def test_field_prefix():
    assert parse_flexible("title:foo") == T("foo", f="title")


def test_match_all():
    assert parse_flexible("*:*") == MatchAllDocsQuery()


def test_boost_atom_and_group():
    assert parse_flexible("foo^2.5") == T("foo", boost=2.5)
    q = parse_flexible("(foo bar)^2")
    assert q.boost == 2.0 and isinstance(q, BooleanQuery)


# ---------------------------------------------------------------------------
# Analyzer integration
# ---------------------------------------------------------------------------


def test_stopword_removed():
    # 'a' is a stopword; the node is removed, single survivor unwrapped.
    assert parse_flexible("a fox") == T("fox")


def test_all_stopwords_raises():
    with pytest.raises(QueryParseError):
        parse_flexible("the a an")


def test_multi_token_expansion_stays_or_under_default_and():
    # BooleanQuery2ModifierNodeProcessor does a GetType() equality check:
    # StandardBooleanQueryNode (analyzer expansion) children do NOT get
    # MOD_REQ even under default-AND.
    q = parse_flexible("wi-fi", default_operator="and")
    assert q == B(BooleanClause(T("wi"), SHOULD), BooleanClause(T("fi"), SHOULD))


def test_phrase_analysis_and_positions():
    q = parse_flexible('"a quick fox"')
    assert q == PhraseQuery(
        field="content", terms=("quick", "fox"), positions=(1, 2), slop=0
    )


def test_phrase_slop_and_default_slop():
    q = parse_flexible('"quick fox"~3')
    assert q.slop == 3
    q = parse_flexible('"quick fox"', phrase_slop=2)
    assert q.slop == 2
    # explicit slop wins over the default
    q = parse_flexible('"quick fox"~1', phrase_slop=5)
    assert q.slop == 1


# ---------------------------------------------------------------------------
# Precedence: Standard flattens, Precedence preserves
# ---------------------------------------------------------------------------


def test_standard_flattens_and_or():
    # a AND b OR c -> ONE flat boolean: +a +b c (no nesting without a group)
    q = parse_flexible("apple AND pie OR cherry")
    assert q == B(
        BooleanClause(T("apple"), MUST),
        BooleanClause(T("pie"), MUST),
        BooleanClause(T("cherry"), SHOULD),
    )


def test_standard_group_is_flatten_boundary():
    q = parse_flexible("(apple AND pie) OR cherry")
    inner = B(BooleanClause(T("apple"), MUST), BooleanClause(T("pie"), MUST))
    assert q == B(BooleanClause(inner, SHOULD), BooleanClause(T("cherry"), SHOULD))


def test_precedence_parser_keeps_tree():
    q = PrecedenceQueryParser().parse("apple AND pie OR cherry")
    inner = B(BooleanClause(T("apple"), MUST), BooleanClause(T("pie"), MUST))
    assert q == B(BooleanClause(inner, SHOULD), BooleanClause(T("cherry"), SHOULD))


def test_precedence_equals_standard_on_flat_queries():
    for s in ("apple pie", "+apple -pie", "apple OR pie", "apple AND pie"):
        assert PrecedenceQueryParser().parse(s) == StandardQueryParser().parse(s)


def test_precedence_default_and_includes_subclasses():
    # Under default-AND the precedence processor applies MOD_REQ to any
    # non-Or boolean (subclasses included) — juxtaposition becomes MUST.
    p = PrecedenceQueryParser().set_default_operator("and")
    assert p.parse("apple pie") == B(
        BooleanClause(T("apple"), MUST), BooleanClause(T("pie"), MUST)
    )


# ---------------------------------------------------------------------------
# Expanded-term nodes
# ---------------------------------------------------------------------------


def test_prefix_vs_wildcard_classification():
    assert parse_flexible("foo*") == PrefixQuery(field="content", prefix="foo")
    assert parse_flexible("f*o") == WildcardQuery(field="content", pattern="f*o")
    assert parse_flexible("fo?") == WildcardQuery(field="content", pattern="fo?")


def test_leading_wildcard_policy():
    with pytest.raises(QueryParseError):
        parse_flexible("*foo")
    q = parse_flexible("*foo", allow_leading_wildcard=True)
    assert q == WildcardQuery(field="content", pattern="*foo")


def test_lowercase_expanded_terms():
    assert parse_flexible("FOO*") == PrefixQuery(field="content", prefix="foo")
    assert parse_flexible("FOO*", lowercase_expanded_terms=False) == PrefixQuery(
        field="content", prefix="FOO"
    )
    assert parse_flexible("BAR~1") == FuzzyQuery(
        field="content", term="bar", max_edits=1
    )


def test_fuzzy_defaults_and_cap():
    assert parse_flexible("foo~") == FuzzyQuery(field="content", term="foo", max_edits=2)
    assert parse_flexible("foo~1").max_edits == 1
    # reference caps edits at LevenshteinAutomata's 2
    assert parse_flexible("foo~7").max_edits == 2


def test_regexp():
    assert parse_flexible("/ab+c/") == RegexpQuery(field="content", pattern="ab+c")
    assert parse_flexible("name:/j.*n/") == RegexpQuery(field="name", pattern="j.*n")


def test_term_ranges():
    q = parse_flexible("title:[aaa TO zzz]")
    assert q == TermRangeQuery(
        field="title", lower="aaa", upper="zzz", include_lower=True, include_upper=True
    )
    q = parse_flexible("title:{aaa TO zzz}")
    assert q.include_lower is False and q.include_upper is False
    # open endpoints via '*'
    q = parse_flexible("title:[* TO zzz]")
    assert q.lower is None and q.upper == "zzz"


def test_numeric_config():
    p = StandardQueryParser().set_numeric_config("price", "long")
    q = p.parse("price:[10 TO 20]")
    assert q == FilteredQuery(
        query=MatchAllDocsQuery(),
        filter=FieldRangeFilter(field="price", lower=10, upper=20),
    )
    # exact term on a numeric field -> point range
    q = p.parse("price:15")
    assert q.filter == FieldRangeFilter(field="price", lower=15, upper=15)
    # exclusive + open endpoints
    q = p.parse("price:{10 TO *]")
    assert q.filter == FieldRangeFilter(
        field="price", lower=10, upper=None, include_lower=False, include_upper=True
    )
    with pytest.raises(QueryParseError):
        p.parse("price:notanumber")


def test_multi_fields_with_boosts():
    p = StandardQueryParser().set_multi_fields(["title", "body"], {"title": 2.0})
    q = p.parse("hello")
    assert q == B(
        BooleanClause(T("hello", f="title", boost=2.0), SHOULD),
        BooleanClause(T("hello", f="body"), SHOULD),
    )
    # explicit field wins over multi-field expansion
    assert p.parse("body:hello") == T("hello", f="body")


# ---------------------------------------------------------------------------
# Errors + pipeline extensibility
# ---------------------------------------------------------------------------


def test_errors():
    for bad in ("", "(foo", "foo)"):
        with pytest.raises(QueryParseError):
            parse_flexible(bad)


def test_pipeline_is_customizable():
    # the processor pipeline is a plain list: drop the lowercase processor
    from lucene_net_ray import flexible as fx

    p = StandardQueryParser()
    p.pipeline = [pr for pr in p.pipeline if pr is not fx.proc_lowercase_expanded]
    assert p.parse("FOO*") == PrefixQuery(field="content", prefix="FOO")


# ---------------------------------------------------------------------------
# End-to-end: flexible-parsed queries agree with classic-parsed ones
# ---------------------------------------------------------------------------


def test_search_equivalence_with_classic(tmp_path):
    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher

    docs = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "content": pa.array(
                [
                    "apple pie with cherry",
                    "banana split",
                    "apple turnover",
                    "cherry apple pie recipe",
                    "plain bread",
                    "pie crust apple",
                ]
            ),
        }
    )
    idx = str(tmp_path / "flexidx")
    build_index_from_table(docs, idx, content_column="content", index_options="positions")
    s = Searcher(idx, use_actors=False)
    for text in ("apple", "apple AND pie", "apple -cherry", 'pie "apple pie"', "appl*"):
        fq = parse_flexible(text)
        cq = parse_query(text)
        rf = [(d, round(sc, 9)) for d, sc in s.search(fq, k=10)]
        rc = [(d, round(sc, 9)) for d, sc in s.search(cq, k=10)]
        assert rf == rc, text
