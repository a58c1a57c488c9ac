"""ExtendableQueryParser analog (reference QueryParser/Ext/
ExtendableQueryParser.cs + Extensions.cs): `field:key:term` atoms resolve a
registered ParserExtension callable; everything else is classic behavior."""

import pytest

from lucene_net_ray.query import (
    BooleanQuery,
    ExtensionQuery,
    PrefixQuery,
    TermQuery,
    WildcardQuery,
    parse_query,
    parse_query_extendable,
)


def _echo_ext(eq: ExtensionQuery):
    # a test extension that records what it was handed (the reference's
    # ExtensionStub pattern): build a verbatim TermQuery, no analysis
    return TermQuery(field=eq.field, term=f"<{eq.term}>")


EXT = {"testExt": _echo_ext}


def test_ext_field_unquoted():
    q = parse_query_extendable("aField:testExt:foo", extensions=EXT)
    assert isinstance(q, TermQuery)
    assert q.field == "aField" and q.term == "<foo>"


def test_ext_default_field():
    # `:key:term` routes to the default field (SplitExtensionField indexOf==0)
    q = parse_query_extendable(":testExt:foo", extensions=EXT)
    assert isinstance(q, TermQuery)
    assert q.field == "content" and q.term == "<foo>"


def test_ext_escaped_term_unescaped():
    # special chars escape so the extension receives them verbatim
    q = parse_query_extendable(r"aField:testExt:foo\*bar", extensions=EXT)
    assert q.term == "<foo*bar>"


def test_unregistered_key_falls_through():
    # GetExtension returns null -> classic QueryParser behavior
    q = parse_query_extendable("aField:noSuchExt:foo", extensions=EXT)
    # classic split: field 'aField', term text 'noSuchExt:foo' analyzed
    # (standard analyzer splits on the colon -> OR of two terms)
    assert isinstance(q, BooleanQuery)
    assert all(c.query.field == "aField" for c in q.clauses)
    assert {c.query.term for c in q.clauses} == {"nosuchext", "foo"}


def test_plain_atoms_unchanged():
    q = parse_query_extendable("title:foo bar*", extensions=EXT)
    assert isinstance(q, BooleanQuery)
    kinds = {type(c.query) for c in q.clauses}
    assert kinds == {TermQuery, PrefixQuery}


def test_ext_with_boost():
    q = parse_query_extendable("aField:testExt:foo^3", extensions=EXT)
    assert q.term == "<foo>" and q.boost == 3.0


def test_ext_composes_with_boolean():
    q = parse_query_extendable(
        "+aField:testExt:foo -plain", extensions=EXT
    )
    assert isinstance(q, BooleanQuery)
    assert q.clauses[0].query.term == "<foo>"


def test_no_extensions_means_classic():
    # parse_query without a registry never routes (two-colon atoms keep
    # their classic meaning: field 'a', term text 'testExt:foo')
    q = parse_query("a:testExt:foo")
    assert isinstance(q, (TermQuery, BooleanQuery, WildcardQuery))
    if isinstance(q, TermQuery):
        assert q.term != "<foo>"
