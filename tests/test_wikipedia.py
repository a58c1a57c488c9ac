"""WikipediaTokenizer analog.

Type taxonomy + output modes pinned from the reference's
Analysis/Wikipedia/WikipediaTokenizer.cs (il/el/elu/ci/c/b/i/bi/h/sh,
TOKENS_ONLY / UNTOKENIZED_ONLY / BOTH); markup recognition from public
MediaWiki syntax (the jflex impl is absent from the reference tree)."""

import pyarrow as pa

from lucene_net_ray.functions.wikipedia import (
    BOTH,
    TOKENS_ONLY,
    UNTOKENIZED_ONLY,
    WikipediaAnalyzer,
    wikipedia_tokenize,
)


def types_of(text):
    return wikipedia_tokenize(text)


def test_internal_link():
    assert types_of("[[Link Target]]") == [("Link", "il"), ("Target", "il")]
    # piped link: target AND anchor words, all 'il'
    assert types_of("[[target page|click here]]") == [
        ("target", "il"), ("page", "il"), ("click", "il"), ("here", "il"),
    ]


def test_category():
    assert types_of("[[Category:Big cats]]") == [("Big", "c"), ("cats", "c")]


def test_external_link():
    got = types_of("[http://example.com/x some anchor]")
    assert got == [
        ("http://example.com/x", "elu"), ("some", "el"), ("anchor", "el"),
    ]
    # bare URL link: just the elu token
    assert types_of("[http://foo.bar]") == [("http://foo.bar", "elu")]


def test_bold_italics_nesting_order():
    assert types_of("'''''both'''''") == [("both", "bi")]
    assert types_of("'''bold words'''") == [("bold", "b"), ("words", "b")]
    assert types_of("''ital''") == [("ital", "i")]


def test_headings():
    assert types_of("==A Heading==\ntext") == [
        ("A", "h"), ("Heading", "h"), ("text", "word"),
    ]
    assert types_of("===Sub Head===\n") == [("Sub", "sh"), ("Head", "sh")]


def test_citation():
    assert types_of("fact<ref>Smith 2001</ref>") == [
        ("fact", "word"), ("Smith", "ci"), ("2001", "ci"),
    ]


def test_plain_text_and_mixed():
    got = types_of("Click [[here]] or '''now''' please")
    assert got == [
        ("Click", "word"), ("here", "il"), ("or", "word"),
        ("now", "b"), ("please", "word"),
    ]


def test_untokenized_only_mode():
    got = wikipedia_tokenize(
        "a [[b c]] d", UNTOKENIZED_ONLY, untokenized_types={"il"}
    )
    assert got == [("a", "word"), ("b c", "il"), ("d", "word")]


def test_both_mode():
    got = wikipedia_tokenize("[[b c]]", BOTH, untokenized_types={"il"})
    assert got == [("b c", "il"), ("b", "il"), ("c", "il")]
    # types not listed stay word-split even in BOTH
    got = wikipedia_tokenize("'''x y'''", BOTH, untokenized_types={"il"})
    assert got == [("x", "b"), ("y", "b")]


def test_analyzer_wrapper_and_type_filter():
    a = WikipediaAnalyzer()
    assert a("Click [[Here Now]]") == ["click", "here", "now"]
    links_only = WikipediaAnalyzer(keep_types={"il", "c"})
    assert links_only("Click [[Here]] [[Category:Cats]] done") == ["here", "cats"]


def test_end_to_end_index(tmp_path):
    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import TermQuery

    docs = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "content": pa.array(
                [
                    "intro [[Alpha Beta]] text",
                    "plain gamma text",
                    "see [http://x.io alpha] link",
                ]
            ),
        }
    )
    out = str(tmp_path / "wikidx")
    meta = build_index_from_table(
        docs, out, content_column="content", analyzer=WikipediaAnalyzer()
    )
    s = Searcher(meta, use_actors=False)
    hits = {d for d, _ in s.search(TermQuery(field="content", term="alpha"), k=10)}
    assert hits == {0, 2}
