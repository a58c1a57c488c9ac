"""FastVectorHighlighter analog: phrase-aware fragments from indexed
positions + offsets (SURVEY.md §2.7; reference
Vectorhighlight/FastVectorHighlighter.cs, mirrored on
Tests.Highlighter/VectorHighlight/FastVectorHighlighterTest.cs hit cases)."""

import pyarrow as pa
import pytest

from lucene_net_ray.pipelines.build import build_index_from_table
from lucene_net_ray.pipelines.search import Searcher
from lucene_net_ray.pipelines.vectorhighlight import fast_vector_highlight
from lucene_net_ray.query import (
    BooleanClause,
    BooleanQuery,
    PhraseQuery,
    TermQuery,
    parse_query,
)

DOCS = [
    # 0: FastVectorHighlighterTest.testSimpleHighlightTest shape
    "This is a test where foo is highlighted and should be highlighted",
    # 1: phrase vs scattered terms — "brown fox" consecutive only at one spot
    "the quick brown fox jumps over the brown dog while a fox watches",
    # 2: long doc for fragment windows
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega again alpha ends here",
    # 3: boosted-clause ordering
    "foo bar baz qux foo",
]


@pytest.fixture(scope="module")
def fvh_index(tmp_path_factory):
    tbl = pa.table(
        {"doc_id": pa.array(range(len(DOCS)), type=pa.int64()), "content": DOCS}
    )
    idx = str(tmp_path_factory.mktemp("fvhidx"))
    build_index_from_table(
        tbl,
        idx,
        target_rows_per_segment=2,
        index_options="offsets",
        stored_columns=("content",),
    )
    return Searcher(idx, use_actors=False)


def test_fvh_simple_term(fvh_index):
    frags = fast_vector_highlight(
        fvh_index, 0, TermQuery(term="foo"), frag_char_size=54, max_frags=1
    )
    assert len(frags) == 1
    assert "<b>foo</b>" in frags[0]
    assert "highlighted" in frags[0]  # window includes surrounding text


def test_fvh_phrase_only_highlights_consecutive(fvh_index):
    """THE FVH property: a phrase query highlights the consecutive
    occurrence as ONE span; scattered 'brown'/'fox' occurrences stay plain."""
    q = PhraseQuery(terms=("brown", "fox"))
    frags = fast_vector_highlight(fvh_index, 1, q, frag_char_size=1000, max_frags=1)
    assert len(frags) == 1
    f = frags[0]
    assert "<b>brown fox</b>" in f
    # the separated 'brown dog' and trailing 'fox' are NOT highlighted
    assert "<b>brown</b> dog" not in f
    assert "a <b>fox</b>" not in f
    assert f.count("<b>") == 1


def test_fvh_term_query_highlights_every_occurrence(fvh_index):
    q = BooleanQuery(
        clauses=(
            BooleanClause(TermQuery(term="brown"), "SHOULD"),
            BooleanClause(TermQuery(term="fox"), "SHOULD"),
        )
    )
    frags = fast_vector_highlight(fvh_index, 1, q, frag_char_size=1000, max_frags=1)
    assert frags[0].count("<b>brown</b>") == 2
    assert frags[0].count("<b>fox</b>") == 2


def test_fvh_fragment_windows_and_score_order(fvh_index):
    """Two distant matches -> two fragments; score_order puts the
    higher-boost fragment first before document-order emission trims."""
    q = BooleanQuery(
        clauses=(
            BooleanClause(TermQuery(term="alpha"), "SHOULD"),
            BooleanClause(TermQuery(term="omega"), "SHOULD"),
        )
    )
    frags = fast_vector_highlight(fvh_index, 2, q, frag_char_size=40, max_frags=2)
    assert len(frags) == 2
    joined = " | ".join(frags)
    assert "<b>alpha</b>" in joined and "<b>omega</b>" in joined
    # fragments are bounded windows, not the whole doc
    assert all(len(f) <= 40 + len("<b></b>") * 3 + 10 for f in frags)


def test_fvh_boost_orders_fragments(fvh_index):
    """The doc-start fragment has two boosted foo hits; with max_frags=1 and
    score_order, it wins over the bar/baz middle."""
    q = BooleanQuery(
        clauses=(
            BooleanClause(TermQuery(term="foo", boost=10.0), "SHOULD"),
            BooleanClause(TermQuery(term="baz"), "SHOULD"),
        )
    )
    frags = fast_vector_highlight(fvh_index, 3, q, frag_char_size=12, max_frags=1)
    assert len(frags) == 1
    assert "<b>foo</b>" in frags[0]


def test_fvh_must_not_never_highlights(fvh_index):
    q = parse_query("+foo -bar")
    frags = fast_vector_highlight(fvh_index, 3, q, frag_char_size=1000)
    assert "<b>bar</b>" not in frags[0]
    assert "<b>foo</b>" in frags[0]


def test_fvh_no_match_returns_empty(fvh_index):
    assert fast_vector_highlight(fvh_index, 0, TermQuery(term="zyzzyva")) == []
    assert fast_vector_highlight(fvh_index, 1, PhraseQuery(terms=("fox", "brown"))) == []


def test_fvh_overlapping_phrase_and_term_spans_merge(fvh_index):
    """A term shared by a phrase and a term query merges into one span (no
    nested tags)."""
    q = BooleanQuery(
        clauses=(
            BooleanClause(PhraseQuery(terms=("brown", "fox")), "SHOULD"),
            BooleanClause(TermQuery(term="brown"), "SHOULD"),
        )
    )
    frags = fast_vector_highlight(fvh_index, 1, q, frag_char_size=1000, max_frags=1)
    f = frags[0]
    assert "<b><b>" not in f and "</b></b>" not in f
    assert "<b>brown fox</b>" in f


def test_fvh_multi_color_tags_cycle(fvh_index):
    """Per-span tag arrays cycle in document order (the reference's
    multi-colored preTags/postTags)."""
    q = BooleanQuery(
        clauses=(
            BooleanClause(TermQuery(term="brown"), "SHOULD"),
            BooleanClause(TermQuery(term="fox"), "SHOULD"),
        )
    )
    frags = fast_vector_highlight(
        fvh_index, 1, q, frag_char_size=1000, max_frags=1,
        pre=["<b1>", "<b2>"], post=["</b1>", "</b2>"],
    )
    f = frags[0]
    # spans in doc order: brown, fox, brown, fox -> tags alternate
    assert "<b1>brown</b1> <b2>fox</b2>" in f
    assert f.count("<b1>") == 2 and f.count("<b2>") == 2
