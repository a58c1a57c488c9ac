"""Span queries: hand-derived span vectors + end-to-end search."""

import pyarrow as pa
import pytest

from lucene_net_ray.pipelines.build import build_index_from_table
from lucene_net_ray.pipelines.search import Searcher
from lucene_net_ray.pipelines.spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
    enumerate_spans,
    span_search,
)

DOCS = [
    "alpha beta gamma delta",      # 0: alpha..gamma ordered gap 1
    "gamma beta alpha",            # 1: reversed order
    "alpha gamma",                 # 2: adjacent ordered
    "alpha x y z gamma",           # 3: gap 3
    "beta delta epsilon",          # 4: neither
    "alpha beta alpha gamma",      # 5: multiple alphas
]


@pytest.fixture(scope="module")
def span_setup(tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("span_idx"))
    build_index_from_table(
        pa.table({"content": DOCS}), idx, target_rows_per_segment=3, index_options="positions"
    )
    return Searcher(idx, use_actors=False)


def _pos_maps(searcher, terms):
    from lucene_net_ray.pipelines.spans import _positions_by_doc

    out = {}
    for t in terms:
        m = {}
        for g in searcher.groups:
            for r in g.readers:
                for d, pl in _positions_by_doc(r, t).items():
                    m[d + r.doc_base] = pl
        out[t] = m
    return out


def test_span_term_spans(span_setup):
    pm = _pos_maps(span_setup, ["alpha"])
    q = SpanTermQuery(term="alpha")
    assert enumerate_spans(q, pm, 0) == [(0, 1)]
    assert enumerate_spans(q, pm, 5) == [(0, 1), (2, 3)]


def test_span_near_ordered(span_setup):
    pm = _pos_maps(span_setup, ["alpha", "gamma"])
    q = SpanNearQuery(clauses=(SpanTermQuery(term="alpha"), SpanTermQuery(term="gamma")),
                      slop=1, in_order=True)
    assert enumerate_spans(q, pm, 0) == [(0, 3)]   # gap 1 ok
    assert enumerate_spans(q, pm, 1) == []          # wrong order
    assert enumerate_spans(q, pm, 2) == [(0, 2)]   # adjacent
    assert enumerate_spans(q, pm, 3) == []          # gap 3 > slop 1
    q3 = SpanNearQuery(clauses=(SpanTermQuery(term="alpha"), SpanTermQuery(term="gamma")),
                       slop=3, in_order=True)
    assert enumerate_spans(q3, pm, 3) == [(0, 5)]
    # doc 5: latest-predecessor shrink picks alpha@2 for gamma@3
    assert enumerate_spans(q, pm, 5) == [(2, 4)]


def test_span_near_unordered(span_setup):
    pm = _pos_maps(span_setup, ["alpha", "gamma"])
    q = SpanNearQuery(clauses=(SpanTermQuery(term="alpha"), SpanTermQuery(term="gamma")),
                      slop=1, in_order=False)
    assert enumerate_spans(q, pm, 1) == [(0, 3)]   # reversed order ok unordered
    assert enumerate_spans(q, pm, 3) == []


def test_span_or_not_first(span_setup):
    pm = _pos_maps(span_setup, ["alpha", "beta", "gamma"])
    q_or = SpanOrQuery(clauses=(SpanTermQuery(term="alpha"), SpanTermQuery(term="beta")))
    assert enumerate_spans(q_or, pm, 0) == [(0, 1), (1, 2)]
    q_first = SpanFirstQuery(match=SpanTermQuery(term="beta"), end=2)
    assert enumerate_spans(q_first, pm, 0) == [(1, 2)]   # beta@1 -> end 2 <= 2
    assert enumerate_spans(q_first, pm, 4) == [(0, 1)]
    near = SpanNearQuery(clauses=(SpanTermQuery(term="alpha"), SpanTermQuery(term="gamma")),
                         slop=3, in_order=True)
    q_not = SpanNotQuery(include=near, exclude=SpanTermQuery(term="beta"))
    # doc 0 span (0,3) overlaps beta@1 -> excluded; doc 2 span survives
    assert enumerate_spans(q_not, pm, 0) == []
    assert enumerate_spans(q_not, pm, 2) == [(0, 2)]


def test_span_search_end_to_end(span_setup):
    q = SpanNearQuery(clauses=(SpanTermQuery(term="alpha"), SpanTermQuery(term="gamma")),
                      slop=1, in_order=True)
    hits = span_search(span_setup, q, k=10)
    ids = [d for d, _ in hits]
    assert set(ids) == {0, 2, 5}
    assert all(s > 0 for _, s in hits)
    # narrower spans (bigger slop factor) score higher at same norm class:
    # doc 2 span width 2 (freq 1/3) vs doc 0 width 3 (freq 1/4); doc 2 is
    # also shorter -> must outrank doc 0
    assert ids[0] == 2


def test_span_search_through_actors(tmp_path):
    import pyarrow as pa

    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.pipelines.spans import SpanNearQuery, SpanTermQuery, span_search

    docs = ["quick brown fox jumps", "fox quick brown", "brown quick then fox later"]
    idx = str(tmp_path / "idx")
    build_index_from_table(pa.table({"content": docs}), idx,
                           index_options="positions", target_rows_per_segment=2)
    q = SpanNearQuery(
        clauses=(SpanTermQuery(term="quick"), SpanTermQuery(term="fox")),
        slop=2, in_order=True,
    )
    local = span_search(Searcher(idx, use_actors=False), q, k=5)
    actors = span_search(Searcher(idx, num_actors=2, use_actors=True), q, k=5)
    assert local == actors
    assert local  # matches exist


def test_complex_phrase_parser_and_search(tmp_path):
    """ComplexPhraseQueryParser subset: wildcard/fuzzy/prefix inside a quoted
    phrase lowers to span queries and matches through span_search
    (ComplexPhraseQueryParser.cs:49 semantics)."""
    import pyarrow as pa

    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.pipelines.spans import (
        SpanMultiTermQuery,
        SpanNearQuery,
        SpanTermQuery,
        rewrite_span_multiterm,
        span_search,
    )
    from lucene_net_ray.query import parse_complex_phrase

    docs = [
        "the quick brown fox",      # 0: quick brown
        "the quickest brown dog",   # 1: quick* brown
        "brown quick reversal",     # 2: wrong order
        "a quack brown duck",       # 3: quick~1 -> quack
        "quickly he ran away",      # 4: no brown
    ]
    idx = str(tmp_path / "idx")
    build_index_from_table(pa.table({"content": docs}), idx,
                           index_options="positions", target_rows_per_segment=2)
    s = Searcher(idx, use_actors=False)

    q = parse_complex_phrase('"quick* brown"')
    assert isinstance(q, SpanNearQuery) and q.in_order and q.slop == 0
    assert isinstance(q.clauses[0], SpanMultiTermQuery)
    hits = {d for d, _ in span_search(s, q, k=10)}
    assert hits == {0, 1}  # quick/quickest/quickly expand; only 0,1 precede brown

    qf = parse_complex_phrase('"quick~1 brown"')
    hf = {d for d, _ in span_search(s, qf, k=10)}
    assert 3 in hf and 0 in hf and 2 not in hf  # quack via fuzzy, order respected

    # slop allows reordering (in_order=False when slop > 0)
    qs = parse_complex_phrase('"brown quick*"~2')
    assert not qs.in_order
    hs = {d for d, _ in span_search(s, qs, k=10)}
    assert {0, 1, 2} <= hs

    # rewrite is searcher-level: the span tree becomes plain SpanOr/SpanTerm
    rq = rewrite_span_multiterm(s, q)
    assert all(not isinstance(c, SpanMultiTermQuery) for c in rq.clauses)

    # plain terms still work through the same parser
    qp = parse_complex_phrase('"quick brown"')
    assert all(isinstance(c, SpanTermQuery) for c in qp.clauses)
    assert {d for d, _ in span_search(s, qp, k=10)} == {0}


def test_surround_parser(tmp_path):
    """Surround subset (QueryParsers/Surround): W/N distance operators, OR,
    NOT, parens, wildcards — lowered to spans and searched."""
    import pyarrow as pa
    import pytest as _pytest

    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.pipelines.spans import (
        SpanNearQuery,
        SpanNotQuery,
        SpanOrQuery,
        span_search,
    )
    from lucene_net_ray.query import parse_surround

    docs = [
        "alpha beta gamma",        # 0
        "alpha gamma beta",        # 1
        "beta alpha gamma",        # 2
        "alpha one two beta end",  # 3
        "delta epsilon",           # 4
    ]
    idx = str(tmp_path / "idx")
    build_index_from_table(pa.table({"content": docs}), idx,
                           index_options="positions", target_rows_per_segment=3)
    s = Searcher(idx, use_actors=False)

    q = parse_surround("alpha W beta")
    assert isinstance(q, SpanNearQuery) and q.slop == 0 and q.in_order
    assert {d for d, _ in span_search(s, q, k=10)} == {0}

    q = parse_surround("alpha N beta")  # unordered adjacent
    assert {d for d, _ in span_search(s, q, k=10)} == {0, 2}

    q = parse_surround("alpha 3W beta")  # ordered, up to 2 intervening
    assert {d for d, _ in span_search(s, q, k=10)} == {0, 1, 3}

    q = parse_surround("alpha W beta W gamma")  # n-ary chain
    assert len(q.clauses) == 3
    assert {d for d, _ in span_search(s, q, k=10)} == {0}

    q = parse_surround("(alpha W beta) OR delta")
    assert isinstance(q, SpanOrQuery)
    assert {d for d, _ in span_search(s, q, k=10)} == {0, 4}

    q = parse_surround("alpha NOT (alpha W beta)")
    assert isinstance(q, SpanNotQuery)
    assert {d for d, _ in span_search(s, q, k=10)} == {1, 2, 3}

    q = parse_surround("alp* W beta")  # wildcard atom via SpanMultiTerm
    assert {d for d, _ in span_search(s, q, k=10)} == {0}

    with _pytest.raises(ValueError):
        parse_surround("alpha AND beta")
    with _pytest.raises(ValueError):
        parse_surround("(alpha W beta")


def test_span_position_range(span_setup):
    """SpanPositionRangeQuery: spans constrained to [start, end) positions
    (SpanFirstQuery generalization, SpanPositionRangeQuery.cs)."""
    from lucene_net_ray.pipelines.spans import (
        SpanPositionRangeQuery,
        SpanTermQuery,
        enumerate_spans,
        span_search,
    )

    s = span_setup
    q0 = SpanTermQuery(term="fox")
    full = span_search(s, q0, k=20)
    # start=0 degenerates to SpanFirst semantics
    q = SpanPositionRangeQuery(match=q0, start=0, end=10_000)
    assert span_search(s, q, k=20) == full
    # a window that excludes position 0 drops docs whose only 'fox' is first
    q2 = SpanPositionRangeQuery(match=q0, start=1, end=10_000)
    sub = {d for d, _ in span_search(s, q2, k=20)}
    assert sub <= {d for d, _ in full}


def test_near_ordered_reference_overlap_example():
    """The NearSpansOrdered class-doc example (NearSpansOrdered.cs:43-50):
    't1 t2 t1 t3 t2 t3' with slop 1 matches twice — (0,4) 't1 t2 .. t3'
    and (2,6) 't1 .. t2 t3'."""
    from lucene_net_ray.pipelines.spans import _near_ordered

    sub = [
        [(0, 1), (2, 3)],  # t1
        [(1, 2), (4, 5)],  # t2
        [(3, 4), (5, 6)],  # t3
    ]
    assert _near_ordered(sub, 1) == [(0, 4), (2, 6)]
    # slop 0 only admits the strictly consecutive variant: none here
    assert _near_ordered(sub, 0) == []


def test_near_ordered_iterator_exhaustion_counts_once():
    """'t1 t3 t3': the t1 iterator exhausts after the first match, so the
    automaton emits ONE span — a per-last-span enumeration would claim two
    (freq parity with SpanScorer counting Next() matches)."""
    from lucene_net_ray.pipelines.spans import _near_ordered

    sub = [[(0, 1)], [(1, 2), (2, 3)]]
    assert _near_ordered(sub, 5) == [(0, 2)]


def test_near_ordered_overlapping_subspans_allowed():
    """DocSpansOrdered permits overlap (start1 < start2 suffices); only
    non-overlapping gap adds slop — so nested spans (1,4) then (2,5)
    match at slop 0."""
    from lucene_net_ray.pipelines.spans import _near_ordered

    sub = [[(1, 4)], [(2, 5)]]
    assert _near_ordered(sub, 0) == [(1, 5)]
    # equal starts: ordered only if end1 < end2
    assert _near_ordered([[(2, 5)], [(2, 3)]], 9) == []
    assert _near_ordered([[(2, 3)], [(2, 5)]], 9) == [(2, 5)]


def test_near_ordered_shrink_picks_latest_chain():
    """Shrink advances earlier clauses as far as possible: for
    't1 .. t1 t2' the match is the SHORT chain (2,4), not (0,4)."""
    from lucene_net_ray.pipelines.spans import _near_ordered

    sub = [[(0, 1), (2, 3)], [(3, 4)]]
    assert _near_ordered(sub, 0) == [(2, 4)]


def test_near_unordered_basic_and_multiset():
    """Unordered near over two term streams; matches every window where
    gap <= slop, emission multiset preserved."""
    from lucene_net_ray.pipelines.spans import _near_unordered

    sub = [[(0, 1), (5, 6)], [(2, 3)]]
    # windows: (0..3) gap 1; then t1 advances: (2..6) gap 2
    assert _near_unordered(sub, 1) == [(0, 3)]
    assert _near_unordered(sub, 2) == [(0, 3), (2, 6)]


def test_near_unordered_max_cell_pointer_quirk():
    """Quirk-parity with SpansCell.Adjust (NearSpansUnordered.cs:115-121):
    when the Max cell advances to a SHORTER span, Max.End() shrinks with
    it even though another live cell has a larger end — the emitted span
    is (5, 11), not (5, 15)."""
    from lucene_net_ray.pipelines.spans import _near_unordered

    sub = [[(5, 15)], [(4, 20), (10, 11)]]
    assert _near_unordered(sub, 100) == [(4, 20), (5, 11)]


def test_span_or_emits_duplicates():
    """SpanOrQuery merges clause streams through a priority queue and
    emits duplicate spans when two clauses yield the same span — freq
    counts both (multiset parity)."""
    from lucene_net_ray.pipelines.spans import (
        SpanOrQuery,
        SpanTermQuery,
        enumerate_spans,
    )

    pos = {"fox": {0: [3]}, "vulpes": {0: [3]}}
    q = SpanOrQuery(clauses=(SpanTermQuery(term="fox"), SpanTermQuery(term="vulpes")))
    assert enumerate_spans(q, pos, 0) == [(3, 4), (3, 4)]


def test_span_regex_query(tmp_path):
    """contrib/Regex SpanRegexQuery analog: a RegexpQuery wrapped in
    SpanMultiTermQuery participates in span trees (contrib
    Regex/SpanRegexQuery.cs — rewrite to SpanOr of matched terms, same as
    SpanMultiTermQueryWrapper)."""
    import pyarrow as pa

    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.pipelines.spans import (
        SpanMultiTermQuery,
        SpanNearQuery,
        SpanTermQuery,
        span_search,
    )
    from lucene_net_ray.query import RegexpQuery

    docs = [
        "alpha beta gamma",
        "alpine beta delta",
        "beta alpha gamma",
        "omega beta gamma",
    ]
    idx = str(tmp_path / "idx")
    build_index_from_table(pa.table({"content": docs}), idx,
                           index_options="positions", target_rows_per_segment=2)
    s = Searcher(idx, use_actors=False)
    q = SpanNearQuery(
        clauses=(
            SpanMultiTermQuery(query=RegexpQuery(field="content", pattern="alp.*")),
            SpanTermQuery(term="beta"),
        ),
        slop=0,
        in_order=True,
    )
    hits = {d for d, _ in span_search(s, q, k=10)}
    assert hits == {0, 1}  # alpha/alpine before beta; doc 2 wrong order
