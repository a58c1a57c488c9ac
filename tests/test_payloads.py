"""Per-position payloads: DelimitedPayloadTokenFilter analog + payload
queries (reference Analysis/Payloads/DelimitedPayloadTokenFilter.cs:28,
Search/Payloads/PayloadTermQuery.cs:36, Min/Max/AveragePayloadFunction.cs,
Search/Spans/SpanPayloadCheckQuery.cs:34)."""

import math

import numpy as np
import pyarrow as pa
import pytest

from lucene_net_ray.pipelines.build import build_index_from_table
from lucene_net_ray.pipelines.search import Searcher
from lucene_net_ray.pipelines.spans import (
    PayloadNearQuery,
    PayloadTermQuery,
    SpanPayloadCheckQuery,
    SpanTermQuery,
    span_search,
)

DOCS = [
    "the|0.5 quick|2.0 fox jumps|4.0",  # 0: mixed payload / no-payload
    "quick|1.0 quick|3.0 brown fox",    # 1: repeated term, distinct payloads
    "plain text without payloads",      # 2: payload-free doc
    "fox|8.0 alone",                    # 3: payload on fox
]


@pytest.fixture(scope="module")
def payload_idx(tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("payload_idx"))
    build_index_from_table(
        pa.table({"content": DOCS}),
        idx,
        target_rows_per_segment=2,
        index_options="positions",
        payload_delimiter="|",
    )
    return idx


@pytest.fixture(scope="module")
def searcher(payload_idx):
    return Searcher(payload_idx, use_actors=False)


def _reader_for(searcher, docid):
    for g in searcher.groups:
        for r in g.readers:
            if r.doc_base <= docid < r.doc_base + r.doc_count:
                return r, docid - r.doc_base
    raise AssertionError(docid)


def test_payload_store_per_position(searcher):
    expect = {
        0: [0.5, 2.0, None, 4.0],
        1: [1.0, 3.0, None, None],
        2: [None, None, None, None],
        3: [8.0, None],
    }
    for docid, want in expect.items():
        r, local = _reader_for(searcher, docid)
        got = r.position_payloads(local)
        assert got.size == len(want)
        for g, w in zip(got.tolist(), want):
            if w is None:
                assert math.isnan(g)
            else:
                assert g == pytest.approx(w)


def test_terms_indexed_stripped(searcher):
    df = searcher._stats_for_terms(["quick", "quick|1.0", "jumps", "0.5"])
    assert df.get("quick", 0) == 2  # docs 0 and 1
    assert df.get("jumps", 0) == 1
    assert df.get("quick|1.0", 0) == 0  # suffix stripped before indexing
    assert df.get("0.5", 0) == 0


def test_unparseable_suffix_left_intact(tmp_path):
    # "foo|bar" has a non-float tail: the ws token is left intact and the
    # standard grammar then splits it into two payload-less sub-tokens (the
    # reference's FloatEncoder would throw; documented deviation)
    idx = str(tmp_path / "weird")
    build_index_from_table(
        pa.table({"content": ["foo|bar c|1.5"]}),
        idx,
        index_options="positions",
        payload_delimiter="|",
    )
    s = Searcher(idx, use_actors=False)
    df = s._stats_for_terms(["foo", "bar", "c", "1.5"])
    assert df.get("foo", 0) == 1 and df.get("bar", 0) == 1
    assert df.get("c", 0) == 1 and df.get("1.5", 0) == 0  # float tail stripped
    r, local = _reader_for(s, 0)
    pay = r.position_payloads(local)
    assert math.isnan(pay[0]) and math.isnan(pay[1])  # foo|bar: no payload
    assert pay[2] == pytest.approx(1.5)


def _scores(hits):
    return {d: s for d, s in hits}


def test_payload_term_factor_avg_min_max(searcher):
    base = _scores(span_search(searcher, SpanTermQuery(term="quick"), k=10))
    for func, want1 in (("avg", 2.0), ("min", 1.0), ("max", 3.0)):
        hits = _scores(
            span_search(searcher, PayloadTermQuery(term="quick", func=func), k=10)
        )
        # doc 1 has payloads [1.0, 3.0] at its two matches; doc 0 has [2.0]
        assert hits[1] == pytest.approx(base[1] * want1, rel=1e-6)
        assert hits[0] == pytest.approx(base[0] * 2.0, rel=1e-6)


def test_payload_term_default_factor_when_no_payload(searcher):
    # 'fox' carries no payload in docs 0/1, payload 8.0 in doc 3
    base = _scores(span_search(searcher, SpanTermQuery(term="fox"), k=10))
    hits = _scores(span_search(searcher, PayloadTermQuery(term="fox", func="max"), k=10))
    assert hits[0] == pytest.approx(base[0], rel=1e-6)  # factor 1.0
    assert hits[1] == pytest.approx(base[1], rel=1e-6)
    assert hits[3] == pytest.approx(base[3] * 8.0, rel=1e-6)


def test_payload_only_scoring_mode(searcher):
    hits = _scores(
        span_search(
            searcher,
            PayloadTermQuery(term="quick", func="avg", include_span_score=False),
            k=10,
        )
    )
    assert hits[1] == pytest.approx(2.0)
    assert hits[0] == pytest.approx(2.0)


def test_span_payload_check(searcher):
    # only doc 1's second 'quick' (payload 3.0) survives the check
    hits = _scores(
        span_search(
            searcher,
            SpanPayloadCheckQuery(match=SpanTermQuery(term="quick"), payloads=(3.0,)),
            k=10,
        )
    )
    assert set(hits) == {1}
    none = span_search(
        searcher,
        SpanPayloadCheckQuery(match=SpanTermQuery(term="quick"), payloads=(9.9,)),
        k=10,
    )
    assert none == []


def test_payload_near(searcher):
    # doc 1: quick@1 (3.0) .. fox@3, slop 1; payloads inside span = [3.0]
    base = _scores(
        span_search(
            searcher,
            PayloadNearQuery(
                clauses=(SpanTermQuery(term="quick"), SpanTermQuery(term="fox")),
                slop=1,
                func="avg",
                include_span_score=False,
            ),
            k=10,
        )
    )
    assert base[1] == pytest.approx(3.0)


def test_payloads_survive_merge(payload_idx, tmp_path):
    from lucene_net_ray.pipelines.merge import MergedIndexReader, merge_index
    from lucene_net_ray.state.index import IndexMeta

    out = str(tmp_path / "merged")
    merge_index(IndexMeta(payload_idx), out, bucket_size=2)
    mr = MergedIndexReader(out)
    assert mr.has_payloads
    got = mr.position_payloads(1)
    assert got[:2].tolist() == pytest.approx([1.0, 3.0])
    assert math.isnan(got[2]) and math.isnan(got[3])


def test_payload_requires_positions(tmp_path):
    with pytest.raises(ValueError):
        build_index_from_table(
            pa.table({"content": ["x|1.0"]}),
            str(tmp_path / "bad"),
            index_options="freqs",
            payload_delimiter="|",
        )
