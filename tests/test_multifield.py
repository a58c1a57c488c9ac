"""Multi-field documents: per-field postings/norms/stats + mixed-field queries."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_net_ray.oracle import OracleIndex
from lucene_net_ray.pipelines.multifield import (
    MultiFieldSearcher,
    build_multi_field_index,
)
from lucene_net_ray.pipelines.search import Searcher
from lucene_net_ray.query import BooleanClause, BooleanQuery, PhraseQuery, TermQuery, parse_query

TITLES = [
    "alpha release notes",
    "beta quickstart guide",
    "alpha api reference",
    "gamma troubleshooting",
    "beta release checklist",
]
BODIES = [
    "the alpha build ships tokenizer fixes and faster merge",
    "install beta then run the quickstart sample",
    "api reference for the query parser and scorer",
    "troubleshooting merge failures and slow builds",
    "checklist covers release sign off and alpha regressions",
]


@pytest.fixture(scope="module")
def mf(tmp_path_factory):
    src = tmp_path_factory.mktemp("mf_src")
    out = str(tmp_path_factory.mktemp("mf_idx"))
    pq.write_table(
        pa.table({"title": TITLES, "body": BODIES}),
        str(src / "docs.parquet"),
        row_group_size=3,
    )
    build_multi_field_index(
        str(src), out, fields=("title", "body"), target_rows_per_segment=3,
        index_options="positions",
    )
    return (
        MultiFieldSearcher(out),
        OracleIndex(TITLES),
        OracleIndex(BODIES),
        out,
    )


def test_single_field_queries_match_field_oracles(mf):
    searcher, title_oracle, body_oracle, out = mf
    q = TermQuery(field="title", term="alpha")
    hits = searcher.search(q, k=10)
    expected = title_oracle.top_k(TermQuery(term="alpha"), 10)
    assert [d for d, _ in hits] == [d for d, _ in expected]
    for (d1, s1), (d2, s2) in zip(hits, expected):
        assert np.float32(s1) == np.float32(s2)

    q = TermQuery(field="body", term="merge")
    hits = searcher.search(q, k=10)
    expected = body_oracle.top_k(TermQuery(term="merge"), 10)
    assert [d for d, _ in hits] == [d for d, _ in expected]
    for (d1, s1), (d2, s2) in zip(hits, expected):
        assert np.float32(s1) == np.float32(s2)


def test_field_stats_are_independent(mf):
    searcher, title_oracle, body_oracle, _ = mf
    # 'alpha' df: titles 2, bodies 2 but avgdl/N differ per field -> scores differ
    ht = searcher.search(TermQuery(field="title", term="alpha"), k=1)
    hb = searcher.search(TermQuery(field="body", term="alpha"), k=1)
    assert ht and hb
    assert np.float32(ht[0][1]) != np.float32(hb[0][1])


def test_mixed_field_conjunction(mf):
    searcher, title_oracle, body_oracle, _ = mf
    q = BooleanQuery(
        clauses=(
            BooleanClause(TermQuery(field="title", term="beta"), "MUST"),
            BooleanClause(TermQuery(field="body", term="quickstart"), "MUST"),
        )
    )
    hits = searcher.search(q, k=10)
    t_match = {d: title_oracle._term_score(d, "beta", 1.0) for d in range(5)}
    b_match = {d: body_oracle._term_score(d, "quickstart", 1.0) for d in range(5)}
    expected = []
    for d in range(5):
        if t_match[d] is not None and b_match[d] is not None:
            # conjunction: f32 sum in global-df cost order (df equal -> clause order)
            expected.append((d, float(np.float32(t_match[d] + b_match[d]))))
    expected.sort(key=lambda h: (-h[1], h[0]))
    assert [(d, np.float32(s)) for d, s in hits] == [(d, np.float32(s)) for d, s in expected]
    assert searcher.count(q) == len(expected)


def test_mixed_field_parser_and_dismax(mf):
    searcher, *_ = mf
    q = parse_query("title:alpha body:merge")
    hits = searcher.search(q, k=10)
    assert hits  # SHOULD across fields unions
    ids = {d for d, _ in hits}
    assert 0 in ids  # alpha title + merge body


def test_field_phrase(mf):
    searcher, _, body_oracle, _ = mf
    q = PhraseQuery(field="body", terms=("query", "parser"))
    hits = searcher.search(q, k=10)
    expected = body_oracle.top_k(PhraseQuery(terms=("query", "parser")), 10)
    assert [d for d, _ in hits] == [d for d, _ in expected] == [2]


def test_unknown_field_matches_nothing(mf):
    searcher, *_ = mf
    assert searcher.search(TermQuery(field="nosuch", term="alpha"), k=5) == []


def test_per_field_analyzers(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.table({"code": ["FooBar BAZ", "foobar baz"], "text": ["FooBar BAZ", "foobar baz"]}),
        str(src / "d.parquet"),
    )
    out = str(tmp_path / "idx")
    build_multi_field_index(
        str(src), out, fields=("code", "text"),
        analyzers={"code": "whitespace", "text": "standard"},
        target_rows_per_segment=10,
    )
    s = MultiFieldSearcher(out)
    # whitespace analyzer is case-sensitive: 'FooBar' only in doc 0
    assert {d for d, _ in s.search(TermQuery(field="code", term="FooBar"), k=5)} == {0}
    assert s.search(TermQuery(field="code", term="foobar"), k=5)[0][0] == 1
    # standard analyzer lowercases: both docs match 'foobar'
    assert {d for d, _ in s.search(TermQuery(field="text", term="foobar"), k=5)} == {0, 1}


def test_parse_multi_field_expansion(mf):
    searcher, *_ = mf
    from lucene_net_ray.query import parse_multi_field

    # each MUST clause may match in EITHER field:
    # alpha: titles {0,2} + bodies {0,4}; release: titles {0,4} + bodies {4}
    q = parse_multi_field("+alpha +release", fields=("title", "body"))
    hits = searcher.search(q, k=10)
    assert {d for d, _ in hits} == {0, 4}
    # explicit field prefixes are untouched
    q2 = parse_multi_field("title:alpha", fields=("title", "body"))
    from lucene_net_ray.query import TermQuery
    assert isinstance(q2, TermQuery) and q2.field == "title"


def test_multifield_actor_parity(tmp_path):
    """MultiFieldSearcher actor path equals the in-process path."""
    import pyarrow as pa

    from lucene_net_ray.pipelines.multifield import MultiFieldSearcher, build_multi_field_index
    from lucene_net_ray.query import parse_multi_field

    docs = pa.table(
        {
            "title": [f"title term{i % 5} alpha" for i in range(30)],
            "body": [f"body content word{i % 7} beta gamma" for i in range(30)],
        }
    )
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(docs, str(src / "d.parquet"), row_group_size=10)
    out = str(tmp_path / "mf")
    build_multi_field_index(str(src), out, fields=("title", "body"), target_rows_per_segment=10)
    local = MultiFieldSearcher(out, use_actors=False)
    actors = MultiFieldSearcher(out, num_actors=2, use_actors=True)
    for qs in ["alpha", "title:term1 body:beta", "term2 gamma"]:
        q = parse_multi_field(qs, fields=("title", "body"))
        lh = local.search(q, k=8)
        ah = actors.search(q, k=8)
        assert [(d, np.float32(s)) for d, s in lh] == [(d, np.float32(s)) for d, s in ah], qs
        assert local.count(q) == actors.count(q)
