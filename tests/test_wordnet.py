"""WordNet contrib analog (Syns2Index + SynExpand/SynLookup).

Vectors derived from the reference's documented behavior:
contrib/WordNet/Syns2Index/Syns2Index.cs (prolog s-fact parse, synset
grouping, collocation skip) and SynExpand.cs (SHOULD expansion at boost 0.9,
query-wide dedup)."""

import pyarrow as pa
import pytest

from lucene_net_ray.query import SHOULD, BooleanQuery, TermQuery
from lucene_net_ray.stages.wordnet import (
    SynonymIndex,
    parse_prolog_line,
    syns_table_from_prolog,
)

PROLOG = """\
s(100001740,1,'entity',n,1,11).
s(100002056,1,'thing',n,12,0).
s(100002056,2,'entity',n,2,0).
s(100003009,1,'big',a,1,0).
s(100003009,2,'large',a,1,0).
s(100003009,3,'great',a,3,0).
s(100004011,1,'big',a,2,0).
s(100004011,2,'grown',a,2,0).
s(100005555,1,'hot_dog',n,1,0).
s(100005555,2,'frank',n,2,0).
s(100006666,1,'lonely',a,1,0).
not_an_s_fact(1,2,3).
s(100007777,1,'o''brien',n,1,0).
"""


def test_parse_prolog_line():
    assert parse_prolog_line("s(100001740,1,'entity',n,1,11).") == (100001740, "entity")
    assert parse_prolog_line("not_an_s_fact(1,2,3).") is None
    # collocations and non-alpha words are skipped (Syns2Index filter)
    assert parse_prolog_line("s(1,1,'hot_dog',n,1,0).") is None
    assert parse_prolog_line("s(1,1,'o''brien',n,1,0).") is None
    # case folds
    assert parse_prolog_line("s(5,1,'Entity',n,1,0).") == (5, "entity")


@pytest.fixture(scope="module")
def syn_index(tmp_path_factory):
    p = tmp_path_factory.mktemp("wn") / "wn_s.pl"
    p.write_text(PROLOG)
    tbl = syns_table_from_prolog(str(p))
    return tbl, SynonymIndex(tbl)


def test_syns_table(syn_index):
    tbl, _ = syn_index
    d = {w: list(s) for w, s in zip(tbl.column("word").to_pylist(),
                                    tbl.column("syns").to_pylist())}
    # 'big' is in two synsets -> union of both, sorted, self excluded
    assert d["big"] == ["great", "grown", "large"]
    assert d["entity"] == ["thing"]
    assert d["thing"] == ["entity"]
    assert d["large"] == ["big", "great"]
    # single-word synsets ('lonely', collocation-pruned 'frank') don't appear
    assert "lonely" not in d
    assert "frank" not in d
    assert "hot_dog" not in d


def test_lookup(syn_index):
    _, idx = syn_index
    assert idx.lookup("big") == ["great", "grown", "large"]
    assert idx.lookup("BIG") == ["great", "grown", "large"]
    assert idx.lookup("nothere") == []


def test_expand(syn_index):
    _, idx = syn_index
    q = idx.expand("big entity", field="content", boost=0.9)
    assert isinstance(q, BooleanQuery)
    got = [(c.query.term, c.query.boost, c.occur) for c in q.clauses]
    assert got == [
        ("big", 1.0, SHOULD),
        ("great", 0.9, SHOULD),
        ("grown", 0.9, SHOULD),
        ("large", 0.9, SHOULD),
        ("entity", 1.0, SHOULD),
        ("thing", 0.9, SHOULD),
    ]


def test_expand_query_wide_dedup(syn_index):
    _, idx = syn_index
    # 'big large': large is big's synonym AND a query term -> no duplicate;
    # big is large's synonym but already present -> skipped
    q = idx.expand("big large")
    terms = [c.query.term for c in q.clauses]
    assert terms == ["big", "great", "grown", "large"]
    assert len(terms) == len(set(terms))


def test_expand_end_to_end(tmp_path, syn_index):
    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher

    _, idx = syn_index
    docs = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "content": pa.array(
                ["a big dog", "a large dog", "a grown cat", "a small fish"]
            ),
        }
    )
    out = str(tmp_path / "wnidx")
    meta = build_index_from_table(docs, out, content_column="content")
    s = Searcher(meta, use_actors=False)
    hits = {d for d, _ in s.search(idx.expand("big"), k=10)}
    assert hits == {0, 1, 2}  # big + synonyms large/grown/great
    plain = {d for d, _ in s.search(TermQuery(field="content", term="big"), k=10)}
    assert plain == {0}
