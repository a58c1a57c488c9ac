"""End-to-end build + BM25 search vs the brute-force oracle (FIXTURES.md §4-5,
mirroring TestTermScorer/TestBooleanQuery/TestDemo semantics)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from lucene_net_ray.oracle import OracleIndex
from lucene_net_ray.pipelines.build import build_index_from_table
from lucene_net_ray.pipelines.search import Searcher
from lucene_net_ray.query import (
    BooleanClause,
    BooleanQuery,
    TermQuery,
    parse_query,
)
from lucene_net_ray.sources.corpus import generate_corpus, reference_query_set

MINI_DOCS = ["all", "dogs dogs", "like", "playing", "fetch", "all"]


@pytest.fixture(scope="module")
def mini_index(tmp_path_factory):
    td = str(tmp_path_factory.mktemp("mini_idx"))
    tbl = pa.table({"content": MINI_DOCS})
    meta = build_index_from_table(tbl, td, target_rows_per_segment=100)
    return Searcher(meta, use_actors=False), OracleIndex(MINI_DOCS)


@pytest.fixture(scope="module")
def corpus_indexes(tmp_path_factory):
    """Same corpus as 1 segment and as 7 segments — results must be identical."""
    corpus = generate_corpus(400, seed=11)
    contents = corpus.column("content").to_pylist()
    oracle = OracleIndex(contents)
    t1 = str(tmp_path_factory.mktemp("idx1"))
    tn = str(tmp_path_factory.mktemp("idxN"))
    build_index_from_table(corpus, t1, target_rows_per_segment=1000)
    build_index_from_table(corpus, tn, target_rows_per_segment=60)
    return Searcher(t1, use_actors=False), Searcher(tn, use_actors=False), oracle


def _assert_same_hits(engine_hits, oracle_hits):
    assert [d for d, _ in engine_hits] == [d for d, _ in oracle_hits]
    for (d1, s1), (d2, s2) in zip(engine_hits, oracle_hits):
        assert np.float32(s1) == np.float32(s2), (d1, s1, d2, s2)


def test_mini_term_query_exact_scores(mini_index):
    searcher, oracle = mini_index
    q = TermQuery(term="dogs")
    hits = searcher.search(q, k=10)
    _assert_same_hits(hits, oracle.top_k(q, 10))
    assert hits[0][0] == 1  # the 'dogs dogs' doc


def test_mini_tie_break_by_docid(mini_index):
    searcher, oracle = mini_index
    q = TermQuery(term="all")  # docs 0 and 5, same length/tf -> equal scores
    hits = searcher.search(q, k=10)
    assert [d for d, _ in hits] == [0, 5]
    assert hits[0][1] == hits[1][1]
    # k=1 keeps the smaller docID
    assert [d for d, _ in searcher.search(q, k=1)] == [0]


@pytest.mark.parametrize("name,qs", reference_query_set())
def test_reference_query_set_vs_oracle(corpus_indexes, name, qs):
    s1, sn, oracle = corpus_indexes
    q = parse_query(qs)
    if name == "fuzzy":
        # oracle can't expand fuzzy itself; use the engine's searcher-level
        # rewrite (deterministic) and score the rewritten tree in the oracle
        rq, _ = s1._rewrite_and_stats(q)
        oracle_hits = oracle.top_k(rq, 10)
    else:
        oracle_hits = oracle.top_k(q, 10)
    h1 = s1.search(q, k=10)
    hn = sn.search(q, k=10)
    _assert_same_hits(h1, oracle_hits)
    _assert_same_hits(hn, oracle_hits)


def test_partitioning_invariance_full_scores(corpus_indexes):
    s1, sn, oracle = corpus_indexes
    for qs in ["public", "+public +query", "query token score"]:
        q = parse_query(qs)
        assert s1.scored_docs(q) == sn.scored_docs(q)


def test_min_should_match(corpus_indexes):
    s1, sn, oracle = corpus_indexes
    q = BooleanQuery(
        clauses=tuple(
            BooleanClause(TermQuery(term=t), "SHOULD")
            for t in ["public", "query", "token", "score"]
        ),
        min_should_match=2,
    )
    _assert_same_hits(s1.search(q, k=10), oracle.top_k(q, 10))
    _assert_same_hits(sn.search(q, k=10), oracle.top_k(q, 10))
    assert s1.count(q) == oracle.count(q)


def test_counts(corpus_indexes):
    s1, sn, oracle = corpus_indexes
    for qs in ["public", "zyzzyva", "+public -query", "notinthecorpusatall"]:
        q = parse_query(qs)
        assert s1.count(q) == oracle.count(q) == sn.count(q)


def test_search_after_pagination(corpus_indexes):
    s1, _, oracle = corpus_indexes
    q = parse_query("public")
    full = oracle.top_k(q, 20)
    page1 = s1.search(q, k=10)
    _assert_same_hits(page1, full[:10])
    last = page1[-1]
    page2 = s1.search(q, k=10, search_after=(last[1], last[0]))
    _assert_same_hits(page2, full[10:20])


def test_actor_pool_search_matches_local(corpus_indexes, tmp_path):
    _, sn, oracle = corpus_indexes
    actor_searcher = Searcher(sn.index, num_actors=2, use_actors=True)
    q = parse_query("query token score")
    _assert_same_hits(actor_searcher.search(q, k=10), oracle.top_k(q, 10))


def test_batch_search(corpus_indexes):
    s1, _, oracle = corpus_indexes
    queries = [(n, parse_query(qs)) for n, qs in reference_query_set() if n != "fuzzy"]
    results = s1.batch_search(queries, k=5)
    for name, q in queries:
        _assert_same_hits(results[name], oracle.top_k(q, 5))


def test_resume_skips_committed_segments(tmp_path):
    corpus = generate_corpus(120, seed=3)
    idx = str(tmp_path / "idx")
    m1 = build_index_from_table(corpus, idx, target_rows_per_segment=40)
    mtimes = {
        d: os.path.getmtime(os.path.join(d, "meta.json")) for d in m1.segment_dirs
    }
    from lucene_net_ray.pipelines.build import build_index

    m2 = build_index(os.path.join(idx, "_corpus"), idx, target_rows_per_segment=40)
    for d in m2.segment_dirs:
        assert os.path.getmtime(os.path.join(d, "meta.json")) == mtimes[d]
    assert m2.max_doc == m1.max_doc


def test_sha256_lineage(tmp_path):
    import hashlib
    import json

    import pyarrow.parquet as pq

    corpus = generate_corpus(30, seed=5)
    idx = str(tmp_path / "idx")
    meta = build_index_from_table(corpus, idx, target_rows_per_segment=1000)
    seg = meta.segment_dirs[0]
    docs = pq.read_table(os.path.join(seg, "docs.parquet"))
    shas = docs.column("sha256").to_pylist()
    for content, sha in zip(corpus.column("content").to_pylist(), shas):
        assert hashlib.sha256(content.encode()).hexdigest() == sha
    with open(os.path.join(seg, "meta.json")) as f:
        m = json.load(f)
    assert m["lineage"]["num_rows"] == 30
