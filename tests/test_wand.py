"""Block-max WAND must be strictly result-preserving vs exhaustive evaluation
across block boundaries, ties, small/large k, and searchAfter."""

import numpy as np
import pytest

from lucene_net_ray.pipelines.build import build_index_from_table
from lucene_net_ray.pipelines.scorer import SegmentScorer
from lucene_net_ray.pipelines.search import Searcher
from lucene_net_ray.query import BooleanClause, BooleanQuery, TermQuery, parse_query
from lucene_net_ray.sources.corpus import generate_corpus
from lucene_net_ray.state.index import IndexMeta
from lucene_net_ray.state.segment import SegmentReader


@pytest.fixture(scope="module")
def big_index(tmp_path_factory):
    # ~1500 docs in one segment -> head terms span many 128-doc blocks
    corpus = generate_corpus(1500, seed=33)
    idx = str(tmp_path_factory.mktemp("wand_idx"))
    build_index_from_table(corpus, idx, target_rows_per_segment=5000)
    meta = IndexMeta(idx)
    reader = SegmentReader(meta.segment_dirs[0])
    return meta, reader


def _stats_for(searcher, q):
    rq, stats = searcher._rewrite_and_stats(q)
    return rq, stats


@pytest.mark.parametrize(
    "qs,k",
    [
        ("public", 10),
        ("public", 1),
        ("public", 3000),  # k > hits
        ("zyzzyva", 10),
        ("public import class void return", 10),
        ("query token score", 7),
        ("notinthecorpus", 5),
        ("rare1 rare2 public", 10),
    ],
)
def test_wand_equals_exhaustive(big_index, qs, k):
    meta, reader = big_index
    s = Searcher(meta, use_actors=False)
    q, stats = _stats_for(s, parse_query(qs))
    scorer = SegmentScorer(reader, stats)
    exhaustive = scorer.top_k(q, k, mode="exhaustive")
    wand = scorer.top_k(q, k, mode="auto")
    assert wand == exhaustive


def test_wand_with_search_after(big_index):
    meta, reader = big_index
    s = Searcher(meta, use_actors=False)
    q, stats = _stats_for(s, parse_query("public"))
    scorer = SegmentScorer(reader, stats)
    full = scorer.top_k(q, 20, mode="exhaustive")
    after = full[9]
    w = scorer.top_k(q, 10, search_after=(after[1], after[0]), mode="wand")
    e = scorer.top_k(q, 10, search_after=(after[1], after[0]), mode="exhaustive")
    assert w == e == full[10:20]


def test_wand_actually_skips_blocks(tmp_path):
    """A high-tf doc in block 0 sets the threshold; later uniform blocks prune."""
    import pyarrow as pa

    # doc 0: tf=40 of 'needle'; docs 1..999: tf=1, same length -> low block maxes
    docs = ["needle " * 40] + [("needle " + "filler " * 39) for _ in range(999)]
    idx = str(tmp_path / "idx")
    build_index_from_table(pa.table({"content": docs}), idx, target_rows_per_segment=5000)
    meta = IndexMeta(idx)
    reader = SegmentReader(meta.segment_dirs[0])
    s = Searcher(meta, use_actors=False)
    q, stats = _stats_for(s, parse_query("needle"))
    scorer = SegmentScorer(reader, stats)

    decoded = {"n": 0}
    orig = reader.postings_block_range

    def counting(ti, lo, hi, blocks):
        decoded["n"] += 1
        return orig(ti, lo, hi, blocks)

    reader.postings_block_range = counting
    try:
        hits = scorer.top_k(q, 1, mode="wand")
    finally:
        reader.postings_block_range = orig
    total_blocks = reader.blocks(reader.term_index("needle"))["last_doc"].size
    assert total_blocks >= 8
    assert decoded["n"] < total_blocks  # pruning really skipped decodes
    assert hits == scorer.top_k(q, 1, mode="exhaustive")


def test_wand_mode_rejects_ineligible(big_index):
    meta, reader = big_index
    s = Searcher(meta, use_actors=False)
    q, stats = _stats_for(s, parse_query("+public +query"))
    scorer = SegmentScorer(reader, stats)
    with pytest.raises(ValueError):
        scorer.top_k(q, 5, mode="wand")


def test_wand_eligibility():
    from lucene_net_ray.pipelines.wand import is_wand_eligible

    assert is_wand_eligible(TermQuery(term="x")) == [("x", 1.0)]
    bq = BooleanQuery(clauses=(BooleanClause(TermQuery(term="a"), "SHOULD"),
                               BooleanClause(TermQuery(term="b"), "SHOULD")))
    assert is_wand_eligible(bq) == [("a", 1.0), ("b", 1.0)]
    assert is_wand_eligible(parse_query("+alpha +beta")) is None
    assert is_wand_eligible(parse_query("+alpha -beta")) is None
