"""DuplicateFilter + CachedFilter (contrib/Queries/DuplicateFilter.cs,
Search/CachingWrapperFilter.cs analogs)."""

import pyarrow as pa
import pytest

from lucene_net_ray.pipelines.build import build_index_from_table
from lucene_net_ray.pipelines.search import Searcher
from lucene_net_ray.query import (
    CachedFilter,
    DuplicateFilter,
    FieldRangeFilter,
    FilteredQuery,
    MatchAllDocsQuery,
    TermQuery,
    terms_filter,
)

DOCS = [
    "alpha common text",      # 0 url=u1
    "beta common text",       # 1 url=u2
    "gamma common text",      # 2 url=u1 (dup of 0)
    "delta common text",      # 3 url=u3
    "epsilon common text",    # 4 url=u2 (dup of 1)
    "zeta common text",       # 5 url=u1 (dup of 0)
]
URLS = ["u1", "u2", "u1", "u3", "u2", "u1"]


@pytest.fixture(scope="module")
def dup_idx(tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("dup_idx"))
    # single segment so first/last-per-reader is deterministic for the test
    build_index_from_table(
        pa.table({"content": DOCS, "url": URLS}), idx,
        target_rows_per_segment=6, stored_columns=("url",),
    )
    return Searcher(idx, use_actors=False)


def test_duplicate_filter_first(dup_idx):
    q = FilteredQuery(query=TermQuery(term="common"), filter=DuplicateFilter(field="url"))
    ids = sorted(d for d, _ in dup_idx.search(q, k=10))
    assert ids == [0, 1, 3]  # first occurrence per url


def test_duplicate_filter_last(dup_idx):
    q = FilteredQuery(
        query=TermQuery(term="common"), filter=DuplicateFilter(field="url", keep="last")
    )
    ids = sorted(d for d, _ in dup_idx.search(q, k=10))
    assert ids == [3, 4, 5]  # last occurrence per url


def test_duplicate_filter_preserves_scores(dup_idx):
    base = dict(dup_idx.search(TermQuery(term="common"), k=10))
    q = FilteredQuery(query=TermQuery(term="common"), filter=DuplicateFilter(field="url"))
    for d, s in dup_idx.search(q, k=10):
        assert s == pytest.approx(base[d])


def test_cached_filter_equivalence_and_memoization(dup_idx):
    inner = terms_filter("content", ["alpha", "beta", "gamma"])
    plain = FilteredQuery(query=TermQuery(term="common"), filter=inner)
    cached = FilteredQuery(query=TermQuery(term="common"), filter=CachedFilter(filter=inner))
    assert dup_idx.search(plain, k=10) == dup_idx.search(cached, k=10)
    # re-run: results stable (cache-hit path)
    assert dup_idx.search(cached, k=10) == dup_idx.search(cached, k=10)
    # CachedFilter composes with range + duplicate filters too
    for f in (FieldRangeFilter(field="url", lower="u1", upper="u2"),
              DuplicateFilter(field="url")):
        a = dup_idx.search(FilteredQuery(query=MatchAllDocsQuery(), filter=f), k=10)
        b = dup_idx.search(
            FilteredQuery(query=MatchAllDocsQuery(), filter=CachedFilter(filter=f)), k=10
        )
        assert a == b


def test_chained_filter(dup_idx):
    """ChainedFilter.cs fold: AND / OR / ANDNOT / XOR over doc sets."""
    from lucene_net_ray.query import ChainedFilter

    fa = terms_filter("content", ["alpha", "beta", "gamma"])   # docs 0,1,2
    fb = terms_filter("content", ["beta", "delta"])            # docs 1,3

    def run(chain):
        q = FilteredQuery(query=MatchAllDocsQuery(), filter=chain)
        return sorted(d for d, _ in dup_idx.search(q, k=10))

    assert run(ChainedFilter(clauses=((fa, "OR"), (fb, "AND")))) == [1]
    assert run(ChainedFilter(clauses=((fa, "OR"), (fb, "OR")))) == [0, 1, 2, 3]
    assert run(ChainedFilter(clauses=((fa, "OR"), (fb, "ANDNOT")))) == [0, 2]
    assert run(ChainedFilter(clauses=((fa, "OR"), (fb, "XOR")))) == [0, 2, 3]
    # nests + composes with range filters
    rng = FieldRangeFilter(field="url", lower="u1", upper="u1")  # docs 0,2,5
    nested = ChainedFilter(clauses=(
        (ChainedFilter(clauses=((fa, "OR"), (fb, "OR"))), "OR"),  # 0,1,2,3
        (rng, "AND"),
    ))
    assert run(nested) == [0, 2]
    # works under CachedFilter too (hashable)
    assert run(CachedFilter(filter=nested)) == [0, 2]
