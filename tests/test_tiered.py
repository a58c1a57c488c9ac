"""TieredMergePolicy selection + segment-level compaction."""

import numpy as np
import pyarrow as pa

from lucene_net_ray.oracle import OracleIndex
from lucene_net_ray.pipelines.build import build_index_from_table
from lucene_net_ray.pipelines.search import Searcher
from lucene_net_ray.pipelines.tiered import compact_segments, plan_merges
from lucene_net_ray.query import parse_query
from lucene_net_ray.sources.corpus import generate_corpus
from lucene_net_ray.state.checkindex import check_index


def test_plan_merges_policy():
    # 20 tiny equal segments -> policy wants them merged down toward one tier
    sizes = [1 << 20] * 20  # all below the 2MB floor
    merges = plan_merges(sizes)
    assert merges, "tiny segments must be selected for merging"
    assert all(2 <= len(g) <= 10 for g in merges)
    # a huge segment is never grouped beyond the merged-size cap
    sizes = [6 << 30, 1 << 20, 1 << 20]
    merges = plan_merges(sizes, max_merged_bytes=5 << 30)
    for g in merges:
        assert 0 not in g  # the 6GB segment stays alone
    # few big same-tier segments: nothing to do
    assert plan_merges([1 << 30] * 3) == []


def test_compact_segments_equivalence(tmp_path):
    corpus = generate_corpus(240, seed=17)
    contents = corpus.column("content").to_pylist()
    idx = str(tmp_path / "idx")
    build_index_from_table(corpus, idx, target_rows_per_segment=20,
                          index_options="positions")  # 12 tiny segments
    # force aggressive compaction so several merges actually run
    out = str(tmp_path / "compacted")
    compacted = compact_segments(idx, out, segs_per_tier=2.0, max_merge_at_once=4)
    assert len(compacted.manifest["segments"]) < 12
    check_index(compacted)
    assert compacted.max_doc == 240
    assert compacted.sum_ttf == Searcher(idx, use_actors=False).index.sum_ttf

    oracle = OracleIndex(contents)
    s = Searcher(compacted, use_actors=False)
    for qs in ["public", "+public +query", "query token score", '"public static"', "zyzzyva"]:
        q = parse_query(qs)
        hits = s.search(q, k=10)
        expected = oracle.top_k(q, 10)
        assert [d for d, _ in hits] == [d for d, _ in expected], qs
        for (d1, s1), (d2, s2) in zip(hits, expected):
            assert np.float32(s1) == np.float32(s2)
    # compaction is idempotent/resumable: re-running skips committed segments
    again = compact_segments(idx, out, segs_per_tier=2.0, max_merge_at_once=4)
    assert again.manifest["segments"] == compacted.manifest["segments"]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    st.integers(min_value=40, max_value=90),
    st.integers(min_value=0, max_value=3),
    st.sampled_from(["public", "query", "zyzzyva", "quux"]),
)
def test_lifecycle_random_property(tmp_path_factory, n_docs, seed, del_term):
    """delete -> expunge -> compact -> search == oracle over the live docs."""
    from lucene_net_ray.pipelines.maintenance import expunge_deletes
    from lucene_net_ray.query import TermQuery
    from lucene_net_ray.state.deletes import delete_by_query

    corpus = generate_corpus(n_docs, seed=seed)
    contents = corpus.column("content").to_pylist()
    base = tmp_path_factory.mktemp("life")
    idx = str(base / "idx")
    build_index_from_table(corpus, idx, target_rows_per_segment=13)
    delete_by_query(idx, TermQuery(term=del_term))
    exp = expunge_deletes(idx, str(base / "exp"))
    check_index(exp)
    comp = compact_segments(exp, str(base / "cmp"), segs_per_tier=2.0)
    check_index(comp)
    live = [c for c in contents if del_term not in c.split()]
    assert comp.max_doc == len(live)
    oracle = OracleIndex(live)
    s = Searcher(comp, use_actors=False)
    for qs in ["public", "+public +query", "query token"]:
        q = parse_query(qs)
        hits = s.search(q, k=10)
        expected = oracle.top_k(q, 10)
        assert [d for d, _ in hits] == [d for d, _ in expected], (qs, del_term)
        for (_, s1), (_, s2) in zip(hits, expected):
            assert np.float32(s1) == np.float32(s2)
