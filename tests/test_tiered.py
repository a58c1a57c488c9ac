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
