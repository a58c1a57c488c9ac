"""sort_index + early-terminating sorted search (Misc/Index/Sorter analogs:
SortingMergePolicy.cs, EarlyTerminatingSortingCollector.cs)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_net_ray.pipelines.build import build_index_from_table
from lucene_net_ray.pipelines.collectors import search_sorted
from lucene_net_ray.pipelines.maintenance import sort_index
from lucene_net_ray.pipelines.search import Searcher
from lucene_net_ray.query import TermQuery


def _corpus(n=600, seed=3):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 100_000, size=n)
    texts = [
        f"common doc{i} {'rare' if i % 37 == 0 else 'filler'} value{v % 7}"
        for i, v in enumerate(vals)
    ]
    return pa.table({"content": texts, "ts": vals, "row": np.arange(n)})


@pytest.fixture(scope="module")
def sorted_idx(tmp_path_factory):
    tbl = _corpus()
    src = tmp_path_factory.mktemp("src")
    pq.write_table(tbl, str(src / "corpus.parquet"), row_group_size=50)
    out = str(tmp_path_factory.mktemp("sortedidx"))
    meta = sort_index(
        str(src), out, sort_field="ts", descending=True,
        target_rows_per_segment=50, stored_columns=("row",),
    )
    return tbl, meta


def test_sort_index_manifest_ranges(sorted_idx):
    tbl, meta = sorted_idx
    assert meta.manifest["sorted_by"] == ["ts", True]
    segs = meta.manifest["segments"]
    assert len(segs) > 4
    for r in segs:
        assert r["sort_min"] <= r["sort_max"]
    # descending build: segment ranges descend and are disjoint
    for a, b in zip(segs, segs[1:]):
        assert a["sort_min"] >= b["sort_max"]


def test_sorted_search_matches_bruteforce_and_skips(sorted_idx):
    tbl, meta = sorted_idx
    s = Searcher(meta, use_actors=False)
    # secondary sort field rides along; leading field still matches the
    # index order, so the early path is taken
    rows = search_sorted(
        s, TermQuery(term="common"), [("ts", True), ("row", False)], k=5
    )
    n_segs = len(meta.manifest["segments"])
    assert s.last_segments_evaluated is not None
    assert s.last_segments_evaluated < n_segs  # actually skipped segments
    vals = sorted(
        zip(tbl.column("ts").to_pylist(), tbl.column("row").to_pylist()),
        key=lambda x: (-x[0], x[1]),
    )[:5]
    assert [(r["ts"], r["row"]) for r in rows] == vals


def test_sorted_search_selective_query(sorted_idx):
    tbl, meta = sorted_idx
    s = Searcher(meta, use_actors=False)
    rows = search_sorted(
        s, TermQuery(term="rare"), [("ts", True), ("row", False)], k=3
    )
    match = [
        (t, rw)
        for t, rw, txt in zip(
            tbl.column("ts").to_pylist(), tbl.column("row").to_pylist(),
            tbl.column("content").to_pylist(),
        )
        if "rare" in txt.split()
    ]
    match.sort(key=lambda x: (-x[0], x[1]))
    assert [(r["ts"], r["row"]) for r in rows] == match[:3]


def test_mismatched_sort_falls_back(sorted_idx):
    _tbl, meta = sorted_idx
    s = Searcher(meta, use_actors=False)
    rows = search_sorted(s, TermQuery(term="common"), [("ts", False)], k=3)
    assert s.last_segments_evaluated is None  # ascending != index order
    assert len(rows) == 3


def test_sorted_search_through_actors(sorted_idx):
    _tbl, meta = sorted_idx
    local = Searcher(meta, use_actors=False)
    actors = Searcher(meta, num_actors=3, use_actors=True)
    q = TermQuery(term="common")
    assert search_sorted(actors, q, [("ts", True)], k=7) == search_sorted(
        local, q, [("ts", True)], k=7
    )
    assert actors.last_segments_evaluated is not None
