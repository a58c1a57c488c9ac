"""Sequence packing (stages/packing.py): concat-split window assignment
matches a local oracle, whole-doc next-fit respects the budget, and both
are invariant to physical block boundaries (the doc_id-range part is the
only grouping that matters)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lucene_net_ray.stages.packing import pack_sequences, pack_sequences_whole


def _docs(n=200, seed=3):
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(f"w{j}" for j in range(int(k))) for k in rng.integers(0, 90, size=n)
    ]
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)), "text": texts})


def _tok_counts(table):
    return np.array([len(t.split()) for t in table.column("text").to_pylist()])


def test_concat_split_matches_local_oracle():
    t = _docs()
    n = _tok_counts(t)
    start = np.concatenate(([0], np.cumsum(n)[:-1]))
    budget = 64
    out = pack_sequences(
        ray.data.from_arrow(t), budget=budget, part_rows=37, text_column="text"
    ).take_all()
    out.sort(key=lambda r: r["doc_id"])
    assert len(out) == t.num_rows
    for r in out:
        i = r["doc_id"]
        assert r["n_tokens"] == n[i]
        assert r["start_tok"] == start[i]
        assert r["first_seq"] == start[i] // budget
        end = start[i] + n[i]
        assert r["last_seq"] == max(start[i] // budget, (end - 1) // budget)


def test_concat_split_invariant_to_partitioning():
    t = _docs(150, seed=9)
    a = pack_sequences(ray.data.from_arrow(t), budget=100, part_rows=50).take_all()
    b = pack_sequences(
        ray.data.from_arrow(t).repartition(11), budget=100, part_rows=50
    ).take_all()
    key = lambda r: r["doc_id"]
    assert sorted(a, key=key) == sorted(b, key=key)


def test_whole_doc_next_fit():
    t = _docs(300, seed=5)
    budget = 120
    out = pack_sequences_whole(
        ray.data.from_arrow(t), budget=budget, part_rows=100, text_column="text"
    ).take_all()
    out.sort(key=lambda r: r["doc_id"])
    n = _tok_counts(t)
    # reconstruct sequences; every non-oversize sequence fits the budget and
    # next-fit is tight: a doc opens a new sequence only when it wouldn't fit
    fills: dict[int, int] = {}
    prev_seq_by_part: dict[int, int] = {}
    for r in out:
        assert r["n_tokens"] == n[r["doc_id"]]
        assert r["oversize"] == (r["n_tokens"] > budget)
        fills[r["seq_id"]] = fills.get(r["seq_id"], 0) + r["n_tokens"]
        assert r["seq_fill"] == fills[r["seq_id"]]
        part = r["seq_id"] >> 32
        prev = prev_seq_by_part.get(part)
        if prev is not None and r["seq_id"] != prev:
            assert r["seq_id"] == prev + 1  # sequences are dense per part
        prev_seq_by_part[part] = r["seq_id"]
    for seq_id, fill in fills.items():
        docs = [r for r in out if r["seq_id"] == seq_id]
        if not any(r["oversize"] for r in docs):
            assert fill <= budget
    # tightness: the first doc of each later sequence would have overflowed
    by_part: dict[int, list] = {}
    for r in out:
        by_part.setdefault(r["seq_id"] >> 32, []).append(r)
    for part, rows in by_part.items():
        rows.sort(key=lambda r: r["doc_id"])
        for prev, cur in zip(rows, rows[1:]):
            if cur["seq_id"] != prev["seq_id"]:
                assert prev["seq_fill"] + cur["n_tokens"] > budget


def test_zero_token_docs():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": ["a b c", "", "d"],
        }
    )
    out = pack_sequences(ray.data.from_arrow(t), budget=2, part_rows=10).take_all()
    out.sort(key=lambda r: r["doc_id"])
    assert [r["n_tokens"] for r in out] == [3, 0, 1]
    assert [r["start_tok"] for r in out] == [0, 3, 3]
    assert [r["first_seq"] for r in out] == [0, 1, 1]
    assert [r["last_seq"] for r in out] == [1, 1, 1]
