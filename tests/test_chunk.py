"""Sliding-window chunking: coverage, overlap, edge cases."""

import pyarrow as pa
import pytest
import ray.data

from lucene_net_ray.stages.chunk import chunk_documents


def test_chunk_windows_and_overlap():
    text = " ".join(f"t{i}" for i in range(10))
    ds = ray.data.from_arrow(pa.table({"doc_id": [7], "text": [text]}))
    out = chunk_documents(ds, chunk_tokens=4, overlap_tokens=1).to_pandas()
    # step 3: starts 0,3,6,9 -> 4 chunks, last is short
    assert list(out["chunk_id"]) == [0, 1, 2, 3]
    assert list(out["n_tokens"]) == [4, 4, 4, 1]
    assert out.loc[0, "chunk_text"] == "t0 t1 t2 t3"
    assert out.loc[1, "chunk_text"] == "t3 t4 t5 t6"   # 1-token overlap
    assert out.loc[3, "chunk_text"] == "t9"
    # every token covered
    covered = set()
    for t in out["chunk_text"]:
        covered |= set(t.split())
    assert covered == {f"t{i}" for i in range(10)}


def test_chunk_edges():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["short doc", "", "   "],
    }))
    out = chunk_documents(ds, chunk_tokens=5, overlap_tokens=0).to_pandas()
    assert list(out["doc_id"]) == [1]   # empty/whitespace docs emit nothing
    assert out.loc[0, "chunk_text"] == "short doc"
    with pytest.raises(ValueError):
        chunk_documents(ds, chunk_tokens=4, overlap_tokens=4)


from hypothesis import given, settings, strategies as st


@given(
    st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=5), max_size=40),
    st.integers(2, 8),
    st.integers(0, 3),
)
@settings(max_examples=30, deadline=None)
def test_chunk_invariants(tokens, chunk, overlap):
    """Every token appears in order across chunks; consecutive chunks share
    exactly `overlap` tokens (except a short tail); concatenating chunks
    with the overlap removed reconstructs the token stream."""
    if overlap >= chunk:
        overlap = chunk - 1
    ds = ray.data.from_arrow(pa.table({"doc_id": [0], "text": [" ".join(tokens)]}))
    out = chunk_documents(ds, chunk_tokens=chunk, overlap_tokens=overlap).to_pandas()
    if not tokens:
        assert len(out) == 0
        return
    out = out.sort_values("chunk_id")
    step = chunk - overlap
    pieces = [t.split() for t in out["chunk_text"]]
    rebuilt = pieces[0] + [tok for p in pieces[1:] for tok in p[overlap:]]
    # the final window may re-cover already-seen tokens; rebuilt is the
    # stream possibly with a duplicated tail segment - prefix must match
    assert rebuilt[: len(tokens)] == tokens
    assert all(len(p) <= chunk for p in pieces)
    starts = [i * step for i in range(len(pieces))]
    for s_, p in zip(starts, pieces):
        assert tokens[s_ : s_ + chunk] == p
