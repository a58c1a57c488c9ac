"""Percolator stage: registered queries vs a document stream."""

import pyarrow as pa
import ray.data

from lucene_net_ray.stages.percolate import percolate


def test_percolate_matches():
    docs = [
        "spark merge pipeline",     # 0: AND + none else
        "vector database search",   # 1: vector
        "window functions in sql",  # 2: window-or-stream
        "stream processing spark",  # 3: window-or-stream (not AND: no merge)
        "nothing relevant at all",  # 4: none
    ]
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(5)), "text": docs}))
    out = percolate(ds, {
        "q_and": "+merge +spark",
        "q_term": "vector",
        "q_or": "window stream",
        "q_not": "+spark -merge",
    }).to_pandas()
    got = {(r.doc_id, r.query_name) for r in out.itertuples()}
    assert got == {
        (0, "q_and"),
        (1, "q_term"),
        (2, "q_or"), (3, "q_or"),
        (3, "q_not"),  # spark without merge
    }


def test_percolate_phrase_and_empty():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1],
        "text": ["exact phrase here", "phrase exact here"],
    }))
    out = percolate(ds, {"p": '"exact phrase"'}).to_pandas()
    assert set(out["doc_id"]) == {0}
    none = percolate(ds, {"z": "absentterm"}).to_pandas()
    assert len(none) == 0
