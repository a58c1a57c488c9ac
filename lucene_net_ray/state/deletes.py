"""Deletions: live-docs tombstones over immutable segments.

Reference analog: IndexWriter.DeleteDocuments(Term/Query) marks docs in a
per-segment liveDocs bitset without touching postings
(/root/reference/src/Lucene.Net.Core/Index/IndexWriter.cs:1591); collection
statistics keep using maxDoc until the deletes are merged away, so idf/avgdl
are UNCHANGED by deletion (authentic Lucene behavior — deleted docs still
count in docFreq until expunged).

Merged (compacted) indexes do not consult tombstones — ``merge_index``
refuses to run while tombstones exist; run
``pipelines.maintenance.expunge_deletes`` first (ForceMergeDeletes analog:
drops tombstoned docs with dense docID remap and shrunken stats), then merge
the expunged index.

Here deletes live in ``{index}/deletes/gen_{N:06d}.parquet`` (one global
doc_id column per generation, atomic rename; generations accumulate like
.del files). Readers union all generations into a live mask applied at
match time.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _deletes_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "deletes")


def write_deletes(index_dir: str, doc_ids: np.ndarray | list[int]) -> str:
    """Append a new tombstone generation (atomic). Returns the file path."""
    doc_ids = np.unique(np.asarray(doc_ids, dtype=np.int64))
    d = _deletes_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    gen = 0
    for f in os.listdir(d):
        if f.startswith("gen_") and f.endswith(".parquet"):
            gen = max(gen, int(f[4:10]) + 1)
    path = os.path.join(d, f"gen_{gen:06d}.parquet")
    tmp = path + ".tmp"
    pq.write_table(pa.table({"doc_id": pa.array(doc_ids)}), tmp)
    os.replace(tmp, path)
    return path


def load_deleted(index_dir: str) -> np.ndarray:
    """Union of all tombstone generations -> sorted global doc_id array."""
    d = _deletes_dir(index_dir)
    if not os.path.isdir(d):
        return np.empty(0, dtype=np.int64)
    parts = []
    for f in sorted(os.listdir(d)):
        if f.startswith("gen_") and f.endswith(".parquet"):
            parts.append(pq.read_table(os.path.join(d, f)).column("doc_id").to_numpy())
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


def delete_by_query(index_dir: str, query, *, use_actors: bool = False) -> int:
    """DeleteDocuments(Query): tombstone every matching doc. Returns count."""
    from ..pipelines.search import Searcher

    searcher = Searcher(index_dir, use_actors=use_actors)
    hits = searcher.scored_docs(query)
    ids = np.array([d for d, _ in hits], dtype=np.int64)
    if ids.size:
        write_deletes(index_dir, ids)
    return int(ids.size)


def delete_by_term(index_dir: str, term: str, *, field: str = "content") -> int:
    from ..query import TermQuery

    return delete_by_query(index_dir, TermQuery(field=field, term=term))
