"""Sliding-window document chunking — the RAG / long-context training prep
step: split each document into overlapping token windows with provenance.

One streaming map_batches pass (no shuffle, no state); chunk text is
reconstructed by joining whitespace tokens with single spaces, which makes
the operation exactly SQL-expressible (list_slice + array_to_string over
the same token stream) and invariant to the source's whitespace quirks.
Window starts advance by ``chunk_tokens - overlap_tokens``; every token
lands in at least one chunk, the last window may be short, empty docs emit
no chunks. Complements pack_sequences (stages/packing.py): chunking cuts
long docs down, packing glues short ones up.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def chunk_documents(
    ds: ray.data.Dataset,
    *,
    chunk_tokens: int = 256,
    overlap_tokens: int = 32,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """Dataset(doc_id, chunk_id, chunk_text, n_tokens) of overlapping
    whitespace-token windows."""
    if not (0 <= overlap_tokens < chunk_tokens):
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    step = chunk_tokens - overlap_tokens

    def chunks(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks_list = pc.utf8_split_whitespace(col)
        ids = batch.column(id_column).to_pylist()
        out_id, out_chunk, out_text, out_n = [], [], [], []
        for i in range(batch.num_rows):
            toks = [t for t in toks_list[i].as_py() if t]
            n = len(toks)
            if n == 0:
                continue
            cid = 0
            for start in range(0, n, step):
                piece = toks[start : start + chunk_tokens]
                out_id.append(ids[i])
                out_chunk.append(cid)
                out_text.append(" ".join(piece))
                out_n.append(len(piece))
                cid += 1
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "chunk_id": pa.array(out_chunk, type=pa.int64()),
                "chunk_text": pa.array(out_text, type=pa.string()),
                "n_tokens": pa.array(out_n, type=pa.int64()),
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow")
