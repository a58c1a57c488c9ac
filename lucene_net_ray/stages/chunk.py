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

The batch kernel is fully vectorized (round 4; the round-3 version looped
rows and tokens in Python): one Arrow split kernel, numpy repeat/arange
window arithmetic over the flat token buffer, one take + binary_join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

_EMPTY = pa.table(
    {
        "doc_id": pa.array([], type=pa.int64()),
        "chunk_id": pa.array([], type=pa.int64()),
        "chunk_text": pa.array([], type=pa.string()),
        "n_tokens": pa.array([], type=pa.int64()),
    }
)


def chunk_batch(
    batch: pa.Table,
    *,
    chunk_tokens: int,
    step: int,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> pa.Table:
    """Zero Python per row: token lists from one Arrow split kernel, window
    starts from numpy repeat/arange arithmetic, chunk text from a single
    take + binary_join over the flat token buffer."""
    import pyarrow.compute as pc

    col = batch.column(text_column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks_list = pc.utf8_split_whitespace(col)
    offs = toks_list.offsets.to_numpy().astype(np.int64)
    flat = toks_list.values
    # drop the empty strings consecutive-whitespace splits emit. Empties are
    # rare (they need doubled/leading/trailing whitespace), and the rebuild
    # (cumsum + string filter) is the kernel's only expensive allocation on
    # a cold heap — so skip it entirely on the common all-kept path.
    keep_np = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if keep_np.all():
        new_offs = offs
    else:
        cs = np.concatenate(([0], np.cumsum(keep_np, dtype=np.int64)))
        new_offs = cs[offs]
        flat = flat.filter(pa.array(keep_np))
    n = new_offs[1:] - new_offs[:-1]  # tokens per doc

    n_chunks = -(-n // step)  # ceil; 0 chunks for empty docs
    total = int(n_chunks.sum())
    if total == 0:
        return _EMPTY
    doc_idx = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
    excl = np.concatenate(([0], np.cumsum(n_chunks)))[:-1]
    chunk_id = np.arange(total, dtype=np.int64) - np.repeat(excl, n_chunks)
    start = chunk_id * step
    chunk_len = np.minimum(chunk_tokens, n[doc_idx] - start)
    tot_toks = int(chunk_len.sum())
    bounds = np.concatenate(([0], np.cumsum(chunk_len)))
    flat_idx = (
        np.repeat(new_offs[:-1][doc_idx] + start, chunk_len)
        + np.arange(tot_toks, dtype=np.int64)
        - np.repeat(bounds[:-1], chunk_len)
    )
    gathered = flat.take(pa.array(flat_idx, type=pa.int64()))
    chunk_lists = pa.LargeListArray.from_arrays(
        pa.array(bounds, type=pa.int64()), gathered
    )
    return pa.table(
        {
            "doc_id": batch.column(id_column).take(pa.array(doc_idx)).cast(pa.int64()),
            "chunk_id": pa.array(chunk_id, type=pa.int64()),
            "chunk_text": pc.binary_join(chunk_lists, " "),
            "n_tokens": pa.array(chunk_len, type=pa.int64()),
        }
    )


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
        return chunk_batch(
            batch,
            chunk_tokens=chunk_tokens,
            step=step,
            text_column=text_column,
            id_column=id_column,
        )

    return ds.map_batches(chunks, batch_format="pyarrow")
