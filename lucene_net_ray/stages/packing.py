"""Sequence packing for LLM training-data pipelines.

Two packing disciplines over a documents table, both deterministic functions
of (doc_id order, token counts) — independent of physical partitioning:

  concat-split (``pack_sequences``): the GPT-style regime — all documents'
    tokens are conceptually concatenated in doc_id order and split into
    fixed ``budget``-token windows; each doc reports the window range it
    spans (first_seq/last_seq) and its global token offset. Fully
    SQL-expressible (window cumsum), so it ships as a hash-exact oracled
    contract entry.

  whole-doc next-fit (``pack_sequences_whole``): no document is split —
    docs accumulate into a sequence until the next doc would overflow the
    budget, which starts a new sequence (oversized docs get a sequence of
    their own, flagged). The packing is defined per doc_id-range part so
    sequence boundaries never depend on Ray's physical block boundaries.

Scale shape (100 TB): one pass counts tokens vectorized
(``count_substring_regex``), ONE coarse keyed shuffle groups rows by
doc_id-range part (``part_rows`` ids per part — bounded group size), and
packing runs vectorized (cumsum) inside each group. Global token/sequence
offsets need the per-part totals only: #parts integers gathered to the
driver (KBs at 10^12 rows), prefix-summed, and shipped back in the group
UDF's closure. No full materialization anywhere.

No reference analog (the reference is a search library); this operator
belongs to the training-data half of the charter (SURVEY.md §8.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

#: one "token" = one maximal non-whitespace run; mirrored verbatim by the
#: oracle SQL (regexp_extract_all(text, '\S+'))
_TOKEN_RE = r"\S+"


def _count_parts(
    ds: ray.data.Dataset, *, text_column: str, id_column: str, part_rows: int
) -> ray.data.Dataset:
    def count(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        n = (
            pc.count_substring_regex(batch.column(text_column), _TOKEN_RE)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "part": pa.array(ids // part_rows),
                "n_tokens": pa.array(n),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow")


def _part_offsets(counts: ray.data.Dataset) -> dict[int, int]:
    """Global token offset of each part = sum of all earlier parts' totals.
    Driver sees #parts rows only."""
    rows = counts.groupby("part").aggregate(Sum("n_tokens")).take_all()
    rows.sort(key=lambda r: r["part"])
    offsets: dict[int, int] = {}
    acc = 0
    for r in rows:
        offsets[r["part"]] = acc
        acc += int(r["sum(n_tokens)"])
    return offsets


def pack_sequences(
    ds: ray.data.Dataset,
    *,
    budget: int = 2048,
    part_rows: int = 100_000,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """Concat-split packing: rows (doc_id, n_tokens, start_tok, first_seq,
    last_seq). start_tok = global token offset of the doc in doc_id order;
    sequences are the consecutive ``budget``-token windows of the global
    stream. Zero-token docs sit at their offset's window (first==last)."""
    counts = _count_parts(
        ds, text_column=text_column, id_column=id_column, part_rows=part_rows
    )
    offsets = _part_offsets(counts)

    def pack(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("doc_id", "ascending")])
        group = group.take(order)
        n = group.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        part = int(group.column("part")[0].as_py())
        start = offsets[part] + np.concatenate(([0], np.cumsum(n)[:-1]))
        end = start + n
        first_seq = start // budget
        last_seq = np.maximum(first_seq, (end - 1) // budget)
        return pa.table(
            {
                "doc_id": group.column("doc_id"),
                "n_tokens": group.column("n_tokens"),
                "start_tok": pa.array(start),
                "first_seq": pa.array(first_seq),
                "last_seq": pa.array(last_seq),
            }
        )

    return counts.groupby("part").map_groups(pack, batch_format="pyarrow")


def pack_sequences_whole(
    ds: ray.data.Dataset,
    *,
    budget: int = 2048,
    part_rows: int = 100_000,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """Whole-doc next-fit packing: rows (doc_id, n_tokens, seq_id,
    seq_fill, oversize). seq_id is globally unique (part << 32 | local) and
    sequence boundaries are per-part, so results are invariant to physical
    partitioning. ``seq_fill`` = tokens in the doc's sequence AFTER adding
    it; ``oversize`` marks docs larger than the budget (they occupy a
    dedicated sequence — the downstream truncation policy's problem)."""
    counts = _count_parts(
        ds, text_column=text_column, id_column=id_column, part_rows=part_rows
    )

    def pack(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("doc_id", "ascending")])
        group = group.take(order)
        n = group.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        part = int(group.column("part")[0].as_py())
        # next-fit is inherently sequential (each break depends on the
        # previous); the loop runs over THIS group's numpy row count only
        # (bounded by part_rows), not the dataset
        seq = np.empty(n.size, dtype=np.int64)
        fill = np.empty(n.size, dtype=np.int64)
        cur_seq, cur_fill = 0, 0
        for i in range(n.size):
            if cur_fill and cur_fill + n[i] > budget:
                cur_seq += 1
                cur_fill = 0
            cur_fill += int(n[i])
            seq[i] = cur_seq
            fill[i] = cur_fill
        return pa.table(
            {
                "doc_id": group.column("doc_id"),
                "n_tokens": group.column("n_tokens"),
                "seq_id": pa.array((part << 32) | seq),
                "seq_fill": pa.array(fill),
                "oversize": pa.array(n > budget),
            }
        )

    return counts.groupby("part").map_groups(pack, batch_format="pyarrow")
