"""Global exact line-level deduplication (the C4/CCNet-style cleanup).

Every line keeps only its FIRST occurrence across the whole corpus — first
in (doc_id, line_no) order — and later duplicate occurrences are dropped
from their documents; a document whose lines are all dropped disappears
from the output. This is the exact-line variant of the family next to
``stages/dupspans.py`` (substring spans) and ``stages/dedup.py`` (whole
documents); no reference analog (search library) — charter §8.2 territory.

Scale shape (100 TB): explode is a vectorized Arrow split (one row per
line, carrying only (doc_id, line_no, line)); the winner per distinct line
is ONE groupby aggregate — Min over a composite rank ``doc_id * 2^20 +
line_no`` — so the exchange carries one row per line occurrence and the
reduce output is one row per DISTINCT line (no tiny-group map_groups on
the line axis, the salted-windows lesson); reassembly groups the kept
lines per document (groups are document-sized). Two keyed exchanges total,
the honest price of a global dedup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min

#: line_no packs into the low bits of the winner rank; 2^20 lines per doc
#: is asserted at explode time (doc_id then must fit 2^43 — it does for any
#: corpus this engine addresses; revisit the split if either bound moves)
_LINE_BITS = 20
_LINE_CAP = 1 << _LINE_BITS


def _explode(batch: pa.Table, *, text_column: str, id_column: str, delim: str) -> pa.Table:
    col = batch.column(text_column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lines = pc.split_pattern(col, delim)
    counts = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
    if counts.size and int(counts.max()) >= _LINE_CAP:
        raise ValueError(f"document exceeds {_LINE_CAP} lines; raise _LINE_BITS")
    flat = pc.list_flatten(lines)
    ids = batch.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
    if ids.size and (int(ids.min()) < 0 or int(ids.max()) >= (1 << (63 - _LINE_BITS))):
        raise ValueError(
            f"doc ids must be in [0, 2^{63 - _LINE_BITS}) for the rank packing"
        )
    doc_of_line = np.repeat(ids, counts)
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
    line_no = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(offs, counts)
    rank = (doc_of_line << _LINE_BITS) | line_no
    return pa.table({"line": flat, "rank": pa.array(rank)})


def line_dedup(
    ds: ray.data.Dataset,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    delim: str = "\n",
) -> ray.data.Dataset:
    """Rows (doc_id, text) with every globally-duplicate line reduced to its
    first occurrence; fully-deduplicated documents are dropped (mirroring
    the oracle's GROUP BY over kept lines only)."""
    exploded = ds.map_batches(
        _explode,
        batch_format="pyarrow",
        fn_kwargs={"text_column": text_column, "id_column": id_column, "delim": delim},
    )
    winners = exploded.groupby("line").aggregate(Min("rank"))

    def decode(batch: pa.Table) -> pa.Table:
        rank = batch.column("min(rank)").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_column: pa.array(rank >> _LINE_BITS),
                "line_no": pa.array(rank & (_LINE_CAP - 1)),
                "line": batch.column("line"),
            }
        )

    kept = winners.map_batches(decode, batch_format="pyarrow")

    def reassemble(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("line_no", "ascending")])
        group = group.take(order)
        text = delim.join(group.column("line").to_pylist())
        return pa.table(
            {
                id_column: pa.array([group.column(id_column)[0].as_py()], type=pa.int64()),
                text_column: pa.array([text], type=pa.string()),
            }
        )

    return kept.groupby(id_column).map_groups(reassemble, batch_format="pyarrow")


def linify_batch(
    batch: pa.Table, *, tokens_per_line: int = 8, text_column: str = "text"
) -> pa.Table:
    """Deterministic test shim: re-line single-line text into
    ``tokens_per_line``-token lines (the contract entry's input fixture —
    the operator's real input is pre-lined text). Mirrored verbatim by the
    oracle's list_transform slicing; tokens are maximal non-space runs."""
    col = batch.column(text_column)
    out = []
    for t in col.to_pylist():
        toks = [w for w in t.split(" ") if w]
        out.append(
            "\n".join(
                " ".join(toks[i : i + tokens_per_line])
                for i in range(0, len(toks), tokens_per_line)
            )
        )
    cols = {c: batch.column(c) for c in batch.column_names if c != text_column}
    cols[text_column] = pa.array(out, type=pa.string())
    return pa.table(cols)
