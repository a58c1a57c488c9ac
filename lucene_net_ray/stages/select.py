"""Corpus selection operators for training-data curation.

Two deterministic, SQL-oracled selection primitives a 100-TB pipeline needs
once quality scoring exists (no reference analog — the reference is a search
library; these belong to the training-data half of the charter, SURVEY §8.2):

  budget_select: keep the highest-quality documents until a global token
    budget is exhausted — the "data-constrained scaling" selection step
    (pick the best B tokens). Global order is (quality DESC, doc_id ASC);
    a doc is kept iff the running token total through that doc is <= budget.

  length_quantiles: exact per-group token-count percentiles (DuckDB
    quantile_disc semantics: the element at 0-based index ceil(q*n)-1 of
    the sorted values — rule verified exhaustively against DuckDB for
    n in 1..400, 1000, 4096, 9999).

Scale shape (100 TB):

  budget_select is a two-pass distributed prefix sum over an INTEGER quality
  key (same discipline as stages/packing.py): pass 1 scores every doc
  vectorized and reduces per-key token totals; the driver sees at most one
  row per distinct 6-dp quality value (<= 1e6 + 1 rows, KBs-to-MBs at any
  corpus size), prefix-sums them, and finds the boundary key; pass 2
  re-scores only rows at or above the boundary key (everything below is
  dropped without a shuffle) and resolves exact per-doc cumulative totals
  inside per-key groups (vectorized sort + cumsum). The keyed exchange
  moves only (doc_id, n_tokens, quality) triples, never text. Skew note:
  one group = one distinct quality value; a pathological corpus where a
  large fraction of docs share one exact 6-dp score concentrates that key
  (bounded by docs-per-distinct-score; real quality scores spread).

  length_quantiles reduces to a (group, value) histogram first — the
  combiner-style shuffle moves one row per distinct (lang, n_tokens) pair,
  not per doc — then resolves exact quantiles from per-group histograms
  (groups are quantile-sized: distinct token-count values, not docs).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from .textstats import quality_score_batch

#: quality is emitted rounded to 6 dp in [0, 1] (stages/textstats.py), so
#: rint(quality * 1e6) is an exact integer key; ascending key == descending
#: quality. Ties (equal quality) share a key by construction.
_QKEY_SCALE = 1_000_000


def _score_batch(batch: pa.Table, *, text_column: str, id_column: str) -> pa.Table:
    scored = quality_score_batch(batch, text_column=text_column)
    q = scored.column("quality").to_numpy(zero_copy_only=False)
    qkey = (_QKEY_SCALE - np.rint(q * _QKEY_SCALE)).astype(np.int64)
    return pa.table(
        {
            "doc_id": scored.column(id_column),
            "n_tokens": scored.column("n_tokens"),
            "quality": scored.column("quality"),
            "qkey": pa.array(qkey),
        }
    )


def budget_select(
    ds: ray.data.Dataset,
    *,
    budget_tokens: int,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """Highest-quality-first selection under a global token budget.

    Returns rows (doc_id, n_tokens, quality, cum_tokens) for every kept doc,
    where cum_tokens is the running token total in (quality DESC, doc_id)
    order INCLUDING the doc itself; kept iff cum_tokens <= budget_tokens.
    Mirrored exactly by a SUM ... OVER (ORDER BY quality DESC, doc_id)
    window in the oracle.
    """
    scored = ds.map_batches(
        _score_batch,
        batch_format="pyarrow",
        fn_kwargs={"text_column": text_column, "id_column": id_column},
    )
    # pass 1: per-key token totals -> driver prefix sum (<= 1e6+1 rows)
    totals = scored.groupby("qkey").aggregate(Sum("n_tokens")).take_all()
    totals.sort(key=lambda r: r["qkey"])
    keys_list: list[int] = []
    offs_list: list[int] = []
    acc = 0
    boundary_key = -1  # last key whose docs can still fit
    for r in totals:
        k = int(r["qkey"])
        if acc <= budget_tokens:
            # keys past the boundary never contribute kept rows — prune
            # them from the broadcast arrays AND the shuffle
            keys_list.append(k)
            offs_list.append(acc)
            boundary_key = k
        acc += int(r["sum(n_tokens)"])
    cand_keys = np.asarray(keys_list, dtype=np.int64)
    cand_offs = np.asarray(offs_list, dtype=np.int64)
    # broadcast once (ray.put), read zero-copy in every group task — the
    # arrays are candidate-keys-sized, never shipped per-task in the pickle
    import ray

    offs_ref = ray.put((cand_keys, cand_offs))

    def resolve(group: pa.Table) -> pa.Table:
        """One COARSE bucket (~2^10 quality keys): segmented cumsum over
        (qkey, doc_id)-sorted rows — vectorized across all keys of the
        bucket, no per-key Python group (the salted-windows lesson)."""
        import pyarrow.compute as pc

        keys, offs = ray.get(offs_ref)
        order = pc.sort_indices(
            group, sort_keys=[("qkey", "ascending"), ("doc_id", "ascending")]
        )
        group = group.take(order)
        q = group.column("qkey").to_numpy(zero_copy_only=False).astype(np.int64)
        n = group.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        cum_all = np.cumsum(n)
        starts = np.flatnonzero(np.concatenate(([True], q[1:] != q[:-1])))
        seg_lens = np.diff(np.concatenate((starts, [q.size])))
        seg_base = cum_all[starts] - n[starts]  # running total before each key's rows
        base_off = offs[np.searchsorted(keys, q[starts])]
        cum = cum_all - np.repeat(seg_base, seg_lens) + np.repeat(base_off, seg_lens)
        keep = cum <= budget_tokens
        return pa.table(
            {
                "doc_id": group.column("doc_id").filter(pa.array(keep)),
                "n_tokens": group.column("n_tokens").filter(pa.array(keep)),
                "quality": group.column("quality").filter(pa.array(keep)),
                "cum_tokens": pa.array(cum[keep]),
            }
        )

    # pass 2: rows beyond the boundary key can never be kept — drop them
    # BEFORE the keyed exchange (at a tight budget this prunes most of the
    # corpus from the shuffle); the exchange key is a coarse bucket
    # (~2^10 keys each, <= ~1000 groups), resolved vectorized inside
    def add_bucket(batch: pa.Table) -> pa.Table:
        qk = batch.column("qkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("qbucket", pa.array(qk >> 10))

    candidates = scored.filter(expr=f"qkey <= {boundary_key}").map_batches(
        add_bucket, batch_format="pyarrow"
    )
    out = candidates.groupby("qbucket").map_groups(resolve, batch_format="pyarrow")
    return out


#: (numerator, denominator) forms of the published quantile grid; the
#: selection rule uses float ceil exactly as DuckDB does (verified identical
#: to the rational form across the probe range in tests).
DEFAULT_QUANTILES = (0.25, 0.5, 0.75, 0.9, 0.95, 0.99)


def length_quantiles(
    ds: ray.data.Dataset,
    *,
    group_column: str = "lang",
    text_column: str = "text",
    quantiles: tuple[float, ...] = DEFAULT_QUANTILES,
) -> ray.data.Dataset:
    """Exact per-group token-count quantiles (quantile_disc semantics).

    Output: one row per group — (group, n_docs, q25, q50, ... qNN) with the
    quantile columns named q<percent> as BIGINT token counts.
    """

    def count_tokens(batch: pa.Table) -> pa.Table:
        scored = quality_score_batch(batch, text_column=text_column)
        return pa.table(
            {
                group_column: scored.column(group_column),
                "n_tokens": scored.column("n_tokens"),
            }
        )

    hist = (
        ds.map_batches(count_tokens, batch_format="pyarrow")
        .groupby([group_column, "n_tokens"])
        .aggregate(Count())
    )

    qnames = [f"q{int(round(q * 100)):02d}" for q in quantiles]

    def resolve(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(group, sort_keys=[("n_tokens", "ascending")])
        group = group.take(order)
        vals = group.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        cnts = group.column("count()").to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        out = {
            group_column: [group.column(group_column)[0].as_py()],
            "n_docs": pa.array([n], type=pa.int64()),
        }
        for q, name in zip(quantiles, qnames):
            idx = max(0, math.ceil(q * n) - 1)  # DuckDB quantile_disc rule
            # idx-th value (0-based) of the expanded sorted multiset
            v = vals[np.searchsorted(cum, idx + 1, side="left")]
            out[name] = pa.array([int(v)], type=pa.int64())
        return pa.table(out)

    return hist.groupby(group_column).map_groups(resolve, batch_format="pyarrow")


def corpus_shuffle_ranks(
    ds: ray.data.Dataset,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic global corpus shuffle for training-order randomization:
    every doc gets a dense rank 0..N-1 in (md5(text), doc_id) order — a
    seedless, reproducible, cluster-size-stable permutation (the md5-draw
    family). Rows out: (doc_id, shuffle_rank).

    Scale shape: NO all-to-all sort. The md5's first 12 bits bucket the
    corpus into 4096 hash ranges; per-bucket counts prefix-sum on the
    driver (4096 ints), and each bucket sorts locally and adds its offset —
    the same two-pass rank-assignment discipline as budget_select, with the
    exchange keyed on a bounded int bucket.
    """
    from .textstats import md5_hex_utf8

    def add_hash(batch: pa.Table) -> pa.Table:
        hx = md5_hex_utf8(batch.column(text_column))
        bucket = np.fromiter(
            (int(h[:3], 16) for h in hx), dtype=np.int64, count=len(hx)
        )
        return pa.table(
            {
                id_column: batch.column(id_column),
                "h": pa.array(hx, type=pa.string()),
                "bucket": pa.array(bucket),
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    counts = hashed.groupby("bucket").aggregate(Count()).take_all()
    counts.sort(key=lambda r: r["bucket"])
    offsets: dict[int, int] = {}
    acc = 0
    for r in counts:
        offsets[int(r["bucket"])] = acc
        acc += int(r["count()"])

    def rank(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("h", "ascending"), (id_column, "ascending")]
        )
        group = group.take(order)
        b = int(group.column("bucket")[0].as_py())
        ranks = offsets[b] + np.arange(group.num_rows, dtype=np.int64)
        return pa.table(
            {
                id_column: group.column(id_column),
                "shuffle_rank": pa.array(ranks),
            }
        )

    return hashed.groupby("bucket").map_groups(rank, batch_format="pyarrow")
