"""Query-time joins — JoinUtil analog over Ray Datasets.

Reference: /root/reference/src/Lucene.Net.Join/JoinUtil.cs:18 —
``CreateJoinQuery(fromField, fromQuery, toField)`` runs the "from" query,
collects the matching docs' fromField terms (TermsCollector.cs), and rewrites
to a query matching any "to" doc whose toField holds one of them. The
index-time parent/child block join (ToParentBlockJoinQuery.cs:74) maps to
``block_join_parents`` over co-partitioned parent/child rows.

Ray-Data-first plan (SURVEY.md §2.7 "Joins" row): the from side's distinct
key set is gathered with a Ray aggregate (it is the SMALL side by
construction — a query's match set), broadcast once via ``ray.put``, and the
to side streams through a set-membership ``map_batches`` filter. No
all-to-all shuffle: the only exchange is the distinct-key aggregate. When
the from side is NOT small (semi-joining two full tables), that is exactly
``Dataset.join`` / the coarse-groupby pattern in stages/clean.py instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def gather_keys(from_ds: ray.data.Dataset, from_field: str) -> np.ndarray:
    """Distinct from-side keys via a groupby aggregate (TermsCollector
    analog). The distinct set — not the rows — comes back to the driver."""
    distinct = from_ds.select_columns([from_field]).groupby(from_field).count()
    vals = [r[from_field] for r in distinct.take_all()]
    return np.asarray(sorted(v for v in vals if v is not None))


def semi_join(
    to_ds: ray.data.Dataset,
    to_field: str,
    from_ds: ray.data.Dataset,
    from_field: str,
    *,
    negate: bool = False,
) -> ray.data.Dataset:
    """to-side rows whose ``to_field`` is (not, if negate) in the from side's
    distinct ``from_field`` set. JoinUtil semi-join / anti-join semantics."""
    keys = gather_keys(from_ds, from_field)
    keys_ref = ray.put(keys)

    def filt(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        mask = pc.is_in(batch.column(to_field), value_set=pa.array(ks))
        if negate:
            mask = pc.invert(pc.fill_null(mask, False))
        return batch.filter(mask)

    return to_ds.map_batches(filt, batch_format="pyarrow")


def block_join_parents(
    ds: ray.data.Dataset,
    *,
    parent_key: str,
    child_match: "callable",
    mode: str = "any",
) -> ray.data.Dataset:
    """ToParentBlockJoinQuery analog for co-partitioned parent/child rows:
    keep groups (blocks) sharing ``parent_key`` where ``child_match(batch)``
    holds for any/all children. ``child_match`` is a vectorized predicate
    batch -> BooleanArray. The groupby shuffles by parent key — the
    'parent/child must be co-located' assumption the reference encodes by
    indexing blocks contiguously is expressed here as the partitioning key."""
    if mode not in ("any", "all"):
        raise ValueError(mode)

    def reduce_group(group: pa.Table) -> pa.Table:
        m = child_match(group)
        arr = m.to_numpy(zero_copy_only=False).astype(bool)
        ok = arr.any() if mode == "any" else arr.all()
        return group if ok else group.slice(0, 0)

    return ds.groupby(parent_key).map_groups(reduce_group, batch_format="pyarrow")
