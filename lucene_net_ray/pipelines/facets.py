"""Hierarchical facets + drill-down / drill-sideways over Ray Datasets.

Reference semantics (SURVEY.md §2.7 Faceting row):
  taxonomy counts  /root/reference/src/Lucene.Net.Facet/Taxonomy/FastTaxonomyFacetCounts.cs
                   — a doc labeled with path a/b/c increments a, a/b and
                   a/b/c (rollup along the taxonomy).
  DrillDownQuery   /root/reference/src/Lucene.Net.Facet/DrillDownQuery.cs:53
                   — base query AND one filter per dimension.
  DrillSideways    /root/reference/src/Lucene.Net.Facet/DrillSideways.cs
                   — per dimension, facet counts are computed with every
                   OTHER dimension's filter applied but that dimension's own
                   filter removed (so the UI can show the sibling values).

All of it is map_batches filters + groupby counts — the natural Ray Data
expression; nothing materializes, the only exchanges are the tiny per-value
count aggregates.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def taxonomy_counts(
    ds: ray.data.Dataset, path_column: str, *, sep: str = "/"
) -> ray.data.Dataset:
    """(path, n_docs) for EVERY prefix level of the slash-separated paths."""

    def expand(batch: pa.Table) -> pa.Table:
        # vectorized prefix expansion: one list_slice + binary_join per
        # depth level (max_depth iterations, not one per row)
        col = batch.column(path_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keep = pc.and_kleene(col.is_valid(), pc.not_equal(col, ""))
        col = col.filter(pc.fill_null(keep, False))
        empty = pa.table({"path": pa.array([], type=pa.string())})
        if len(col) == 0:
            return empty
        parts = pc.split_pattern(col, sep)
        depth = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        outs = []
        for i in range(1, int(depth.max()) + 1):
            sliced = pc.list_slice(parts.filter(pa.array(depth >= i)), 0, i)
            outs.append(pc.binary_join(sliced, sep))
        joined = pa.concat_arrays([o.combine_chunks() if isinstance(o, pa.ChunkedArray) else o for o in outs])
        return pa.table({"path": joined})

    counts = ds.map_batches(expand, batch_format="pyarrow").groupby("path").count()
    return counts.rename_columns({"count()": "n_docs"})


def association_facet_sums(
    ds: ray.data.Dataset,
    facet_column: str,
    value_column: str,
    *,
    taxonomy: bool = False,
    sep: str = "/",
) -> ray.data.Dataset:
    """Association facets (reference
    Facet/Taxonomy/TaxonomyFacetSumValueSource.cs and
    Taxonomy/{Int,Float}AssociationFacetField): per facet label, the SUM of
    an associated per-doc value (and the doc count) instead of a plain
    count. With ``taxonomy=True`` the facet column holds slash paths and
    every prefix level aggregates (rollup semantics) — one vectorized
    prefix expansion per depth, one groupby."""
    import numpy as np

    def expand(batch: pa.Table) -> pa.Table:
        col = batch.column(facet_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = batch.column(value_column)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        keep = pc.and_kleene(col.is_valid(), pc.not_equal(col, ""))
        keep = pc.fill_null(keep, False)
        col, vals = col.filter(keep), vals.filter(keep)
        empty = pa.table(
            {
                "facet": pa.array([], type=pa.string()),
                "v": pa.array([], type=pa.float64()),
            }
        )
        if len(col) == 0:
            return empty
        if not taxonomy:
            return pa.table({"facet": col, "v": vals.cast(pa.float64())})
        parts = pc.split_pattern(col, sep)
        depth = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        outs, vouts = [], []
        vnp = vals.cast(pa.float64()).to_numpy(zero_copy_only=False)
        for i in range(1, int(depth.max()) + 1):
            m = depth >= i
            sliced = pc.list_slice(parts.filter(pa.array(m)), 0, i)
            outs.append(pc.binary_join(sliced, sep))
            vouts.append(vnp[m])
        joined = pa.concat_arrays(
            [o.combine_chunks() if isinstance(o, pa.ChunkedArray) else o for o in outs]
        )
        return pa.table({"facet": joined, "v": pa.array(np.concatenate(vouts))})

    from ray.data.aggregate import Count, Sum

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("facet")
        .aggregate(Sum("v", alias_name="sum_value"), Count(alias_name="n_docs"))
    )


def range_counts(
    ds: ray.data.Dataset,
    field: str,
    ranges: list[tuple],
) -> ray.data.Dataset:
    """Range facet counts — the Long/DoubleRangeFacetCounts analog
    (reference Facet/Range/RangeFacetCounts.cs + LongRange.cs:30: ranges
    may OVERLAP, a doc counts once in every range containing it; null
    values count nowhere). ``ranges`` rows are (label, lower, upper,
    include_lower, include_upper) with None = unbounded. One map_batches
    pass emits per-batch per-range partial counts (combiner-before-shuffle:
    the only exchange is len(ranges) rows per block), then a tiny
    groupby(label).sum. Returns Dataset(label, n_docs) including
    zero-count ranges."""
    rngs = [tuple(r) for r in ranges]

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(field)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = col.is_valid()
        labels, ns = [], []
        for label, lo, hi, inc_lo, inc_hi in rngs:
            m = valid
            if lo is not None:
                cmp = pc.greater_equal(col, lo) if inc_lo else pc.greater(col, lo)
                m = pc.and_kleene(m, cmp)
            if hi is not None:
                cmp = pc.less_equal(col, hi) if inc_hi else pc.less(col, hi)
                m = pc.and_kleene(m, cmp)
            labels.append(label)
            ns.append(pc.sum(pc.fill_null(m, False)).as_py() or 0)
        return pa.table({"label": pa.array(labels, type=pa.string()),
                         "n": pa.array(ns, type=pa.int64())})

    out = ds.map_batches(partial, batch_format="pyarrow").groupby("label").sum("n")
    return out.rename_columns({"sum(n)": "n_docs"})


def drill_down(ds: ray.data.Dataset, filters: dict[str, object]) -> ray.data.Dataset:
    """AND of per-dimension equality filters (DrillDownQuery analog)."""
    out = ds
    for col, val in filters.items():
        out = out.map_batches(
            lambda b, c=col, v=val: b.filter(pc.equal(b.column(c), v)),
            batch_format="pyarrow",
        )
    return out


def drill_sideways(
    ds: ray.data.Dataset, filters: dict[str, object], *, dims: list[str] | None = None
) -> dict:
    """{"hits": drill-down count, "facets": {dim: Dataset(value, n_docs)}}.

    Each dimension's counts apply every OTHER dimension's filter but not its
    own, so sibling values of the selected one stay visible."""
    dims = dims if dims is not None else list(filters)
    hits = drill_down(ds, filters).count()
    facets = {}
    for dim in dims:
        others = {c: v for c, v in filters.items() if c != dim}
        sub = drill_down(ds, others) if others else ds
        counts = sub.groupby(dim).count().rename_columns({"count()": "n_docs"})
        facets[dim] = counts
    return {"hits": hits, "facets": facets}


def sampled_facet_counts(
    ds: "ray.data.Dataset",
    *,
    term: str,
    facet_column: str = "lang",
    text_column: str = "text",
    fraction: float = 0.5,
):
    """RandomSamplingFacetsCollector analog (reference
    Facet/RandomSamplingFacetsCollector.cs:38 — sample the hit set, facet
    on the sample, amortize counts back up by the inverse sampling ratio).

    The reference samples with a seeded XORShift64; here the draw is the
    repo's deterministic md5(text)-threshold (the stratified_sample /
    mix_sources trick), which is seedless, shuffle- and cluster-size-stable,
    and SQL-mirrorable — so the entry stays hash-exact. Scale shape: the
    facet groupby sees ONLY the sampled hits; the totals are two scalar
    counts. est = n_sampled * total_hits // sampled_hits (exact integer
    math on both sides).

    Returns a pandas DataFrame (facet label, n_sampled, est) — label-sized.
    """
    import pandas as pd

    from ..stages.clean import mix_threshold_hex
    from ..stages.textstats import md5_hex_utf8

    thr = mix_threshold_hex(fraction)

    def hit_rows(batch: pa.Table) -> pa.Table:
        # explicit bool type: an all-false/empty list otherwise infers a
        # null-typed array (schema divergence across blocks, filter errors)
        keep = pa.array(
            [term in t.split() for t in batch.column(text_column).to_pylist()],
            type=pa.bool_(),
        )
        hits = batch.filter(keep)
        hx = md5_hex_utf8(hits.column(text_column))
        sampled = pa.array([h < thr for h in hx], type=pa.bool_())
        return pa.table(
            {
                facet_column: hits.column(facet_column),
                "sampled": sampled,
            }
        )

    # materialize the (facet label, sampled) pairs — hit-sized, two narrow
    # columns — so the three consumers below don't re-run the corpus scan
    hits = ds.map_batches(hit_rows, batch_format="pyarrow").materialize()
    total = hits.count()
    sample = hits.filter(expr="sampled == True")
    stotal = sample.count()
    per_label = sample.groupby(facet_column).count().to_pandas()
    if per_label.empty:  # zero-sample: empty frames lose their schema
        return pd.DataFrame(
            {facet_column: pd.Series([], dtype="object"),
             "n_sampled": pd.Series([], dtype="int64"),
             "est": pd.Series([], dtype="int64")}
        )
    per_label = per_label.rename(columns={"count()": "n_sampled"})
    per_label["est"] = (
        per_label["n_sampled"].astype("int64") * int(total) // int(stotal)
    ).astype("int64")
    return per_label.sort_values(facet_column).reset_index(drop=True)
