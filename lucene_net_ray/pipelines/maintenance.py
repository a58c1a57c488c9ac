"""Index maintenance: addIndexes, expunge-deletes, add/update docs, reopen.

  add_indexes      IndexWriter.AddIndexes analog (reference Index/IndexWriter.cs
                   AddIndexes(Directory[]): import foreign segments wholesale,
                   remapping docIDs by base offset — postings stay untouched
                   because their docIDs are segment-local; only each segment's
                   doc_base and its docs-table doc_id column shift).
  expunge_deletes  IndexWriter.ForceMergeDeletes analog: rewrite segments
                   dropping tombstoned docs with dense docID remapping
                   (MappingMultiDocsEnum semantics, reference
                   Codecs/MappingMultiDocsEnum.cs). docFreq / sumTotalTermFreq
                   shrink accordingly — authentic post-expunge statistics.
  add_documents    IndexWriter.AddDocument flush analog: append one new
                   segment to a committed index (NRT-style small flush).
  update_documents IndexWriter.UpdateDocument analog (IndexWriter.cs:1801):
                   atomically delete-by-key then add the replacements.
  reopen           SearcherManager.MaybeRefresh analog (reference
                   Search/SearcherManager.cs): a new point-in-time Searcher
                   from the current committed manifest; cheap because
                   segments are immutable.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..state.index import IndexMeta, write_index_manifest


def add_indexes(out_dir: str, *source_indexes: str | IndexMeta) -> IndexMeta:
    """Combine several committed indexes into a new one (copy-based import).

    Segments are renumbered sequentially; docIDs are re-based by prefix sums
    over the source order (deterministic: sources in the order given, each
    source's segments in seg_id order). Analyzer configs must match.
    """
    sources = [s if isinstance(s, IndexMeta) else IndexMeta(s) for s in source_indexes]
    if not sources:
        raise ValueError("no source indexes")
    analyzers = {json.dumps(s.manifest.get("analyzer"), sort_keys=True) for s in sources}
    if len(analyzers) != 1:
        raise ValueError("cannot add indexes with different analyzer configs")
    index_opts = {s.manifest.get("index_options", "freqs") for s in sources}

    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
    seg_rows = []
    new_id = 0
    doc_base = 0
    for src in sources:
        for seg_dir, row in zip(src.segment_dirs, src.manifest["segments"]):
            new_name = f"seg{new_id:06d}"
            dst = os.path.join(out_dir, "segments", new_name)
            if not os.path.exists(os.path.join(dst, "meta.json")):
                tmp = dst + f".tmp{os.getpid()}"
                shutil.copytree(seg_dir, tmp, dirs_exist_ok=True)
                # re-base the docs table's global doc_id column
                docs_path = os.path.join(tmp, "docs.parquet")
                t = pq.read_table(docs_path)
                n = t.num_rows
                t = t.set_column(
                    t.column_names.index("doc_id"),
                    "doc_id",
                    pa.array(doc_base + np.arange(n, dtype=np.int64)),
                )
                pq.write_table(t, docs_path)
                with open(os.path.join(tmp, "meta.json")) as f:
                    meta = json.load(f)
                meta["seg_id"] = new_id
                meta["name"] = new_name
                meta["doc_base"] = doc_base
                meta["lineage"] = {"imported_from": seg_dir, **meta.get("lineage", {})}
                with open(os.path.join(tmp, "meta.json"), "w") as f:
                    json.dump(meta, f, indent=1, sort_keys=True)
                if os.path.exists(dst):
                    shutil.rmtree(tmp)
                else:
                    os.replace(tmp, dst)
            seg_rows.append(
                {
                    "seg_id": new_id,
                    "doc_count": row["doc_count"],
                    "sum_ttf": row["sum_ttf"],
                    "term_count": row["term_count"],
                    "postings": row.get("postings", 0),
                    "postings_bytes": row.get("postings_bytes", 0),
                    "build_sec": row.get("build_sec", 0.0),
                }
            )
            doc_base += row["doc_count"]
            new_id += 1
    write_index_manifest(
        out_dir,
        {
            "version": 1,
            "index_options": index_opts.pop() if len(index_opts) == 1 else "freqs",
            "analyzer": sources[0].manifest.get("analyzer"),
            "content_column": sources[0].manifest.get("content_column"),
            "segments": seg_rows,
            "max_doc": doc_base,
            "sum_ttf": int(sum(r["sum_ttf"] for r in seg_rows)),
            "added_from": [s.index_dir for s in sources],
        },
    )
    return IndexMeta(out_dir)


def split_index(index_dir: str | IndexMeta, out_dirs: list[str]) -> list[IndexMeta]:
    """IndexSplitter analog (reference Misc/Index/IndexSplitter.cs): partition
    an index's segments contiguously into len(out_dirs) standalone indexes,
    re-basing docIDs per part (each part's docIDs restart at 0)."""
    src = index_dir if isinstance(index_dir, IndexMeta) else IndexMeta(index_dir)
    n_parts = len(out_dirs)
    seg_dirs = src.segment_dirs
    if n_parts < 1 or n_parts > len(seg_dirs):
        raise ValueError(f"cannot split {len(seg_dirs)} segments into {n_parts} parts")
    # contiguous slices, sizes as even as possible
    base, extra = divmod(len(seg_dirs), n_parts)
    out = []
    i = 0
    for p, out_dir in enumerate(out_dirs):
        take = base + (1 if p < extra else 0)
        part_dirs = seg_dirs[i : i + take]
        part_rows = src.manifest["segments"][i : i + take]
        i += take
        # reuse add_indexes' import machinery via a temporary single-part view
        os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
        seg_rows = []
        doc_base = 0
        for new_id, (seg_dir, row) in enumerate(zip(part_dirs, part_rows)):
            new_name = f"seg{new_id:06d}"
            dst = os.path.join(out_dir, "segments", new_name)
            if not os.path.exists(os.path.join(dst, "meta.json")):
                tmp = dst + f".tmp{os.getpid()}"
                shutil.copytree(seg_dir, tmp, dirs_exist_ok=True)
                docs_path = os.path.join(tmp, "docs.parquet")
                t = pq.read_table(docs_path)
                t = t.set_column(
                    t.column_names.index("doc_id"),
                    "doc_id",
                    pa.array(doc_base + np.arange(t.num_rows, dtype=np.int64)),
                )
                pq.write_table(t, docs_path)
                with open(os.path.join(tmp, "meta.json")) as f:
                    meta = json.load(f)
                meta.update(seg_id=new_id, name=new_name, doc_base=doc_base)
                meta["lineage"] = {"split_from": seg_dir, **meta.get("lineage", {})}
                with open(os.path.join(tmp, "meta.json"), "w") as f:
                    json.dump(meta, f, indent=1, sort_keys=True)
                if os.path.exists(dst):
                    shutil.rmtree(tmp)
                else:
                    os.replace(tmp, dst)
            seg_rows.append({**row, "seg_id": new_id})
            doc_base += row["doc_count"]
        write_index_manifest(
            out_dir,
            {
                "version": 1,
                "index_options": src.manifest.get("index_options", "freqs"),
                "analyzer": src.manifest.get("analyzer"),
                "content_column": src.manifest.get("content_column"),
                "segments": seg_rows,
                "max_doc": doc_base,
                "sum_ttf": int(sum(r["sum_ttf"] for r in seg_rows)),
                "split_from": src.index_dir,
            },
        )
        out.append(IndexMeta(out_dir))
    return out


def _expunge_segment_task(batch: pa.Table) -> pa.Table:
    """Rewrite one segment minus its tombstoned docs (stateless Ray task).

    Decodes the segment's doc/frq/pos streams in ONE vectorized pass each,
    masks postings of deleted docs, densely remaps local docIDs, and re-emits
    via the shared stream writer. Position streams need no re-delta: each
    posting's positions are self-contained (first delta is absolute)."""
    from ..functions import codec
    from ..state.segment import SegmentReader, _atomic_write_json, write_terms_and_postings

    out_rows = []
    for row in batch.to_pylist():
        seg_dir = row["seg_dir"]
        new_id = row["new_id"]
        new_base = row["new_base"]
        out_dir = row["out_dir"]
        local_dels = np.asarray(row["local_dels"], dtype=np.int64)
        seg_name = f"seg{new_id:06d}"
        final_dir = os.path.join(out_dir, "segments", seg_name)
        if os.path.exists(os.path.join(final_dir, "meta.json")):
            with open(os.path.join(final_dir, "meta.json")) as f:
                meta = json.load(f)
            out_rows.append(_seg_meta_row(meta))
            continue
        tmp = final_dir + f".tmp{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        r = SegmentReader(seg_dir)
        doc_count = r.doc_count
        live_mask = np.ones(doc_count, dtype=bool)
        live_mask[local_dels] = False
        n_live = int(live_mask.sum())

        docs_tbl = pq.read_table(os.path.join(seg_dir, "docs.parquet"))
        docs_tbl = docs_tbl.filter(pa.array(live_mask))
        docs_tbl = docs_tbl.set_column(
            docs_tbl.column_names.index("doc_id"),
            "doc_id",
            pa.array(new_base + np.arange(n_live, dtype=np.int64)),
        )

        n_terms = len(r.terms)
        if n_terms and local_dels.size:
            df = r._df.astype(np.int64)
            post = r._post
            doc_end = int(r._doc_off[-1] + r._doc_len[-1])
            frq_start = int(r._frq_off[0])
            frq_end = int(r._frq_off[-1] + r._frq_len[-1])
            deltas = codec.vbyte_decode(post[0:doc_end]).astype(np.int64)
            tfs = codec.vbyte_decode(post[frq_start:frq_end]).astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(df)))[:-1]
            cum = np.cumsum(deltas)
            term_base = cum[starts] - deltas[starts]
            docs_local = cum - np.repeat(term_base, df)
            codes = np.repeat(np.arange(n_terms, dtype=np.int64), df)
            keep = live_mask[docs_local]
            new_id_of = np.cumsum(live_mask) - 1  # old local -> new local (live only)
            docs_new = new_id_of[docs_local[keep]]
            codes_k = codes[keep]
            tfs_k = tfs[keep]
            if r.has_positions:
                pos_start = int(r._pos_off[0])
                pos_end = int(r._pos_off[-1] + r._pos_len[-1])
                pos_all = codec.vbyte_decode(post[pos_start:pos_end]).astype(np.int64)
                occ_keep = np.repeat(keep, tfs)
                pos_deltas_k = pos_all[occ_keep]
            else:
                pos_deltas_k = None
            uniq_codes, codes_dense = np.unique(codes_k, return_inverse=True)
            uniq_terms_new = r._terms.take(pa.array(uniq_codes, type=pa.int64()))
            norms_new = docs_tbl.column("norm").to_numpy()
            enc = write_terms_and_postings(
                tmp,
                uniq_terms=uniq_terms_new,
                codes=codes_dense.astype(np.int64),
                docs_sorted=docs_new,
                tfs_sorted=tfs_k,
                pos_deltas=pos_deltas_k,
                norms=norms_new,
            )
        else:
            # nothing deleted in this segment: reuse postings files verbatim
            shutil.copy2(os.path.join(seg_dir, "terms.parquet"), os.path.join(tmp, "terms.parquet"))
            shutil.copy2(os.path.join(seg_dir, "postings.bin"), os.path.join(tmp, "postings.bin"))
            enc = {
                "term_count": r.meta["term_count"],
                "postings": r.meta["postings"],
                "postings_bytes": r.meta["postings_bytes"],
            }
        pq.write_table(docs_tbl, os.path.join(tmp, "docs.parquet"))
        sum_ttf = int(docs_tbl.column("field_len").to_numpy().astype(np.int64).sum()) if n_live else 0
        meta = {
            **r.meta,
            "seg_id": new_id,
            "name": seg_name,
            "doc_base": int(new_base),
            "doc_count": n_live,
            "sum_ttf": sum_ttf,
            "term_count": enc["term_count"],
            "postings": enc["postings"],
            "postings_bytes": enc["postings_bytes"],
            "lineage": {"expunged_from": seg_dir, "n_deleted": int(local_dels.size)},
        }
        meta["metrics"] = {**r.meta.get("metrics", {}), "tokens": sum_ttf}
        _atomic_write_json(os.path.join(tmp, "meta.json"), meta)
        if os.path.exists(final_dir):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            os.replace(tmp, final_dir)
        out_rows.append(_seg_meta_row(meta))
    return pa.Table.from_pylist(out_rows)


def _seg_meta_row(meta: dict) -> dict:
    return {
        "seg_id": meta["seg_id"],
        "doc_count": meta["doc_count"],
        "sum_ttf": meta["sum_ttf"],
        "term_count": meta["term_count"],
        "postings": meta.get("postings", 0),
        "postings_bytes": meta.get("postings_bytes", 0),
        "build_sec": meta.get("metrics", {}).get("build_sec", 0.0),
    }


def expunge_deletes(index_dir: str | IndexMeta, out_dir: str) -> IndexMeta:
    """Drop tombstoned docs from every segment, densely remapping docIDs.

    ForceMergeDeletes analog: 100%-deleted segments are dropped, surviving
    segments are renumbered, docIDs are re-based by prefix sums over live
    counts, and docFreq / ttf / sum_ttf shrink to the live corpus (authentic
    post-expunge Lucene statistics — idf changes are expected). Runs one Ray
    task per segment; the tombstone set ships once in each task's descriptor
    row (at extreme delete volumes this would become a Dataset join against
    the docs tables instead).
    """
    import ray
    import ray.data

    src = index_dir if isinstance(index_dir, IndexMeta) else IndexMeta(index_dir)
    from ..state.deletes import load_deleted

    deleted = load_deleted(src.index_dir)
    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)

    rows = []
    old_base = 0
    new_base = 0
    new_id = 0
    for seg_dir, seg_row in zip(src.segment_dirs, src.manifest["segments"]):
        count = seg_row["doc_count"]
        local = deleted[(deleted >= old_base) & (deleted < old_base + count)] - old_base
        n_live = count - local.size
        if n_live > 0:
            rows.append(
                {
                    "seg_dir": seg_dir,
                    "new_id": new_id,
                    "new_base": new_base,
                    "out_dir": out_dir,
                    "local_dels": local.tolist(),
                }
            )
            new_id += 1
            new_base += n_live
        old_base += count

    ds = ray.data.from_items(rows)
    seg_rows = ds.map_batches(
        _expunge_segment_task, batch_size=None, batch_format="pyarrow", num_cpus=1
    ).take_all()
    seg_rows.sort(key=lambda r: r["seg_id"])
    write_index_manifest(
        out_dir,
        {
            "version": 1,
            "index_options": src.manifest.get("index_options", "freqs"),
            "analyzer": src.manifest.get("analyzer"),
            "content_column": src.manifest.get("content_column"),
            "segments": seg_rows,
            "max_doc": int(sum(r["doc_count"] for r in seg_rows)),
            "sum_ttf": int(sum(r["sum_ttf"] for r in seg_rows)),
            "expunged_from": src.index_dir,
            "n_expunged": int(deleted.size),
        },
    )
    return IndexMeta(out_dir)


def add_documents(
    index_dir: str,
    table: pa.Table,
    *,
    stored_columns: tuple[str, ...] = (),
) -> IndexMeta:
    """Append one new segment to a committed index (NRT-style small flush).

    The analyzer / content column / index options come from the index's own
    manifest, so the new segment is guaranteed chain-compatible."""
    from ..functions.analysis import Analyzer
    from ..state.segment import build_segment

    src = IndexMeta(index_dir)
    cfg = src.manifest.get("analyzer") or {"kind": "standard"}
    analyzer = Analyzer(
        kind=cfg.get("kind", "standard"),
        stop_words=frozenset(cfg.get("stop_words", [])),
        max_token_length=cfg.get("max_token_length", 255),
        ascii_fold=cfg.get("ascii_fold", False),
    )
    new_id = 1 + max(r["seg_id"] for r in src.manifest["segments"]) if src.manifest["segments"] else 0
    meta = build_segment(
        table,
        seg_id=new_id,
        doc_base=src.max_doc,
        out_dir=os.path.join(index_dir, "segments"),
        analyzer=analyzer,
        content_column=src.manifest.get("content_column", "content"),
        stored_columns=stored_columns,
        index_options=src.manifest.get("index_options", "freqs"),
        lineage={"added_via": "add_documents"},
    )
    manifest = dict(src.manifest)
    manifest["segments"] = src.manifest["segments"] + [_seg_meta_row(meta)]
    manifest["max_doc"] = src.max_doc + meta["doc_count"]
    manifest["sum_ttf"] = src.sum_ttf + meta["sum_ttf"]
    write_index_manifest(index_dir, manifest)
    return IndexMeta(index_dir)


def update_documents(
    index_dir: str,
    table: pa.Table,
    key_column: str,
    *,
    stored_columns: tuple[str, ...] = (),
) -> dict:
    """UpdateDocument analog: tombstone every doc whose stored ``key_column``
    matches a key in ``table``, then append the replacements as a new segment
    (reference IndexWriter.cs:1801 UpdateDocument = delete-by-term + add).

    Requires ``key_column`` to have been a stored column at build time.
    Returns {"deleted": n, "added": n}."""
    src = IndexMeta(index_dir)
    keys = set(table.column(key_column).to_pylist())
    doomed: list[int] = []
    for seg_dir in src.segment_dirs:
        t = pq.read_table(os.path.join(seg_dir, "docs.parquet"), columns=["doc_id", key_column])
        mask = pa.compute.is_in(t.column(key_column), value_set=pa.array(sorted(keys)))
        doomed.extend(t.filter(mask).column("doc_id").to_pylist())
    if doomed:
        from ..state.deletes import write_deletes

        write_deletes(index_dir, doomed)
    cols = tuple(dict.fromkeys((key_column, *stored_columns)))
    add_documents(index_dir, table, stored_columns=cols)
    return {"deleted": len(doomed), "added": table.num_rows}


def reopen(index_dir: str, num_actors: int = 4, use_actors: bool = False):
    """Fresh point-in-time Searcher over the current committed manifest."""
    from .search import Searcher

    return Searcher(IndexMeta(index_dir), num_actors=num_actors, use_actors=use_actors)


def sort_index(
    input_path: str | list[str],
    out_dir: str,
    *,
    sort_field: str,
    descending: bool = False,
    target_rows_per_segment: int = 100_000,
    **build_kwargs,
) -> IndexMeta:
    """SortingMergePolicy analog (reference Index/Sorter/SortingMergePolicy.cs
    + SortingAtomicReader.cs): build the index in ``sort_field`` order. The
    Ray-Data expression is STRONGER than the reference's within-segment
    sort: one global ``ds.sort`` range-partitions the corpus, so segments
    are disjoint sort-key ranges and a sorted search can skip whole
    segments, not just early-terminate within one (the
    EarlyTerminatingSortingCollector.cs win, lifted to the segment level).

    The manifest records ``sorted_by`` and each segment's exact (min, max)
    key — first/last row of its docs table, exact because docs are written
    in sort order. ``sort_field`` is added to stored_columns automatically.
    """
    import pyarrow.parquet as pq
    import ray.data

    from .build import build_index

    stored = tuple(build_kwargs.pop("stored_columns", ()))
    if sort_field not in stored:
        stored = (*stored, sort_field)
    sorted_dir = os.path.join(out_dir, "_sorted_corpus")
    if not os.path.exists(os.path.join(sorted_dir, "_done")):
        os.makedirs(sorted_dir, exist_ok=True)
        ds = ray.data.read_parquet(input_path)
        ds.sort(sort_field, descending=descending).write_parquet(
            sorted_dir, row_group_size=target_rows_per_segment
        )
        with open(os.path.join(sorted_dir, "_done"), "w") as f:
            f.write("ok")
    meta = build_index(
        sorted_dir,
        out_dir,
        stored_columns=stored,
        target_rows_per_segment=target_rows_per_segment,
        **build_kwargs,
    )
    # exact per-segment key ranges: first/last row of the sorted docs table
    manifest = dict(meta.manifest)
    seg_rows = [dict(r) for r in manifest["segments"]]
    for d, row in zip(meta.segment_dirs, seg_rows):
        pf = pq.ParquetFile(os.path.join(d, "docs.parquet"))
        first = pf.read_row_group(0, columns=[sort_field]).column(sort_field)[0].as_py()
        last = pf.read_row_group(
            pf.metadata.num_row_groups - 1, columns=[sort_field]
        ).column(sort_field)[-1].as_py()
        pf.close()
        lo, hi = (last, first) if descending else (first, last)
        row["sort_min"], row["sort_max"] = lo, hi
    manifest["segments"] = seg_rows
    manifest["sorted_by"] = [sort_field, bool(descending)]
    write_index_manifest(out_dir, manifest)
    return IndexMeta(out_dir)


def _clone_with_tombstones(src: IndexMeta, tombstones: "np.ndarray") -> str:
    """Hardlink clone of an index's immutable segments (O(files), no data
    copy) carrying a fresh tombstone set — the shared substrate of the
    filter/round-robin splitters."""
    import tempfile

    from ..state.deletes import write_deletes

    tmp = tempfile.mkdtemp(prefix="lnr_split_", dir="/tmp")
    os.makedirs(os.path.join(tmp, "segments"))
    for d in src.segment_dirs:
        dst = os.path.join(tmp, "segments", os.path.basename(d.rstrip("/")))
        os.makedirs(dst)
        for f in os.listdir(d):
            try:
                os.link(os.path.join(d, f), os.path.join(dst, f))
            except OSError:
                shutil.copy2(os.path.join(d, f), os.path.join(dst, f))
    write_index_manifest(tmp, dict(src.manifest))
    if tombstones.size:
        write_deletes(tmp, tombstones)
    return tmp


def split_index_round_robin(
    index_dir: str | IndexMeta, out_dirs: list[str]
) -> list[IndexMeta]:
    """MultiPassIndexSplitter analog (reference
    Misc/Index/MultiPassIndexSplitter.cs: N passes over the source, each
    keeping every Nth doc via negated-deletes views, then rewriting): part p
    keeps live docs with position % N == p; each part is a hardlink clone +
    complement tombstones pushed through the expunge rewrite (one Ray task
    per segment per part — the reference's N passes, parallelized)."""
    from ..state.deletes import load_deleted

    src = index_dir if isinstance(index_dir, IndexMeta) else IndexMeta(index_dir)
    n = len(out_dirs)
    if n < 1:
        raise ValueError("need at least one output")
    alive = np.setdiff1d(
        np.arange(src.max_doc, dtype=np.int64), load_deleted(src.index_dir),
        assume_unique=True,
    )
    out = []
    all_ids = np.arange(src.max_doc, dtype=np.int64)
    for p, out_dir in enumerate(out_dirs):
        keep = alive[p::n]
        tmp = _clone_with_tombstones(src, np.setdiff1d(all_ids, keep))
        try:
            out.append(expunge_deletes(tmp, out_dir))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    return out


def split_index_by_filter(
    index_dir: str | IndexMeta, out_a: str, out_b: str, q
) -> tuple[IndexMeta, IndexMeta]:
    """PKIndexSplitter analog (reference Misc/Index/PKIndexSplitter.cs:
    partition one index into two by a query/filter — docs MATCHING ``q`` go
    to ``out_a``, the rest to ``out_b``, both densely renumbered with
    authentic post-split statistics).

    Plan: evaluate the filter once (per-segment scorers, membership only),
    clone the immutable segments into two temp views by HARDLINK (O(files),
    no data copy), write each view's complement as tombstones, and reuse the
    expunge pipeline (one Ray task per segment) for the rewrite — the same
    machinery ForceMergeDeletes exercises, so remapping and stat shrinkage
    are already tested. The matching-id array is the only driver-resident
    state (8 bytes/doc; the reference's per-segment bitset equivalent)."""
    import tempfile

    from ..state.deletes import load_deleted, write_deletes
    from .search import Searcher

    src = index_dir if isinstance(index_dir, IndexMeta) else IndexMeta(index_dir)
    s = Searcher(src, use_actors=False)
    matching = np.unique(
        np.array([d for d, _ in s.scored_docs(q)], dtype=np.int64)
    )
    already = load_deleted(src.index_dir)
    alive = np.setdiff1d(
        np.arange(src.max_doc, dtype=np.int64), already, assume_unique=True
    )
    match_alive = np.intersect1d(matching, alive, assume_unique=True)
    rest_alive = np.setdiff1d(alive, match_alive, assume_unique=True)

    tmp_a = _clone_with_tombstones(
        src, np.setdiff1d(np.arange(src.max_doc, dtype=np.int64), match_alive)
    )
    tmp_b = _clone_with_tombstones(
        src, np.setdiff1d(np.arange(src.max_doc, dtype=np.int64), rest_alive)
    )
    try:
        meta_a = expunge_deletes(tmp_a, out_a)
        meta_b = expunge_deletes(tmp_b, out_b)
    finally:
        shutil.rmtree(tmp_a, ignore_errors=True)
        shutil.rmtree(tmp_b, ignore_errors=True)
    return meta_a, meta_b
