"""Index maintenance utilities: addIndexes, NRT-style reopen.

  add_indexes   IndexWriter.AddIndexes analog (reference Index/IndexWriter.cs
                AddIndexes(Directory[]): import foreign segments wholesale,
                remapping docIDs by base offset — postings stay untouched
                because their docIDs are segment-local; only each segment's
                doc_base and its docs-table doc_id column shift).
  reopen        SearcherManager.MaybeRefresh analog (reference
                Search/SearcherManager.cs): a new point-in-time Searcher from
                the current committed manifest; cheap because segments are
                immutable.
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


def reopen(index_dir: str, num_actors: int = 4, use_actors: bool = False):
    """Fresh point-in-time Searcher over the current committed manifest."""
    from .search import Searcher

    return Searcher(IndexMeta(index_dir), num_actors=num_actors, use_actors=use_actors)
