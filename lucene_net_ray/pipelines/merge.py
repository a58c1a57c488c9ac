"""Segment merge — the one true shuffle (SURVEY.md §2.5, §7.4).

Reference analog: SegmentMerger's k-way merge of sorted TermsEnums with docID
remapping (/root/reference/src/Lucene.Net.Core/Index/SegmentMerger.cs:89-176)
driven by TieredMergePolicy. Because per-segment docID ranges are disjoint and
ordered (doc_base prefix sums), a term's merged posting list is the
concatenation of its per-segment lists in segment order — no re-sort, just an
O(1) splice of each chunk's first vByte delta (codec.splice_first_delta) and a
block-directory rebase.

Skew handling (head terms like 'public'/'import' with df ~ corpus size):
the shuffle key is (term, bucket) with bucket = seg_id // bucket_size, so no
reduce task ever holds more than ``bucket_size`` segments' worth of one term's
postings. Head terms stay SHARDED on disk as multiple chunk rows — the reader
and block-max WAND consume them chunk-/block-wise anyway, so there is no
level-2 concatenation at all. This is the explicit design answer to "a head
posting list must never sit in one reduce task" (SURVEY.md §4 skew row).

Global term statistics (df/ttf summed across segments) fall out of the same
pipeline for free and are also available separately via ``global_term_stats``
(small rows only, no blobs).
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..functions import codec
from ..state.index import IndexMeta, write_index_manifest
from ..state.segment import SegmentReader


def _segment_term_rows(batch: pa.Table, *, with_blobs: bool, bucket_size: int = 8) -> pa.Table:
    """flat_map one segment-descriptor row -> one row per term in the segment."""
    out_tables = []
    for row in batch.to_pylist():
        seg_dir = row["seg_dir"]
        r = SegmentReader(seg_dir)
        n = len(r.terms)
        terms_list = list(r.terms)
        cols: dict = {
            "term": pa.array(terms_list, type=pa.string()),
            "seg_id": pa.array(np.full(n, row["seg_id"], dtype=np.int64)),
            "bucket": pa.array(np.full(n, row["seg_id"] // bucket_size, dtype=np.int64)),
            # coarse shuffle key: one map_groups UDF call per (term,bucket)
            # group would dominate at real vocab sizes; hash terms into a
            # bounded number of groups and split exact runs inside the UDF
            "coarse": pa.array(
                np.array([zlib.crc32(t.encode()) & 0x7FF for t in terms_list], dtype=np.int64)
            ),
            "df": pa.array(r.df_array.astype(np.int64)),
            "ttf": pa.array(r.ttf_array.astype(np.int64)),
        }
        if with_blobs:
            post = r._post
            has_pos = r.has_positions
            doc_blobs, frq_blobs, pos_blobs = [], [], []
            first_docs = np.empty(n, dtype=np.int64)
            last_docs = np.empty(n, dtype=np.int64)
            tbl = pq.read_table(os.path.join(seg_dir, "terms.parquet"))
            blk_last = tbl.column("blk_last_doc")
            blk_doc_boff = tbl.column("blk_doc_boff")
            blk_frq_boff = tbl.column("blk_frq_boff")
            blk_max_tf = tbl.column("blk_max_tf")
            blk_min_normb = tbl.column("blk_min_normb")
            for i in range(n):
                do, dl = r._doc_off[i], r._doc_len[i]
                fo, fl = r._frq_off[i], r._frq_len[i]
                doc_blobs.append(post[do : do + dl].tobytes())
                frq_blobs.append(post[fo : fo + fl].tobytes())
                if has_pos:
                    po, pl = r._pos_off[i], r._pos_len[i]
                    pos_blobs.append(post[po : po + pl].tobytes())
                else:
                    pos_blobs.append(b"")
                lasts = blk_last[i].as_py()
                last_docs[i] = lasts[-1]
                # first docid = first delta of the stream
                first_docs[i] = int(codec.vbyte_decode(post[do : do + min(dl, 10)])[0])
            base = row["doc_base"]
            cols.update(
                {
                    "doc_blob": pa.array(doc_blobs, type=pa.large_binary()),
                    "frq_blob": pa.array(frq_blobs, type=pa.large_binary()),
                    "pos_blob": pa.array(pos_blobs, type=pa.large_binary()),
                    "first_doc": pa.array(first_docs + base),
                    "last_doc": pa.array(last_docs + base),
                    "blk_last_doc": _rebase_list(blk_last, base),
                    "blk_doc_boff": blk_doc_boff.combine_chunks(),
                    "blk_frq_boff": blk_frq_boff.combine_chunks(),
                    "blk_max_tf": blk_max_tf.combine_chunks(),
                    "blk_min_normb": blk_min_normb.combine_chunks(),
                }
            )
        out_tables.append(pa.table(cols))
    return pa.concat_tables(out_tables) if out_tables else pa.table({})


def _rebase_list(chunked, base: int):
    arr = chunked.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = pa.compute.add(arr.flatten(), base)
    return pa.ListArray.from_arrays(arr.offsets, flat)


def global_term_stats(index: IndexMeta, num_partitions: int | None = None) -> ray.data.Dataset:
    """(term, df, ttf) summed across segments via a groupby(term) shuffle.

    Rows are small (no posting blobs): each segment's term table is already
    per-term pre-aggregated, so this is the cheapest possible exchange.
    """
    seg_rows = [
        {"seg_dir": d, "seg_id": r["seg_id"], "doc_base": 0}
        for d, r in zip(index.segment_dirs, index.manifest["segments"])
    ]
    ds = ray.data.from_items(seg_rows).repartition(len(seg_rows))
    terms = ds.map_batches(
        _segment_term_rows, fn_kwargs={"with_blobs": False}, batch_format="pyarrow", batch_size=None
    )
    agg = terms.groupby("term").sum(["df", "ttf"])
    return agg.rename_columns({"sum(df)": "df", "sum(ttf)": "ttf"})


def high_freq_terms(index: IndexMeta, k: int = 20) -> ray.data.Dataset:
    """Top-k terms by document frequency (HighFreqTerms analog,
    /root/reference/src/Lucene.Net.Misc/Misc/HighFreqTerms.cs) — also the
    skew-detection probe for merge bucketing."""
    stats = global_term_stats(index)
    return stats.sort(["df", "term"], descending=[True, False]).limit(k)


def _merge_term_group(group: pa.Table) -> pa.Table:
    """One coarse group: split into exact (term, bucket) runs, merge each."""
    rows_all = group.to_pylist()
    rows_all.sort(key=lambda x: (x["term"], x["bucket"], x["seg_id"]))
    outs = []
    i = 0
    while i < len(rows_all):
        j = i
        while (
            j < len(rows_all)
            and rows_all[j]["term"] == rows_all[i]["term"]
            and rows_all[j]["bucket"] == rows_all[i]["bucket"]
        ):
            j += 1
        outs.append(_merge_one_run(rows_all[i:j]))
        i = j
    return pa.concat_tables(outs)


def _merge_one_run(rows: list[dict]) -> pa.Table:
    """Ordered chunk concat for one (term, bucket) run (already seg-sorted)."""
    doc_parts: list[bytes] = []
    frq_parts: list[bytes] = []
    pos_parts: list[bytes] = []
    blk_last: list[int] = []
    blk_doc_boff: list[int] = []
    blk_frq_boff: list[int] = []
    blk_max_tf: list[int] = []
    blk_min_normb: list[int] = []
    prev_last = None
    doc_pos = 0
    frq_pos = 0
    df = ttf = 0
    for r in rows:
        blob = r["doc_blob"]
        if prev_last is not None:
            blob = codec.splice_first_delta(blob, r["first_doc"] - prev_last)
        else:
            blob = codec.splice_first_delta(blob, r["first_doc"])  # local->global first delta
        doc_parts.append(blob)
        frq_parts.append(r["frq_blob"])
        pos_parts.append(r.get("pos_blob") or b"")
        shift = len(blob) - len(r["doc_blob"])  # first-delta splice may change length
        # block 0 still starts at the chunk head; later blocks shift with it
        blk_doc_boff.extend([doc_pos + (b + shift if b > 0 else 0) for b in r["blk_doc_boff"]])
        blk_frq_boff.extend([frq_pos + b for b in r["blk_frq_boff"]])
        blk_last.extend(r["blk_last_doc"])
        blk_max_tf.extend(r["blk_max_tf"])
        blk_min_normb.extend(r["blk_min_normb"])
        doc_pos += len(blob)
        frq_pos += len(r["frq_blob"])
        prev_last = r["last_doc"]
        df += r["df"]
        ttf += r["ttf"]
    return pa.table(
        {
            "term": [rows[0]["term"]],
            "bucket": [rows[0]["bucket"]],
            "df": pa.array([df], type=pa.int64()),
            "ttf": pa.array([ttf], type=pa.int64()),
            "first_seg": pa.array([rows[0]["seg_id"]], type=pa.int64()),
            "doc_blob": pa.array([b"".join(doc_parts)], type=pa.large_binary()),
            "frq_blob": pa.array([b"".join(frq_parts)], type=pa.large_binary()),
            "pos_blob": pa.array([b"".join(pos_parts)], type=pa.large_binary()),
            "blk_last_doc": pa.array([blk_last], type=pa.list_(pa.int64())),
            "blk_doc_boff": pa.array([blk_doc_boff], type=pa.list_(pa.int64())),
            "blk_frq_boff": pa.array([blk_frq_boff], type=pa.list_(pa.int64())),
            "blk_max_tf": pa.array([blk_max_tf], type=pa.list_(pa.int64())),
            "blk_min_normb": pa.array([blk_min_normb], type=pa.list_(pa.uint8())),
        }
    )


def merge_index(index: IndexMeta | str, out_dir: str, *, bucket_size: int = 8) -> str:
    """Compact a segmented index into a term-partitioned merged index.

    ForceMerge analog (/root/reference/src/Lucene.Net.Core/Index/IndexWriter.cs:2099)
    with TieredMergePolicy's bounded-inputs-per-merge idea expressed as the
    (term, bucket) shuffle key. Output under ``out_dir``:
      parts/part-*.parquet   chunked term entries (term, bucket, blobs, blocks)
      docs/docs-*.parquet    per-source-segment doc tables (global docIDs)
      manifest.json
    Postings in the merged index carry GLOBAL docIDs.
    """
    index = index if isinstance(index, IndexMeta) else IndexMeta(index)
    os.makedirs(os.path.join(out_dir, "parts"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "docs"), exist_ok=True)

    seg_rows = [
        {"seg_dir": d, "seg_id": r["seg_id"], "doc_base": _doc_base(index, r["seg_id"])}
        for d, r in zip(index.segment_dirs, index.manifest["segments"])
    ]
    ds = ray.data.from_items(seg_rows).repartition(len(seg_rows))
    term_rows = ds.map_batches(
        _segment_term_rows,
        fn_kwargs={"with_blobs": True, "bucket_size": bucket_size},
        batch_format="pyarrow",
        batch_size=None,
    )
    merged = term_rows.groupby("coarse").map_groups(_merge_term_group, batch_format="pyarrow")
    merged.write_parquet(os.path.join(out_dir, "parts"))

    # docs: copy per-segment doc tables, already global docIDs
    for d in index.segment_dirs:
        t = pq.read_table(os.path.join(d, "docs.parquet"))
        pq.write_table(t, os.path.join(out_dir, "docs", os.path.basename(d) + ".parquet"))

    write_index_manifest(
        out_dir,
        {
            "version": 1,
            "kind": "merged",
            "max_doc": index.max_doc,
            "sum_ttf": index.sum_ttf,
            "bucket_size": bucket_size,
            "index_options": index.manifest.get("index_options", "freqs"),
            "source": index.index_dir,
            "analyzer": index.manifest.get("analyzer"),
            "segments": index.manifest["segments"],
        },
    )
    return out_dir


def _doc_base(index: IndexMeta, seg_id: int) -> int:
    base = 0
    for r in index.manifest["segments"]:
        if r["seg_id"] == seg_id:
            return base
        base += r["doc_count"]
    raise KeyError(seg_id)


class MergedIndexReader:
    """Facade over a merged (term-partitioned, chunked) index.

    Exposes the SegmentReader interface the scorer needs — postings() returns
    GLOBAL docids (doc_base 0, norms indexed globally) — so SegmentScorer
    works unchanged. Head terms may be several chunk rows; they are decoded
    chunk-wise and concatenated (already globally docid-ordered by bucket).
    """

    def __init__(self, out_dir: str):
        with open(os.path.join(out_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        parts_dir = os.path.join(out_dir, "parts")
        files = sorted(
            os.path.join(parts_dir, f) for f in os.listdir(parts_dir) if f.endswith(".parquet")
        )
        self._tbl = pa.concat_tables([pq.read_table(f) for f in files]).sort_by(
            [("term", "ascending"), ("bucket", "ascending")]
        )
        self._term_np = np.asarray(self._tbl.column("term").to_pylist(), dtype=object)
        self._df = self._tbl.column("df").to_numpy()
        self._ttf = self._tbl.column("ttf").to_numpy()
        docs_dir = os.path.join(out_dir, "docs")
        dfiles = sorted(os.path.join(docs_dir, f) for f in os.listdir(docs_dir))
        docs = pa.concat_tables([pq.read_table(f) for f in dfiles]).sort_by("doc_id")
        self.norms = docs.column("norm").to_numpy()
        self.doc_base = 0
        self.doc_count = self.manifest["max_doc"]
        self.sum_ttf = self.manifest["sum_ttf"]

    @property
    def terms(self) -> np.ndarray:
        # unique sorted terms (chunk rows repeat a term); fine for expansion scans
        return np.unique(self._term_np)

    def _row_range(self, term: str) -> tuple[int, int]:
        lo = int(np.searchsorted(self._term_np, term, side="left"))
        hi = int(np.searchsorted(self._term_np, term, side="right"))
        return lo, hi

    def term_stats(self, term: str) -> tuple[int, int]:
        lo, hi = self._row_range(term)
        if lo == hi:
            return 0, 0
        return int(self._df[lo:hi].sum()), int(self._ttf[lo:hi].sum())

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        lo, hi = self._row_range(term)
        if lo == hi:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        doc_parts, tf_parts = [], []
        for i in range(lo, hi):
            db = self._tbl.column("doc_blob")[i].as_py()
            fb = self._tbl.column("frq_blob")[i].as_py()
            d, t = codec.decode_postings(db, fb)
            doc_parts.append(d)
            tf_parts.append(t)
        return np.concatenate(doc_parts), np.concatenate(tf_parts)

    @property
    def has_positions(self) -> bool:
        return "pos_blob" in self._tbl.column_names and self.manifest.get("index_options") == "positions"

    def positions(self, term: str):
        """(docids, tfs, flat_positions, occ_offsets) — see SegmentReader."""
        if not self.has_positions:
            raise ValueError("merged index was built without positions")
        lo, hi = self._row_range(term)
        e = np.empty(0, dtype=np.int64)
        if lo == hi:
            return e, e, e, np.zeros(1, dtype=np.int64)
        doc_parts, tf_parts, flat_parts = [], [], []
        for i in range(lo, hi):
            d, t = codec.decode_postings(
                self._tbl.column("doc_blob")[i].as_py(), self._tbl.column("frq_blob")[i].as_py()
            )
            deltas = codec.vbyte_decode(
                np.frombuffer(self._tbl.column("pos_blob")[i].as_py(), dtype=np.uint8)
            ).astype(np.int64)
            occ = np.concatenate(([0], np.cumsum(t)))
            flat = np.cumsum(deltas)
            if d.size > 1:
                flat -= np.repeat(np.concatenate(([0], flat[occ[1:-1] - 1])), t)
            doc_parts.append(d)
            tf_parts.append(t)
            flat_parts.append(flat)
        docids = np.concatenate(doc_parts)
        tfs = np.concatenate(tf_parts)
        flatp = np.concatenate(flat_parts)
        return docids, tfs, flatp, np.concatenate(([0], np.cumsum(tfs)))


class MergedSearcher:
    """Search interface over a merged index (same results as the segmented
    Searcher — asserted by the merge-equivalence tests)."""

    def __init__(self, out_dir: str):
        from .scorer import SegmentScorer, expand_multiterm, query_terms

        self.reader = MergedIndexReader(out_dir)
        self._SegmentScorer = SegmentScorer
        self._expand = expand_multiterm
        self._query_terms = query_terms

    def _stats(self, q) -> dict:
        terms = sorted(self._query_terms(q))
        df = {t: self.reader.term_stats(t)[0] for t in terms}
        return {"max_doc": self.reader.doc_count, "sum_ttf": self.reader.sum_ttf, "df": df}

    def search(self, q, k: int = 10):
        scorer = self._SegmentScorer(self.reader, self._stats(q))
        return scorer.top_k(q, k)

    def count(self, q) -> int:
        return self._SegmentScorer(self.reader, self._stats(q)).count(q)
