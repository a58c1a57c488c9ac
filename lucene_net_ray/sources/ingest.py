"""Corpus ingestion: normalize JSONL / CSV / text sources into the
canonical Parquet corpus layout that ``build_index`` (and every stage
operator) consumes.

The reference indexes ``Document`` objects fed by user code from arbitrary
sources; this repo's equivalent contract is "a Parquet directory with a
content column". ``ingest_corpus`` closes the gap for the common raw
formats, as a streaming Ray Data pipeline (no driver materialization):

  jsonl      one JSON object per line  -> columns as-is
  csv        header row                -> columns as-is
  text       one document per LINE     -> content column
  textfiles  one document per FILE     -> content + source_file columns

Output is written with bounded rows per file / row group so the index
builder's shard planner (sources/sharding.py — row-group granular) can
honor ``target_rows_per_segment``. Within one ingest output the corpus is
a fixed file set, so build-time doc ids stay deterministic for
checkpoint/resume; re-INGESTING may reorder rows across output files
(Ray task completion order), which is a new corpus, not a resume.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

_FORMATS = ("jsonl", "csv", "text", "textfiles", "parquet")


def read_corpus(
    input_path: str | list[str],
    *,
    format: str = "jsonl",
    content_column: str = "content",
    encoding: str = "utf-8",
) -> ray.data.Dataset:
    """Read a raw corpus as a Dataset whose text lives in ``content_column``.

    For ``text`` the single line column is renamed; for ``textfiles`` each
    file becomes one row (decoded bytes) with its path kept in
    ``source_file`` for provenance. ``jsonl``/``csv``/``parquet`` keep
    their own columns and must already contain ``content_column``.
    """
    if format not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {format!r}")
    if format == "jsonl":
        ds = ray.data.read_json(input_path)
    elif format == "csv":
        ds = ray.data.read_csv(input_path)
    elif format == "parquet":
        ds = ray.data.read_parquet(input_path)
    elif format == "text":
        ds = ray.data.read_text(input_path, encoding=encoding)

        def rename_line(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                [content_column if c == "text" else c for c in batch.column_names]
            )

        return ds.map_batches(rename_line, batch_format="pyarrow")
    else:  # textfiles
        ds = ray.data.read_binary_files(input_path, include_paths=True)

        def decode_files(batch: pa.Table) -> pa.Table:
            texts = [
                b.as_py().decode(encoding, errors="replace")
                for b in batch.column("bytes")
            ]
            return pa.table(
                {
                    content_column: pa.array(texts, type=pa.string()),
                    "source_file": batch.column("path"),
                }
            )

        return ds.map_batches(decode_files, batch_format="pyarrow")

    def check_content(batch: pa.Table) -> pa.Table:
        if content_column not in batch.column_names:
            raise ValueError(
                f"{format} input has no {content_column!r} column; "
                f"columns: {batch.column_names}"
            )
        return batch

    return ds.map_batches(check_content, batch_format="pyarrow")


def ingest_corpus(
    input_path: str | list[str],
    out_dir: str,
    *,
    format: str = "jsonl",
    content_column: str = "content",
    encoding: str = "utf-8",
    rows_per_file: int = 100_000,
) -> str:
    """Normalize a raw corpus into a Parquet corpus dir and return it.

    ``rows_per_file`` bounds both the parquet file and row-group size so
    the shard planner can split segments at ``target_rows_per_segment``
    granularity (a single huge row group would defeat it).
    """
    ds = read_corpus(
        input_path,
        format=format,
        content_column=content_column,
        encoding=encoding,
    )
    ds.write_parquet(
        out_dir,
        max_rows_per_file=rows_per_file,
        row_group_size=min(rows_per_file, 100_000),
    )
    return out_dir
