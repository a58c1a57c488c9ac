"""Deterministic shard planning over Parquet inputs.

DocID determinism (SURVEY.md §7.5.5): global docIDs are
``doc_base(shard) + row_index``, with doc_bases from an exclusive prefix sum
over per-shard row counts. That only works if the shard list is stable across
runs and resumes, so shards are planned from SORTED file lists and row-group
metadata only (no data read, no reliance on read order). At 100 TB this scan
touches parquet footers only.

A shard = one or more consecutive row groups of one file, targeted at
``target_rows`` rows; it is the unit of segment build and of checkpoint/resume.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow.parquet as pq


@dataclass(frozen=True)
class Shard:
    shard_id: int
    path: str
    row_groups: tuple[int, ...]
    num_rows: int
    doc_base: int

    def to_row(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "path": self.path,
            "row_groups": list(self.row_groups),
            "num_rows": self.num_rows,
            "doc_base": self.doc_base,
        }


def list_parquet_files(input_path: str | list[str]) -> list[str]:
    if isinstance(input_path, list):
        return sorted(input_path)
    if os.path.isfile(input_path):
        return [input_path]
    out = []
    for root, _dirs, files in os.walk(input_path):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


def plan_shards(input_path: str | list[str], target_rows: int = 100_000) -> list[Shard]:
    """Split sorted input files into shards of consecutive row groups."""
    shards: list[Shard] = []
    doc_base = 0
    shard_id = 0
    for path in list_parquet_files(input_path):
        md = pq.ParquetFile(path).metadata
        groups: list[int] = []
        rows = 0
        for rg in range(md.num_row_groups):
            groups.append(rg)
            rows += md.row_group(rg).num_rows
            if rows >= target_rows:
                shards.append(Shard(shard_id, path, tuple(groups), rows, doc_base))
                doc_base += rows
                shard_id += 1
                groups, rows = [], 0
        if groups:
            shards.append(Shard(shard_id, path, tuple(groups), rows, doc_base))
            doc_base += rows
            shard_id += 1
    return shards


def read_shard(shard_row: dict, columns: list[str] | None = None):
    """Read one shard's rows (column-pruned) as a pyarrow Table."""
    f = pq.ParquetFile(shard_row["path"])
    return f.read_row_groups(list(shard_row["row_groups"]), columns=columns)
