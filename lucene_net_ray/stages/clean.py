"""End-to-end training-corpus cleaning pipeline (streaming, resumable output).

read_parquet -> quality scoring (map_batches) -> quality filter -> exact-dedup
keep-first -> partitioned parquet write. Everything streams through the object
store with backpressure; nothing materializes the corpus. The dedup keep-set
is the one keyed exchange (hash groupby on the text fingerprint); the keep
decision joins back map-side via a broadcast of kept ids at test scale (hash
join at petabyte scale — same note as stages/dedup.py).

Output is one file per input block (``write_parquet`` default), so a failed
run re-writes only missing partitions when re-executed with the same input.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data


def clean_corpus(
    input_path: str,
    out_dir: str,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    min_quality: float = 0.0,
    dedup: bool = True,
) -> dict:
    """Returns {"rows_in", "rows_kept", "out_dir"}."""
    from .dedup import exact_dedup
    from .textstats import quality_score_batch

    ds = ray.data.read_parquet(input_path)
    rows_in = ds.count()

    scored = ds.map_batches(
        lambda b: _with_quality(b, text_column), batch_format="pyarrow"
    )
    if min_quality > 0:
        scored = scored.map_batches(
            lambda b: b.filter(pa.compute.greater_equal(b.column("quality"), min_quality)),
            batch_format="pyarrow",
        )

    if dedup:
        kept = exact_dedup(
            scored.select_columns([id_column, text_column]),
            text_column=text_column,
            id_column=id_column,
        )
        keep_ids = np.sort(
            np.asarray([r["kept_doc_id"] for r in kept.take_all()], dtype=np.int64)
        )
        keep_ref = ray.put(keep_ids)  # broadcast once; hash join at PB scale

        def keep_only(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_column).to_numpy()
            mask = np.isin(ids, ray.get(keep_ref), assume_unique=False)
            return batch.filter(pa.array(mask))

        scored = scored.map_batches(keep_only, batch_format="pyarrow")

    os.makedirs(out_dir, exist_ok=True)
    scored.write_parquet(out_dir)
    out = ray.data.read_parquet(out_dir)
    return {"rows_in": rows_in, "rows_kept": out.count(), "out_dir": out_dir}


def _with_quality(batch: pa.Table, text_column: str) -> pa.Table:
    from .textstats import quality_score_batch

    q = quality_score_batch(batch, text_column=text_column)
    return batch.append_column("quality", q.column("quality"))
