"""End-to-end training-shards pipeline: clean -> chunk -> pack -> sharded
resumable write."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_net_ray.pipelines.training import prepare_training_shards


def test_prepare_training_shards(tmp_path):
    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(200)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(20, 400))) for _ in range(120)]
    texts[5] = texts[3]  # exact duplicate -> dedup drops one
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(
        pa.table({"doc_id": list(range(120)), "text": texts}),
        os.path.join(src, "c.parquet"),
        row_group_size=40,
    )
    out = str(tmp_path / "out")
    m = prepare_training_shards(
        src, out, chunk_tokens=64, overlap_tokens=8, pack_budget=128, num_shards=8
    )
    assert m["rows_in"] == 120 and m["rows_kept"] == 119  # dup dropped
    assert m["n_chunks"] > 119  # long docs split
    assert m["n_sequences"] >= 1

    # partitioned output: one dir per shard, all chunks accounted for
    shards = sorted(os.listdir(os.path.join(out, "chunks")))
    assert all(s.startswith("shard=") for s in shards)
    assert 1 < len(shards) <= 8
    import ray.data

    chunks = ray.data.read_parquet(os.path.join(out, "chunks"))
    assert chunks.count() == m["n_chunks"]
    # packing sidecar maps every chunk to a sequence window
    packing = ray.data.read_parquet(os.path.join(out, "packing"))
    assert packing.count() == m["n_chunks"]
    rows = packing.take_all()
    assert all(0 <= r["first_seq"] <= r["last_seq"] < m["n_sequences"] for r in rows)
    # token conservation: total chunk tokens == span of the packed stream
    total = sum(r["n_tokens"] for r in rows)
    ends = max(r["start_tok"] + r["n_tokens"] for r in rows)
    assert total == ends

    # resume: a second call returns the committed manifest without rework
    m2 = prepare_training_shards(src, out)
    assert m2 == m
