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

    # resume: a second call WITH THE SAME PARAMETERS returns the committed
    # manifest without rework
    m2 = prepare_training_shards(
        src, out, chunk_tokens=64, overlap_tokens=8, pack_budget=128, num_shards=8
    )
    assert m2 == m

    # parameter change invalidates the committed run instead of silently
    # reusing old-parameter output: same out_dir, different chunk size
    m3 = prepare_training_shards(
        src, out, chunk_tokens=32, overlap_tokens=8, pack_budget=128, num_shards=8
    )
    assert m3["params_fp"] != m["params_fp"]
    assert m3["n_chunks"] > m["n_chunks"]  # smaller windows -> more chunks
    assert m3["rows_kept"] == m["rows_kept"]


def test_mid_run_kill_resumes_per_stage(tmp_path, monkeypatch):
    """A kill during packing must not re-pay clean+chunk on resume: the
    committed stage manifests are honored, only the in-flight stage reruns."""
    rng = np.random.default_rng(43)
    vocab = [f"w{i}" for i in range(100)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(30, 200))) for _ in range(60)]
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(
        pa.table({"doc_id": list(range(60)), "text": texts}),
        os.path.join(src, "c.parquet"),
        row_group_size=20,
    )
    out = str(tmp_path / "out")

    # simulate the kill: packing raises mid-stage after leaving partial files
    import lucene_net_ray.stages.packing as packing_mod

    real_pack = packing_mod.pack_sequences

    def dying_pack(*a, **k):
        os.makedirs(os.path.join(out, "packing"), exist_ok=True)
        with open(os.path.join(out, "packing", "partial.parquet"), "w") as f:
            f.write("garbage")  # half-written stage output
        raise RuntimeError("simulated worker-pool crash")

    monkeypatch.setattr(packing_mod, "pack_sequences", dying_pack)
    try:
        prepare_training_shards(src, out, chunk_tokens=64, pack_budget=128, num_shards=4)
        raise AssertionError("expected the simulated crash to propagate")
    except RuntimeError:
        pass
    # clean + chunk stages committed, packing did not
    assert os.path.exists(os.path.join(out, "_stage_clean.json"))
    assert os.path.exists(os.path.join(out, "_stage_chunks.json"))
    assert not os.path.exists(os.path.join(out, "_stage_packing.json"))
    assert not os.path.exists(os.path.join(out, "_done"))
    clean_mtime = os.path.getmtime(os.path.join(out, "_stage_clean.json"))
    chunk_mtime = os.path.getmtime(os.path.join(out, "_stage_chunks.json"))

    # resume: committed stages are skipped (clean_corpus/chunk must not run
    # again — poison them), the partial packing dir is cleared and redone
    monkeypatch.setattr(packing_mod, "pack_sequences", real_pack)

    def poisoned(*a, **k):
        raise AssertionError("committed stage re-ran on resume")

    import lucene_net_ray.stages.clean as clean_mod
    import lucene_net_ray.stages.chunk as chunk_mod

    monkeypatch.setattr(clean_mod, "clean_corpus", poisoned)
    monkeypatch.setattr(chunk_mod, "chunk_documents", poisoned)
    m = prepare_training_shards(src, out, chunk_tokens=64, pack_budget=128, num_shards=4)
    assert m["rows_in"] == 60 and m["n_chunks"] > 0 and m["n_sequences"] >= 1
    assert not os.path.exists(os.path.join(out, "packing", "partial.parquet"))
    assert os.path.getmtime(os.path.join(out, "_stage_clean.json")) == clean_mtime
    assert os.path.getmtime(os.path.join(out, "_stage_chunks.json")) == chunk_mtime


def test_done_run_returns_manifest_without_input(ray_session, tmp_path):
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_net_ray.pipelines.training import prepare_training_shards

    corpus = tmp_path / "c"
    corpus.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(50), type=pa.int64()),
                  "text": [f"doc {i} some words here" for i in range(50)]}),
        str(corpus / "p.parquet"),
    )
    out = str(tmp_path / "shards")
    m1 = prepare_training_shards(str(corpus), out, num_shards=2)
    shutil.rmtree(corpus)  # input gone: the _done fast-path must not touch it
    m2 = prepare_training_shards(str(corpus), out, num_shards=2)
    assert m2["n_chunks"] == m1["n_chunks"] and m2["rows_kept"] == m1["rows_kept"]
