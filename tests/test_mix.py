"""mix_sources: deterministic weighted source mixing."""

import hashlib

import pyarrow as pa
import pytest
import ray.data

from lucene_net_ray.stages.clean import mix_sources, mix_threshold_hex


def test_threshold_hex():
    assert mix_threshold_hex(1.0) == "g0000000"
    assert mix_threshold_hex(1.5) == "g0000000"
    assert mix_threshold_hex(0.0) == "00000000"
    assert mix_threshold_hex(-1) == "00000000"
    assert mix_threshold_hex(0.5) == "80000000"
    # every 8-hex-char md5 prefix sorts below the keep-all sentinel
    assert "ffffffff" < "g0000000"


def test_mix_sources_exact():
    rows = {
        "doc_id": list(range(300)),
        "text": [f"document number {i} body" for i in range(300)],
        "source": ["web", "code", "books"][0:1] * 0,
    }
    rows["source"] = [["web", "code", "books"][i % 3] for i in range(300)]
    weights = {"web": 1.0, "code": 0.5}  # books absent -> dropped
    ds = ray.data.from_arrow(pa.table(rows))
    out = mix_sources(ds, weights).to_pandas()

    # reference computation row-by-row
    kept = set()
    for i in range(300):
        src = ["web", "code", "books"][i % 3]
        h8 = hashlib.md5(f"document number {i} body".encode()).hexdigest()[:8]
        if h8 < mix_threshold_hex(weights.get(src, 0.0)):
            kept.add(i)
    assert set(out["doc_id"]) == kept
    # all web kept, no books kept, code roughly half
    assert sum(1 for i in kept if i % 3 == 0) == 100
    assert sum(1 for i in kept if i % 3 == 2) == 0
    n_code = sum(1 for i in kept if i % 3 == 1)
    assert 30 <= n_code <= 70


def test_mix_sources_empty_weights():
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["x", "y"], "source": ["a", "b"]})
    )
    assert mix_sources(ds, {}).count() == 0
