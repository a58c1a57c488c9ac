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


def test_top_terms_per_group():
    """Trending terms: exact per-group token counts, top-k with (count desc,
    token asc) ties — vs a brute-force Counter oracle."""
    import re
    from collections import Counter

    import numpy as np
    import pyarrow as pa
    import ray.data

    from lucene_net_ray.functions.analysis import ENGLISH_STOP_WORDS
    from lucene_net_ray.stages.textstats import top_terms_per_group

    rng = np.random.default_rng(31)
    vocab = ["merge", "spark", "window", "vector", "the", "and", "data", "query"]
    docs, langs = [], []
    for i in range(400):
        docs.append(" ".join(rng.choice(vocab, size=rng.integers(3, 12))))
        langs.append(["en", "de", "fr"][i % 3])
    ds = ray.data.from_arrow(pa.table({"lang": langs, "text": docs})).repartition(5)
    got = top_terms_per_group(ds, k=3).to_pandas()

    exp: dict = {}
    for lang, text in zip(langs, docs):
        c = exp.setdefault(lang, Counter())
        c.update(
            t for t in re.findall(r"[a-z0-9]+", text) if t not in ENGLISH_STOP_WORDS
        )
    for lang, c in exp.items():
        top = sorted(c.items(), key=lambda x: (-x[1], x[0]))[:3]
        sub = got[got["lang"] == lang].sort_values(["n", "tok"], ascending=[False, True])
        assert [(r.tok, r.n) for r in sub.itertuples()] == top


def test_dataset_split_deterministic_and_proportional(ray_session):
    import hashlib

    import pyarrow as pa
    import ray.data

    from lucene_net_ray.stages.clean import dataset_split, mix_threshold_hex

    texts = [f"document number {i} body" for i in range(2000)]
    tbl = pa.table({"doc_id": pa.array(range(2000), type=pa.int64()), "text": texts})
    out = dataset_split(
        ray.data.from_arrow(tbl).repartition(7), test_fraction=0.2, cv_fraction=0.1
    ).to_pandas()
    t1, t2 = mix_threshold_hex(0.2), mix_threshold_hex(0.2 + 0.1)
    for _, r in out.iterrows():
        h = hashlib.md5(r["text"].encode()).hexdigest()[:8]
        exp = "test" if h < t1 else ("cv" if h < t2 else "train")
        assert r["split"] == exp
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["test"] - 0.2) < 0.04 and abs(frac["cv"] - 0.1) < 0.04
    # partitioning-invariant: same labels at a different block count
    out2 = dataset_split(
        ray.data.from_arrow(tbl).repartition(2), test_fraction=0.2, cv_fraction=0.1
    ).to_pandas()
    a = out.sort_values("doc_id")["split"].tolist()
    b = out2.sort_values("doc_id")["split"].tolist()
    assert a == b


def test_dataset_split_rejects_invalid_fractions(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from lucene_net_ray.stages.clean import dataset_split

    ds = ray.data.from_arrow(pa.table({"doc_id": [0], "text": ["x"]}))
    with pytest.raises(ValueError, match="invalid split fractions"):
        dataset_split(ds, test_fraction=0.6, cv_fraction=0.6)
    with pytest.raises(ValueError, match="invalid split fractions"):
        dataset_split(ds, test_fraction=-0.1, cv_fraction=0.1)
