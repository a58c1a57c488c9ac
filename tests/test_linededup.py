"""Global exact line dedup (stages/linededup.py) vs brute force."""

import numpy as np
import pyarrow as pa
import ray.data

from lucene_net_ray.stages.linededup import line_dedup, linify_batch


def _brute(rows: dict[int, str], delim: str = "\n") -> dict[int, str]:
    seen: set[str] = set()
    out: dict[int, list[str]] = {}
    for doc_id in sorted(rows):
        for line in rows[doc_id].split(delim):
            if line not in seen:
                seen.add(line)
                out.setdefault(doc_id, []).append(line)
    return {d: delim.join(ls) for d, ls in out.items()}


def _run(rows: dict[int, str]) -> dict[int, str]:
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(rows), type=pa.int64()),
            "text": [rows[d] for d in sorted(rows)],
        }
    )
    got = line_dedup(ray.data.from_arrow(tbl).repartition(3)).to_pandas()
    return dict(zip(got["doc_id"], got["text"]))


def test_cross_doc_duplicate_lines_keep_first(ray_session):
    rows = {
        0: "alpha beta\ngamma",
        1: "gamma\ndelta",          # 'gamma' already seen in doc 0
        2: "alpha beta\ndelta",     # both lines seen -> doc vanishes
        3: "epsilon",
    }
    got = _run(rows)
    assert got == _brute(rows)
    assert 2 not in got  # fully-deduplicated doc drops


def test_within_doc_duplicate_keeps_lowest_line_no(ray_session):
    rows = {5: "x\ny\nx\nz"}
    got = _run(rows)
    assert got == {5: "x\ny\nz"}


def test_blank_lines_collapse_globally(ray_session):
    rows = {0: "a\n\nb", 1: "\nc"}
    got = _run(rows)
    # the empty line between a and b wins; doc 1's leading blank drops
    assert got == _brute(rows) == {0: "a\n\nb", 1: "c"}


def test_random_corpus_matches_brute(ray_session):
    rng = np.random.default_rng(3)
    pool = [f"line {i}" for i in range(30)]
    rows = {
        d: "\n".join(rng.choice(pool, size=rng.integers(1, 8)).tolist())
        for d in range(60)
    }
    assert _run(rows) == _brute(rows)


def test_linify_batch_shapes():
    tbl = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                    "text": ["a b c d e f g h i j k"]})
    out = linify_batch(tbl, tokens_per_line=8)
    assert out.column("text")[0].as_py() == "a b c d e f g h\ni j k"


def test_doc_id_out_of_rank_range_raises(ray_session):
    import pytest

    tbl = pa.table({"doc_id": pa.array([1 << 50], type=pa.int64()),
                    "text": ["x"]})
    with pytest.raises(Exception, match="doc ids must be"):
        line_dedup(ray.data.from_arrow(tbl)).to_pandas()


def test_empty_filtered_block_survives(ray_session):
    # regression: an upstream filter can hand _explode a 0-row block
    tbl = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                    "text": ["", "a\nb"]})
    ds = ray.data.from_arrow(tbl).repartition(2).filter(
        lambda r: bool(r["text"])
    )
    got = line_dedup(ds).to_pandas()
    assert dict(zip(got["doc_id"], got["text"])) == {1: "a\nb"}
