"""Exact duplicate-substring span detection (stages/dupspans.py) vs a
brute-force in-process reference and the DuckDB oracle shape."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from lucene_net_ray.stages.dupspans import (
    duplicate_span_doc_stats,
    duplicate_spans,
)


def _brute(docs: dict[int, str], w: int) -> list[tuple[int, int, int, int]]:
    """Reference: windows keyed by the joined token text, global count>=2,
    merge overlapping/adjacent, (doc, start, end, n_windows)."""
    from collections import Counter

    toks = {d: t.split() for d, t in docs.items()}
    keys = Counter()
    for d, ts in toks.items():
        for i in range(len(ts) - w + 1):
            keys[" ".join(ts[i : i + w])] += 1
    out = []
    for d in sorted(toks):
        ts = toks[d]
        dup_pos = [
            i
            for i in range(len(ts) - w + 1)
            if keys[" ".join(ts[i : i + w])] >= 2
        ]
        island: list[int] = []
        for p in dup_pos:
            if island and p <= island[-1] + w:
                island.append(p)
            else:
                if island:
                    out.append((d, island[0], island[-1] + w, len(island)))
                island = [p]
        if island:
            out.append((d, island[0], island[-1] + w, len(island)))
    return out


def _run(docs: dict[int, str], w: int) -> list[tuple[int, int, int, int]]:
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(docs), type=pa.int64()),
            "text": pa.array([docs[d] for d in sorted(docs)]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    df = duplicate_spans(ds, window_tokens=w).to_pandas()
    return list(df.itertuples(index=False, name=None))


def test_cross_doc_duplicate_span():
    docs = {
        1: "a b c d e f g h i j",
        2: "x y a b c d e f q r",
        3: "p q r s t u v w",
    }
    got = _run(docs, 4)
    assert got == _brute(docs, 4)
    # the shared run "a b c d e f" = 3 windows of 4 in doc 1 (pos 0..2)
    # and doc 2 (pos 2..4)
    assert (1, 0, 6, 3) in got and (2, 2, 8, 3) in got


def test_within_doc_repeat_counts():
    docs = {7: "m n o p z z z m n o p"}  # "m n o p" twice in ONE doc
    got = _run(docs, 4)
    assert got == _brute(docs, 4) == [(7, 0, 4, 1), (7, 7, 11, 1)]


def test_adjacent_windows_merge_and_short_docs_skip():
    docs = {
        1: "u v w x y z u v w x y z",  # self-overlapping repeat
        2: "too short",
        3: "",
    }
    got = _run(docs, 3)
    assert got == _brute(docs, 3)
    assert all(r[0] == 1 for r in got)


def test_whitespace_normalization_matches_regex_tokens():
    docs = {
        1: "  alpha\tbeta\n gamma  delta epsilon  ",
        2: "alpha beta gamma delta zeta",
    }
    got = _run(docs, 4)
    assert got == _brute({d: " ".join(t.split()) for d, t in docs.items()}, 4)
    assert got == [(1, 0, 4, 1), (2, 0, 4, 1)]


def test_no_duplicates_empty_result():
    docs = {1: "one two three four five", 2: "six seven eight nine ten"}
    assert _run(docs, 3) == []


def test_doc_stats_rollup():
    docs = {
        1: "a b c d e f g h i j",
        2: "x y a b c d e f q r",
        3: "c d e f g h z z z z",
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(docs), type=pa.int64()),
            "text": pa.array([docs[d] for d in sorted(docs)]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    df = duplicate_span_doc_stats(ds, window_tokens=4).to_pandas()
    spans = _brute(docs, 4)
    exp = {}
    for d, s, e, _ in spans:
        n, t = exp.get(d, (0, 0))
        exp[d] = (n + 1, t + (e - s))
    got = {r.doc_id: (r.n_spans, r.dup_tokens) for r in df.itertuples()}
    assert got == exp


@pytest.mark.parametrize("w", [2, 5])
def test_random_corpus_matches_brute(w):
    rng = np.random.default_rng(42 + w)
    vocab = [f"t{i}" for i in range(12)]  # tiny vocab -> many collisions
    docs = {
        d: " ".join(rng.choice(vocab, size=rng.integers(0, 30)))
        for d in range(40)
    }
    assert _run(docs, w) == _brute(docs, w)


def test_sf0001_matches_duckdb_oracle():
    sf = "/root/testdata/sf0.001"
    w = 8
    ds = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    mine = duplicate_spans(ds, window_tokens=w).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    q = f"""
WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents),
win AS (SELECT doc_id, unnest(generate_series(1, len(t) - {w} + 1)) - 1 AS pos, t
        FROM toks WHERE len(t) >= {w}),
win2 AS (SELECT doc_id, pos, md5(array_to_string(t[pos + 1 : pos + {w}], ' ')) AS key FROM win),
dup AS (SELECT key FROM win2 GROUP BY key HAVING count(*) >= 2),
marked AS (SELECT w.doc_id, w.pos FROM win2 w JOIN dup USING(key)),
isl AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER
        (PARTITION BY doc_id ORDER BY pos) <= {w} THEN 0 ELSE 1 END AS brk FROM marked),
grp AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g FROM isl)
SELECT doc_id, min(pos) AS span_start, CAST(max(pos) + {w} AS BIGINT) AS span_end,
       count(*) AS n_windows
FROM grp GROUP BY doc_id, g ORDER BY doc_id, span_start
"""
    oracle = con.execute(q).fetch_df()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True).astype("int64"), oracle.astype("int64")
    )
