"""budget_select + length_quantiles (stages/select.py) vs brute force/DuckDB."""

import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from lucene_net_ray.stages.select import budget_select, length_quantiles
from lucene_net_ray.stages.textstats import quality_score_batch


def _mk_docs(rng, n):
    words = ["the", "and", "merge", "spark", "window", "query", "zz9", "q"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(0, 40)).tolist()) for _ in range(n)
    ]
    # a few exact duplicates -> guaranteed quality ties across docs
    for i in range(0, n, 7):
        texts[i] = texts[(i + 3) % n]
    texts[0] = ""  # zero-token doc
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)), "text": texts})


def _brute_budget(tbl: pa.Table, budget: int) -> pd.DataFrame:
    scored = quality_score_batch(tbl).to_pandas()
    scored = scored.sort_values(["quality", "doc_id"], ascending=[False, True])
    scored["cum_tokens"] = scored["n_tokens"].cumsum()
    kept = scored[scored["cum_tokens"] <= budget]
    return (
        kept[["doc_id", "n_tokens", "quality", "cum_tokens"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _run_budget(tbl, budget):
    ds = ray.data.from_arrow(tbl).repartition(5)
    out = budget_select(ds, budget_tokens=budget).to_pandas()
    if out.empty:  # empty result loses its schema on to_pandas
        return pd.DataFrame(
            columns=["doc_id", "n_tokens", "quality", "cum_tokens"]
        ).astype({"doc_id": "int64", "n_tokens": "int64", "quality": "float64",
                  "cum_tokens": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def test_budget_select_matches_brute_force(ray_session):
    rng = np.random.default_rng(7)
    tbl = _mk_docs(rng, 120)
    for budget in (0, 5, 100, 700, 10**9):
        got = _run_budget(tbl, budget)
        exp = _brute_budget(tbl, budget)
        pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))


def test_budget_select_boundary_splits_a_quality_tie(ray_session):
    # 4 identical docs (same quality, 3 tokens each): budget 7 keeps exactly
    # the 2 lowest doc_ids of the tie group
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(4, dtype=np.int64)),
            "text": ["merge spark query"] * 4,
        }
    )
    got = _run_budget(tbl, 7)
    assert got["doc_id"].tolist() == [0, 1]
    assert got["cum_tokens"].tolist() == [3, 6]


def test_budget_select_zero_token_doc_at_boundary(ray_session):
    # zero-token doc has the LOWEST quality here (0.0) — kept only if the
    # running total at its position still fits, exactly like the SQL window
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(3, dtype=np.int64)),
            "text": ["the and merge", "", "the and spark"],
        }
    )
    got_all = _run_budget(tbl, 6)
    exp_all = _brute_budget(tbl, 6)
    pd.testing.assert_frame_equal(got_all, exp_all.astype(got_all.dtypes.to_dict()))
    assert 1 in got_all["doc_id"].tolist()  # fits at budget == total tokens


def test_length_quantiles_matches_duckdb(ray_session):
    rng = np.random.default_rng(11)
    n = 400
    langs = rng.choice(["en", "de", "fr"], size=n)
    texts = [" ".join(["tok"] * int(rng.integers(0, 60))) for _ in range(n)]
    tbl = pa.table({"lang": pa.array(langs.tolist()), "text": texts})
    got = (
        length_quantiles(ray.data.from_arrow(tbl).repartition(4))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", tbl)
    exp = con.sql(
        """
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
          quantile_disc(n, 0.25) AS q25, quantile_disc(n, 0.50) AS q50,
          quantile_disc(n, 0.75) AS q75, quantile_disc(n, 0.90) AS q90,
          quantile_disc(n, 0.95) AS q95, quantile_disc(n, 0.99) AS q99
        FROM (SELECT lang, CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n
              FROM docs)
        GROUP BY lang ORDER BY lang
        """
    ).df()
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))


def test_quantile_disc_rule_matches_duckdb_small_n():
    """The ceil(q*n)-1 selection rule == DuckDB quantile_disc for every n
    that could make the float ceil ambiguous."""
    con = duckdb.connect()
    qs = [0.25, 0.5, 0.75, 0.9, 0.95, 0.99]
    for n in list(range(1, 120)) + [399, 1000]:
        got = con.sql(
            f"SELECT quantile_disc(x, {qs}) FROM (SELECT unnest(range(1, {n + 1})) AS x)"
        ).fetchone()[0]
        exp = [max(0, math.ceil(q * n) - 1) + 1 for q in qs]
        assert list(got) == exp, n


def test_corpus_shuffle_ranks_matches_brute(ray_session):
    import hashlib

    from lucene_net_ray.stages.select import corpus_shuffle_ranks

    rng = np.random.default_rng(9)
    texts = [f"doc body {int(rng.integers(0, 50))}" for _ in range(300)]  # dup texts -> id tie-breaks
    tbl = pa.table({"doc_id": pa.array(range(300), type=pa.int64()), "text": texts})
    got = (
        corpus_shuffle_ranks(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    order = sorted(range(300), key=lambda i: (hashlib.md5(texts[i].encode()).hexdigest(), i))
    exp = {doc: r for r, doc in enumerate(order)}
    assert dict(zip(got["doc_id"], got["shuffle_rank"])) == exp
    # dense permutation 0..N-1
    assert sorted(got["shuffle_rank"]) == list(range(300))
