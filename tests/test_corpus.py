"""Corpus-statistics operators: n-gram counts, PMI collocations, TF-IDF.

Hand-verifiable vectors plus a DuckDB cross-check on a small synthetic
corpus (the same oracle SQL shape the driver contract uses).
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lucene_net_ray.stages.corpus import (
    doc_term_partials,
    ngram_counts_topk,
    ngram_partials,
    pmi_bigrams_topk,
    tfidf_top_terms,
)

DOCS = [
    (0, "machine learning makes machine learning easy"),
    (1, "deep learning and machine learning"),
    (2, "the quick brown fox"),
    (3, "machine learning"),
    (4, ""),
    (5, "the the the"),  # stopwords only -> no tokens
]


def _ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], type=pa.int64()),
                "text": pa.array([t for _, t in DOCS], type=pa.string()),
            }
        )
    )


def test_ngram_partials_hand_vector():
    batch = pa.table(
        {"doc_id": pa.array([0, 1]), "text": pa.array(["x y x y", "y x"])}
    )
    out = ngram_partials(batch, n=2)
    d = {g: n for g, n in zip(out.column("gram").to_pylist(), out.column("n").to_pylist())}
    # doc0 bigrams: (x,y) (y,x) (x,y); doc1: (y,x) — never crossing docs
    assert d == {"x\x1fy": 2, "y\x1fx": 2}


def test_ngram_partials_respects_doc_boundary_and_stopwords():
    batch = pa.table(
        {"doc_id": pa.array([0, 1]), "text": pa.array(["alpha the beta", "beta alpha"])}
    )
    out = ngram_partials(batch, n=2)
    d = {g: n for g, n in zip(out.column("gram").to_pylist(), out.column("n").to_pylist())}
    # "the" is a stopword: doc0 stream is [alpha, beta] -> bigram (alpha,beta)
    assert d == {"alpha\x1fbeta": 1, "beta\x1falpha": 1}


def test_ngram_counts_topk():
    tbl = ngram_counts_topk(_ds(), n=2, k=3)
    rows = list(
        zip(tbl.column("t1").to_pylist(), tbl.column("t2").to_pylist(), tbl.column("n").to_pylist())
    )
    # (machine, learning) x3 docs + once more in doc0 = 4
    assert rows[0] == ("machine", "learning", 4)
    assert len(rows) == 3
    # counts are non-increasing and ties broken by gram ascending
    assert rows[1][2] >= rows[2][2]


def test_trigram_counts():
    tbl = ngram_counts_topk(_ds(), n=3, k=2)
    rows = list(
        zip(
            tbl.column("t1").to_pylist(),
            tbl.column("t2").to_pylist(),
            tbl.column("t3").to_pylist(),
            tbl.column("n").to_pylist(),
        )
    )
    assert ("machine", "learning", "makes", 1) in rows or len(rows) == 2


def test_doc_term_partials_exact():
    batch = pa.table({"doc_id": pa.array([7]), "text": pa.array(["x y x"])})
    out = doc_term_partials(batch)
    d = {
        (i, t): n
        for i, t, n in zip(
            out.column("doc_id").to_pylist(),
            out.column("tok").to_pylist(),
            out.column("tf").to_pylist(),
        )
    }
    assert d == {(7, "x"): 2, (7, "y"): 1}


def test_tfidf_vs_duckdb():
    out = (
        tfidf_top_terms(_ds(), k=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS], type=pa.int64()),
            "text": pa.array([t for _, t in DOCS], type=pa.string()),
        }
    ))
    from lucene_net_ray.pipelines.driver_contract import STOPS_SQL

    oracle = con.execute(
        f"""
WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_extract_all(text, '[a-z0-9]+'),
  t -> t NOT IN ({STOPS_SQL}))) AS tok FROM documents),
tfs AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
dfs AS (SELECT tok, count(*) AS df FROM tfs GROUP BY tok),
nd AS (SELECT count(*) AS v FROM documents),
scored AS (
  SELECT tfs.doc_id, tfs.tok,
    ROUND(tf * ln((SELECT v FROM nd) * 1.0 / df), 6) AS tfidf,
    row_number() OVER (PARTITION BY tfs.doc_id
      ORDER BY ROUND(tf * ln((SELECT v FROM nd) * 1.0 / df), 6) DESC, tfs.tok ASC) AS rank
  FROM tfs JOIN dfs ON dfs.tok = tfs.tok)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, tok, tfidf FROM scored WHERE rank <= 2
ORDER BY doc_id, rank
"""
    ).fetchdf()
    assert list(out.columns) == ["doc_id", "rank", "tok", "tfidf"]
    assert out.equals(oracle)


def test_tfidf_idf_zero_for_ubiquitous_term():
    # a term in every doc has idf = ln(N/N) = 0 -> tfidf 0
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(["common alpha", "common beta"], type=pa.string()),
        }
    )
    out = tfidf_top_terms(ray.data.from_arrow(docs), k=2).to_pandas()
    common = out[out["tok"] == "common"]
    assert (common["tfidf"] == 0.0).all()
    # rank 1 in each doc is the distinctive term
    r1 = out[out["rank"] == 1].sort_values("doc_id")
    assert list(r1["tok"]) == ["alpha", "beta"]


def test_pmi_hand_vector():
    # corpus engineered so one bigram dominates: "a b" repeated
    text = " ".join(["aa bb"] * 10)
    docs = pa.table(
        {
            "doc_id": pa.array([0], type=pa.int64()),
            "text": pa.array([text], type=pa.string()),
        }
    )
    out = pmi_bigrams_topk(ray.data.from_arrow(docs), k=5, min_count=5)
    rows = list(zip(out.column("t1").to_pylist(), out.column("t2").to_pylist()))
    assert ("aa", "bb") in rows
    # verify the exact f64 op-order formula for (aa, bb)
    i = rows.index(("aa", "bb"))
    n_uni, n_bi = 20, 19
    c_xy = out.column("n").to_pylist()[i]
    pmi = np.log(((c_xy * 1.0 * n_uni / 10) * n_uni / 10) / n_bi)
    r = float(np.sign(pmi) * np.floor(abs(pmi) * 1e6 + 0.5) / 1e6)
    assert out.column("pmi").to_pylist()[i] == pytest.approx(r, abs=0)


def test_pmi_min_count_filters():
    out = pmi_bigrams_topk(_ds(), k=10, min_count=5)
    # nothing in the small corpus reaches count 5
    assert out.num_rows == 0


def test_empty_corpus():
    docs = pa.table(
        {"doc_id": pa.array([], type=pa.int64()), "text": pa.array([], type=pa.string())}
    )
    ds = ray.data.from_arrow(docs)
    assert ngram_counts_topk(ds, n=2, k=5).num_rows == 0
    assert pmi_bigrams_topk(ds, k=5).num_rows == 0
