"""WAND crossover benchmark at its design regime (VERDICT r1 #7).

Builds a synthetic head-term segment DIRECTLY from posting arrays (no text):
docs with zipf-ish tfs and realistic norm spread, head terms with df up to
10M. Times exhaustive vs block-max WAND disjunctions across df regimes to
place WAND_MIN_DF on data instead of folklore. Run:
    python tools/bench_wand.py [--n-docs 10000000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_net_ray.functions.norms import encode_norm_array
from lucene_net_ray.pipelines.scorer import SegmentScorer
from lucene_net_ray.query import BooleanClause, BooleanQuery, TermQuery
from lucene_net_ray.state.segment import SegmentReader, write_terms_and_postings


def build_synthetic_segment(out_dir: str, n_docs: int, term_dfs: dict[str, int], seed: int = 7):
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    field_lens = rng.integers(20, 2000, size=n_docs).astype(np.int64)
    norms = encode_norm_array(field_lens)

    terms = sorted(term_dfs)
    codes_parts, docs_parts, tfs_parts = [], [], []
    df_list = []
    for rank, t in enumerate(terms):
        df = term_dfs[t]
        docids = np.sort(rng.choice(n_docs, size=df, replace=False)) if df < n_docs else np.arange(n_docs)
        tfs = np.minimum((rng.pareto(1.3, size=df) + 1).astype(np.int64), 500)
        codes_parts.append(np.full(df, rank, dtype=np.int64))
        docs_parts.append(docids.astype(np.int64))
        tfs_parts.append(tfs)
        df_list.append(df)
    codes = np.concatenate(codes_parts)
    docs = np.concatenate(docs_parts)
    tfs = np.concatenate(tfs_parts)
    enc = write_terms_and_postings(
        out_dir,
        uniq_terms=pa.array(terms, type=pa.string()),
        codes=codes,
        docs_sorted=docs,
        tfs_sorted=tfs,
        pos_deltas=None,
        norms=norms,
    )
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "norm": pa.array(norms, type=pa.uint8()),
            "field_len": pa.array(field_lens.astype(np.int32)),
            "sha256": pa.array([""] * n_docs, type=pa.string()),
        }),
        os.path.join(out_dir, "docs.parquet"),
    )
    meta = {
        "seg_id": 0, "name": "seg000000", "doc_base": 0, "doc_count": n_docs,
        "sum_ttf": int(field_lens.sum()), "term_count": enc["term_count"],
        "postings": enc["postings"], "postings_bytes": enc["postings_bytes"],
        "index_options": "freqs", "lineage": {"synthetic": True}, "metrics": {},
        "analyzer": {"kind": "standard"},
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=10_000_000)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    n = args.n_docs
    work = "/tmp/wand_bench_seg"
    shutil.rmtree(work, ignore_errors=True)

    term_dfs = {
        "h10m": min(n, 10_000_000),
        "h05m": min(n, 5_000_000) // 1,
        "h02m": min(n, 2_000_000),
        "m500k": min(n // 2, 500_000),
        "m100k": 100_000,
        "t010k": 10_000,
    }
    t0 = time.perf_counter()
    meta = build_synthetic_segment(work, n, term_dfs)
    print(f"built synthetic segment: {n} docs, {meta['postings']} postings, "
          f"{meta['postings_bytes']/1e6:.0f} MB in {time.perf_counter()-t0:.1f}s", flush=True)

    reader = SegmentReader(work)
    stats = {"max_doc": n, "sum_ttf": meta["sum_ttf"],
             "df": {t: int(d) for t, d in term_dfs.items()}}
    scorer = SegmentScorer(reader, stats)

    def bq(*ts):
        return BooleanQuery(clauses=tuple(BooleanClause(TermQuery(term=t), "SHOULD") for t in ts))

    queries = {
        "or2_head": bq("h10m", "h05m"),
        "or3_head": bq("h10m", "h05m", "h02m"),
        "or2_mid": bq("m500k", "m100k"),
        "head_plus_tail": bq("h10m", "t010k"),
        "or5_all": bq("h10m", "h05m", "h02m", "m500k", "m100k"),
        "term_head": TermQuery(term="h10m"),
    }
    results = {}
    for name, q in queries.items():
        sum_df = sum(term_dfs[t] for t, _ in __import__("lucene_net_ray.pipelines.wand", fromlist=["is_wand_eligible"]).is_wand_eligible(q))
        times = {}
        hits = {}
        for mode in ("exhaustive", "wand"):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                h = scorer.top_k(q, args.k, mode=mode)
                best = min(best, time.perf_counter() - t0)
            times[mode] = best
            hits[mode] = h
        assert hits["exhaustive"] == hits["wand"], f"WAND diverged on {name}!"
        results[name] = {"sum_df": sum_df, **{m: round(t, 4) for m, t in times.items()},
                         "speedup": round(times["exhaustive"] / times["wand"], 2)}
        print(name, results[name], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
