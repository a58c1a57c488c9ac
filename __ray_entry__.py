"""Driver contract for the graft builder (Ray Data target).

The driver calls ray.init() itself BEFORE importing this module; nothing here
(or in lucene_net_ray) calls ray.init()/ray.shutdown().

- entry(): flagship pipeline on /root/testdata/sf0.001 — build the inverted
  index over the documents table (tokenize -> per-partition segments ->
  checkpointed build) and serve the reference query set through the
  actor-pool BM25 searcher; returns one row per (query, rank) hit.
- queries(): one callable per implemented operator/pipeline
  (SURVEY.md §2 + the training-data operators); see
  lucene_net_ray/pipelines/driver_contract.py.
- oracle_sql(): DuckDB-equivalent SQL for most of them, producing
  identically-named columns and values (byte315 norm quantization embedded as
  a length-bucket VALUES table). Approximate / stateful / offline-blocked
  operators (minhash, simhash, LSH ANN, multimodal stubs, fingerprint,
  Porter-stemmed index — DuckDB's stem() needs the unavailable fts
  extension) intentionally have no SQL entry -> rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    import numpy as np
    import pandas as pd

    from lucene_net_ray.pipelines.driver_contract import _index_for
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import parse_query

    sf_dir = "/root/testdata/sf0.001"
    meta, orig = _index_for(sf_dir)
    searcher = Searcher(meta, num_actors=2, use_actors=True)
    query_set = [
        ("term_head", "table"),
        ("term_mid", "merge"),
        ("bool_and", "+merge +spark"),
        ("bool_or", "merge spark window"),
        ("bool_not", "+merge -spark"),
        ("prefix", "sp*"),
    ]
    rows = []
    results = searcher.batch_search([(n, parse_query(qs)) for n, qs in query_set], k=10)
    for name, _ in query_set:
        for rank, (doc, score) in enumerate(results[name], 1):
            rows.append(
                {
                    "query": name,
                    "rank": np.int64(rank),
                    "doc_id": np.int64(orig[doc]),
                    "score": float(np.float32(score)),
                }
            )
    return pd.DataFrame(rows, columns=["query", "rank", "doc_id", "score"])


def queries() -> dict[str, Callable[[str], Any]]:
    from lucene_net_ray.pipelines.driver_contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from lucene_net_ray.pipelines.driver_contract import oracle_sql as _sql

    return _sql()
