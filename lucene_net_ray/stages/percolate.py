"""Percolation at corpus scale: match a STREAM of documents against a
REGISTERED set of queries (the alerting / saved-search direction — queries
are the data at rest, documents flow).

The reference's building block is MemoryIndex (one doc in RAM, every query
scored against it — Index/Memory/MemoryIndex.cs:83, used exactly this way
by percolator-style systems). Ray-Data-first, the scale axes invert
cleanly: the query set is the SMALL side (parsed once per actor in
__init__, never re-shipped), documents shard across the actor pool, and
each batch builds ONE in-memory batch index evaluated query-by-query.

Correctness note: matching (score > 0) against a batch-level index equals
per-doc MemoryIndex matching — BM25 idf is strictly positive regardless of
collection stats, so WHICH docs match is stats-independent; only scores
(not membership) would differ, and percolation emits membership.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data


class PercolatorStage:
    """Actor-pool stage: (doc_id, query_name) for every registered query a
    doc matches. ``queries`` maps name -> classic-syntax string or Query
    object; parsing and analyzer construction happen once per actor."""

    def __init__(
        self,
        queries: dict,
        *,
        text_column: str = "text",
        id_column: str = "doc_id",
        analyzer=None,
    ):
        from ..functions.analysis import Analyzer
        from ..query import Query, parse_query

        self.analyzer = analyzer or Analyzer()
        self.queries = {
            name: (q if isinstance(q, Query) else parse_query(q, analyzer=self.analyzer))
            for name, q in queries.items()
        }
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..oracle import OracleIndex

        texts = batch.column(self.text_column).to_pylist()
        ids = batch.column(self.id_column).to_pylist()
        oracle = OracleIndex(texts, analyzer=self.analyzer)
        out_ids, out_names = [], []
        for name, q in self.queries.items():
            for d in range(len(texts)):
                s = oracle._eval(d, q)
                if s is not None and s > 0:
                    out_ids.append(ids[d])
                    out_names.append(name)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "query_name": pa.array(out_names, type=pa.string()),
            }
        )


def percolate(
    ds: ray.data.Dataset,
    queries: dict,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    analyzer=None,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Dataset(doc_id, query_name) of all (document, registered-query)
    matches. One streaming actor-pool pass; no shuffle."""
    return ds.map_batches(
        PercolatorStage,
        fn_constructor_kwargs={
            "queries": queries,
            "text_column": text_column,
            "id_column": id_column,
            "analyzer": analyzer,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
