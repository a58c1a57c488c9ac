"""Percolation at corpus scale: match a STREAM of documents against a
REGISTERED set of queries (the alerting / saved-search direction — queries
are the data at rest, documents flow).

The reference's building block is MemoryIndex (one doc in RAM, every query
scored against it — Index/Memory/MemoryIndex.cs:83, used exactly this way
by percolator-style systems). Ray-Data-first, the scale axes invert
cleanly: the query set is the SMALL side (parsed once per actor in
__init__, never re-shipped), documents shard across the actor pool, and
each batch is matched in one vectorized pass.

Matching is the percolator trick, not a Q×B interpreted loop: at actor
setup each registered query is compiled to CNF presence requirements —
"the doc must contain ≥1 term from EVERY group" (a necessary condition for
a match) — over the union vocabulary of all registered queries. Per batch
one boolean doc×term incidence matrix is built from the analyzed docs, and
each query's candidates come from numpy column reductions over it. Queries
whose match condition IS their CNF (term / pure-AND / pure-OR — the common
alerting shapes) finish there with zero per-doc evaluation; the rest
(phrases, minShouldMatch, NOT, multi-term rewrites) evaluate ONLY the
candidates through the per-batch index, typically ≪ B docs per query.

Correctness note: matching (score > 0) against a batch-level index equals
per-doc MemoryIndex matching — BM25 idf is strictly positive regardless of
collection stats, so WHICH docs match is stats-independent; only scores
(not membership) would differ, and percolation emits membership.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _cnf_groups(q) -> list[frozenset] | None:
    """Necessary-condition CNF for a query: the doc must contain at least one
    term from each returned group. None = no safe prefilter (match-all
    fallback); unknown MUST children are simply skipped (their siblings'
    requirements remain necessary)."""
    from ..query import (
        MUST,
        MUST_NOT,
        SHOULD,
        BooleanQuery,
        MultiPhraseQuery,
        PhraseQuery,
        TermQuery,
    )

    if isinstance(q, TermQuery):
        return [frozenset((q.term,))]
    if isinstance(q, PhraseQuery):
        return [frozenset((t,)) for t in q.terms] or None
    if isinstance(q, MultiPhraseQuery):
        groups = [frozenset(slot) for slot in q.positions_terms if slot]
        return groups or None
    if isinstance(q, BooleanQuery):
        musts = [c.query for c in q.clauses if c.occur == MUST]
        shoulds = [c.query for c in q.clauses if c.occur == SHOULD]
        if musts:
            out: list[frozenset] = []
            for child in musts:
                out.extend(_cnf_groups(child) or [])
            return out or None
        if shoulds:
            # a match needs >=1 SHOULD child; union one group per child
            union: set = set()
            for child in shoulds:
                g = _cnf_groups(child)
                if not g:
                    return None  # one unboundable child poisons the OR
                union |= g[0]
            return [frozenset(union)]
        return None  # only MUST_NOT / empty
    return None


def _presence_exact(q) -> bool:
    """True when CNF presence is the EXACT match condition (no scoring-side
    semantics left): a single term, a pure AND of terms, or a pure OR of
    terms with minShouldMatch <= 1."""
    from ..query import MUST, SHOULD, BooleanQuery, TermQuery

    if isinstance(q, TermQuery):
        return True
    if isinstance(q, BooleanQuery):
        occurs = {c.occur for c in q.clauses}
        children = [c.query for c in q.clauses]
        if not children or not all(isinstance(c, TermQuery) for c in children):
            return False
        if occurs == {MUST}:
            return True
        if occurs == {SHOULD} and q.min_should_match <= 1:
            return True
    return False


class PercolatorStage:
    """Actor-pool stage: (doc_id, query_name) for every registered query a
    doc matches. ``queries`` maps name -> classic-syntax string or Query
    object; parsing, CNF compilation, and the query-term vocabulary happen
    once per actor."""

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
        # term -> column in the incidence matrix, over the union vocabulary
        self._col: dict[str, int] = {}
        self._plans = []  # (name, q, group_cols: list[np.ndarray] | None, exact)
        for name, q in self.queries.items():
            groups = _cnf_groups(q)
            cols = None
            if groups:
                cols = []
                for g in groups:
                    for t in g:
                        self._col.setdefault(t, len(self._col))
                    cols.append(np.array([self._col[t] for t in sorted(g)], dtype=np.int64))
            self._plans.append((name, q, cols, _presence_exact(q)))
        self._qtset = frozenset(self._col)
        # column-ordered vocabulary for the vectorized incidence fill: one
        # Arrow index_in per batch dictionary-encodes every doc token against
        # this list, so the token's code IS its matrix column
        vocab: list[str | None] = [None] * len(self._col)
        for t, i in self._col.items():
            vocab[i] = t
        self._vocab_arr = pa.array(vocab, type=pa.string())
        self._need_oracle = any(not exact for _, _, _, exact in self._plans)

    def _fill_incidence(self, key_sets, n: int) -> np.ndarray:
        """Boolean doc x query-term incidence matrix, vectorized: flatten the
        batch's tokens, hash-join them against the query vocabulary in ONE
        pa.compute.index_in call, scatter the hits in one fancy-index
        assignment. Replaces the per-doc ``ks & qtset`` set-intersection loop
        (round-4's last interpreted inner loop on this path)."""
        import itertools

        import pyarrow.compute as pc

        m = np.zeros((n, len(self._col)), dtype=bool)
        if not len(self._col):
            return m
        lens = np.fromiter((len(ks) for ks in key_sets), dtype=np.int64, count=n)
        total = int(lens.sum())
        if not total:
            return m
        flat = pa.array(
            itertools.chain.from_iterable(key_sets), type=pa.string(), size=total
        )
        codes = (
            pc.index_in(flat, value_set=self._vocab_arr)
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False)
        )
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        hit = codes >= 0
        m[doc_idx[hit], codes[hit]] = True
        return m

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        ids = np.asarray(batch.column(self.id_column).to_numpy(zero_copy_only=False))
        n = len(texts)
        oracle = None
        if self._need_oracle:
            from ..oracle import OracleIndex

            oracle = OracleIndex(texts, analyzer=self.analyzer)
            key_sets = [c.keys() for c in oracle.docs]
        else:
            # token lists, not sets: the boolean scatter dedups for free
            key_sets = [self.analyzer(t) for t in texts]
        # one incidence matrix per batch: docs x union-query-terms
        m = self._fill_incidence(key_sets, n)
        out_ids: list[np.ndarray] = []
        out_names: list[str] = []
        counts: list[int] = []
        for name, q, group_cols, exact in self._plans:
            if group_cols is None:
                cand = np.ones(n, dtype=bool)
            else:
                cand = m[:, group_cols[0]].any(axis=1)
                for gc in group_cols[1:]:
                    cand &= m[:, gc].any(axis=1)
            if exact:
                matched = np.flatnonzero(cand)
            else:
                matched = np.array(
                    [
                        d
                        for d in np.flatnonzero(cand).tolist()
                        if (s := oracle._eval(d, q)) is not None and s > 0
                    ],
                    dtype=np.int64,
                )
            out_ids.append(ids[matched])
            out_names.append(name)
            counts.append(len(matched))
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate(out_ids) if out_ids else np.array([], dtype=np.int64),
                    type=pa.int64(),
                ),
                "query_name": pa.array(
                    np.repeat(np.array(out_names, dtype=object), counts),
                    type=pa.string(),
                ),
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
