"""Search serving: actor-pool segment readers + driver-side TopDocs merge.

Reference flow (SURVEY.md §3.3): open point-in-time view -> ONE global stats
pass (idf/avgdl are index-global even though scoring is per-segment,
/root/reference/src/Lucene.Net.Core/Search/IndexSearcher.cs:1001-1013) ->
per-leaf scorers -> TopDocs.Merge with (score desc, docID asc) tie-break
(/root/reference/src/Lucene.Net.Core/Search/TopDocs.cs:251-320,
 /root/reference/src/Lucene.Net.Core/Search/HitQueue.cs:78-88).

Here: SegmentGroupActor holds SegmentReaders (term dict in RAM, postings
mmap'd) — load once per actor, reused across queries. The driver broadcasts
(query, global stats, k), actors return per-segment top-k, the driver heap-
merges. For batch evaluation of a query SET, `batch_search` amortizes one
actor round-trip over many queries.

At cluster scale the actor pool is sized to nodes x cores and each actor owns
a disjoint group of segments; global stats are one small gather per query
(term-dict lookups only), not a shuffle.
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import ray

from ..query import Query
from ..state.index import IndexMeta
from ..state.segment import SegmentReader
from .scorer import SegmentScorer, expand_multiterm, query_fields, query_terms


def _sort_key_fn(sort_fields):
    """Tuple sort key honoring per-field descending flags (strings too)."""

    class _NegStr(str):
        def __lt__(self, other):  # noqa: D105
            return str.__gt__(self, other)

    def key(row):
        key_vals, gid = row
        out = []
        for (f, desc), v in zip(sort_fields, key_vals):
            import numpy as _np

            if isinstance(v, (int, float, _np.number)) and not isinstance(v, bool):
                out.append(-v if desc else v)
            else:
                out.append(_NegStr(v) if desc else v)
        out.append(gid)
        return tuple(out)

    return key


class TimeExceededError(Exception):
    """TimeLimitingCollector.TimeExceededException analog: carries the hits
    collected before the budget ran out (reference
    Search/TimeLimitingCollector.cs; greedy mode returns them instead)."""

    def __init__(self, partial: list):
        super().__init__(f"time limit exceeded after {len(partial)} hits")
        self.partial = partial


class _SegmentGroup:
    """In-process group of segments (shared by local searcher and actors).

    ``deleted`` is the index-global tombstone array (liveDocs analog); each
    reader's local slice is computed once here. At cluster scale the array
    ships once per actor at construction (or per refresh), not per query.
    """

    def __init__(self, seg_dirs: list[str], deleted: list[int] | None = None):
        self.readers = [SegmentReader(d) for d in seg_dirs]
        import numpy as _np

        dels = _np.asarray(deleted if deleted is not None else [], dtype=_np.int64)
        self.deleted_local = []
        for r in self.readers:
            lo, hi = r.doc_base, r.doc_base + r.doc_count
            sel = dels[(dels >= lo) & (dels < hi)] - lo
            self.deleted_local.append(sel)

    def term_stats(self, terms: list[str]) -> dict[str, list[int]]:
        # Codecs/Bloom fast path: a reader whose term set says "definitely
        # absent" is skipped without a dict probe (vectorized per reader).
        maybes = []
        for r in self.readers:
            bl = r.term_bloom
            maybes.append(bl.may_contain_many(terms) if bl is not None else None)
        out = {}
        for i, t in enumerate(terms):
            df = ttf = 0
            for r, mb in zip(self.readers, maybes):
                if mb is not None and not mb[i]:
                    continue
                d, tt = r.term_stats(t)
                df += d
                ttf += tt
            out[t] = [df, ttf]
        return out

    def bloom_union(self):
        """OR of the segments' term sets — None unless EVERY segment has one
        (a missing set would make the union claim false absences)."""
        blooms = [r.term_bloom for r in self.readers]
        if not blooms or any(b is None for b in blooms):
            return None
        u = blooms[0]
        for b in blooms[1:]:
            u = u.union(b)
        return u

    def expand(self, q: Query) -> list[tuple[str, float]]:
        seen: dict[str, float] = {}
        for r in self.readers:
            for t, b in expand_multiterm(r, q):
                seen.setdefault(t, b)
        return sorted(seen.items())

    def top_k(
        self, q: Query, stats: dict, k: int, search_after=None, budget: dict | None = None
    ) -> list[tuple[int, float]]:
        """budget: {"time_limit_s": float|None, "early_docs": int|None,
        "greedy": bool} — TimeLimitingCollector / EarlyTerminating analogs.
        The time check runs between segments (our collection unit); greedy
        returns the partial hits, non-greedy raises TimeExceededError."""
        import time as _time

        deadline = None
        early_docs = None
        greedy = False
        if budget:
            if budget.get("time_limit_s") is not None:
                deadline = _time.monotonic() + budget["time_limit_s"]
            early_docs = budget.get("early_docs")
            greedy = bool(budget.get("greedy"))
        merged: list[tuple[int, float]] = []
        for r, dels in zip(self.readers, self.deleted_local):
            if deadline is not None and _time.monotonic() > deadline:
                merged.sort(key=lambda h: (-h[1], h[0]))
                if greedy:
                    return merged[:k]
                raise TimeExceededError(merged[:k])
            if early_docs is not None:
                merged.extend(
                    self._early_top_k(r, dels, q, stats, k, search_after, early_docs)
                )
            else:
                merged.extend(
                    SegmentScorer(r, stats).top_k(q, k, search_after, exclude_local=dels)
                )
        merged.sort(key=lambda h: (-h[1], h[0]))
        return merged[:k]

    @staticmethod
    def _early_top_k(r, dels, q, stats, k, search_after, early_docs):
        """EarlyTerminatingSortingCollector semantics: per segment, only the
        FIRST ``early_docs`` matching docs (docID order) are collected."""
        import numpy as _np

        scorer = SegmentScorer(r, stats)
        docs, scores = scorer.evaluate(q)
        if dels.size and docs.size:
            keep = ~_np.isin(docs, dels, assume_unique=True)
            docs, scores = docs[keep], scores[keep]
        docs, scores = docs[:early_docs], scores[:early_docs]  # docID-ordered
        if search_after is not None:
            a_score = _np.float32(search_after[0])
            a_doc = search_after[1] - r.doc_base
            m = (scores < a_score) | ((scores == a_score) & (docs > a_doc))
            docs, scores = docs[m], scores[m]
        if docs.size == 0:
            return []
        order = _np.lexsort((docs, -scores))[:k]
        return [(int(docs[i]) + r.doc_base, float(scores[i])) for i in order]

    def top_k_many(self, items: list[tuple[Query, dict]], k: int) -> list[list[tuple[int, float]]]:
        """Evaluate many (query, stats) pairs in ONE actor round-trip — the
        bulk-serving path's amortization of per-call overhead."""
        return [self.top_k(q, stats, k) for q, stats in items]

    def count(self, q: Query, stats: dict) -> int:
        import numpy as _np

        total = 0
        for r, dels in zip(self.readers, self.deleted_local):
            docs, _ = SegmentScorer(r, stats).evaluate(q)
            if dels.size:
                docs = docs[~_np.isin(docs, dels, assume_unique=True)]
            total += int(docs.size)
        return total

    # --- collector partials (facet / sorted / grouping run on the actors;
    # the driver only merges per-group summaries, never raw matches) --------
    def _matching(self, q: Query, stats: dict):
        import numpy as _np

        for r, dels in zip(self.readers, self.deleted_local):
            docs, scores = SegmentScorer(r, stats).evaluate(q)
            if dels.size and docs.size:
                keep = ~_np.isin(docs, dels, assume_unique=True)
                docs, scores = docs[keep], scores[keep]
            if docs.size:
                yield r, docs, scores

    def facet_partial(self, q: Query, stats: dict, field: str) -> dict:
        from collections import Counter

        out: Counter = Counter()
        for r, docs, _s in self._matching(q, stats):
            out.update(Counter(r.doc_values(field)[docs].tolist()))
        return dict(out)

    def sorted_partial(self, q: Query, stats: dict, sort_fields: list, k: int) -> list:
        """Per-segment top-k rows [(key_vals tuple, global docid)] — safe
        pre-truncation before the driver's k-way merge."""
        import numpy as _np

        rows: list = []
        for r, docs, _s in self._matching(q, stats):
            vals = {f: r.doc_values(f)[docs] for f, _ in sort_fields}
            seg_rows = [
                (tuple(vals[f][i] for f, _ in sort_fields), int(docs[i]) + r.doc_base)
                for i in range(docs.size)
            ]
            seg_rows.sort(key=_sort_key_fn(sort_fields))
            rows.extend(seg_rows[:k])
        return rows

    def group_partial(
        self, q: Query, stats: dict, group_field: str, k_per_group: int
    ) -> dict:
        """{group value: per-group top hits [(score, gid)]} truncated per
        segment — associative under the driver's re-sort merge."""
        import numpy as _np
        from collections import defaultdict

        groups: dict = defaultdict(list)
        for r, docs, scores in self._matching(q, stats):
            vals = r.doc_values(group_field)[docs]
            for gid, v, s in zip((docs + r.doc_base).tolist(), vals.tolist(), scores.tolist()):
                groups[v].append((float(_np.float32(s)), gid))
        return {
            v: sorted(hits, key=lambda h: (-h[0], h[1]))[:k_per_group]
            for v, hits in groups.items()
        }

    def field_minmax_partial(self, fields: list) -> dict:
        """{field: (min, max)} over this shard's LIVE docs."""
        import numpy as _np

        out: dict = {}
        for r, dels in zip(self.readers, self.deleted_local):
            for f in fields:
                vals = r.doc_values(f)
                if dels.size:
                    keep = _np.ones(len(vals), dtype=bool)
                    keep[dels] = False
                    vals = vals[keep]
                if len(vals) == 0:
                    continue
                mn, mx = vals.min(), vals.max()
                cur = out.get(f)
                out[f] = (
                    (mn, mx) if cur is None else (min(cur[0], mn), max(cur[1], mx))
                )
        return {f: (v[0].item() if hasattr(v[0], "item") else v[0],
                    v[1].item() if hasattr(v[1], "item") else v[1])
                for f, v in out.items()}

    def sorted_partial_early(
        self, q: Query, stats: dict, sort_fields: list, k: int, ranges: dict
    ) -> tuple:
        """EarlyTerminatingSortingCollector analog
        (Index/Sorter/EarlyTerminatingSortingCollector.cs): when the index is
        range-partitioned by the leading sort field (sort_index), this group
        walks ITS readers in key order and stops once k rows are collected
        and the next reader's best possible key is strictly worse than the
        kth (ties continue — exactness over eagerness). Returns
        (rows like sorted_partial, n_segments_evaluated)."""
        import numpy as _np

        field, desc = sort_fields[0]
        order = sorted(
            range(len(self.readers)),
            key=lambda i: ranges[os.path.basename(self.readers[i].seg_dir.rstrip("/"))][
                1 if desc else 0
            ],
            reverse=bool(desc),
        )
        key_fn = _sort_key_fn(sort_fields)
        rows: list = []
        n_eval = 0
        for pos, i in enumerate(order):
            r, dels = self.readers[i], self.deleted_local[i]
            docs, scores = SegmentScorer(r, stats).evaluate(q)
            if dels.size and docs.size:
                keep = ~_np.isin(docs, dels, assume_unique=True)
                docs = docs[keep]
            n_eval += 1
            if docs.size:
                vals = {f: r.doc_values(f)[docs] for f, _ in sort_fields}
                seg_rows = [
                    (
                        tuple(vals[f][j] for f, _ in sort_fields),
                        int(docs[j]) + r.doc_base,
                    )
                    for j in range(docs.size)
                ]
                seg_rows.sort(key=key_fn)
                rows.extend(seg_rows[:k])
                rows.sort(key=key_fn)
                rows = rows[:k]
            if len(rows) >= k and pos + 1 < len(order):
                nxt = self.readers[order[pos + 1]]
                nb = ranges[os.path.basename(nxt.seg_dir.rstrip("/"))][1 if desc else 0]
                kth = rows[k - 1][0][0]
                worse = nb < kth if desc else nb > kth
                if worse:
                    break
        return rows, n_eval

    def group_heads_partial(
        self, q: Query, stats: dict, group_field: str, sort_fields: list
    ) -> dict:
        """{group value: (key_vals tuple, global docid)} — the best matching
        doc per group within this shard by the sort order (AllGroupHeads
        partial; associative under the driver's per-group min merge).
        Reference: Grouping/AbstractAllGroupHeadsCollector.cs:12."""
        import numpy as _np

        heads: dict = {}
        key_fn = _sort_key_fn(sort_fields)
        for r, docs, _s in self._matching(q, stats):
            gvals = r.doc_values(group_field)[docs]
            cols = [r.doc_values(f)[docs] for f, _ in sort_fields]
            keys = []
            for c, (_f, desc) in zip(cols, sort_fields):
                codes = (
                    c
                    if _np.issubdtype(c.dtype, _np.number)
                    else _np.unique(c, return_inverse=True)[1]
                )
                keys.append(-codes if desc else codes)
            gids = docs + r.doc_base
            order = _np.lexsort((gids, *keys[::-1]))
            # first occurrence per group in sort order = segment-local head
            _uniq, first = _np.unique(gvals[order], return_index=True)
            for j in first.tolist():
                i = int(order[j])
                row = (tuple(col[i] for col in cols), int(gids[i]))
                g = gvals[i]
                cur = heads.get(g)
                if cur is None or key_fn(row) < key_fn(cur):
                    heads[g] = row
        return heads

    def pair_partial(self, q: Query, stats: dict, field_a: str, field_b: str) -> list:
        """Distinct (field_a value, field_b value) pairs among matching docs —
        the shared partial behind DistinctValues and GroupFacet collectors
        (associative under set union on the driver)."""
        import numpy as _np

        out: set = set()
        for r, docs, _s in self._matching(q, stats):
            a = r.doc_values(field_a)[docs]
            b = r.doc_values(field_b)[docs]
            ua, ca = _np.unique(a, return_inverse=True)
            ub, cb = _np.unique(b, return_inverse=True)
            ua, ub = ua.tolist(), ub.tolist()
            for p in _np.unique(ca.astype(_np.int64) * len(ub) + cb).tolist():
                out.add((ua[p // len(ub)], ub[p % len(ub)]))
        return list(out)

    def span_partial(self, q, stats: dict, k: int) -> list:
        """Per-segment span-query top-k (SpanEvaluator runs actor-side)."""
        import numpy as _np

        from .spans import SpanEvaluator

        out = []
        for r, dels in zip(self.readers, self.deleted_local):
            docs, scores = SpanEvaluator(r, stats).evaluate(q)
            if dels.size and docs.size:
                keep = ~_np.isin(docs, dels, assume_unique=True)
                docs, scores = docs[keep], scores[keep]
            order = _np.lexsort((docs, -scores))[:k]
            out.append([(int(docs[i]) + r.doc_base, float(scores[i])) for i in order])
        return out

    def rescore_partial(
        self, q: Query, stats: dict, fields: list[str], score_fn, window: int
    ) -> list:
        """Per-segment rescore window [(gid, new_score)] for function scoring
        (score_fn ships to the actor via cloudpickle)."""
        import numpy as _np

        rows: list = []
        for r, docs, scores in self._matching(q, stats):
            vals = {f: r.doc_values(f)[docs] for f in fields}
            new_scores = _np.asarray(score_fn(scores, vals), dtype=_np.float64)
            gids = docs + r.doc_base
            order = _np.lexsort((gids, -new_scores))[:window]
            rows.extend((int(gids[i]), float(new_scores[i])) for i in order)
        return rows

    def function_partial(
        self, q: Query, stats: dict, fields: list[str], score_fn, window: int, ispec: dict
    ) -> list:
        """rescore_partial plus per-doc index-bound ValueSources (reference
        Queries/Function/ValueSources/): raw term freqs aligned to the
        candidate docs, byte315-decoded norms, global-ord lookups, and
        sub-query scores with default fill — all vectorized per segment."""
        import numpy as _np

        from ..functions.norms import BYTE315_DECODE

        def _align(src_docs, src_vals, docs, default, dtype=_np.float64):
            """Scatter (src_docs -> src_vals) onto the sorted candidate docs."""
            out = _np.full(docs.size, default, dtype=dtype)
            if src_docs.size:
                idx = _np.searchsorted(src_docs, docs)
                idx_c = _np.minimum(idx, src_docs.size - 1)
                m = src_docs[idx_c] == docs
                out[m] = src_vals[idx_c[m]]
            return out

        rows: list = []
        for r, docs, scores in self._matching(q, stats):
            vals = {f: r.doc_values(f)[docs] for f in fields}
            for t in ispec.get("tf_terms", ()):
                pdocs, ptfs = r.postings(t)
                vals[f"__tf:{t}"] = _align(pdocs, ptfs, docs, 0.0)
            if ispec.get("norm"):
                vals["__norm"] = BYTE315_DECODE[r.norms[docs]].astype(_np.float64)
            for fld, gvals in ispec.get("ords", {}).items():
                fv = r.doc_values(fld)[docs]
                vals[f"__ord:{fld}"] = _np.searchsorted(gvals, fv).astype(_np.float64)
            for qstr, (subq, substats, defval) in ispec.get("queries", {}).items():
                qdocs, qscores = SegmentScorer(r, substats).evaluate(subq)
                vals[f"__query:{qstr}"] = _align(qdocs, qscores, docs, defval)
            new_scores = _np.asarray(score_fn(scores, vals), dtype=_np.float64)
            gids = docs + r.doc_base
            order = _np.lexsort((gids, -new_scores))[:window]
            rows.extend((int(gids[i]), float(new_scores[i])) for i in order)
        return rows

    def scored_docs(self, q: Query, stats: dict) -> list[tuple[int, float]]:
        """All matching live (global docid, score) — for tests/oracles."""
        import numpy as _np

        out = []
        for r, dels in zip(self.readers, self.deleted_local):
            docs, scores = SegmentScorer(r, stats).evaluate(q)
            if dels.size:
                keep = ~_np.isin(docs, dels, assume_unique=True)
                docs, scores = docs[keep], scores[keep]
            out.extend(zip((docs + r.doc_base).tolist(), scores.tolist()))
        return out


SegmentGroupActor = ray.remote(_SegmentGroup)


def merge_top_docs(per_shard: list[list[tuple[int, float]]], k: int) -> list[tuple[int, float]]:
    """TopDocs.Merge: k-way merge by (score desc, global docID asc)."""
    heap = []
    for hits in per_shard:
        for doc, score in hits:
            heap.append((-np.float32(score), doc))
    heapq.heapify(heap)
    out = []
    while heap and len(out) < k:
        ns, doc = heapq.heappop(heap)
        out.append((doc, float(np.float32(-ns))))
    return out


class QueryEvalStage:
    """Actor-pool map_batches stage: evaluate a Dataset of query strings.

    Round-2 sharded design: the stage actors hold NO index. A fixed group of
    SegmentGroupActor handles (each owning a DISJOINT segment slice — memory
    per actor = 1/G of the index) is created once and shared by every stage
    actor; each query batch is scattered to all groups in one remote call per
    group (``top_k_many``) and gathered/merged per query. This reuses the
    per-query Searcher's group topology for the bulk path, replacing the
    round-1 design that replicated the FULL index into every stage actor.
    Global stats are per-term lookups, cached across batches per stage actor.
    """

    def __init__(
        self,
        index_dir: str,
        k: int = 10,
        group_handles: list | None = None,
        replica_sets: list[list] | None = None,
    ):
        from ..state.index import IndexMeta

        meta = IndexMeta(index_dir)
        if replica_sets:
            # R independent group sets (each a full partition of the index);
            # batches round-robin across replicas for throughput while each
            # actor still holds only 1/G of the index
            self.searchers = [Searcher(meta, groups=g) for g in replica_sets]
        elif group_handles is not None:
            self.searchers = [Searcher(meta, groups=group_handles)]
        else:  # in-process fallback (tests / no shared actors)
            self.searchers = [Searcher(meta, use_actors=False)]
        self._rr = 0
        self.k = k

    @property
    def searcher(self):
        s = self.searchers[self._rr % len(self.searchers)]
        self._rr += 1
        return s

    def __call__(self, batch):
        import pyarrow as pa

        from ..query import parse_query

        parsed = []
        for row in batch.to_pylist():
            try:
                parsed.append((row["query_id"], parse_query(row["query"])))
            except Exception:
                continue
        out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
        if parsed:
            searcher = self.searcher  # one replica set per batch (round-robin)
            # warm the df cache with ONE stats gather for the whole batch
            terms = sorted({t for _, q in parsed for t in query_terms(q)})
            if terms:
                searcher._stats_for_terms(terms)
            hits_by_name = searcher.batch_search(
                [(str(qid), q) for qid, q in parsed], k=self.k
            )
            for qid, _q in parsed:
                for rank, (doc, score) in enumerate(hits_by_name[str(qid)], 1):
                    out["query_id"].append(qid)
                    out["rank"].append(rank)
                    out["doc_id"].append(doc)
                    out["score"].append(float(score))
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "rank": pa.array(out["rank"], type=pa.int64()),
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "score": pa.array(out["score"], type=pa.float64()),
            }
        )


def evaluate_query_dataset(
    index_dir: str,
    queries_ds,
    *,
    k: int = 10,
    concurrency=(1, 8),
    batch_size: int = 64,
    num_groups: int = 8,
    group_replicas: int = 1,
    share_groups: bool = True,
):
    """queries Dataset (query_id, query) -> hits Dataset (query_id, rank, doc_id, score).

    With share_groups (default) the index lives in shared segment-group
    actors (1/num_groups of the index each); the map_batches actors are
    lightweight dispatchers, so index size is bounded by a worker's share,
    not replicated per dispatcher. ``group_replicas`` adds independent group
    sets batches round-robin over — use when group actors (not dispatchers
    or cores) are the bottleneck; per-actor memory stays 1/num_groups.
    Measured on the 200k bench index (32 cpus): G=8/R=1 119 QPS vs 102 for
    full per-dispatcher replication at 8x the memory; R>1 oversubscribes
    this box and loses (85/46 QPS at R=2/3) — raise R only with the cores
    to back it."""
    fn_kwargs = {"index_dir": index_dir, "k": k}
    if share_groups:
        meta = IndexMeta(index_dir)
        sets = [
            Searcher(meta, num_actors=num_groups, use_actors=True).groups
            for _ in range(max(1, group_replicas))
        ]
        if len(sets) == 1:
            fn_kwargs["group_handles"] = sets[0]
        else:
            fn_kwargs["replica_sets"] = sets
    return queries_ds.map_batches(
        QueryEvalStage,
        fn_constructor_kwargs=fn_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class Searcher:
    """IndexSearcher analog. use_actors=False runs in-process (tests)."""

    def __init__(
        self,
        index: IndexMeta | str,
        num_actors: int = 4,
        use_actors: bool = True,
        groups: list | None = None,
    ):
        """``groups`` adopts EXISTING SegmentGroupActor handles (shared
        topology — e.g. the bulk-eval dispatchers all talk to one fixed group
        set) instead of creating new actors."""
        self.index = index if isinstance(index, IndexMeta) else IndexMeta(index)
        self.field = self.index.manifest.get("content_column", "content")
        self._df_cache: dict[str, int] = {}
        self.use_term_bloom = True  # driver-side Codecs/Bloom fan-out skip
        self._group_blooms_cache = None
        if groups is not None:
            self.use_actors = True
            self.groups = groups
            return
        seg_dirs = self.index.segment_dirs
        n = max(1, min(num_actors, len(seg_dirs)))
        seg_groups = [seg_dirs[i::n] for i in range(n)]
        self.use_actors = use_actors
        from ..state.deletes import load_deleted

        deleted = load_deleted(self.index.index_dir).tolist()
        if use_actors:
            self.groups = [SegmentGroupActor.remote(g, deleted) for g in seg_groups]
        else:
            self.groups = [_SegmentGroup(g, deleted) for g in seg_groups]

    # --- the global stats pass (one term-dict gather per query) -----------
    def _rewrite_and_stats(self, q: Query) -> tuple[Query, dict]:
        from ..query import BooleanClause, BooleanQuery, FuzzyQuery, TermQuery

        # fuzzy queries need a global expansion so every segment scores the
        # same term set with the same boosts (TopTermsRewrite is searcher-level)
        def rewrite(node: Query) -> Query:
            if isinstance(node, FuzzyQuery):
                if self.use_actors:
                    per = ray.get([g.expand.remote(node) for g in self.groups])
                else:
                    per = [g.expand(node) for g in self.groups]
                seen: dict[str, float] = {}
                for lst in per:
                    for t, b in lst:
                        seen.setdefault(t, b)
                top = sorted(seen.items(), key=lambda tb: (-tb[1], tb[0]))[: node.max_expansions]
                return BooleanQuery(
                    boost=node.boost,
                    clauses=tuple(
                        BooleanClause(TermQuery(field=node.field, term=t, boost=b), "SHOULD")
                        for t, b in top
                    ),
                )
            if isinstance(node, BooleanQuery):
                return BooleanQuery(
                    boost=node.boost,
                    min_should_match=node.min_should_match,
                    clauses=tuple(
                        BooleanClause(rewrite(c.query), c.occur) for c in node.clauses
                    ),
                )
            return node

        q = rewrite(q)
        # a parsed 'title:foo' must not silently search this index's single
        # content field; the parser's default field name 'content' is accepted
        # as an alias for whatever column the index was built over
        unknown = query_fields(q) - {self.field, "content"}
        if unknown:
            raise ValueError(
                f"query references field(s) {sorted(unknown)} but this index "
                f"only has {self.field!r} (use MultiFieldSearcher for multi-field docs)"
            )
        terms = sorted(query_terms(q))
        self._gather_df([t for t in terms if t not in self._df_cache])
        df = {t: self._df_cache[t] for t in terms}
        stats = {"max_doc": self.index.max_doc, "sum_ttf": self.index.sum_ttf, "df": df}
        return q, stats

    @property
    def _group_blooms(self):
        """Per-group unioned Codecs/Bloom term sets, fetched ONCE (lazy).
        Entry is None when a group lacks full coverage. Driver memory is the
        sum of downsized set sizes — ~10 bits per distinct term, the same
        budget the reference spends per segment."""
        if self._group_blooms_cache is None:
            if self.use_actors:
                self._group_blooms_cache = ray.get(
                    [g.bloom_union.remote() for g in self.groups]
                )
            else:
                self._group_blooms_cache = [g.bloom_union() for g in self.groups]
        return self._group_blooms_cache

    def _gather_df(self, missing: list[str]) -> None:
        """Fill the df cache for ``missing`` terms with ONE fan-out, skipping
        groups whose bloom says 'definitely absent' (BloomFilteringPostings-
        Format's reason to exist: fuzzy/spell candidate storms and PK-style
        probes mostly ask for terms that aren't there)."""
        if not missing:
            return
        agg = {t: 0 for t in missing}
        sends: list[tuple[int, list[str]]] = []
        blooms = self._group_blooms if self.use_term_bloom else [None] * len(self.groups)
        for gi, bl in enumerate(blooms):
            if bl is None:
                sends.append((gi, missing))
                continue
            mb = bl.may_contain_many(missing)
            sub = [t for t, m in zip(missing, mb) if m]
            if sub:
                sends.append((gi, sub))
        if self.use_actors:
            per = ray.get(
                [self.groups[gi].term_stats.remote(sub) for gi, sub in sends]
            )
        else:
            per = [self.groups[gi].term_stats(sub) for gi, sub in sends]
        for stats in per:
            for t, (d, _tt) in stats.items():
                agg[t] += d
        self._df_cache.update(agg)

    def _stats_for_terms(self, terms: list[str]) -> dict[str, int]:
        """Global df for arbitrary terms (cached; used by MLT/CommonTerms/suggest)."""
        self._gather_df([t for t in terms if t not in self._df_cache])
        return {t: self._df_cache[t] for t in terms}

    def search(
        self,
        q: Query,
        k: int = 10,
        search_after: tuple[float, int] | None = None,
        *,
        time_limit_s: float | None = None,
        early_terminate_docs: int | None = None,
        greedy: bool = False,
    ) -> list[tuple[int, float]]:
        """time_limit_s / early_terminate_docs: per-group collection budgets
        (TimeLimitingCollector / EarlyTerminatingSortingCollector analogs).
        A non-greedy timeout raises TimeExceededError with the partial hits."""
        q, stats = self._rewrite_and_stats(q)
        budget = None
        if time_limit_s is not None or early_terminate_docs is not None:
            budget = {
                "time_limit_s": time_limit_s,
                "early_docs": early_terminate_docs,
                "greedy": greedy,
            }
        if self.use_actors:
            try:
                per = ray.get(
                    [g.top_k.remote(q, stats, k, search_after, budget) for g in self.groups]
                )
            except ray.exceptions.RayTaskError as e:
                if isinstance(e.cause, TimeExceededError):
                    raise e.cause from None
                raise
        else:
            per = [g.top_k(q, stats, k, search_after, budget) for g in self.groups]
        return merge_top_docs(per, k)

    def count(self, q: Query) -> int:
        q, stats = self._rewrite_and_stats(q)
        if self.use_actors:
            return sum(ray.get([g.count.remote(q, stats) for g in self.groups]))
        return sum(g.count(q, stats) for g in self.groups)

    def scored_docs(self, q: Query) -> list[tuple[int, float]]:
        q, stats = self._rewrite_and_stats(q)
        if self.use_actors:
            per = ray.get([g.scored_docs.remote(q, stats) for g in self.groups])
        else:
            per = [g.scored_docs(q, stats) for g in self.groups]
        out = [h for hits in per for h in hits]
        out.sort(key=lambda h: h[0])
        return out

    def batch_search(self, queries: list[tuple[str, Query]], k: int = 10) -> dict[str, list[tuple[int, float]]]:
        """Evaluate many queries with ONE top_k_many round-trip per group
        (amortizes actor-call overhead over the whole batch)."""
        rewritten = []
        for name, q in queries:
            rq, stats = self._rewrite_and_stats(q)
            rewritten.append((name, rq, stats))
        items = [(rq, stats) for _name, rq, stats in rewritten]
        out = {}
        if self.use_actors:
            per_group = ray.get([g.top_k_many.remote(items, k) for g in self.groups])
        else:
            per_group = [g.top_k_many(items, k) for g in self.groups]
        for i, (name, _rq, _stats) in enumerate(rewritten):
            out[name] = merge_top_docs([pg[i] for pg in per_group], k)
        return out
