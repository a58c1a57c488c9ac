"""Block-max WAND top-k pruning for term / pure-disjunction queries.

Strictly result-preserving (SURVEY.md §7.2.6): per-128-doc-block metadata
(max_tf, min_normb — codec.encode_postings) gives a true upper bound on any
doc's score inside the block (similarity.block_max_score). The docid axis is
cut into zones at the union of all terms' block boundaries; a zone whose
summed per-term bounds cannot beat the current k-th score is skipped without
decoding. Safe w.r.t. Lucene's tie rules: a doc scoring exactly the heap-min
cannot enter the heap anyway (TopScoreDocCollector.cs:47-59), so pruning at
``bound <= threshold`` loses nothing; zones are visited in increasing docid
order, matching the in-order collector's smaller-docID-wins behavior.

Blocks are decoded lazily and at most once per term (postings_block_range).
"""

from __future__ import annotations

import heapq

import numpy as np

from ..functions import similarity as sim
from ..state.segment import BLOCK_SIZE, SegmentReader


def wand_top_k(
    reader: SegmentReader,
    term_weights: list[tuple[str, np.float32]],
    cache: np.ndarray,
    k: int,
    search_after: tuple[float, int] | None = None,
) -> list[tuple[int, float]]:
    """[(local docid, float32 score)] top-k of sum-of-term-scores (SHOULD sum).

    term_weights: [(term, weight_value)] with weight_value = idf*(k1+1)*boost
    from index-global stats. Results identical to exhaustive evaluation.
    """
    norms = reader.norms
    terms = []
    for term, w in term_weights:
        if w <= 0:
            continue
        ti = reader.term_index(term)
        if ti < 0:
            continue
        blocks = reader.blocks(ti)
        ub = sim.block_max_score(blocks["max_tf"], blocks["min_normb"], w, cache)
        terms.append(
            {
                "ti": ti,
                "w": np.float32(w),
                "blocks": blocks,
                "last": blocks["last_doc"],
                "ub": ub,
                "cache_blk": {},  # block idx -> (docids, tfs)
            }
        )
    if not terms:
        return []

    # zone boundaries: union of all block last-docs (zone = (prev, b])
    bounds = np.unique(np.concatenate([t["last"] for t in terms]))
    heap: list[tuple[np.float32, int]] = []  # (score, -docid) min-heap of top-k

    def threshold() -> np.float32:
        return heap[0][0] if len(heap) >= k else np.float32(-np.inf)

    a_score = np.float32(search_after[0]) if search_after else None
    a_doc = (search_after[1] - reader.doc_base) if search_after else None

    zone_lo = 0  # first docid of current zone
    for e in bounds:
        # per-term covering block index and bound sum (float64, then rounded
        # UP one ulp in float32 — the real score is f32(f64 sum of f32 term
        # scores) and must never exceed a bound we prune against)
        zone_bound = 0.0
        cover: list[tuple[dict, int]] = []
        for t in terms:
            bi = int(np.searchsorted(t["last"], zone_lo))
            if bi >= t["last"].size:
                continue  # term exhausted before this zone
            cover.append((t, bi))
            zone_bound += float(t["ub"][bi])
        safe_bound = np.nextafter(np.float32(zone_bound), np.float32(np.inf))
        if cover and (len(heap) < k or safe_bound > threshold()):
            # decode covering blocks (cached), restrict to zone, accumulate
            zone_docs: list[np.ndarray] = []
            zone_scores: list[np.ndarray] = []
            for t, bi in cover:
                blk = t["cache_blk"].get(bi)
                if blk is None:
                    docids, tfs, _ = reader.postings_block_range(t["ti"], bi, bi + 1, t["blocks"])
                    blk = (docids, tfs)
                    t["cache_blk"][bi] = blk
                docids, tfs = blk
                m = (docids >= zone_lo) & (docids <= e)
                if not m.any():
                    continue
                d = docids[m]
                s = sim.score_tf(tfs[m], norms[d], t["w"], cache)
                zone_docs.append(d)
                zone_scores.append(s)
            if zone_docs:
                if len(zone_docs) == 1:
                    uniq, final = zone_docs[0], zone_scores[0]
                else:
                    alld = np.concatenate(zone_docs)
                    alls = np.concatenate(zone_scores)
                    uniq = np.unique(alld)
                    acc = np.zeros(uniq.size, dtype=np.float64)
                    np.add.at(acc, np.searchsorted(uniq, alld), alls.astype(np.float64))
                    final = acc.astype(np.float32)
                if a_score is not None:
                    keep = (final < a_score) | ((final == a_score) & (uniq > a_doc))
                    uniq, final = uniq[keep], final[keep]
                if len(heap) >= k:
                    # vectorized pre-filter: only strict improvements can enter
                    # (equal-to-min never displaces: smaller docIDs came first)
                    cand = np.flatnonzero(final > heap[0][0])
                else:
                    cand = np.arange(uniq.size)
                for i in cand.tolist():
                    item = (np.float32(final[i]), -int(uniq[i]))
                    if len(heap) < k:
                        heapq.heappush(heap, item)
                    elif item > heap[0]:
                        heapq.heapreplace(heap, item)
        zone_lo = int(e) + 1

    out = [(-nd, float(s)) for s, nd in heap]
    out.sort(key=lambda h: (-h[1], h[0]))
    return out


def is_wand_eligible(q) -> list[tuple[str, float]] | None:
    """Return [(term, boost)] if q is a term or pure SHOULD-of-terms
    disjunction (minShouldMatch<=1, no boost nesting surprises), else None."""
    from ..query import BooleanQuery, TermQuery

    if isinstance(q, TermQuery):
        return [(q.term, q.boost)]
    if isinstance(q, BooleanQuery) and q.min_should_match <= 1 and q.boost == 1.0:
        out = []
        for c in q.clauses:
            if c.occur != "SHOULD" or not isinstance(c.query, TermQuery):
                return None
            out.append((c.query.term, c.query.boost))
        return out if out else None
    return None
