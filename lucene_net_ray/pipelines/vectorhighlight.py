"""FastVectorHighlighter analog — phrase-aware highlighting driven by INDEXED
positions + offsets, never re-analysis.

Reference: /root/reference/src/Lucene.Net.Highlighter/Vectorhighlight/
FastVectorHighlighter.cs:35 (FieldQuery -> FieldTermStack -> FieldPhraseList
-> FragListBuilder -> FragmentsBuilder), FieldTermStack.cs (term vector
positions+offsets pruned to the query's term set), FieldPhraseList.cs
(consecutive-position phrase matching with boosts), SimpleFragListBuilder.cs
(margin = fragCharSize/6, greedy windows), ScoreOrderFragmentsBuilder.cs
(fragments ordered by total boost).

The reference reads per-doc term vectors with positions+offsets; this
engine's equivalent stored shape is the offsets-at-index mode — postings
positions per term (SegmentReader.positions) plus per-position char offsets
(SegmentReader.position_char_offsets). The term stack is pruned to query
terms exactly like FieldTermStack, so the per-hit cost is O(query terms'
postings in this doc), not O(doc length).

What distinguishes FVH from the re-analyze Highlighter and the
PostingsHighlighter here: PHRASE AWARENESS — a PhraseQuery only highlights
occurrences where its terms sit at consecutive positions, as one combined
span. Slop>0 phrase support and per-phrase multi-color tags are scoped out
(the reference's FieldQuery slop path and tag arrays); single pre/post tags
cover the test surface.
"""

from __future__ import annotations

import numpy as np


def _flatten_phrases(q, boost: float = 1.0) -> list[tuple[tuple[str, ...], float]]:
    """FieldQuery.flatten analog: the query's positive term sequences with
    effective boosts. MUST_NOT children never highlight; unsupported leaf
    types (multi-term, ranges) contribute nothing — the reference requires
    rewritten queries for those too."""
    from ..query import (
        MUST_NOT,
        BooleanQuery,
        BoostingQuery,
        ConstantScoreQuery,
        DisjunctionMaxQuery,
        FilteredQuery,
        PhraseQuery,
        TermQuery,
    )

    b = boost * getattr(q, "boost", 1.0)
    if isinstance(q, TermQuery):
        return [((q.term,), b)]
    if isinstance(q, PhraseQuery):
        return [(tuple(q.terms), b)] if q.terms else []
    if isinstance(q, BooleanQuery):
        out = []
        for c in q.clauses:
            if c.occur == MUST_NOT:
                continue
            out.extend(_flatten_phrases(c.query, b))
        return out
    if isinstance(q, DisjunctionMaxQuery):
        out = []
        for sub in q.disjuncts:
            out.extend(_flatten_phrases(sub, b))
        return out
    if isinstance(q, (ConstantScoreQuery, FilteredQuery)):
        return _flatten_phrases(q.query, b)
    if isinstance(q, BoostingQuery):
        return _flatten_phrases(q.match, b)
    return []


def _reader_for(searcher, docid: int):
    """(SegmentReader, local docid) for a global docid — the postings_highlight
    routing, shared."""
    if hasattr(searcher, "reader"):  # MergedSearcher
        return searcher.reader, docid
    if not hasattr(searcher, "_ph_readers"):
        from ..state.segment import SegmentReader

        searcher._ph_readers = [SegmentReader(d) for d in searcher.index.segment_dirs]
    for r in searcher._ph_readers:
        if r.doc_base <= docid < r.doc_base + r.doc_count:
            return r, docid - r.doc_base
    raise ValueError(f"docid {docid} outside index doc range")


def _term_positions(r, local: int, terms: list[str]) -> dict[str, np.ndarray]:
    """FieldTermStack analog: positions of each QUERY term in the doc, read
    from indexed postings (the term-vector role)."""
    out: dict[str, np.ndarray] = {}
    for t in terms:
        docids, _tfs, flat, occ = r.positions(t)
        j = int(np.searchsorted(docids, local))
        if j < docids.size and docids[j] == local:
            out[t] = flat[occ[j] : occ[j + 1]]
    return out


def _phrase_occurrences(
    phrases: list[tuple[tuple[str, ...], float]],
    pos: dict[str, np.ndarray],
    starts: np.ndarray,
    ends: np.ndarray,
) -> list[tuple[int, int, float]]:
    """FieldPhraseList analog: (char_start, char_end, boost) of every phrase
    occurrence — terms at consecutive positions, offsets spanning first to
    last term."""
    occs: list[tuple[int, int, float]] = []
    for terms, boost in phrases:
        if any(t not in pos for t in terms):
            continue
        first = pos[terms[0]]
        cand = first
        for i, t in enumerate(terms[1:], 1):
            if cand.size == 0:
                break
            mask = np.isin(cand + i, pos[t], assume_unique=False)
            cand = cand[mask]
        for p in cand.tolist():
            last = p + len(terms) - 1
            if p < starts.size and last < ends.size:
                occs.append((int(starts[p]), int(ends[last]), boost))
    occs.sort()
    return occs


def _frag_list(
    occs: list[tuple[int, int, float]], frag_char_size: int
) -> list[tuple[int, int, float, list[tuple[int, int]]]]:
    """SimpleFragListBuilder analog: greedy windows of frag_char_size chars
    with margin = fragCharSize/6 before the first phrase; each fragment
    carries (win_start, win_end, total_boost, [phrase spans])."""
    margin = frag_char_size // 6
    frags = []
    i, n = 0, len(occs)
    prev_end = 0
    while i < n:
        s0 = max(occs[i][0] - margin, prev_end)
        w_end = s0 + frag_char_size
        spans: list[tuple[int, int]] = []
        total = 0.0
        while i < n and occs[i][0] >= s0 and occs[i][1] <= w_end:
            spans.append((occs[i][0], occs[i][1]))
            total += occs[i][2]
            i += 1
        if not spans:  # phrase longer than the window: widen to fit it
            spans.append((occs[i][0], occs[i][1]))
            total += occs[i][2]
            w_end = max(w_end, occs[i][1])
            i += 1
        frags.append((s0, w_end, total, spans))
        prev_end = w_end
    return frags


def fast_vector_highlight(
    searcher,
    docid: int,
    q,
    *,
    field: str | None = None,
    frag_char_size: int = 100,
    max_frags: int = 2,
    pre: str = "<b>",
    post: str = "</b>",
    score_order: bool = True,
) -> list[str]:
    """Best fragments for a hit doc, phrase-aware, from indexed offsets.

    Requires the index built with index_options='offsets' and the text
    column stored (the same contract as postings_highlight — the engine's
    term-vector-with-offsets equivalent). ``pre``/``post`` may be LISTS —
    the reference's multi-colored tag arrays, cycled per highlighted span
    in document order (BaseFragmentsBuilder.preTags/postTags)."""
    phrases = _flatten_phrases(q)
    if not phrases:
        return []
    pres = list(pre) if isinstance(pre, (list, tuple)) else [pre]
    posts = list(post) if isinstance(post, (list, tuple)) else [post]
    r, local = _reader_for(searcher, docid)
    if hasattr(searcher, "reader"):
        field = field or "content"
        text = r.stored_value(local, field)
    else:
        field = field or searcher.field
        text = r.doc_values(field)[local]
    starts, ends = r.position_char_offsets(local)
    terms = sorted({t for seq, _ in phrases for t in seq})
    pos = _term_positions(r, local, terms)
    occs = _phrase_occurrences(phrases, pos, starts, ends)
    if not occs:
        return []
    frags = _frag_list(occs, frag_char_size)
    if score_order:
        frags.sort(key=lambda f: (-f[2], f[0]))
    frags = frags[:max_frags]
    frags.sort(key=lambda f: f[0])  # emit in document order, like the tests
    out = []
    for s0, w_end, _total, spans in frags:
        e0 = min(w_end, len(text))
        # merge overlapping spans (a term shared by two phrases)
        merged: list[list[int]] = []
        for a, b in sorted(set(spans)):
            if merged and a < merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], b)
            else:
                merged.append([a, b])
        buf, cur = [], s0
        for si, (a, b) in enumerate(merged):
            buf.append(text[cur:a])
            buf.append(pres[si % len(pres)] + text[a:b] + posts[si % len(posts)])
            cur = b
        buf.append(text[cur:e0])
        out.append("".join(buf))
    return out
