"""Per-segment query evaluation: vectorized BM25 scoring over decoded postings.

Replicates the reference's scorer algebra (SURVEY.md §2.6) with numpy set ops
instead of doc-at-a-time iterators:
  ConjunctionScorer   float32 sum in cost-ascending clause order
                      (/root/reference/src/Lucene.Net.Core/Search/ConjunctionScorer.cs:134-141)
  DisjunctionSumScorer double accumulator cast to float32
                      (/root/reference/src/Lucene.Net.Core/Search/DisjunctionSumScorer.cs:80-83)
  ReqOptSumScorer     req float32 + opt float32
  ReqExclScorer       exclusion filter, req score passthrough
  MinShouldMatchSumScorer count>=n variant
  MultiTermQuery      expansion against the segment term dict (rewrite modes:
                      constant-score for prefix/wildcard/range, top-terms
                      scoring with distance boosts for fuzzy)

Scores are float32 at exactly the reference's rounding points (similarity.py),
so per-doc scores are identical to a doc-at-a-time evaluation.
"""

from __future__ import annotations

import re

import numpy as np

from ..functions import similarity as sim
from ..functions.lev_automaton import LevenshteinDFA
from ..query import (
    BooleanClause,
    BooleanQuery,
    BoostingQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FilteredQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MultiPhraseQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    QueryFilter,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from ..state.segment import SegmentReader

# Auto-mode WAND thresholds, set from tools/bench_wand.py measurements on
# synthetic segments with pareto tfs + realistic norm spread (2M & 10M docs,
# the north-rule head-term regime):
#   single term:  df=10k 0.24x | 100k 1.2-2.0x | 500k 2.6x | 2M 3.7-3.8x |
#                 5M 4.5x | 10M 24x   -> crossover ~100k; 500k adds margin
#                 for flat-tf corpora (bench.py's uniform synthetic still
#                 loses at 150k).
#   2-term OR:    sum_df 0.6M 0.22x | 10M 1.25x | 15M 8.1x -> >= 10M wins.
#   3+-term OR:   17M 1.07x | 17.6M 0.34x -> stays exhaustive (sparse terms
#                 smear across the dense terms' zone grid; one vectorized
#                 decode+score wins). mode="wand" still forces any shape.
WAND_MIN_DF = 500_000       # single-term queries
WAND_MIN_OR_DF = 10_000_000  # 2-term disjunctions (summed df)


class ClassicSegmentScorer:
    """TF-IDF (DefaultSimilarity) scorer — the Similarity extension surface.

    Supports TermQuery and flat BooleanQuery of term clauses (MUST / SHOULD /
    MUST_NOT, minShouldMatch) with queryNorm + coord; see
    functions/similarity_classic.py for formula provenance.
    """

    def __init__(self, reader: SegmentReader, global_stats: dict):
        from ..functions import similarity_classic as cs

        self.cs = cs
        self.reader = reader
        self.stats = global_stats

    # Similarity extension hooks (SweetSpotSimilarity overrides both)
    def _tf(self, tfs: np.ndarray) -> np.ndarray:
        return self.cs.classic_tf(tfs)

    def _doc_norms(self) -> np.ndarray:
        return self.cs.CLASSIC_NORM_TABLE[self.reader.norms]

    def _flat_terms(self, q: Query) -> tuple[list[tuple[str, float, str]], int]:
        if isinstance(q, TermQuery):
            return [(q.term, q.boost, "SHOULD")], 0
        if isinstance(q, BooleanQuery):
            out = []
            for c in q.clauses:
                if not isinstance(c.query, TermQuery):
                    raise NotImplementedError("classic scorer supports flat term clauses")
                out.append((c.query.term, c.query.boost, c.occur))
            return out, q.min_should_match
        raise NotImplementedError(f"classic scorer: {type(q).__name__}")

    def evaluate(self, q: Query) -> tuple[np.ndarray, np.ndarray]:
        cs = self.cs
        clauses, msm = self._flat_terms(q)
        n = self.stats["max_doc"]
        scoring = [(t, b) for t, b, occ in clauses if occ != "MUST_NOT"]
        # queryNorm over all scoring clauses' squared weights
        ssw = 0.0
        weights = {}
        for t, b in scoring:
            idf = cs.classic_idf(self.stats["df"].get(t, 0), n)
            qw = np.float32(idf * np.float32(b))
            weights[(t, b)] = (idf, qw)
            ssw += float(qw) * float(qw)
        qn = cs.query_norm(ssw)
        norms = self._doc_norms()

        musts = [(t, b) for t, b, occ in clauses if occ == "MUST"]
        shoulds = [(t, b) for t, b, occ in clauses if occ == "SHOULD"]
        nots = [t for t, b, occ in clauses if occ == "MUST_NOT"]

        def term_scores(t, b):
            docids, tfs = self.reader.postings(t)
            if docids.size == 0:
                return docids, np.empty(0, dtype=np.float32)
            idf, qw = weights[(t, b)]
            value = np.float32(qw * qn)
            s = (self._tf(tfs) * np.float32(idf) * value * norms[docids]).astype(np.float32)
            return docids, s

        evals = {key: term_scores(*key) for key in set(musts + shoulds)}
        req = None
        if musts:
            req = evals[musts[0]][0]
            for key in musts[1:]:
                req = _intersect_sorted(req, evals[key][0])
        union_src = [evals[k][0] for k in set(musts + shoulds)]
        docs = np.unique(np.concatenate(union_src)) if union_src else np.empty(0, dtype=np.int64)
        if req is not None:
            docs = _intersect_sorted(docs, req)
        acc = np.zeros(docs.size, dtype=np.float64)
        matched = np.zeros(docs.size, dtype=np.int64)
        for key in musts + shoulds:
            d, s = evals[key]
            if d.size == 0:
                continue
            ix = np.searchsorted(docs, d)
            valid = (ix < docs.size) & (docs[np.minimum(ix, max(docs.size - 1, 0))] == d) if docs.size else np.zeros(d.size, bool)
            np.add.at(acc, ix[valid], s[valid].astype(np.float64))
            np.add.at(matched, ix[valid], 1)
        if msm > 0 and shoulds:
            should_matched = np.zeros(docs.size, dtype=np.int64)
            for key in shoulds:
                d, s = evals[key]
                ix = np.searchsorted(docs, d)
                valid = (ix < docs.size) & (docs[np.minimum(ix, max(docs.size - 1, 0))] == d) if docs.size else np.zeros(d.size, bool)
                np.add.at(should_matched, ix[valid], 1)
            keep = should_matched >= msm
            docs, acc, matched = docs[keep], acc[keep], matched[keep]
        scores = (acc.astype(np.float32) * self.cs.coord(matched, len(scoring))).astype(np.float32)
        for t in nots:
            nd, _ = self.reader.postings(t)
            if nd.size and docs.size:
                keep = ~np.isin(docs, nd, assume_unique=True)
                docs, scores = docs[keep], scores[keep]
        return docs, scores

    def top_k(self, q: Query, k: int) -> list[tuple[int, float]]:
        docs, scores = self.evaluate(q)
        if docs.size == 0:
            return []
        order = np.lexsort((docs, -scores))[:k]
        return [(int(docs[i]) + self.reader.doc_base, float(scores[i])) for i in order]


class SweetSpotSegmentScorer(ClassicSegmentScorer):
    """SweetSpotSimilarity (reference Misc/SweetSpotSimilarity.cs): classic
    TF-IDF with a plateaued length norm ([ln_min, ln_max] scores as length 1,
    falloff controlled by steepness) and a baseline or hyperbolic tf. Norms
    come from the EXACT stored field_len (the reference quantizes through the
    norm byte; documented deviation, strictly more precise)."""

    def __init__(
        self,
        reader: SegmentReader,
        global_stats: dict,
        *,
        ln_min: int = 1,
        ln_max: int = 1,
        steepness: float = 0.5,
        tf_base: float = 0.0,
        tf_min: float = 0.0,
        hyperbolic: dict | None = None,
    ):
        super().__init__(reader, global_stats)
        self.ln_min, self.ln_max, self.steepness = ln_min, ln_max, steepness
        self.tf_base, self.tf_min = tf_base, tf_min
        self.hyperbolic = hyperbolic

    def _tf(self, tfs: np.ndarray) -> np.ndarray:
        if self.hyperbolic is not None:
            return self.cs.sweetspot_hyperbolic_tf(tfs, **self.hyperbolic)
        return self.cs.sweetspot_baseline_tf(tfs, self.tf_base, self.tf_min)

    def _doc_norms(self) -> np.ndarray:
        lens = self.reader.doc_values("field_len")
        return self.cs.sweetspot_length_norm(
            np.asarray(lens, dtype=np.float32), self.ln_min, self.ln_max, self.steepness
        )


class LMSegmentScorer:
    """Language-model similarities (LM-Dirichlet / LM-Jelinek-Mercer) through
    the Similarity extension seam — same index, same norms, different SimScorer
    (reference Similarities/LMDirichletSimilarity.cs, LMJelinekMercerSimilarity.cs).

    Supports TermQuery and flat BooleanQuery of term clauses; scores sum like
    the BM25 path (queryNorm/coord are 1 for SimilarityBase subclasses).
    global_stats needs "max_doc", "sum_ttf" and per-term "ttf" (not df).
    """

    def __init__(
        self,
        reader: SegmentReader,
        global_stats: dict,
        *,
        model: str = "dirichlet",
        mu: float = 2000.0,
        lam: float = 0.1,
    ):
        from ..functions import similarity_lm as lm

        if model not in ("dirichlet", "jelinek_mercer"):
            raise ValueError(model)
        self.lm = lm
        self.reader = reader
        self.stats = global_stats
        self.model = model
        self.mu = mu
        self.lam = lam

    def score_term(self, term: str, boost: float = 1.0) -> tuple[np.ndarray, np.ndarray]:
        docids, tfs = self.reader.postings(term)
        if docids.size == 0:
            return docids, np.empty(0, dtype=np.float32)
        ttf = self.stats["ttf"].get(term, 0)
        nb = self.reader.norms[docids]
        if self.model == "dirichlet":
            s = self.lm.lm_dirichlet_scores(tfs, nb, ttf, self.stats["sum_ttf"], boost, self.mu)
        else:
            s = self.lm.lm_jelinek_mercer_scores(tfs, nb, ttf, self.stats["sum_ttf"], boost, self.lam)
        return docids, s

    def evaluate(self, q: Query) -> tuple[np.ndarray, np.ndarray]:
        if isinstance(q, TermQuery):
            return self.score_term(q.term, q.boost)
        if isinstance(q, BooleanQuery):
            musts = [c.query for c in q.clauses if c.occur == "MUST"]
            shoulds = [c.query for c in q.clauses if c.occur == "SHOULD"]
            nots = [c.query for c in q.clauses if c.occur == "MUST_NOT"]
            evals = [self.evaluate(c) for c in musts + shoulds]
            if not evals:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
            docs = np.unique(np.concatenate([d for d, _ in evals]))
            if musts:
                for d, _ in evals[: len(musts)]:
                    docs = _intersect_sorted(docs, d)
            acc = np.zeros(docs.size, dtype=np.float64)
            for d, s in evals:
                ix = np.searchsorted(docs, d)
                valid = (ix < docs.size) & (docs[np.minimum(ix, max(docs.size - 1, 0))] == d) if docs.size else np.zeros(d.size, bool)
                np.add.at(acc, ix[valid], s[valid].astype(np.float64))
            scores = acc.astype(np.float32)
            for nq in nots:
                nd, _ = self.evaluate(nq)
                if nd.size and docs.size:
                    keep = ~np.isin(docs, nd, assume_unique=True)
                    docs, scores = docs[keep], scores[keep]
            return docs, scores
        raise NotImplementedError(f"LM scorer: {type(q).__name__}")

    def top_k(self, q: Query, k: int) -> list[tuple[int, float]]:
        docs, scores = self.evaluate(q)
        if docs.size == 0:
            return []
        order = np.lexsort((docs, -scores))[:k]
        return [(int(docs[i]) + self.reader.doc_base, float(scores[i])) for i in order]


class DFRSegmentScorer(LMSegmentScorer):
    """DFR similarity (reference Similarities/DFRSimilarity.cs) reusing the
    LM scorer's boolean algebra. global_stats needs per-term "df" AND "ttf"
    maps plus max_doc/sum_ttf."""

    def __init__(self, reader: SegmentReader, global_stats: dict, **cfg):
        from ..functions import similarity_dfr as dfr

        self.dfr = dfr
        self.reader = reader
        self.stats = global_stats
        self.cfg = cfg
        self.avgdl = global_stats["sum_ttf"] / global_stats["max_doc"]

    def score_term(self, term: str, boost: float = 1.0):
        docids, tfs = self.reader.postings(term)
        if docids.size == 0:
            return docids, np.empty(0, dtype=np.float32)
        s = self.dfr.dfr_scores(
            tfs,
            self.reader.norms[docids],
            df=self.stats["df"].get(term, 0),
            ttf=self.stats["ttf"].get(term, 0),
            max_doc=self.stats["max_doc"],
            avgdl=self.avgdl,
            boost=boost,
            **self.cfg,
        )
        return docids, s


class IBSegmentScorer(DFRSegmentScorer):
    """Information-based similarity (reference Similarities/IBSimilarity.cs)."""

    def score_term(self, term: str, boost: float = 1.0):
        docids, tfs = self.reader.postings(term)
        if docids.size == 0:
            return docids, np.empty(0, dtype=np.float32)
        s = self.dfr.ib_scores(
            tfs,
            self.reader.norms[docids],
            df=self.stats["df"].get(term, 0),
            ttf=self.stats["ttf"].get(term, 0),
            max_doc=self.stats["max_doc"],
            avgdl=self.avgdl,
            boost=boost,
            **self.cfg,
        )
        return docids, s


def query_terms(q: Query) -> set[str]:
    """All literal terms referenced by a query tree (for the global stats pass)."""
    if isinstance(q, TermQuery):
        return {q.term}
    if isinstance(q, BooleanQuery):
        out: set[str] = set()
        for c in q.clauses:
            out |= query_terms(c.query)
        return out
    if isinstance(q, PhraseQuery):
        return set(q.terms)
    if isinstance(q, MultiPhraseQuery):
        return {t for terms in q.positions_terms for t in terms}
    if isinstance(q, DisjunctionMaxQuery):
        out = set()
        for d in q.disjuncts:
            out |= query_terms(d)
        return out
    if isinstance(q, (ConstantScoreQuery, FilteredQuery)):
        out = query_terms(q.query)
        if isinstance(getattr(q, "filter", None), QueryFilter):
            out |= query_terms(q.filter.query)
        return out
    if isinstance(q, BoostingQuery):
        return query_terms(q.match) | query_terms(q.context)
    return set()


def query_fields(q: Query) -> set[str]:
    """All index fields referenced by term-bearing leaves of a query tree
    (used by Searcher to reject queries against fields the index lacks —
    a parsed 'title:foo' must not silently search the content postings)."""
    if isinstance(q, (TermQuery, PhraseQuery, MultiPhraseQuery, PrefixQuery, TermRangeQuery, WildcardQuery, FuzzyQuery, RegexpQuery)):
        return {q.field}
    if isinstance(q, BooleanQuery):
        out: set[str] = set()
        for c in q.clauses:
            out |= query_fields(c.query)
        return out
    if isinstance(q, DisjunctionMaxQuery):
        out = set()
        for d in q.disjuncts:
            out |= query_fields(d)
        return out
    if isinstance(q, (ConstantScoreQuery, FilteredQuery)):
        out = query_fields(q.query)
        if isinstance(getattr(q, "filter", None), QueryFilter):
            out |= query_fields(q.filter.query)
        return out
    if isinstance(q, BoostingQuery):
        return query_fields(q.match) | query_fields(q.context)
    return set()


#: sorts above any real token (tokens are never runs of U+10FFFF)
_TERM_CEILING = "\U0010FFFF" * 4


def _terms_in_range(reader, lo: str, hi: str) -> np.ndarray:
    """Sorted unique candidate terms in [lo, hi], WITHOUT materializing the
    full vocabulary: MergedIndexReader answers from only the manifest parts
    covering the range (pruned Parquet reads); a plain SegmentReader slices
    its already-resident sorted dict with binary search. This is the
    AutomatonTermsEnum discipline (Search/MultiTermQuery.cs:64 — walk the
    dict range, never load it whole)."""
    f = getattr(reader, "terms_in_range", None)
    if f is not None:
        return f(lo, hi)
    terms = reader.terms
    i = np.searchsorted(terms, lo, side="left")
    j = np.searchsorted(terms, hi, side="right")
    return terms[i:j]


def _iter_term_chunks(reader, part_filter=None):
    """Vocabulary as a stream of sorted chunks — one merged part (or one
    segment dict) resident at a time. Only unbounded scans (leading
    wildcard, regexp with no literal head, fuzzy prefix_length=0) pay this
    full pass; bounded scans go through `_terms_in_range`. ``part_filter``
    (lo, hi) -> bool lets a caller (the fuzzy automaton) veto whole parts
    from their manifest bounds before any bytes are read."""
    f = getattr(reader, "iter_term_parts", None)
    if f is not None:
        try:
            yield from f(part_filter=part_filter)
        except TypeError:  # reader without the filter seam
            yield from f()
    else:
        yield reader.terms


def _fuzzy_matches_blocked(
    dfa, base: str, cand: np.ndarray, cap: int, matched: dict, block: int = 8192
) -> None:
    """Collect fuzzy matches from a SORTED candidate array into ``matched``
    (term -> distance), hybrid automaton/DP: ``next_valid_string`` jumps
    over blocks containing no accepted string (binary-search skip, possibly
    many blocks per jump); viable blocks run the vectorized DP. Match set is
    identical to running the DP over everything (property-tested)."""
    n = cand.size
    i = 0
    while i < n:
        j = min(i + block, n)
        nxt = dfa.next_valid_string(str(cand[i]))
        if nxt is None:
            break
        if nxt > str(cand[j - 1]):
            # no accepted string up to the block end: jump the gap
            i = int(np.searchsorted(cand, nxt, side="left"))
            continue
        sub = cand[i:j]
        dists = _edit_distances_vectorized(base, sub, cap)
        keep = dists <= cap
        for t, d in zip(sub[keep], dists[keep].tolist()):
            matched[str(t)] = d  # part-boundary dupes collapse here
        i = j


def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two SORTED unique docid arrays via binary search —
    postings are always sorted, so np.intersect1d's concat-and-sort
    (O((n+m) log(n+m)) and a 2x temporary) is wasted work; this is
    O(min log max) with a min-sized output."""
    if a.size > b.size:
        a, b = b, a
    if a.size == 0:
        return a
    idx = np.searchsorted(b, a)
    valid = idx < b.size
    hit = np.zeros(a.size, dtype=bool)
    hit[valid] = b[idx[valid]] == a[valid]
    return a[hit]


def expand_multiterm(reader: SegmentReader, q: Query) -> list[tuple[str, float]]:
    """Matching (term, boost) pairs from this segment's term dict.

    Every query type with a literal prefix bound takes its candidate slice
    via `_terms_in_range` — on the merged layout that reads only covering
    parts, never the whole vocabulary. Unbounded patterns stream the dict
    chunk-by-chunk; the match set (small) is deduped, never the stream.
    """
    if isinstance(q, PrefixQuery):
        cand = _terms_in_range(reader, q.prefix, q.prefix + _TERM_CEILING)
        return [(str(t), 1.0) for t in cand]
    if isinstance(q, TermRangeQuery):
        lo = q.lower if q.lower is not None else ""
        hi = q.upper if q.upper is not None else _TERM_CEILING
        cand = _terms_in_range(reader, lo, hi)
        if q.lower is not None and not q.include_lower:
            cand = cand[cand > q.lower]
        if q.upper is not None and not q.include_upper:
            cand = cand[cand < q.upper]
        return [(str(t), 1.0) for t in cand]
    if isinstance(q, WildcardQuery):
        head = re.match(r"^[^*?]*", q.pattern).group()
        rx = re.compile(re.escape(q.pattern).replace(r"\*", ".*").replace(r"\?", ".") + r"\Z")
        if head:
            cand = _terms_in_range(reader, head, head + _TERM_CEILING)
            return [(str(t), 1.0) for t in cand if rx.match(t)]
        hits: list[str] = []
        for chunk in _iter_term_chunks(reader):
            hits.extend(str(t) for t in chunk if rx.match(t))
        return [(t, 1.0) for t in sorted(set(hits))]
    if isinstance(q, RegexpQuery):
        # literal-prefix range scan (RegexpQuery.cs:49 automaton-walk analog):
        # only the dict range sharing the pattern's literal head is scanned,
        # then the compiled regex (anchored both ends) filters it
        head_m = re.match(r"^[^\\.\[\]()*+?{|^$]*", q.pattern)
        head = head_m.group() if head_m else ""
        rx = re.compile(r"(?:" + q.pattern + r")\Z")
        if head:
            cand = _terms_in_range(reader, head, head + _TERM_CEILING)
            return [(str(t), 1.0) for t in cand if rx.match(t)][: q.max_expansions]
        hits = []
        for chunk in _iter_term_chunks(reader):
            hits.extend(str(t) for t in chunk if rx.match(t))
            # chunks stream in ascending term order: once a chunk completes
            # with >= cap distinct hits, no later chunk can beat them
            if len(set(hits)) >= q.max_expansions:
                break
        return [(t, 1.0) for t in sorted(set(hits))][: q.max_expansions]
    if isinstance(q, FuzzyQuery):
        base = q.term
        pref = base[: q.prefix_length]
        matched: dict[str, int] = {}
        # Levenshtein automaton (functions/lev_automaton.py — the
        # FuzzyTermsEnum/LevenshteinAutomata.cs walk): prunes whole merged
        # parts via manifest [term_min, term_max] bounds WITHOUT reading
        # them, then skips dead blocks inside each surviving chunk; only
        # automaton-viable blocks pay the vectorized DP. Never slower than
        # the plain DP by more than one next_valid_string per block; at
        # 10^9-term vocab the walk touches O(neighborhood) parts, not all.
        dfa = LevenshteinDFA(base, q.max_edits)
        if pref:
            chunks = [_terms_in_range(reader, pref, pref + _TERM_CEILING)]
        else:
            chunks = _iter_term_chunks(reader, part_filter=dfa.can_match_range)
        for cand in chunks:
            _fuzzy_matches_blocked(dfa, base, cand, q.max_edits, matched)
        out = []
        for t, d in matched.items():
            if d == 0:
                boost = 1.0
            else:
                # FuzzyTermsEnum boost: 1 - d / min(|term|,|text|)
                boost = 1.0 - d / min(len(t), len(base))
            out.append((t, boost))
        out.sort(key=lambda tb: (-tb[1], tb[0]))  # TopTermsRewrite: best first
        return out[: q.max_expansions]
    raise TypeError(f"not a multi-term query: {q!r}")


def _edit_distances_vectorized(base: str, terms: np.ndarray, cap: int) -> np.ndarray:
    """Levenshtein distance of ``base`` to every candidate term, vectorized
    across the dictionary slice: the DP runs |base| x max_len VECTOR steps
    over an (n_terms, max_len) codepoint matrix instead of a Python loop per
    term (the per-segment dict is millions of terms at corpus scale; the
    automaton-free numpy sweep is the scale answer until an FST exists).
    Terms longer than |base|+cap or shorter than |base|-cap get cap+1."""
    n = terms.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    lens = np.fromiter((len(t) for t in terms), dtype=np.int64, count=n)
    out = np.full(n, cap + 1, dtype=np.int64)
    sel = np.flatnonzero(np.abs(lens - len(base)) <= cap)
    if sel.size == 0:
        return out
    cand = terms[sel]
    clens = lens[sel]
    maxlen = int(clens.max())
    chars = np.full((sel.size, maxlen), -1, dtype=np.int32)
    for i, t in enumerate(cand):  # one pass to build the codepoint matrix
        chars[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), dtype=np.int32)
    prev = np.broadcast_to(np.arange(maxlen + 1, dtype=np.int32), (sel.size, maxlen + 1)).copy()
    for bi, ch in enumerate(base):
        cur = np.empty_like(prev)
        cur[:, 0] = bi + 1
        code = np.int32(ord(ch))
        sub = prev[:, :-1] + (chars != code)
        dele = prev[:, 1:] + 1
        best = np.minimum(sub, dele)
        # insertion needs the running minimum along the row: cur[j] depends on
        # cur[j-1]; do the scan with a logarithmic min-prefix over (best - j)
        shifted = np.minimum.accumulate(
            np.concatenate((cur[:, :1], best), axis=1) - np.arange(maxlen + 1, dtype=np.int32),
            axis=1,
        )
        cur = np.minimum(
            np.concatenate((cur[:, :1], best), axis=1),
            shifted + np.arange(maxlen + 1, dtype=np.int32) ,
        )
        prev = cur
    out[sel] = prev[np.arange(sel.size), clens]
    return out


def _edit_distance_capped(a: str, b: str, cap: int) -> int:
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        lo = cap + 1
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
            lo = min(lo, cur[j])
        if lo > cap:
            return cap + 1
        prev = cur
    return prev[lb]


class _PP:
    """PhrasePositions port: position = doc position - query offset."""

    __slots__ = ("plist", "offset", "rpt_group", "rpt_ind", "pos", "idx")

    def __init__(self, plist, offset, rpt_group=-1, rpt_ind=0):
        self.plist = plist
        self.offset = offset
        self.rpt_group = rpt_group
        self.rpt_ind = rpt_ind
        self.pos = 0
        self.idx = 0

    def first(self) -> None:
        self.pos = self.plist[0]
        self.idx = 1

    def next(self) -> bool:
        if self.idx >= len(self.plist):
            return False
        self.pos = self.plist[self.idx]
        self.idx += 1
        return True


def _sloppy_phrase_freq_rpts(slots: list[tuple[list[int], int, str]], slop: int) -> float:
    """SloppyPhraseScorer.PhraseFreq port WITH repeating terms
    (/root/reference/src/Lucene.Net.Core/Search/SloppyPhraseScorer.cs:104-146,
    repeat handling :160-210, :338-383 — single-term repeat groups, the
    no-multi-term-postings case since our phrase terms are literals).

    slots: [(adjusted position list, query offset, term)] per query slot.
    The PhraseQueue is a linear-scan min (phrase arity is tiny), which makes
    Lucene's re-queue bookkeeping after collision resolution unnecessary
    while preserving the identical visit order (position, then offset)."""
    pps = [ _PP(pl, off) for pl, off, _t in slots ]
    # repeat groups: slots sharing a term, sorted by offset (GatherRptGroups)
    by_term: dict[str, list[int]] = {}
    for i, (_pl, _off, t) in enumerate(slots):
        by_term.setdefault(t, []).append(i)
    rpt_groups: list[list[_PP]] = []
    for t, idxs in by_term.items():
        if len(idxs) > 1:
            group = sorted((pps[i] for i in idxs), key=lambda p: p.offset)
            for gi, p in enumerate(group):
                p.rpt_group = len(rpt_groups)
                p.rpt_ind = gi
            rpt_groups.append(group)

    for p in pps:
        p.first()

    def tp_pos(p: _PP) -> int:
        return p.pos + p.offset

    def collide(p: _PP) -> _PP | None:
        for p2 in rpt_groups[p.rpt_group]:
            if p2 is not p and tp_pos(p2) == tp_pos(p):
                return p2
        return None

    def lesser(a: _PP, b: _PP) -> _PP:
        if a.pos < b.pos or (a.pos == b.pos and a.offset < b.offset):
            return a
        return b

    # AdvanceRepeatGroups (simple case): rg[j] advances j times
    for rg in rpt_groups:
        for j in range(1, len(rg)):
            for _ in range(j):
                if not rg[j].next():
                    return 0.0
    end = max(p.pos for p in pps)

    queue = list(pps)

    def pop_min() -> _PP:
        m = min(queue, key=lambda p: (p.pos, p.offset))
        queue.remove(m)
        return m

    freq = np.float32(0.0)
    pp = pop_min()
    match_length = end - pp.pos
    nxt = min(queue, key=lambda p: (p.pos, p.offset)).pos if queue else pp.pos

    def advance_pp(p: _PP) -> bool:
        nonlocal end
        if not p.next():
            return False
        if p.pos > end:
            end = p.pos
        return True

    def advance_rpts(p: _PP) -> bool:
        if p.rpt_group < 0:
            return True
        while True:
            other = collide(p)
            if other is None:
                return True
            p = lesser(p, other)
            if not advance_pp(p):
                return False

    while advance_pp(pp):
        if rpt_groups and not advance_rpts(pp):
            break
        if pp.pos > nxt:
            if match_length <= slop:
                freq = np.float32(freq + np.float32(1.0 / (match_length + 1.0)))
            queue.append(pp)
            pp = pop_min()
            nxt = min(queue, key=lambda p: (p.pos, p.offset)).pos if queue else pp.pos
            match_length = end - pp.pos
        else:
            ml2 = end - pp.pos
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq = np.float32(freq + np.float32(1.0 / (match_length + 1.0)))
    return float(freq)


def _sloppy_phrase_freq(plists: list[list[int]], slop: int) -> float:
    """PhraseFreq() port: plists = per-term offset-adjusted position lists
    (sorted ascending, non-repeating terms). Returns float32 freq."""
    import heapq

    if len(plists) == 1:
        return float(len(plists[0]))  # every position is a 0-length match
    iters = [iter(pl) for pl in plists]
    cur = []
    end = -1
    for i, it in enumerate(iters):
        p = next(it)
        cur.append(p)
        end = max(end, p)
    pq = [(p, i) for i, p in enumerate(cur)]
    heapq.heapify(pq)
    freq = np.float32(0.0)

    pos, i = heapq.heappop(pq)
    match_length = end - pos
    nxt = pq[0][0]
    while True:
        # AdvancePP: next position of term i, update end
        p = next(iters[i], None)
        if p is None:
            break
        if p > end:
            end = p
        if p > nxt:  # done minimizing current match length
            if match_length <= slop:
                freq = np.float32(freq + np.float32(1.0 / (match_length + 1.0)))
            heapq.heappush(pq, (p, i))
            pos, i = heapq.heappop(pq)
            nxt = pq[0][0]
            match_length = end - pos
        else:
            ml2 = end - p
            if ml2 < match_length:
                match_length = ml2
            pos = p
    if match_length <= slop:
        freq = np.float32(freq + np.float32(1.0 / (match_length + 1.0)))
    return float(freq)


class SegmentScorer:
    """Evaluates a query tree against one segment with index-global stats."""

    def __init__(
        self,
        reader: SegmentReader,
        global_stats: dict,
        k1: float = 1.2,
        b: float = 0.75,
    ):
        """global_stats: {"max_doc": N, "sum_ttf": S, "df": {term: global df}}."""
        self.reader = reader
        self.stats = global_stats
        self.k1 = np.float32(k1)
        self.b = np.float32(b)
        avgdl = sim.avg_field_length(global_stats["sum_ttf"], global_stats["max_doc"])
        self.avgdl = avgdl
        self.cache = sim.norm_cache(avgdl, self.k1, self.b)

    # -- term-level ---------------------------------------------------------
    def _term_weight(self, term: str, boost: float) -> np.float32:
        df = self.stats["df"].get(term, 0)
        if df <= 0:
            return np.float32(0.0)
        return sim.term_weight_value(sim.idf(df, self.stats["max_doc"]), boost, self.k1)

    def score_term(self, q: TermQuery) -> tuple[np.ndarray, np.ndarray]:
        """(local docids sorted, float32 scores) for one term clause."""
        docids, tfs = self.reader.postings(q.term)
        if docids.size == 0:
            return docids, np.empty(0, dtype=np.float32)
        w = self._term_weight(q.term, q.boost)
        scores = sim.score_tf(tfs, self.reader.norms[docids], w, self.cache)
        return docids, scores

    # -- tree evaluation ----------------------------------------------------
    def evaluate(self, q: Query) -> tuple[np.ndarray, np.ndarray]:
        """(local docids sorted asc, float32 scores)."""
        if isinstance(q, TermQuery):
            return self.score_term(q)
        if isinstance(q, MatchAllDocsQuery):
            n = self.reader.doc_count
            return np.arange(n, dtype=np.int64), np.full(n, np.float32(q.boost), dtype=np.float32)
        if isinstance(q, ConstantScoreQuery):
            docids, _ = self.evaluate(q.query)
            return docids, np.full(docids.size, np.float32(q.boost), dtype=np.float32)
        if isinstance(q, (PrefixQuery, TermRangeQuery, WildcardQuery, RegexpQuery)):
            # ConstantScoreAutoRewrite semantics: matching docs score = boost
            expansions = expand_multiterm(self.reader, q)
            if not expansions:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
            docs = [self.reader.postings(t)[0] for t, _ in expansions]
            union = np.unique(np.concatenate(docs))
            return union, np.full(union.size, np.float32(q.boost), dtype=np.float32)
        if isinstance(q, FuzzyQuery):
            expansions = expand_multiterm(self.reader, q)
            if not expansions:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
            sub = BooleanQuery(
                boost=q.boost,
                clauses=tuple(
                    BooleanClause(TermQuery(field=q.field, term=t, boost=bst), "SHOULD")
                    for t, bst in expansions
                ),
            )
            return self.evaluate(sub)
        if isinstance(q, FilteredQuery):
            docs, scores = self.evaluate(q.query)
            if docs.size == 0:
                return docs, scores
            keep = self._filter_keep(q.filter, docs)
            return docs[keep], scores[keep]
        if isinstance(q, BoostingQuery):
            docs, scores = self.evaluate(q.match)
            if docs.size:
                ctx_docs, _ = self.evaluate(q.context)
                if ctx_docs.size:
                    demoted = np.isin(docs, ctx_docs, assume_unique=True)
                    scores = scores.copy()
                    scores[demoted] = (scores[demoted] * np.float32(q.demote)).astype(np.float32)
            return docs, scores
        if isinstance(q, PhraseQuery):
            return self._evaluate_phrase(q)
        if isinstance(q, MultiPhraseQuery):
            return self._evaluate_multi_phrase(q)
        if isinstance(q, DisjunctionMaxQuery):
            return self._evaluate_dismax(q)
        if isinstance(q, BooleanQuery):
            return self._evaluate_boolean(q)
        raise TypeError(f"unsupported query: {q!r}")

    def _filter_keep(self, f, docs: np.ndarray) -> np.ndarray:
        """Boolean keep-mask for ``docs`` under a FilteredQuery filter:
        FieldRangeFilter (docs-table predicate, evaluated only at the
        candidate docs), QueryFilter (posting-list doc set,
        QueryWrapperFilter.cs:31 — scores untouched), DuplicateFilter
        (first/last doc per key value), CachedFilter (doc set memoized per
        scorer, CachingWrapperFilter.cs:33)."""
        from ..query import CachedFilter, DuplicateFilter, FieldRangeFilter

        if isinstance(f, CachedFilter):
            cache = self.__dict__.setdefault("_filter_cache", {})
            allowed = cache.get(f.filter)
            if allowed is None:
                allowed = cache[f.filter] = self._filter_docset(f.filter)
            return np.isin(docs, allowed, assume_unique=True)
        if isinstance(f, QueryFilter):
            fdocs, _ = self.evaluate(f.query)
            return np.isin(docs, fdocs, assume_unique=True)
        if isinstance(f, DuplicateFilter):
            return np.isin(docs, self._duplicate_docset(f), assume_unique=True)
        from ..query import ChainedFilter as _CF

        if isinstance(f, _CF):
            return np.isin(docs, self._filter_docset(f), assume_unique=True)
        if isinstance(f, FieldRangeFilter):
            vals = self.reader.doc_values(f.field)
            keep = np.ones(docs.size, dtype=bool)
            if f.lower is not None:
                keep &= (vals[docs] >= f.lower) if f.include_lower else (vals[docs] > f.lower)
            if f.upper is not None:
                keep &= (vals[docs] <= f.upper) if f.include_upper else (vals[docs] < f.upper)
            return keep
        raise TypeError(f"unsupported filter: {f!r}")

    def _filter_docset(self, f) -> np.ndarray:
        """Sorted array of ALL docids a filter allows (the cached form)."""
        from ..query import ChainedFilter, DuplicateFilter, FieldRangeFilter

        if isinstance(f, ChainedFilter):
            # ChainedFilter.cs sequential fold over sorted docid sets
            if not f.clauses:
                return np.empty(0, dtype=np.int64)
            result = self._filter_docset(f.clauses[0][0])
            for sub, op in f.clauses[1:]:
                dset = self._filter_docset(sub)
                if op == "AND":
                    result = np.intersect1d(result, dset, assume_unique=True)
                elif op == "OR":
                    result = np.union1d(result, dset)
                elif op == "ANDNOT":
                    result = np.setdiff1d(result, dset, assume_unique=True)
                elif op == "XOR":
                    result = np.setxor1d(result, dset, assume_unique=True)
                else:
                    raise ValueError(f"unknown ChainedFilter op: {op!r}")
            return result.astype(np.int64)
        if isinstance(f, QueryFilter):
            fdocs, _ = self.evaluate(f.query)
            return fdocs
        if isinstance(f, DuplicateFilter):
            return self._duplicate_docset(f)
        if isinstance(f, FieldRangeFilter):
            vals = self.reader.doc_values(f.field)
            keep = np.ones(len(vals), dtype=bool)
            if f.lower is not None:
                keep &= (vals >= f.lower) if f.include_lower else (vals > f.lower)
            if f.upper is not None:
                keep &= (vals <= f.upper) if f.include_upper else (vals < f.upper)
            return np.flatnonzero(keep).astype(np.int64)
        raise TypeError(f"unsupported filter: {f!r}")

    def _duplicate_docset(self, f) -> np.ndarray:
        """Docids surviving DuplicateFilter: per distinct non-null key value,
        the lowest (keep='first') or highest docID in this reader. One
        stable argsort over the key column; null keys excluded (the
        reference's full-validation mode starts all-invalid)."""
        import pandas as pd

        vals = self.reader.doc_values(f.field)
        idx = np.flatnonzero(~pd.isnull(vals)).astype(np.int64)
        if idx.size == 0:
            return idx
        order = np.argsort(vals[idx], kind="stable")
        sv = vals[idx][order]
        first = np.concatenate(([True], sv[1:] != sv[:-1]))
        if f.keep == "first":
            winners = idx[order[first]]
        else:
            last = np.concatenate((first[1:], [True]))
            winners = idx[order[last]]
        winners.sort()
        return winners

    def _evaluate_phrase(self, q: PhraseQuery) -> tuple[np.ndarray, np.ndarray]:
        """ExactPhraseScorer: positions must align with the query's analyzed
        position pattern; tf = phrase frequency; weight = f32-summed idfs.
        slop>0 delegates to the SloppyPhraseScorer port."""
        if q.slop != 0:
            return self._evaluate_sloppy_phrase(q)
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        if not q.terms:
            return empty
        qpos = q.term_positions()
        qmax = max(qpos)
        # per-term (docid, adjusted position) keys; anchor = pos - qpos_i
        SHIFT = np.int64(1) << np.int64(32)
        keysets = []
        for t, p in zip(q.terms, qpos):
            if self.stats["df"].get(t, 0) == 0:
                return empty
            docids, tfs, flat, occ = self.reader.positions(t)
            if docids.size == 0:
                return empty
            doc_per_occ = np.repeat(docids, tfs)
            adj = flat - p + qmax  # keep non-negative
            keysets.append(doc_per_occ * SHIFT + adj)
        common = keysets[0]
        for ks in keysets[1:]:
            common = _intersect_sorted(common, ks)
        if common.size == 0:
            return empty
        docs, freqs = np.unique(common // SHIFT, return_counts=True)
        # weight: f32 sequential sum of idfs in term order (IdfExplain loop)
        idf_sum = np.float32(0.0)
        for t in q.terms:
            idf_sum = np.float32(idf_sum + sim.idf(self.stats["df"][t], self.stats["max_doc"]))
        w = np.float32(np.float32(idf_sum * np.float32(q.boost)) * (self.k1 + np.float32(1.0)))
        scores = sim.score_tf(freqs.astype(np.int64), self.reader.norms[docs], w, self.cache)
        return docs.astype(np.int64), scores

    @staticmethod
    def _union_postings_keys(plist):
        """Merge several terms' positions postings into one
        (docids, tfs, flat, occ) tuple — the UnionDocsAndPositionsEnum
        analog. Exact (doc, position) duplicates (terms stacked at one
        position by a synonym-style filter) are deduped."""
        SHIFT = np.int64(1) << np.int64(32)
        keys = []
        for docids, tfs, flat, occ in plist:
            keys.append(np.repeat(docids, tfs) * SHIFT + flat)
        u = np.unique(np.concatenate(keys)) if len(keys) > 1 else np.sort(keys[0])
        docs = u // SHIFT
        pos = u % SHIFT
        docids, tfs = np.unique(docs, return_counts=True)
        occ = np.concatenate(([0], np.cumsum(tfs)))
        return docids, tfs, pos, occ

    def _evaluate_multi_phrase(self, q) -> tuple[np.ndarray, np.ndarray]:
        """MultiPhraseQuery: per-position union of term postings
        (UnionDocsAndPositionsEnum analog, MultiPhraseQuery.cs:521), then the
        exact-phrase intersection (slop=0) or the SloppyPhraseScorer sweep
        with each union treated as one pseudo-term slot (slots with
        identical term SETS route through the repeating-terms path)."""
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        if not q.positions_terms:
            return empty
        qpos = q.term_positions()
        all_terms = [t for terms in q.positions_terms for t in terms]
        slot_posts = []
        for terms in q.positions_terms:
            plist = []
            for t in terms:
                if self.stats["df"].get(t, 0) == 0:
                    continue
                post = self.reader.positions(t)
                if post[0].size:
                    plist.append(post)
            if not plist:
                return empty  # a position no term can fill: no phrase match
            slot_posts.append(self._union_postings_keys(plist))
        # MultiPhraseWeight: f32-summed idf of EVERY term in declaration
        # order, df=0 terms included
        idf_sum = np.float32(0.0)
        for t in all_terms:
            idf_sum = np.float32(
                idf_sum + sim.idf(self.stats["df"].get(t, 0), self.stats["max_doc"])
            )
        w = np.float32(np.float32(idf_sum * np.float32(q.boost)) * (self.k1 + np.float32(1.0)))
        SHIFT = np.int64(1) << np.int64(32)
        if q.slop == 0:
            qmax = max(qpos)
            keysets = []
            for (docids, tfs, flat, occ), p in zip(slot_posts, qpos):
                doc_per_occ = np.repeat(docids, tfs)
                keysets.append(doc_per_occ * SHIFT + (flat - p + qmax))
            common = keysets[0]
            for ks in keysets[1:]:
                common = _intersect_sorted(common, ks)
            if common.size == 0:
                return empty
            docs, freqs = np.unique(common // SHIFT, return_counts=True)
            scores = sim.score_tf(freqs.astype(np.int64), self.reader.norms[docs], w, self.cache)
            return docs.astype(np.int64), scores
        # sloppy: pseudo-term per slot, named by its term set so identical
        # sets are recognized as repeats
        names = ["|".join(sorted(terms)) for terms in q.positions_terms]
        has_rpts = len(set(names)) != len(names)
        common = slot_posts[0][0]
        for docids, *_ in slot_posts[1:]:
            common = _intersect_sorted(common, docids)
        if common.size == 0:
            return empty
        out_docs, out_freqs = [], []
        for doc in common.tolist():
            slots = []
            for (docids, tfs, flat, occ), name, p in zip(slot_posts, names, qpos):
                j = int(np.searchsorted(docids, doc))
                slots.append(((flat[occ[j] : occ[j + 1]] - p).tolist(), p, name))
            if has_rpts:
                f = _sloppy_phrase_freq_rpts(slots, q.slop)
            else:
                f = _sloppy_phrase_freq([pl for pl, _p, _t in slots], q.slop)
            if f > 0:
                out_docs.append(doc)
                out_freqs.append(f)
        if not out_docs:
            return empty
        docs = np.array(out_docs, dtype=np.int64)
        freqs = np.array(out_freqs, dtype=np.float32)
        c = self.cache[self.reader.norms[docs]]
        scores = ((np.float32(w) * freqs) / (freqs + c)).astype(np.float32)
        return docs, scores

    def _evaluate_sloppy_phrase(self, q: PhraseQuery) -> tuple[np.ndarray, np.ndarray]:
        """SloppyPhraseScorer port (non-repeating terms): min-window sweep via
        a priority queue, phrase freq = f32 sum of 1/(matchLength+1) per match
        (/root/reference/src/Lucene.Net.Core/Search/SloppyPhraseScorer.cs:102-146,
        SloppyFreq = 1/(distance+1), BM25Similarity.cs:75).
        """
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        if not q.terms:
            return empty
        has_rpts = len(set(q.terms)) != len(q.terms)
        qpos = q.term_positions()
        postings_by_term: dict[str, tuple] = {}
        for t in set(q.terms):
            if self.stats["df"].get(t, 0) == 0:
                return empty
            docids, tfs, flat, occ = self.reader.positions(t)
            if docids.size == 0:
                return empty
            postings_by_term[t] = (docids, tfs, flat, occ)
        per_slot = [(postings_by_term[t], t, p) for t, p in zip(q.terms, qpos)]
        common = per_slot[0][0][0]
        for (d, *_), _t, _p in per_slot[1:]:
            common = _intersect_sorted(common, d)
        if common.size == 0:
            return empty
        out_docs, out_freqs = [], []
        for doc in common.tolist():
            slots = []
            for (docids, tfs, flat, occ), t, p in per_slot:
                j = int(np.searchsorted(docids, doc))
                slots.append(((flat[occ[j] : occ[j + 1]] - p).tolist(), p, t))
            if has_rpts:
                f = _sloppy_phrase_freq_rpts(slots, q.slop)
            else:
                f = _sloppy_phrase_freq([pl for pl, _p, _t in slots], q.slop)
            if f > 0:
                out_docs.append(doc)
                out_freqs.append(f)
        if not out_docs:
            return empty
        docs = np.array(out_docs, dtype=np.int64)
        freqs = np.array(out_freqs, dtype=np.float32)
        idf_sum = np.float32(0.0)
        for t in q.terms:
            idf_sum = np.float32(idf_sum + sim.idf(self.stats["df"][t], self.stats["max_doc"]))
        w = np.float32(np.float32(idf_sum * np.float32(q.boost)) * (self.k1 + np.float32(1.0)))
        c = self.cache[self.reader.norms[docs]]
        scores = ((np.float32(w) * freqs) / (freqs + c)).astype(np.float32)
        return docs, scores

    def _evaluate_dismax(self, q: DisjunctionMaxQuery) -> tuple[np.ndarray, np.ndarray]:
        """DisjunctionMaxScorer: max + tieBreaker * (sum - max) per doc."""
        evals = [self.evaluate(d) for d in q.disjuncts]
        evals = [(d, s) for d, s in evals if d.size]
        if not evals:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        union = np.unique(np.concatenate([d for d, _ in evals]))
        smax = np.full(union.size, -np.inf, dtype=np.float32)
        ssum = np.zeros(union.size, dtype=np.float64)
        for d, s in evals:
            ix = np.searchsorted(union, d)
            np.maximum.at(smax, ix, s)
            np.add.at(ssum, ix, s.astype(np.float64))
        tie = np.float32(q.tie_breaker)
        scores = (smax + tie * (ssum.astype(np.float32) - smax)).astype(np.float32)
        if q.boost != 1.0:
            scores = (scores * np.float32(q.boost)).astype(np.float32)
        return union, scores

    def _evaluate_boolean(self, q: BooleanQuery) -> tuple[np.ndarray, np.ndarray]:
        musts = [c.query for c in q.clauses if c.occur == "MUST"]
        shoulds = [c.query for c in q.clauses if c.occur == "SHOULD"]
        nots = [c.query for c in q.clauses if c.occur == "MUST_NOT"]
        msm = q.min_should_match
        if msm > len(shoulds):
            # Lucene matches nothing when minNrShouldMatch exceeds the optional
            # clause count (BooleanQuery.cs: scorer can never satisfy the bound)
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)

        must_evals = [self.evaluate(m) for m in musts]
        should_evals = [self.evaluate(s) for s in shoulds]

        # --- required side: leapfrog intersection, cost-ascending f32 sum ---
        # cost = GLOBAL df (not per-segment postings size) so the float32
        # summation order is identical across segments and in the oracle;
        # the reference uses per-leaf docFreq (ConjunctionScorer.cs:47-51) —
        # same order in the single-segment case, last-ulp-equivalent otherwise.
        req_docs = req_scores = None
        if must_evals:
            order = sorted(range(len(must_evals)), key=lambda i: (self._cost(musts[i]), i))
            req_docs = must_evals[order[0]][0]
            for i in order[1:]:
                req_docs = _intersect_sorted(req_docs, must_evals[i][0])
            req_scores = np.zeros(req_docs.size, dtype=np.float32)
            for i in order:  # sequential float32 adds in cost order
                d, s = must_evals[i]
                idx = np.searchsorted(d, req_docs)
                req_scores = (req_scores + s[idx]).astype(np.float32)

        # --- optional side: union, double-accumulated sum, match counts ----
        opt_docs = opt_scores = opt_counts = None
        if should_evals:
            all_docs = np.concatenate([d for d, _ in should_evals]) if should_evals else np.empty(0, dtype=np.int64)
            opt_docs = np.unique(all_docs)
            acc = np.zeros(opt_docs.size, dtype=np.float64)
            cnt = np.zeros(opt_docs.size, dtype=np.int32)
            for d, s in should_evals:
                if d.size == 0:
                    continue
                idx = np.searchsorted(opt_docs, d)
                np.add.at(acc, idx, s.astype(np.float64))
                np.add.at(cnt, idx, 1)
            opt_scores = acc.astype(np.float32)
            opt_counts = cnt

        # --- combine -------------------------------------------------------
        if req_docs is not None:
            docs, scores = req_docs, req_scores
            if opt_docs is not None:
                if msm > 0:
                    keep = opt_counts >= msm
                    strict_docs = opt_docs[keep]
                    mask = np.isin(docs, strict_docs, assume_unique=True)
                    docs, scores = docs[mask], scores[mask]
                idx = np.searchsorted(opt_docs, docs)
                valid = (idx < opt_docs.size) & (opt_docs[np.minimum(idx, opt_docs.size - 1)] == docs) if opt_docs.size else np.zeros(docs.size, bool)
                add = np.zeros(docs.size, dtype=np.float32)
                add[valid] = opt_scores[idx[valid]]
                scores = (scores + add).astype(np.float32)  # ReqOptSumScorer f32 add
        elif opt_docs is not None:
            need = max(msm, 1)
            keep = opt_counts >= need
            docs, scores = opt_docs[keep], opt_scores[keep]
        else:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)

        for nq in nots:
            nd, _ = self.evaluate(nq)
            if nd.size and docs.size:
                mask = ~np.isin(docs, nd, assume_unique=True)
                docs, scores = docs[mask], scores[mask]

        if q.boost != 1.0:
            scores = (scores * np.float32(q.boost)).astype(np.float32)
        return docs, scores

    def _cost(self, q: Query) -> int:
        if isinstance(q, TermQuery):
            return self.stats["df"].get(q.term, 0)
        return self.stats["max_doc"]

    def top_k(
        self,
        q: Query,
        k: int,
        search_after: tuple[float, int] | None = None,
        mode: str = "auto",
        exclude_local: np.ndarray | None = None,
    ) -> list[tuple[int, float]]:
        """[(global docid, float32 score)] by (score desc, docid asc), length<=k.

        mode: 'auto' uses block-max WAND for term/pure-disjunction queries
        (result-preserving pruning), 'exhaustive' forces full evaluation,
        'wand' forces WAND (error if the query shape is ineligible).
        exclude_local: deleted (liveDocs) local docids — forces the
        exhaustive path so masking happens before top-k selection.
        """
        if exclude_local is not None and exclude_local.size:
            docs, scores = self.evaluate(q)
            keep = ~np.isin(docs, exclude_local, assume_unique=True)
            docs, scores = docs[keep], scores[keep]
            if search_after is not None:
                a_score = np.float32(search_after[0])
                a_doc = search_after[1] - self.reader.doc_base
                m = (scores < a_score) | ((scores == a_score) & (docs > a_doc))
                docs, scores = docs[m], scores[m]
            if docs.size == 0:
                return []
            order = np.lexsort((docs, -scores))[:k]
            return [(int(docs[i]) + self.reader.doc_base, float(scores[i])) for i in order]
        if mode in ("auto", "wand"):
            from .wand import is_wand_eligible, wand_top_k

            tw = is_wand_eligible(q) if hasattr(self.reader, "blocks") else None
            if tw is not None:
                # cost-based choice per the measured table above: single
                # terms from 500k df, 2-term ORs from 10M summed df, larger
                # disjunctions always exhaustive (one vectorized pass wins)
                sum_df = sum(self.stats["df"].get(t, 0) for t, _ in tw)
                use = (len(tw) == 1 and sum_df >= WAND_MIN_DF) or (
                    len(tw) == 2 and sum_df >= WAND_MIN_OR_DF
                )
                if mode == "wand" or use:
                    weights = [(t, self._term_weight(t, boost)) for t, boost in tw]
                    hits = wand_top_k(self.reader, weights, self.cache, k, search_after)
                    return [(d + self.reader.doc_base, s) for d, s in hits]
            elif mode == "wand":
                raise ValueError(f"query not WAND-eligible: {q!r}")
        docs, scores = self.evaluate(q)
        if search_after is not None:
            a_score = np.float32(search_after[0])
            a_doc = search_after[1] - self.reader.doc_base
            mask = (scores < a_score) | ((scores == a_score) & (docs > a_doc))
            docs, scores = docs[mask], scores[mask]
        if docs.size == 0:
            return []
        order = np.lexsort((docs, -scores))[:k]
        return [
            (int(docs[i]) + self.reader.doc_base, float(scores[i])) for i in order
        ]

    def count(self, q: Query) -> int:
        docs, _ = self.evaluate(q)
        return int(docs.size)
