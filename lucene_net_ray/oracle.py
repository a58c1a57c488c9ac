"""Brute-force BM25 oracle: reference semantics, zero shared code with the engine's
postings path (FIXTURES.md 'Oracle'; mirrors TestTermScorer/TestBooleanQuery/
TestSimilarity2, /root/reference/src/Lucene.Net.Tests/core/Search/TestTermScorer.cs:76-175).

Tokenizes every doc with the analyzer, computes df/N/avgdl exactly, pushes doc
lengths through the byte315 round-trip, scores each doc per clause with float32
rounding at the reference's points, combines per the scorer algebra, and sorts
by (score desc, docid asc). Engine top-k must match IDs and scores exactly.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from .functions import similarity as sim
from .functions.analysis import Analyzer
from .functions.norms import encode_norm
from .query import (
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)


class OracleIndex:
    def __init__(self, contents: list[str], analyzer: Analyzer | None = None, k1=1.2, b=0.75):
        from .functions.analysis import analyze_with_positions

        analyzer = analyzer or Analyzer()
        self.docs = [Counter(analyzer(c)) for c in contents]
        # term -> positions per doc (positions = cumulative increments - 1)
        self.positions: list[dict[str, list[int]]] = []
        for c in contents:
            toks, incrs = analyze_with_positions(c)
            pos_map: dict[str, list[int]] = {}
            pos = -1
            for t, inc in zip(toks, incrs):
                pos += inc
                pos_map.setdefault(t, []).append(pos)
            self.positions.append(pos_map)
        self.lens = [sum(c.values()) for c in self.docs]
        self.norm_bytes = [encode_norm(n) for n in self.lens]
        self.max_doc = len(contents)
        self.sum_ttf = sum(self.lens)
        self.df: Counter = Counter()
        for c in self.docs:
            self.df.update(c.keys())
        self.k1 = np.float32(k1)
        self.b = np.float32(b)
        self.avgdl = sim.avg_field_length(self.sum_ttf, self.max_doc)
        self.cache = sim.norm_cache(self.avgdl, self.k1, self.b)
        self.vocab = sorted(self.df.keys())

    def _term_score(self, doc: int, term: str, boost: float) -> np.float32 | None:
        tf = self.docs[doc].get(term, 0)
        if tf == 0 or self.df[term] == 0:
            return None
        w = sim.term_weight_value(sim.idf(self.df[term], self.max_doc), boost, self.k1)
        tf32 = np.float32(tf)
        return np.float32((w * tf32) / (tf32 + self.cache[self.norm_bytes[doc]]))

    def _expand(self, q: Query) -> list[tuple[str, float]]:
        import re

        if isinstance(q, PrefixQuery):
            return [(t, 1.0) for t in self.vocab if t.startswith(q.prefix)]
        if isinstance(q, TermRangeQuery):
            out = []
            for t in self.vocab:
                if q.lower is not None and (t < q.lower or (t == q.lower and not q.include_lower)):
                    continue
                if q.upper is not None and (t > q.upper or (t == q.upper and not q.include_upper)):
                    continue
                out.append((t, 1.0))
            return out
        if isinstance(q, WildcardQuery):
            rx = re.compile(re.escape(q.pattern).replace(r"\*", ".*").replace(r"\?", ".") + r"\Z")
            return [(t, 1.0) for t in self.vocab if rx.match(t)]
        raise TypeError(q)

    def _eval(self, doc: int, q: Query) -> np.float32 | None:
        """Score of doc for q, or None if doc doesn't match."""
        if isinstance(q, TermQuery):
            return self._term_score(doc, q.term, q.boost)
        if isinstance(q, MatchAllDocsQuery):
            return np.float32(q.boost)
        if isinstance(q, ConstantScoreQuery):
            return np.float32(q.boost) if self._eval(doc, q.query) is not None else None
        if isinstance(q, (PrefixQuery, TermRangeQuery, WildcardQuery)):
            for t, _ in self._expand(q):
                if self.docs[doc].get(t, 0) > 0:
                    return np.float32(q.boost)
            return None
        if isinstance(q, PhraseQuery):
            qpos = q.term_positions()
            pos_map = self.positions[doc]
            if q.slop > 0:
                from .pipelines.scorer import _sloppy_phrase_freq

                plists = []
                for t, p in zip(q.terms, qpos):
                    pl = pos_map.get(t)
                    if not pl:
                        return None
                    plists.append([x - p for x in pl])
                freq = _sloppy_phrase_freq(plists, q.slop)
                if freq == 0:
                    return None
                idf_sum = np.float32(0.0)
                for t in q.terms:
                    idf_sum = np.float32(idf_sum + sim.idf(self.df[t], self.max_doc))
                w = np.float32(np.float32(idf_sum * np.float32(q.boost)) * (self.k1 + np.float32(1.0)))
                f32 = np.float32(freq)
                return np.float32((w * f32) / (f32 + self.cache[self.norm_bytes[doc]]))
            sets = []
            for t, p in zip(q.terms, qpos):
                pl = pos_map.get(t)
                if not pl:
                    return None
                sets.append({x - p for x in pl})
            anchors = set.intersection(*sets)
            freq = len(anchors)
            if freq == 0:
                return None
            idf_sum = np.float32(0.0)
            for t in q.terms:
                idf_sum = np.float32(idf_sum + sim.idf(self.df[t], self.max_doc))
            w = np.float32(np.float32(idf_sum * np.float32(q.boost)) * (self.k1 + np.float32(1.0)))
            f32 = np.float32(freq)
            return np.float32((w * f32) / (f32 + self.cache[self.norm_bytes[doc]]))
        if isinstance(q, DisjunctionMaxQuery):
            scores = [s for s in (self._eval(doc, d) for d in q.disjuncts) if s is not None]
            if not scores:
                return None
            mx = max(scores)
            total = np.float32(float(np.sum(np.array(scores, dtype=np.float64))))
            out = np.float32(mx + np.float32(q.tie_breaker) * np.float32(total - mx))
            return np.float32(out * np.float32(q.boost)) if q.boost != 1.0 else out
        if isinstance(q, FuzzyQuery):
            raise NotImplementedError("fuzzy handled via engine-level rewrite in tests")
        if isinstance(q, BooleanQuery):
            musts = [c.query for c in q.clauses if c.occur == "MUST"]
            shoulds = [c.query for c in q.clauses if c.occur == "SHOULD"]
            nots = [c.query for c in q.clauses if c.occur == "MUST_NOT"]
            for nq in nots:
                if self._eval(doc, nq) is not None:
                    return None
            must_scores = []
            for mq in musts:
                s = self._eval(doc, mq)
                if s is None:
                    return None
                must_scores.append(s)
            should_scores = [s for s in (self._eval(doc, sq) for sq in shoulds) if s is not None]
            need = q.min_should_match if (musts or q.min_should_match) else (1 if shoulds else 0)
            if shoulds and len(should_scores) < max(need, 0 if musts else 1):
                return None
            score = np.float32(0.0)
            if musts:
                # ConjunctionScorer: float32 sum in cost order; cost order for the
                # oracle = ascending df of the clause's rarest term, approximated by
                # evaluating in the engine's order: ascending matching-doc count.
                costs = [self._cost(mq) for mq in musts]
                for i in sorted(range(len(musts)), key=lambda i: (costs[i], i)):
                    score = np.float32(score + must_scores[i])
                if should_scores:
                    opt = np.float32(np.sum(np.array(should_scores, dtype=np.float64)))
                    score = np.float32(score + opt)
            elif shoulds:
                score = np.float32(np.sum(np.array(should_scores, dtype=np.float64)))
            else:
                return None
            if q.boost != 1.0:
                score = np.float32(score * np.float32(q.boost))
            return score
        raise TypeError(q)

    def _cost(self, q: Query) -> int:
        if isinstance(q, TermQuery):
            return self.df.get(q.term, 0)
        return self.max_doc

    def top_k(self, q: Query, k: int = 10) -> list[tuple[int, float]]:
        hits = []
        for d in range(self.max_doc):
            s = self._eval(d, q)
            if s is not None:
                hits.append((d, float(s)))
        hits.sort(key=lambda h: (-h[1], h[0]))
        return hits[:k]

    def count(self, q: Query) -> int:
        return sum(1 for d in range(self.max_doc) if self._eval(d, q) is not None)
