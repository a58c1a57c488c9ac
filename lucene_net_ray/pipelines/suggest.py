"""Suggesters beyond the term-dict prefix/spell utilities in collectors.py.

  AnalyzingSuggester analog  reference Suggest/Suggest/Analyzing/
      AnalyzingSuggester.cs:88 — completions are looked up by the ANALYZED
      form of the key but return the ORIGINAL surface form, ranked by weight.
      The FST is replaced by a sorted Arrow table of (analyzed_key, weight,
      surface, payload) built with one Ray aggregation; lookup is a binary-
      search prefix range. Holding the table in RAM matches the reference
      (suggesters are in-memory structures built offline).
  WordBreakSpellChecker analog  reference Suggest/Spell/
      WordBreakSpellChecker.cs — suggestWordBreaks splits an out-of-
      vocabulary term into dictionary words; suggestWordCombinations joins
      adjacent query terms into one dictionary word. Both rank by the
      combined document frequency.
"""

from __future__ import annotations

import bisect

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.analysis import Analyzer


class AnalyzingSuggester:
    """Build once from a Dataset of (surface, weight); lookup by analyzed prefix."""

    def __init__(
        self,
        ds: ray.data.Dataset,
        *,
        surface_column: str = "suggestion",
        weight_column: str = "weight",
        analyzer: Analyzer | None = None,
    ):
        analyzer = analyzer or Analyzer()

        def keyed(batch: pa.Table) -> pa.Table:
            surfaces = batch.column(surface_column).to_pylist()
            weights = batch.column(weight_column).to_pylist()
            keys = [" ".join(analyzer(s)) for s in surfaces]
            return pa.table(
                {
                    "key": pa.array(keys, type=pa.string()),
                    "surface": pa.array(surfaces, type=pa.string()),
                    "weight": pa.array([int(w) for w in weights], type=pa.int64()),
                }
            )

        rows = (
            ds.map_batches(keyed, batch_format="pyarrow")
            .groupby(["key", "surface"])
            .max("weight")
            .take_all()
        )  # suggester-sized, not corpus-sized
        rows.sort(key=lambda r: r["key"])
        self._keys = [r["key"] for r in rows]
        self._surfaces = [r["surface"] for r in rows]
        self._weights = [int(r["max(weight)"]) for r in rows]
        self._analyzer = analyzer

    def lookup(self, prefix: str, k: int = 5) -> list[tuple[str, int]]:
        """Top-k (surface, weight) whose ANALYZED key starts with the
        analyzed prefix; ties by surface asc."""
        key = " ".join(self._analyzer(prefix))
        lo = bisect.bisect_left(self._keys, key)
        hi = bisect.bisect_right(self._keys, key + "\U0010FFFF")
        cands = [
            (self._surfaces[i], self._weights[i])
            for i in range(lo, hi)
            if self._keys[i].startswith(key)
        ]
        cands.sort(key=lambda x: (-x[1], x[0]))
        return cands[:k]


def _prefix_edit_distance(query: str, cand: str, cap: int) -> int:
    """min edit distance of `query` to any PREFIX of `cand` (banded DP rows
    over cand; suggester keys are short, so plain DP is fine)."""
    prev = list(range(len(query) + 1))
    best = prev[-1]
    for ch in cand:
        cur = [prev[0] + 1]
        for j, qc in enumerate(query, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (qc != ch)))
        prev = cur
        best = min(best, prev[-1])
        if min(prev) > cap:
            break
    return best


class FuzzySuggester(AnalyzingSuggester):
    """FuzzySuggester analog (reference
    Suggest/Suggest/Analyzing/FuzzySuggester.cs:60): AnalyzingSuggester whose
    lookup key may differ from stored keys by up to ``max_edits`` edits. The
    first ``non_fuzzy_prefix`` chars must match exactly and keys shorter
    than ``min_fuzzy_length`` fall back to exact prefix lookup — the
    reference's defaults (1 edit, prefix 1, min length 3)."""

    def __init__(
        self,
        ds: ray.data.Dataset,
        *,
        max_edits: int = 1,
        non_fuzzy_prefix: int = 1,
        min_fuzzy_length: int = 3,
        **kw,
    ):
        super().__init__(ds, **kw)
        self.max_edits = max_edits
        self.non_fuzzy_prefix = non_fuzzy_prefix
        self.min_fuzzy_length = min_fuzzy_length

    def lookup(self, prefix: str, k: int = 5) -> list[tuple[str, int]]:
        key = " ".join(self._analyzer(prefix))
        if len(key) < self.min_fuzzy_length:
            return super().lookup(prefix, k)
        head = key[: self.non_fuzzy_prefix]
        lo = bisect.bisect_left(self._keys, head)
        hi = bisect.bisect_right(self._keys, head + "\U0010FFFF")
        best: dict[str, int] = {}
        for i in range(lo, hi):
            cand = self._keys[i][: len(key) + self.max_edits]
            if _prefix_edit_distance(key, cand, self.max_edits) <= self.max_edits:
                s, w = self._surfaces[i], self._weights[i]
                if w > best.get(s, -1):
                    best[s] = w
        out = sorted(best.items(), key=lambda x: (-x[1], x[0]))
        return out[:k]


class FreeTextSuggester:
    """FreeTextSuggester analog (reference
    Suggest/Suggest/Analyzing/FreeTextSuggester.cs:120): an n-gram language
    model with "stupid backoff" (the reference's ALPHA = 0.4).

    Build = ONE Ray aggregation: per-batch shingle Counters (the
    combiner-before-shuffle pattern) -> groupby(gram).sum. The finished model
    (gram -> count per order) is suggester-sized and held in RAM, like the
    reference's FST.

    lookup(context): the last (grams-1) analyzed tokens form the context;
    candidates seed from the LONGEST matching context suffix and back off to
    shorter ones weighted ALPHA^steps, each scored count/context_count; a
    trailing partial token (no trailing whitespace) filters candidates by
    prefix — mirroring FreeTextSuggester.DoLookup's backoff walk.
    """

    ALPHA = 0.4

    def __init__(
        self,
        ds: ray.data.Dataset,
        *,
        text_column: str = "text",
        grams: int = 3,
        analyzer: Analyzer | None = None,
    ):
        analyzer = analyzer or Analyzer(stop_words=None)
        self.grams = grams
        self._analyzer = analyzer

        def shingle_partials(batch: pa.Table) -> pa.Table:
            from collections import Counter

            agg: Counter = Counter()
            for text in batch.column(text_column).to_pylist():
                toks = analyzer(text)
                for n in range(1, grams + 1):
                    for i in range(len(toks) - n + 1):
                        agg[" ".join(toks[i : i + n])] += 1
            return pa.table(
                {
                    "gram": pa.array(list(agg.keys()), type=pa.string()),
                    "n": pa.array(list(agg.values()), type=pa.int64()),
                }
            )

        rows = (
            ds.map_batches(shingle_partials, batch_format="pyarrow")
            .groupby("gram")
            .sum("n")
            .take_all()
        )  # model-sized, not corpus-sized
        self._count: dict[str, int] = {}
        by_order: dict[int, list[str]] = {}
        total_uni = 0
        for r in rows:
            g, n = r["gram"], int(r["sum(n)"])
            self._count[g] = n
            order = g.count(" ") + 1
            by_order.setdefault(order, []).append(g)
            if order == 1:
                total_uni += n
        self._sorted = {o: sorted(gs) for o, gs in by_order.items()}
        self._total_uni = max(total_uni, 1)

    def _candidates(self, ctx_key: str, prefix: str, order: int) -> list[str]:
        """Grams of length `order` starting with 'ctx_key ' + prefix*."""
        lst = self._sorted.get(order, [])
        head = (ctx_key + " " + prefix) if ctx_key else prefix
        lo = bisect.bisect_left(lst, head)
        hi = bisect.bisect_right(lst, head + "\U0010FFFF")
        return lst[lo:hi]

    def lookup(self, context: str, k: int = 5) -> list[tuple[str, float]]:
        """Top-k (next_token, score). Trailing whitespace means the last
        token is complete; otherwise it is a prefix filter."""
        complete = context != context.rstrip()
        toks = self._analyzer(context)
        if complete or not toks:
            prefix, ctx = "", toks
        else:
            prefix, ctx = toks[-1], toks[:-1]
        ctx = ctx[-(self.grams - 1) :] if self.grams > 1 else []
        scored: dict[str, float] = {}
        max_order = len(ctx)
        for order in range(max_order, -1, -1):
            suffix = ctx[len(ctx) - order :]
            key = " ".join(suffix)
            denom = self._count.get(key, 0) if order else self._total_uni
            if denom <= 0:
                continue
            weight = self.ALPHA ** (max_order - order)
            for g in self._candidates(key, prefix, order + 1):
                token = g.rsplit(" ", 1)[-1] if order else g
                if token in scored:
                    continue  # higher-order estimate wins (stupid backoff)
                scored[token] = weight * self._count[g] / denom
        out = sorted(scored.items(), key=lambda x: (-x[1], x[0]))
        return out[:k]


def suggest_word_breaks(
    searcher, term: str, *, k: int = 5, min_part_len: int = 2
) -> list[tuple[tuple[str, str], int]]:
    """Split an out-of-vocabulary term into two dictionary words
    (WordBreakSpellChecker.SuggestWordBreaks, two-part case). Ranked by the
    SUM of the parts' document frequencies, desc."""
    out = []
    parts = []
    for i in range(min_part_len, len(term) - min_part_len + 1):
        parts.append((term[:i], term[i:]))
    wanted = sorted({w for p in parts for w in p})
    df = searcher._stats_for_terms(wanted)
    for a, b in parts:
        if df.get(a, 0) > 0 and df.get(b, 0) > 0:
            out.append(((a, b), df[a] + df[b]))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def suggest_word_combinations(
    searcher, terms: list[str], *, k: int = 5
) -> list[tuple[str, int]]:
    """Join adjacent query terms into one dictionary word
    (WordBreakSpellChecker.SuggestWordCombinations). Ranked by the combined
    word's df desc."""
    cands = ["".join(terms[i : i + 2]) for i in range(len(terms) - 1)]
    df = searcher._stats_for_terms(sorted(set(cands)))
    out = [(c, df[c]) for c in dict.fromkeys(cands) if df.get(c, 0) > 0]
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]
