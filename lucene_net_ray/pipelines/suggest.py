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
