"""Levenshtein automaton for fuzzy term expansion (the FST-walk analog).

Reference semantics:
  /root/reference/src/Lucene.Net.Core/Search/FuzzyTermsEnum.cs:48 — fuzzy
    expansion walks the term dictionary with a Levenshtein automaton
    ("Term enumerations are always ordered by Comparator. Each term in the
    enumeration is greater than all that precede it") and NEVER materializes
    or linearly scans the whole dict.
  /root/reference/src/Lucene.Net.Core/Util/Automaton/LevenshteinAutomata.cs:36
    builds the DFA; we build the same accept language (plain Levenshtein,
    no transpositions — matching this repo's `_edit_distances_vectorized`
    metric exactly) lazily instead of via parametric tables.

The algorithm is the classic public construction (Schulz & Mihov 2002;
popularized by the "Levenshtein automata" blog constructions): an NFA whose
positions are (offset, errors) pairs, determinized lazily with memoization,
plus `next_valid_string(s)` = the lexicographically smallest accepted string
>= s. Intersecting that with a SORTED term dictionary via binary-search
jumps visits O(matches + jumps) terms instead of O(vocab):

    t = lo
    while True:
        nxt = dfa.next_valid_string(t)        # smallest accepted >= t
        i = searchsorted(terms, nxt)          # jump the gap
        if terms[i] == nxt: emit; t = nxt + '\0'
        else:               t = terms[i]

Termination/progress: every iteration either emits a match or advances t to
an existing term > previous t, so the loop runs at most (#matches + #jumps)
<= 2 * #terms times and in practice ~#neighborhood times.

Key property making the greedy suffix descent correct: any live NFA position
(i, e) can always reach acceptance by consuming the remaining base chars
w[i:] exactly (ending at (len(w), e), an accepting position). So from any
non-dead DFA state, following the smallest outgoing edge repeatedly reaches
an accepting state, and paths are bounded by len(w) + k steps (offset+errors
strictly grow) — no cycles, no search needed.
"""

from __future__ import annotations

import numpy as np

#: sorts above any real token — mirrors scorer._TERM_CEILING
_CEILING = "\U0010FFFF" * 4


#: smallest codepoint the walk will ever emit in a jump string. Real terms
#: never contain NUL, and numpy's fixed-width unicode PADS with NUL — a
#: jump string ending in "\x00" compares EQUAL to its NUL-stripped term
#: under np.searchsorted, which would stall the dictionary walk. Starting
#: the wildcard descent at chr(1) skips only NUL-containing strings, which
#: cannot be dictionary terms, so no match is ever missed.
_MIN_CP = 1


class LevenshteinDFA:
    """Lazy DFA accepting every string within ``max_edits`` plain Levenshtein
    distance of ``base``. States are subsume-reduced frozensets of (offset,
    errors) NFA positions after the deletion epsilon-closure."""

    def __init__(self, base: str, max_edits: int):
        self.base = base
        self.k = max_edits
        self._steps: dict[tuple[frozenset, int], frozenset] = {}
        self._edge_chars: dict[frozenset, np.ndarray] = {}
        self.start = self._closure({(0, 0)})

    def _closure(self, positions: set[tuple[int, int]]) -> frozenset:
        """Epsilon-closure under deletion: (i,e) -> (i+1, e+1). States stay
        FULLY closed (no subsumption pruning): `step` reads match transitions
        straight off the position set, so dropping an implied (i+1, e+1)
        would lose the match-after-deletion path."""
        m, k = len(self.base), self.k
        stack = list(positions)
        seen = set(positions)
        while stack:
            i, e = stack.pop()
            if i < m and e < k and (i + 1, e + 1) not in seen:
                seen.add((i + 1, e + 1))
                stack.append((i + 1, e + 1))
        return frozenset(seen)

    def step(self, state: frozenset, ch: int) -> frozenset:
        key = (state, ch)
        hit = self._steps.get(key)
        if hit is not None:
            return hit
        m, k = len(self.base), self.k
        nxt: set[tuple[int, int]] = set()
        for (i, e) in state:
            if i < m and ord(self.base[i]) == ch:
                nxt.add((i + 1, e))  # match
            if e < k:
                nxt.add((i, e + 1))      # insertion (consume ch, stay)
                if i < m:
                    nxt.add((i + 1, e + 1))  # substitution
        out = self._closure(nxt) if nxt else frozenset()
        self._steps[key] = out
        return out

    def is_accept(self, state: frozenset) -> bool:
        # (i,e) accepts iff the remaining base chars fit the error budget
        # (all deleted): m - i <= k - e
        m, k = len(self.base), self.k
        return any(m - i <= k - e for (i, e) in state)

    def _edges(self, state: frozenset) -> np.ndarray:
        """Sorted codepoints with DISTINGUISHED transitions out of ``state``
        (base chars within reach). -1 encodes 'every other char also steps'
        (some position still has error budget)."""
        cached = self._edge_chars.get(state)
        if cached is not None:
            return cached
        m, k = len(self.base), self.k
        chars = {ord(self.base[i]) for (i, _e) in state if i < m}
        if any(e < k for (_i, e) in state):
            chars.add(-1)
        arr = np.array(sorted(chars), dtype=np.int64)
        self._edge_chars[state] = arr
        return arr

    def _find_next_edge(self, state: frozenset, lo_ch: int) -> int | None:
        """Smallest codepoint >= lo_ch with a non-dead transition."""
        lo_ch = max(lo_ch, _MIN_CP)
        edges = self._edges(state)
        if edges.size and edges[0] == -1:
            # wildcard budget: any char >= lo_ch steps somewhere live
            return lo_ch if lo_ch <= 0x10FFFF else None
        idx = int(np.searchsorted(edges, lo_ch, side="left"))
        if idx >= edges.size:
            return None
        return int(edges[idx])

    def next_valid_string(self, s: str) -> str | None:
        """Lexicographically smallest accepted string >= ``s`` (None if the
        accept language is exhausted above s)."""
        state = self.start
        path: list[tuple[frozenset, int]] = []  # (state BEFORE consuming ch, ch)
        consumed = len(s)
        for idx, ch in enumerate(s):
            path.append((state, ord(ch)))
            state = self.step(state, ord(ch))
            if not state:
                consumed = idx + 1
                break
        else:
            if self.is_accept(state):
                return s
            # s itself is a live prefix: the smallest accepted extension
            ext = self._smallest_accepted_suffix(state)
            if ext is not None:
                return s + ext
        # backtrack: bump the last consumed char upward, then descend greedily
        while path:
            prev_state, ch = path.pop()
            nxt_ch = self._find_next_edge(prev_state, ch + 1)
            if nxt_ch is None:
                continue
            state = self.step(prev_state, nxt_ch)
            prefix = s[: len(path)] + chr(nxt_ch)
            if self.is_accept(state):
                return prefix
            ext = self._smallest_accepted_suffix(state)
            if ext is not None:
                return prefix + ext
        return None

    def _smallest_accepted_suffix(self, state: frozenset) -> str | None:
        """Greedy smallest-edge descent to an accepting state (correct and
        terminating per the module docstring invariant)."""
        out: list[str] = []
        guard = len(self.base) + self.k + 1
        while not self.is_accept(state):
            if len(out) > guard:  # defensive; unreachable per invariant
                return None
            ch = self._find_next_edge(state, _MIN_CP)
            if ch is None:
                return None
            state = self.step(state, ch)
            out.append(chr(ch))
        return "".join(out)

    # -- sorted-dictionary intersection ---------------------------------

    def matches_in_sorted(self, terms: np.ndarray, lo: str = "", hi: str | None = None) -> list[str]:
        """All accepted terms within terms[searchsorted(lo):] and <= hi,
        visiting O(matches + gaps) entries via next_valid_string jumps."""
        n = terms.size
        if n == 0:
            return []
        hi_b = hi if hi is not None else _CEILING
        out: list[str] = []
        t = lo
        i = int(np.searchsorted(terms, t, side="left"))
        while i < n:
            nxt = self.next_valid_string(str(terms[i]))
            if nxt is None or nxt > hi_b:
                break
            i = int(np.searchsorted(terms, nxt, side="left"))
            if i >= n:
                break
            cur = str(terms[i])
            if cur == nxt:
                out.append(cur)
                i += 1
        return out

    def can_match_range(self, lo: str, hi: str) -> bool:
        """True iff some accepted string lies in [lo, hi] — O(|lo|) chunk
        pruning for part manifests (skips whole parts without reading them)."""
        nxt = self.next_valid_string(lo)
        return nxt is not None and nxt <= hi
