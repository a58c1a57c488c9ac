"""WordDelimiterFilter analog — the subword splitter/catenator.

Reference semantics (not mechanics — the reference drives a char-type table
and a stateful iterator through a token stream; ours is a pure list
transform):
  /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Miscellaneous/WordDelimiterFilter.cs:39
  /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Miscellaneous/WordDelimiterIterator.cs

Rules implemented (WordDelimiterFilter.cs:41-56):
- split on intra-word non-alphanumeric delimiters   "Wi-Fi" -> Wi, Fi
- split on case transitions (SPLIT_ON_CASE_CHANGE)  "PowerShot" -> Power, Shot
  with the acronym rule: an upper-run followed by a lower char breaks before
  the last upper                                     "XLDatabase" -> XL, Database
- split on letter/digit transitions (SPLIT_ON_NUMERICS) "SD500" -> SD, 500
- leading/trailing delimiters ignored               "//hello---there" -> hello, there
- trailing "'s" removed per subword (STEM_ENGLISH_POSSESSIVE)
                                                    "O'Neil's" -> O, Neil
- GENERATE_WORD_PARTS / GENERATE_NUMBER_PARTS gate which subword types are
  emitted; a mixed-type subword (possible only when not splitting on
  numerics) counts as both.
- CATENATE_WORDS / CATENATE_NUMBERS join maximal runs of same-category
  subwords ("wi-fi" -> wifi); CATENATE_ALL joins every subword of the token
  ("wi-fi-4000" -> wifi4000). A catenation of a single subword is emitted
  only when the part itself was not generated (reference flushConcatenation
  dedup rule).
- PRESERVE_ORIGINAL emits the untouched input token first.
- A token that is a single subword with no trimmed delimiters passes through
  unchanged (reference isSingleWord fast path).
- A token of only delimiters is dropped unless PRESERVE_ORIGINAL.

Output ordering (flat-list analog of the reference's position buffering):
original first, then subwords in order, each run-catenation immediately
after its run's last part, CATENATE_ALL last.

Chain-order note: this repo's base analyzers lowercase during
tokenization, so inside a ChainAnalyzer the SPLIT_ON_CASE_CHANGE flag never
fires (the reference's canonical chain is WhitespaceTokenizer ->
WordDelimiterFilter -> LowerCaseFilter). Delimiter and numeric splitting
plus catenation work unchanged; for case-change splitting drive the filter
directly (or via a custom non-folding base) — verified end-to-end in the
/tmp drive: 'sd500' -> sd/500 searchable, 'wi-fi' -> wifi catenation
searchable through build_index + Searcher.
"""

from __future__ import annotations

# flag constants (same names/values as the reference, WordDelimiterFilter.cs:114-168)
GENERATE_WORD_PARTS = 1
GENERATE_NUMBER_PARTS = 2
CATENATE_WORDS = 4
CATENATE_NUMBERS = 8
CATENATE_ALL = 16
PRESERVE_ORIGINAL = 32
SPLIT_ON_CASE_CHANGE = 64
SPLIT_ON_NUMERICS = 128
STEM_ENGLISH_POSSESSIVE = 256

_APOS = ("'", "’")

_LOWER, _UPPER, _DIGIT, _DELIM = 0, 1, 2, 3


def _ctype(c: str) -> int:
    if c.isdigit():
        return _DIGIT
    if c.isalpha():
        return _UPPER if c.isupper() else _LOWER
    return _DELIM


class WordDelimiterFilter:
    """Pure list[str] -> list[str] token filter; plug into ChainAnalyzer."""

    def __init__(self, flags: int = GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
                 | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE,
                 prot_words: frozenset[str] = frozenset()):
        self.flags = flags
        self.prot = frozenset(prot_words)

    def _has(self, f: int) -> bool:
        return bool(self.flags & f)

    def _spans(self, tok: str) -> list[tuple[int, int]]:
        """Subword [start, end) spans after delimiter + transition splitting."""
        types = [_ctype(c) for c in tok]
        n = len(tok)
        spans: list[tuple[int, int]] = []
        start = None
        for i in range(n):
            t = types[i]
            if t == _DELIM:
                if start is not None:
                    spans.append((start, i))
                    start = None
                continue
            if start is None:
                start = i
                continue
            prev = types[i - 1]
            boundary = False
            if self._has(SPLIT_ON_CASE_CHANGE):
                if prev == _LOWER and t == _UPPER:
                    boundary = True  # power|Shot
                elif (
                    prev == _UPPER
                    and t == _UPPER
                    and i + 1 < n
                    and types[i + 1] == _LOWER
                ):
                    boundary = True  # XL|Database: break before the last upper
            if self._has(SPLIT_ON_NUMERICS) and (
                (prev == _DIGIT) != (t == _DIGIT) and prev != _DELIM
            ):
                boundary = True
            if boundary:
                spans.append((start, i))
                start = i
        if start is not None:
            spans.append((start, n))
        if self._has(STEM_ENGLISH_POSSESSIVE):
            spans = [
                (s, e)
                for s, e in spans
                if not (e - s == 1 and tok[s] in "sS" and s > 0 and tok[s - 1] in _APOS)
            ]
        return spans

    @staticmethod
    def _span_type(tok: str, s: int, e: int) -> int:
        """bit 1 = has alpha, bit 2 = has digit."""
        t = 0
        for c in tok[s:e]:
            t |= 2 if c.isdigit() else 1
        return t

    def _process(self, tok: str, out: list[str]) -> None:
        if tok in self.prot:
            out.append(tok)
            return
        spans = self._spans(tok)
        if not spans:
            if self._has(PRESERVE_ORIGINAL):
                out.append(tok)
            return
        if (
            len(spans) == 1
            and spans[0] == (0, len(tok))
        ):
            # single whole-token subword: pass through unchanged
            out.append(tok)
            return
        if self._has(PRESERVE_ORIGINAL):
            out.append(tok)
        gen_w, gen_n = self._has(GENERATE_WORD_PARTS), self._has(GENERATE_NUMBER_PARTS)
        cat_w, cat_n = self._has(CATENATE_WORDS), self._has(CATENATE_NUMBERS)
        run_parts: list[str] = []
        run_cat = 0  # 1 = words buffer, 2 = numbers buffer
        run_generated = True

        def flush():
            nonlocal run_parts, run_cat, run_generated
            if run_parts and (len(run_parts) > 1 or not run_generated):
                out.append("".join(run_parts))
            run_parts, run_cat, run_generated = [], 0, True

        all_parts: list[str] = []
        any_generated = False
        for s, e in spans:
            text = tok[s:e]
            st = self._span_type(tok, s, e)
            generate = (gen_w and (st & 1)) or (gen_n and (st & 2))
            cat = 1 if (cat_w and (st & 1)) else (2 if (cat_n and (st & 2)) else 0)
            if cat != run_cat:
                flush()
            if generate:
                out.append(text)
                any_generated = True
            if cat:
                if not run_parts:
                    run_generated = bool(generate)
                else:
                    run_generated = run_generated and bool(generate)
                run_cat = cat
                run_parts.append(text)
        flush()
        if self._has(CATENATE_ALL):
            joined = "".join(tok[s:e] for s, e in spans)
            if len(spans) > 1 or not any_generated:
                out.append(joined)

    def __call__(self, terms: list[str]) -> list[str]:
        out: list[str] = []
        for t in terms:
            self._process(t, out)
        return out

    def config(self) -> dict:
        return {"filter": "word_delimiter", "flags": self.flags, "prot": len(self.prot)}
