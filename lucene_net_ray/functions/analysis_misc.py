"""Miscellaneous filter wave (reference Analysis/Miscellaneous/*, Reverse/,
Path/): Trim, KeepWord, CodepointCount, HyphenatedWords, Scandinavian
normalization/folding, StemmerOverride, ReverseString, PathHierarchy.

All are pure list[str] -> list[str] token filters (plug into ChainAnalyzer)
except PathHierarchyAnalyzer, which is Analyzer-compatible.
"""

from __future__ import annotations


class TrimFilter:
    """TrimFilter analog (Analysis/Miscellaneous/TrimFilter.cs): strip
    leading/trailing whitespace from each token (zero-length results kept,
    like the reference's non-updateOffsets mode)."""

    def __call__(self, terms: list[str]) -> list[str]:
        return [t.strip() for t in terms]

    def config(self) -> dict:
        return {"filter": "trim"}


class KeepWordFilter:
    """KeepWordFilter analog (Analysis/Miscellaneous/KeepWordFilter.cs):
    keep only tokens contained in the word set (inverse of a StopFilter)."""

    def __init__(self, words: frozenset[str]):
        self.words = frozenset(words)

    def __call__(self, terms: list[str]) -> list[str]:
        return [t for t in terms if t in self.words]

    def config(self) -> dict:
        return {"filter": "keep_word", "n": len(self.words)}


class CodepointCountFilter:
    """CodepointCountFilter analog (Analysis/Miscellaneous/
    CodepointCountFilter.cs): length gate counted in Unicode code points —
    in Python, len() of a str IS the code-point count (astral chars count 1,
    unlike the UTF-16 unit count LengthFilter mirrors)."""

    def __init__(self, min_cp: int = 1, max_cp: int = 255):
        self.min_cp = min_cp
        self.max_cp = max_cp

    def __call__(self, terms: list[str]) -> list[str]:
        return [t for t in terms if self.min_cp <= len(t) <= self.max_cp]

    def config(self) -> dict:
        return {"filter": "codepoint_count", "min": self.min_cp, "max": self.max_cp}


class HyphenatedWordsFilter:
    """HyphenatedWordsFilter analog (Analysis/Miscellaneous/
    HyphenatedWordsFilter.cs): a token ending in '-' (a line-break
    hyphenation artifact) is joined with the following token; a trailing
    unpaired hyphenated token is emitted with its hyphen dropped."""

    def __call__(self, terms: list[str]) -> list[str]:
        out: list[str] = []
        carry: str | None = None
        for t in terms:
            if carry is not None:
                t = carry + t
                carry = None
            if t.endswith("-") and len(t) > 1:
                carry = t[:-1]
            else:
                out.append(t)
        if carry is not None:
            out.append(carry)
        return out

    def config(self) -> dict:
        return {"filter": "hyphenated_words"}


class ScandinavianNormalizationFilter:
    """ScandinavianNormalizationFilter analog (Analysis/Miscellaneous/
    ScandinavianNormalizationFilter.cs javadoc): normalize the
    interchangeable Scandinavian spellings to the single-letter forms —
    ae/ä -> æ, oe/ö -> ø, aa/ao -> å, oo -> ø — so Danish/Norwegian/Swedish
    spellings of the same word collate. Lowercase input assumed (tokens are
    post-LowerCaseFilter in every chain here)."""

    _DIGRAPHS = (("ae", "æ"), ("ao", "å"), ("aa", "å"), ("oe", "ø"), ("oo", "ø"))

    def _one(self, t: str) -> str:
        t = t.replace("ä", "æ").replace("ö", "ø")
        for src, dst in self._DIGRAPHS:
            t = t.replace(src, dst)
        return t

    def __call__(self, terms: list[str]) -> list[str]:
        return [self._one(t) for t in terms]

    def config(self) -> dict:
        return {"filter": "scandinavian_normalization"}


class ScandinavianFoldingFilter:
    """ScandinavianFoldingFilter analog (Analysis/Miscellaneous/
    ScandinavianFoldingFilter.cs javadoc): the aggressive variant —
    å/ä/æ (and aa/ae/ao) -> a, ö/ø (and oe/oo) -> o — discriminates less
    but matches across all three languages plus ASCII-folded text."""

    _DIGRAPHS = (("aa", "a"), ("ae", "a"), ("ao", "a"), ("oe", "o"), ("oo", "o"))

    def _one(self, t: str) -> str:
        for src, dst in self._DIGRAPHS:
            t = t.replace(src, dst)
        return (
            t.replace("å", "a")
            .replace("ä", "a")
            .replace("æ", "a")
            .replace("ö", "o")
            .replace("ø", "o")
        )

    def __call__(self, terms: list[str]) -> list[str]:
        return [self._one(t) for t in terms]

    def config(self) -> dict:
        return {"filter": "scandinavian_folding"}


class StemmerOverrideFilter:
    """StemmerOverrideFilter analog (Analysis/Miscellaneous/
    StemmerOverrideFilter.cs): dictionary-driven stemming exceptions — a
    token present in the override map is REPLACED by its mapped form and
    marked keyword so a later stemmer leaves it alone. Our chain filters are
    stateless list transforms, so the keyword marking is positional: place
    this filter BEFORE the stemmer and pass its ``protect`` set to the
    stemmer's keyword set (StemFilter(protected=...))."""

    def __init__(self, overrides: dict[str, str]):
        self.overrides = dict(overrides)
        # the mapped-to forms double as the keyword-protection set
        self.protect = frozenset(self.overrides.values())

    def __call__(self, terms: list[str]) -> list[str]:
        ov = self.overrides
        return [ov.get(t, t) for t in terms]

    def config(self) -> dict:
        return {"filter": "stemmer_override", "n": len(self.overrides)}


class ReverseStringFilter:
    """ReverseStringFilter analog (Analysis/Reverse/ReverseStringFilter.cs):
    reverse each token — the classic leading-wildcard trick (index reversed
    terms, rewrite *suffix queries as prefix queries over them). The
    reference can prepend a marker char (START_OF_HEADING \\u0001) so
    reversed terms never collide with forward terms in the same field."""

    def __init__(self, marker: str | None = None):
        self.marker = marker

    def __call__(self, terms: list[str]) -> list[str]:
        if self.marker:
            return [self.marker + t[::-1] for t in terms]
        return [t[::-1] for t in terms]

    def config(self) -> dict:
        return {"filter": "reverse_string", "marker": self.marker or ""}


class PathHierarchyAnalyzer:
    """PathHierarchyTokenizer analog (Analysis/Path/
    PathHierarchyTokenizer.cs): '/a/b/c' -> ['/a', '/a/b', '/a/b/c'].
    reverse=True mirrors ReversePathHierarchyTokenizer (delimiter-anchored
    suffixes: '/a/b/c' -> ['/a/b/c', 'a/b/c', 'b/c', 'c']). skip drops that
    many leading (or trailing, when reversed) path components from every
    emitted token. Analyzer-compatible (plugs into build_index /
    ChainAnalyzer as a base)."""

    kind = "path_hierarchy"

    def __init__(
        self,
        delimiter: str = "/",
        replacement: str | None = None,
        skip: int = 0,
        reverse: bool = False,
    ):
        self.delimiter = delimiter
        self.replacement = replacement if replacement is not None else delimiter
        self.skip = skip
        self.reverse = reverse
        self.stop_words = frozenset()
        self.max_token_length = 1 << 30

    def __call__(self, text: str) -> list[str]:
        d, r = self.delimiter, self.replacement
        parts = text.split(d)
        out: list[str] = []
        if not self.reverse:
            # prefixes, keeping a leading delimiter attached to the first
            # component: '/a/b' -> ['/a', '/a/b']; 'a/b' -> ['a', 'a/b'];
            # with skip>0 the reference anchors every token at the delimiter
            # preceding the first kept component: 'a/b/c' skip=1 -> '/b', '/b/c'
            comps = parts[self.skip :] if parts[:1] != [""] else parts[1 + self.skip :]
            lead = r if (parts[:1] == [""] or self.skip > 0) else ""
            acc = lead
            first = True
            for p in comps:
                acc = acc + p if first else acc + r + p
                first = False
                out.append(acc)
        else:
            end = len(parts) - self.skip
            for i in range(end):
                out.append(r.join(parts[i:end]))
        return [t for t in out if t and t != r]

    def analyze_positions(self, ws_token: str):
        raise NotImplementedError("positions unsupported for path analyzers")

    def config(self) -> dict:
        return {
            "kind": "path_hierarchy",
            "delimiter": self.delimiter,
            "skip": self.skip,
            "reverse": self.reverse,
        }
