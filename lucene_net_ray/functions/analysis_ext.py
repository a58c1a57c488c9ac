"""Analysis-chain extensions: SynonymFilter / ShingleFilter / NGramTokenizer.

References (semantics, not mechanics — the reference drives these through
FST/state-machine token streams, ours are pure list transforms):
  SynonymFilter  /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Synonym/SynonymFilter.cs:106
                 (matched input terms are replaced/augmented by synonym terms
                 injected at the same position)
  ShingleFilter  /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Shingle/ShingleFilter.cs:48
                 (word n-grams joined by a separator, optionally keeping the
                 unigrams)
  NGramTokenizer /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Ngram/NGramTokenizer.cs:66
                 and EdgeNGramTokenizer (character n-grams of the stream)

``ChainAnalyzer`` composes a base Analyzer with term-sequence filters and is
pluggable anywhere an Analyzer is (build_segment / build_index take the
instance — it pickles into the Ray tasks). It deliberately routes the segment
builder onto the doc-at-a-time path: shingles/synonyms cross whitespace
boundaries, so the per-ws-token memo of the fast path does not apply.

Known divergence, stated: injected synonym terms and shingles COUNT toward
field length here (norms), whereas the reference's DiscountOverlaps would
exclude posIncr-0 injected tokens from BM25's length. Phrase positions are
unsupported for chain analyzers (like the keyword kind).
"""

from __future__ import annotations

from .analysis import Analyzer


class SynonymFilter:
    """Single-term synonym expansion/replacement.

    synonyms: term -> list of synonym terms. include_original=True appends
    the synonyms after the matched term (SynonymMap keepOrig); False replaces
    it."""

    def __init__(self, synonyms: dict[str, list[str]], include_original: bool = True):
        self.synonyms = {k: list(v) for k, v in synonyms.items()}
        self.include_original = include_original

    def __call__(self, terms: list[str]) -> list[str]:
        out: list[str] = []
        for t in terms:
            syns = self.synonyms.get(t)
            if syns is None:
                out.append(t)
            elif self.include_original:
                out.append(t)
                out.extend(syns)
            else:
                out.extend(syns)
        return out

    def config(self) -> dict:
        return {
            "filter": "synonym",
            "n": len(self.synonyms),
            "include_original": self.include_original,
        }


class ShingleFilter:
    """Word n-grams (shingles) of the term stream."""

    def __init__(
        self,
        min_size: int = 2,
        max_size: int = 2,
        separator: str = " ",
        output_unigrams: bool = True,
    ):
        if min_size < 2 or max_size < min_size:
            raise ValueError("shingle sizes must satisfy 2 <= min <= max")
        self.min_size = min_size
        self.max_size = max_size
        self.separator = separator
        self.output_unigrams = output_unigrams

    def __call__(self, terms: list[str]) -> list[str]:
        out: list[str] = []
        n = len(terms)
        for i in range(n):
            if self.output_unigrams:
                out.append(terms[i])
            for size in range(self.min_size, self.max_size + 1):
                if i + size <= n:
                    out.append(self.separator.join(terms[i : i + size]))
        return out

    def config(self) -> dict:
        return {
            "filter": "shingle",
            "min_size": self.min_size,
            "max_size": self.max_size,
            "output_unigrams": self.output_unigrams,
        }


class CommonGramsFilter:
    """CommonGramsFilter analog (reference Analysis.Common/Analysis/
    CommonGrams/CommonGramsFilter.cs): bigrams joining a common word with its
    neighbor are ADDED alongside the unigrams, so phrase-heavy queries over
    stopword-ish terms hit a single cheap term."""

    def __init__(self, common_words: frozenset[str], separator: str = "_"):
        self.common = frozenset(common_words)
        self.separator = separator

    def __call__(self, terms: list[str]) -> list[str]:
        out: list[str] = []
        for i, t in enumerate(terms):
            out.append(t)
            if i + 1 < len(terms) and (t in self.common or terms[i + 1] in self.common):
                out.append(t + self.separator + terms[i + 1])
        return out

    def config(self) -> dict:
        return {"filter": "common_grams", "n": len(self.common)}


class LengthFilter:
    """LengthFilter analog (Analysis.Common/Analysis/Miscellaneous/
    LengthFilter.cs): drop terms outside [min_len, max_len]."""

    def __init__(self, min_len: int = 1, max_len: int = 255):
        self.min_len = min_len
        self.max_len = max_len

    def __call__(self, terms: list[str]) -> list[str]:
        return [t for t in terms if self.min_len <= len(t) <= self.max_len]

    def config(self) -> dict:
        return {"filter": "length", "min": self.min_len, "max": self.max_len}


import re as _re


class HTMLStripCharFilter:
    """HTMLStripCharFilter analog (Analysis.Common/Analysis/CharFilters/
    HTMLStripCharFilter.cs subset): drops tags/comments, unescapes the common
    entities, runs BEFORE tokenization."""

    _TAG = _re.compile(r"<!--.*?-->|<[^>]*>", _re.DOTALL)
    _ENT = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&apos;": "'", "&nbsp;": " "}

    def __call__(self, text: str) -> str:
        text = self._TAG.sub(" ", text)
        for e, ch in self._ENT.items():
            text = text.replace(e, ch)
        return text

    def config(self) -> dict:
        return {"char_filter": "html_strip"}


class MappingCharFilter:
    """MappingCharFilter analog (CharFilters/MappingCharFilter.cs): longest-
    match string substitutions before tokenization."""

    def __init__(self, mapping: dict[str, str]):
        self.mapping = dict(mapping)
        keys = sorted(mapping, key=len, reverse=True)
        self._rx = _re.compile("|".join(_re.escape(k) for k in keys)) if keys else None

    def __call__(self, text: str) -> str:
        if self._rx is None:
            return text
        return self._rx.sub(lambda m: self.mapping[m.group()], text)

    def config(self) -> dict:
        return {"char_filter": "mapping", "n": len(self.mapping)}


class ChainAnalyzer:
    """Base analyzer + ordered char filters (pre-tokenization) + term-sequence
    filters (post); Analyzer-compatible."""

    kind = "chain"

    def __init__(
        self,
        base: Analyzer | None = None,
        filters: tuple = (),
        char_filters: tuple = (),
    ):
        self.base = base or Analyzer()
        self.filters = tuple(filters)
        self.char_filters = tuple(char_filters)
        self.stop_words = self.base.stop_words
        self.max_token_length = self.base.max_token_length

    def __call__(self, text: str) -> list[str]:
        for cf in self.char_filters:
            text = cf(text)
        terms = self.base(text)
        for f in self.filters:
            terms = f(terms)
        return terms

    def analyze_positions(self, ws_token: str):
        raise NotImplementedError("positions unsupported for chain analyzers")

    def config(self) -> dict:
        return {
            "kind": "chain",
            "base": self.base.config(),
            "filters": [f.config() for f in self.filters],
            "char_filters": [cf.config() for cf in self.char_filters],
        }


class NGramAnalyzer:
    """Character n-gram tokenizer over the whole input stream
    (NGramTokenizer semantics: every substring of length min..max, in
    position order; edge=True restricts to prefixes — EdgeNGramTokenizer)."""

    kind = "ngram"

    def __init__(self, min_gram: int = 2, max_gram: int = 3, lowercase: bool = True, edge: bool = False):
        if min_gram < 1 or max_gram < min_gram:
            raise ValueError("ngram sizes must satisfy 1 <= min <= max")
        self.min_gram = min_gram
        self.max_gram = max_gram
        self.lowercase = lowercase
        self.edge = edge
        self.stop_words = frozenset()
        self.max_token_length = max_gram

    def __call__(self, text: str) -> list[str]:
        if self.lowercase:
            text = text.lower()
        out: list[str] = []
        n = len(text)
        if self.edge:
            for size in range(self.min_gram, self.max_gram + 1):
                if size <= n:
                    out.append(text[:size])
            return out
        for i in range(n):
            for size in range(self.min_gram, self.max_gram + 1):
                if i + size <= n:
                    out.append(text[i : i + size])
        return out

    def analyze_positions(self, ws_token: str):
        raise NotImplementedError("positions unsupported for ngram analyzers")

    def config(self) -> dict:
        return {
            "kind": "ngram",
            "min_gram": self.min_gram,
            "max_gram": self.max_gram,
            "lowercase": self.lowercase,
            "edge": self.edge,
        }


class PatternAnalyzer:
    """PatternTokenizer analog (reference
    Analysis/Pattern/PatternTokenizer.cs:38): tokens are either the match
    group of the regex (group >= 0) or the text BETWEEN matches
    (group == -1, the String.split mode)."""

    kind = "pattern"

    def __init__(self, pattern: str, group: int = -1, lowercase: bool = True):
        import re as _re

        self.pattern = pattern
        self.group = group
        self.lowercase = lowercase
        self._re = _re.compile(pattern)
        self.stop_words = frozenset()
        self.max_token_length = 255

    def __call__(self, text: str) -> list[str]:
        if self.lowercase:
            text = text.lower()
        if self.group >= 0:
            out = [m.group(self.group) for m in self._re.finditer(text)]
        else:
            out = self._re.split(text)
        return [t for t in out if t]

    def analyze_positions(self, ws_token: str):
        raise NotImplementedError("positions unsupported for pattern analyzers")

    def config(self) -> dict:
        return {
            "kind": "pattern",
            "pattern": self.pattern,
            "group": self.group,
            "lowercase": self.lowercase,
        }


class LimitTokenCountFilter:
    """LimitTokenCountFilter analog (reference
    Analysis/Miscellaneous/LimitTokenCountFilter.cs:28): keep only the
    first ``max_count`` tokens of the stream (index-size guard for
    pathological documents)."""

    def __init__(self, max_count: int):
        if max_count < 1:
            raise ValueError("max_count must be >= 1")
        self.max_count = max_count

    def __call__(self, terms: list[str]) -> list[str]:
        return terms[: self.max_count]

    def config(self) -> dict:
        return {"filter": "limit_token_count", "max_count": self.max_count}


class TruncateTokenFilter:
    """TruncateTokenFilter analog (reference
    Analysis/Miscellaneous/TruncateTokenFilter.cs:30): truncate every token
    to its first ``length`` characters (a crude prefix-stemmer for
    agglutinative languages, per the reference's docs)."""

    def __init__(self, length: int):
        if length < 1:
            raise ValueError("length must be >= 1")
        self.length = length

    def __call__(self, terms: list[str]) -> list[str]:
        return [t[: self.length] for t in terms]

    def config(self) -> dict:
        return {"filter": "truncate", "length": self.length}


class CapitalizationFilter:
    """CapitalizationFilter analog (reference
    Analysis/Miscellaneous/CapitalizationFilter.cs:30 core behavior):
    capitalize each token — first char uppercased, the rest lowercased —
    except tokens in ``keep`` (the reference's keep set), which pass
    unchanged. onlyFirstWord/forceFirstLetter operate on multi-word KEYWORD
    tokens; with per-token streams the per-token rule is the whole
    behavior."""

    def __init__(self, keep=frozenset()):
        self.keep = frozenset(keep)

    def __call__(self, terms: list[str]) -> list[str]:
        return [t if t in self.keep or not t else t[0].upper() + t[1:].lower() for t in terms]

    def config(self) -> dict:
        return {"filter": "capitalization", "keep": sorted(self.keep)}


class StemFilter:
    """Stemming as a CHAIN filter (PorterStemFilter/SnowballFilter analog)
    honoring the keyword-attribute protocol the reference builds around it:
    ``protected`` words pass through unstemmed (KeywordMarkerFilter,
    Analysis/Miscellaneous/SetKeywordMarkerFilter.cs) and ``repeat=True``
    emits the original token before its stem when they differ
    (KeywordRepeatFilter.cs — pair with RemoveDuplicatesFilter, exactly the
    reference's recommended chain). ``stemmer`` is a name from
    functions.stem.STEMMERS."""

    def __init__(self, stemmer: str = "porter", protected=frozenset(), repeat: bool = False):
        from .stem import STEMMERS

        if stemmer not in STEMMERS:
            raise ValueError(f"unknown stemmer {stemmer!r}; options: {sorted(STEMMERS)}")
        self.stemmer = stemmer
        self.protected = frozenset(protected)
        self.repeat = repeat
        self._fn = STEMMERS[stemmer]

    def __call__(self, terms: list[str]) -> list[str]:
        out: list[str] = []
        for t in terms:
            if t in self.protected:
                out.append(t)
                continue
            s = self._fn(t)
            if self.repeat and s != t:
                out.append(t)  # original first, like KeywordRepeatFilter
            out.append(s)
        return out

    def config(self) -> dict:
        return {
            "filter": "stem",
            "stemmer": self.stemmer,
            "protected": sorted(self.protected),
            "repeat": self.repeat,
        }


class RemoveDuplicatesFilter:
    """RemoveDuplicatesTokenFilter analog (reference
    Analysis/Miscellaneous/RemoveDuplicatesTokenFilter.cs:28: drops a token
    identical to one already seen at the SAME position; chains carry no
    positions, so 'same position' = consecutive — exactly the duplicates a
    repeat-mode StemFilter produces when stem == original survives)."""

    def __call__(self, terms: list[str]) -> list[str]:
        out: list[str] = []
        for t in terms:
            if out and out[-1] == t:
                continue
            out.append(t)
        return out

    def config(self) -> dict:
        return {"filter": "remove_duplicates"}


class PatternReplaceFilter:
    """PatternReplaceFilter analog (reference
    Analysis/Pattern/PatternReplaceFilter.cs:32): regex replace inside each
    term. ``all=False`` replaces only the first occurrence
    (Matcher.replaceFirst). Like the reference, a replacement that empties a
    term keeps the (empty) token — chain a LengthFilter to drop those."""

    def __init__(self, pattern: str, replacement: str = "", all: bool = True):
        import re as _re

        self.pattern = pattern
        self.replacement = replacement
        self.all = all
        self._re = _re.compile(pattern)

    def __call__(self, terms: list[str]) -> list[str]:
        count = 0 if self.all else 1
        return [self._re.sub(self.replacement, t, count=count) for t in terms]

    def config(self) -> dict:
        return {
            "filter": "pattern_replace",
            "pattern": self.pattern,
            "replacement": self.replacement,
            "all": self.all,
        }


class PatternReplaceCharFilter:
    """PatternReplaceCharFilter analog (reference
    Analysis/Pattern/PatternReplaceCharFilter.cs:36): regex replace over the
    raw char stream BEFORE tokenization (the reference's offset-correction
    bookkeeping is irrelevant here — offsets are recomputed at index time)."""

    def __init__(self, pattern: str, replacement: str = ""):
        import re as _re

        self.pattern = pattern
        self.replacement = replacement
        self._re = _re.compile(pattern)

    def __call__(self, text: str) -> str:
        return self._re.sub(self.replacement, text)

    def config(self) -> dict:
        return {
            "char_filter": "pattern_replace",
            "pattern": self.pattern,
            "replacement": self.replacement,
        }


class PatternCaptureGroupFilter:
    """PatternCaptureGroupTokenFilter analog (reference
    Analysis/Pattern/PatternCaptureGroupTokenFilter.cs:50): per input term,
    emit one token per non-empty capture group per match per pattern.
    preserve_original keeps the whole term first; a capture equal to the
    whole term is then skipped (the reference's start==0 && len==end guard).
    A term no pattern matches passes through unchanged. Simplification vs
    the reference (documented): captures are emitted pattern-by-pattern in
    match/group order rather than interleaved by start offset — a
    position-increment-free reordering that cannot matter to this engine's
    bag-of-terms chains (ChainAnalyzer has no position support)."""

    def __init__(self, patterns, preserve_original: bool = True):
        import re as _re

        self.patterns = tuple(patterns)
        self.preserve_original = preserve_original
        self._res = tuple(_re.compile(p) for p in self.patterns)

    def __call__(self, terms: list[str]) -> list[str]:
        out: list[str] = []
        for t in terms:
            caps: list[str] = []
            for rex in self._res:
                if rex.groups == 0:
                    continue
                for m in rex.finditer(t):
                    for g in range(1, rex.groups + 1):
                        cap = m.group(g)
                        if not cap:
                            continue
                        if self.preserve_original and cap == t:
                            continue
                        caps.append(cap)
            if self.preserve_original:
                out.append(t)
                out.extend(caps)
            elif caps:
                out.extend(caps)
            else:
                out.append(t)
        return out

    def config(self) -> dict:
        return {
            "filter": "pattern_capture_group",
            "patterns": list(self.patterns),
            "preserve_original": self.preserve_original,
        }


class DictionaryCompoundFilter:
    """DictionaryCompoundWordTokenFilter analog (reference
    Analysis/Compound/DictionaryCompoundWordTokenFilter.cs:30 +
    CompoundWordTokenFilterBase.cs Decompose): every dictionary word of
    length [min_subword, max_subword] found inside a token of length
    >= min_word_size is emitted AFTER the original token (the reference
    keeps the original and injects subwords at the same position).
    only_longest_match keeps only the longest subword per start offset."""

    def __init__(
        self,
        dictionary,
        *,
        min_word_size: int = 5,
        min_subword_size: int = 2,
        max_subword_size: int = 15,
        only_longest_match: bool = False,
    ):
        self.dictionary = frozenset(w.lower() for w in dictionary)
        self.min_word_size = min_word_size
        self.min_subword_size = min_subword_size
        self.max_subword_size = max_subword_size
        self.only_longest_match = only_longest_match

    def __call__(self, terms: list[str]) -> list[str]:
        out: list[str] = []
        for t in terms:
            out.append(t)
            if len(t) < self.min_word_size:
                continue
            for i in range(len(t) - self.min_subword_size + 1):
                longest = None
                for size in range(self.min_subword_size, self.max_subword_size + 1):
                    if i + size > len(t):
                        break
                    sub = t[i : i + size]
                    if sub in self.dictionary:
                        if self.only_longest_match:
                            longest = sub
                        else:
                            out.append(sub)
                if longest is not None:
                    out.append(longest)
        return out

    def config(self) -> dict:
        return {
            "filter": "dictionary_compound",
            "dict_size": len(self.dictionary),
            "min_word_size": self.min_word_size,
            "min_subword_size": self.min_subword_size,
            "max_subword_size": self.max_subword_size,
            "only_longest_match": self.only_longest_match,
        }


class DictionarySegmenterCharFilter:
    """Dictionary word segmentation as a char filter — the pluggable seam for
    unsegmented scripts (reference Analysis/Th/ThaiAnalyzer.cs segments with
    an ICU dictionary BreakIterator; no such dictionary ships in this
    container, so the SEAM is the deliverable: a user supplies their own
    word list and the chain tokenizes the result normally).

    Dictionary-script runs are segmented by the ICU-style dynamic program:
    among all segmentations, minimize unknown characters first, then token
    count (greedy longest-match alone mis-splits when a longer word shadows
    a boundary, e.g. Thai ว่างานดี must be ว่า|งาน|ดี, not ว่าง|าน|ดี).
    Spaces are inserted at word boundaries, unknown spans pass through
    intact so a downstream tokenizer still sees them. Text outside
    ``alphabet`` (when given) is never touched — mixed Thai/Latin input
    segments only the Thai runs, like the reference's per-script break
    iterator."""

    def __init__(self, words, *, alphabet: str | None = None):
        self.words = frozenset(words)
        if not self.words:
            raise ValueError("empty segmentation dictionary")
        self.max_len = max(len(w) for w in self.words)
        self.alphabet = frozenset(alphabet) if alphabet else frozenset(
            c for w in self.words for c in w
        )

    def _segment_run(self, run: str) -> str:
        n = len(run)
        INF = (n + 1, n + 1)
        # dp[i] = (unknown_chars, tokens) for run[:i]; back[i] = start of the
        # final piece (negative length marks an unknown single char)
        dp = [INF] * (n + 1)
        dp[0] = (0, 0)
        back = [0] * (n + 1)
        for i in range(1, n + 1):
            # unknown char: one char of cost; adjacent unknowns glue into
            # one token at reconstruction, so don't charge a token per char
            prev_unknown = back[i - 1] < 0 if i > 1 else False
            cand = (dp[i - 1][0] + 1, dp[i - 1][1] + (0 if prev_unknown else 1))
            best, src = cand, -1
            for ln in range(1, min(self.max_len, i) + 1):
                if run[i - ln : i] in self.words:
                    c = (dp[i - ln][0], dp[i - ln][1] + 1)
                    if c < best:
                        best, src = c, ln
            dp[i] = best
            back[i] = src
        pieces: list[str] = []
        i = n
        while i > 0:
            ln = back[i]
            if ln > 0:
                pieces.append(run[i - ln : i])
                i -= ln
            else:
                j = i
                while j > 0 and back[j] < 0:
                    j -= 1
                pieces.append(run[j:i])  # glued unknown span, one token
                i = j
        return " ".join(reversed(pieces))

    def __call__(self, text: str) -> str:
        out, run = [], []
        for c in text:
            if c in self.alphabet:
                run.append(c)
            else:
                if run:
                    out.append(self._segment_run("".join(run)))
                    run = []
                out.append(c)
        if run:
            out.append(self._segment_run("".join(run)))
        return "".join(out)

    def config(self) -> dict:
        return {"kind": "dict_segmenter", "n_words": len(self.words)}


def query_auto_stopword_analyzer(
    index,
    *,
    base: "Analyzer | None" = None,
    max_doc_freq: int | None = None,
    max_percent_docs: float | None = None,
):
    """QueryAutoStopWordAnalyzer analog (reference
    Analysis/Query/QueryAutoStopWordAnalyzer.cs:71): derive EXTRA stopwords
    from the index itself — every term whose document frequency exceeds
    ``max_doc_freq`` (or ``max_percent_docs`` of maxDoc) is stopped at
    query-analysis time. The df scan is the distributed global-term-stats
    exchange (one per-segment pre-aggregation + one groupby.sum), filtered
    BEFORE take_all so only the stopword set itself reaches the driver.

    Returns an Analyzer-compatible chain whose stop set = the base
    analyzer's stops UNION the auto-derived high-df terms.
    """
    import pyarrow.compute as _pc

    from ..pipelines.merge import global_term_stats
    from ..state.index import IndexMeta

    meta = index if isinstance(index, IndexMeta) else IndexMeta(index)
    if (max_doc_freq is None) == (max_percent_docs is None):
        raise ValueError("pass exactly one of max_doc_freq / max_percent_docs")
    threshold = (
        max_doc_freq
        if max_doc_freq is not None
        else int(max_percent_docs * meta.max_doc)
    )
    stats = global_term_stats(meta)
    hot = stats.map_batches(
        lambda b: b.filter(_pc.greater(b.column("df"), threshold)).select(["term"]),
        batch_format="pyarrow",
    ).take_all()  # stopword-set-sized, not vocabulary-sized
    auto = frozenset(r["term"] for r in hot)
    b = base or Analyzer()
    merged = Analyzer(
        kind=b.kind if b.kind in ("standard", "whitespace", "simple", "keyword") else "standard",
        stop_words=frozenset(b.stop_words) | auto,
        max_token_length=b.max_token_length,
    )
    merged.auto_stop_words = auto  # introspection, mirrors GetStopWords()
    return merged


class PositionFilterAnalyzer:
    """PositionFilter analog (reference
    Analysis.Common/Analysis/Position/PositionFilter.cs): the first token
    keeps its position; every later token's position increment is replaced
    by ``position_increment`` (default 0, stacking all tokens on the first —
    the "treat the query like one phrase slot" trick PositionFilter exists
    for). Analyzer-compatible, position-aware."""

    kind = "position_filter"

    def __init__(self, base: Analyzer | None = None, position_increment: int = 0):
        self.base = base or Analyzer()
        self.position_increment = int(position_increment)
        self.stop_words = self.base.stop_words
        self.max_token_length = self.base.max_token_length

    def __call__(self, text: str) -> list[str]:
        return self.base(text)

    def analyze_text_positions(self, text: str) -> tuple[list[str], list[int]]:
        terms, positions = self.base.analyze_text_positions(text)
        if not terms:
            return terms, positions
        out = [positions[0]]
        for _ in terms[1:]:
            out.append(out[-1] + self.position_increment)
        return terms, out

    def config(self) -> dict:
        return {
            "kind": "position_filter",
            "base": self.base.config(),
            "position_increment": self.position_increment,
        }


class TeeSinkAnalyzer:
    """TeeSinkTokenFilter analog (reference
    Analysis.Common/Analysis/Sinks/TeeSinkTokenFilter.cs): tokenize ONCE,
    feed the same token stream to several named sink filter chains — the
    one-pass multi-field indexing pattern (e.g. a raw field plus a stemmed
    field from a single tokenization). ``analyze_sinks(text)`` returns
    {sink_name: terms}; the analyzer itself yields the unfiltered stream.
    Sinks may also carry a SinkFilter-style predicate: (terms) -> terms."""

    kind = "tee_sink"

    def __init__(self, base: Analyzer | None = None, sinks: dict | None = None):
        self.base = base or Analyzer()
        self.sinks = dict(sinks or {})  # name -> filter chain (tuple of callables)
        self.stop_words = self.base.stop_words
        self.max_token_length = self.base.max_token_length

    def __call__(self, text: str) -> list[str]:
        return self.base(text)

    def analyze_sinks(self, text: str) -> dict[str, list[str]]:
        terms = self.base(text)  # the single tokenization pass
        out = {}
        for name, chain in self.sinks.items():
            ts = terms
            for f in chain if isinstance(chain, (tuple, list)) else (chain,):
                ts = f(ts)
            out[name] = ts
        return out

    def config(self) -> dict:
        return {"kind": "tee_sink", "base": self.base.config(),
                "sinks": sorted(self.sinks)}
