"""Analysis/Cn ChineseAnalyzer analog (the classic pre-CJK-bigram design).

Reference semantics (clean-room from
/root/reference/src/Lucene.Net.Analysis.Common/Analysis/Cn/ChineseTokenizer.cs:112
and ChineseFilter.cs:66):

  tokenizer — runs of cased letters and decimal digits buffer into one
  lowercased token (flushed at 255 chars); every OTHER_LETTER (category Lo:
  han, kana, and any other uncased script) is a single-char token of its
  own; everything else (punctuation, marks, whitespace) breaks the run.

  filter — a token survives iff it is not in the fixed 30-word English stop
  list (checked FIRST, exactly like the reference), and then: cased-letter
  initial tokens need length > 1 ("English word/token should larger than 1
  character"), OTHER_LETTER single chars always survive, digit-initial
  tokens never do (they fall through the reference's switch).

Position semantics: the reference filter drops tokens without adjusting
position increments (each survivor still arrives with increment 1), so
surviving tokens occupy consecutive positions — mirrored here.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

#: ChineseFilter.STOP_WORDS verbatim (ChineseFilter.cs:51 — note: no "a"/"an";
#: single ascii letters die in the length check instead)
CHINESE_STOP_WORDS = frozenset(
    "and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

_MAX_WORD_LEN = 255


def chinese_tokens(text: str) -> tuple[str, ...]:
    """ChineseTokenizer analog: raw tokens, lowercased, pre-filter.

    Memoized only for short inputs (the per-ws-token indexing path); whole
    documents bypass the cache — an lru keyed by full document text would
    pin up to maxsize complete documents per worker process."""
    if len(text) <= 64:
        return _chinese_tokens_cached(text)
    return _chinese_tokens_uncached(text)


@lru_cache(maxsize=200_000)
def _chinese_tokens_cached(text: str) -> tuple[str, ...]:
    return _chinese_tokens_uncached(text)


#: Java Character.toLowerCase is 1:1 per char — 'İ' must not expand to
#: 'i' + combining dot (str.lower() would); same pre-map the standard
#: chain's LowerCaseFilter analog uses (analysis._JAVA_LOWER)
_CN_JAVA_LOWER = str.maketrans({"İ": "i", "Σ": "σ"})


def _chinese_tokens_uncached(text: str) -> tuple[str, ...]:
    out: list[str] = []
    buf: list[str] = []
    for c in text:
        cat = unicodedata.category(c)
        if cat in ("Nd", "Ll", "Lu"):
            buf.append(c.translate(_CN_JAVA_LOWER).lower())
            if len(buf) == _MAX_WORD_LEN:
                out.append("".join(buf))
                buf.clear()
        elif cat == "Lo":
            if buf:
                out.append("".join(buf))
                buf.clear()
            out.append(c)
        else:
            if buf:
                out.append("".join(buf))
                buf.clear()
    if buf:
        out.append("".join(buf))
    return tuple(out)


def chinese_filter(
    tokens: tuple[str, ...], stop_words: frozenset[str] = CHINESE_STOP_WORDS
) -> tuple[str, ...]:
    """ChineseFilter analog: stop check first, then the per-category rule."""
    keep: list[str] = []
    for t in tokens:
        if t in stop_words:
            continue
        cat = unicodedata.category(t[0])
        if cat in ("Ll", "Lu"):
            if len(t) > 1:
                keep.append(t)
        elif cat == "Lo":
            keep.append(t)
        # digit-initial: dropped (falls through the reference's switch)
    return tuple(keep)


def chinese_terms(
    text: str, stop_words: frozenset[str] = CHINESE_STOP_WORDS
) -> tuple[str, ...]:
    return chinese_filter(chinese_tokens(text), stop_words)
