"""CJK analysis: width normalization + bigramming (Analysis/Cjk analogs).

References (semantics, not mechanics):
  CJKWidthFilter  /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Cjk/CJKWidthFilter.cs:36
                  (fold fullwidth ASCII variants to basic latin; fold
                  halfwidth katakana to kana, combining voice marks with the
                  preceding kana where a composed form exists)
  CJKBigramFilter /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Cjk/CJKBigramFilter.cs:134
                  (runs of adjacent CJK tokens become overlapping bigrams;
                  a lone CJK token is emitted as a unigram; outputUnigrams
                  additionally emits every unigram)
  CJKAnalyzer     /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Cjk/CJKAnalyzer.cs
                  (StandardTokenizer -> CJKWidth -> LowerCase -> CJKBigram
                  -> Stop)

Mapping onto this engine: the classic-grammar tokenizer already emits Han /
Hiragana / Katakana code points as single-char tokens (analysis.py `_CJ`), so
bigramming is a term-sequence filter joining consecutive single-CJK-char
terms. Width folding runs as a CHAR filter (pre-tokenization) rather than a
token filter: halfwidth katakana + fullwidth ASCII then tokenize exactly like
their normalized forms, which is the filter's intent. Divergence, stated:
Hangul syllables are ALPHANUM runs under the classic grammar (no per-char
Hangul tokens), so the reference's HANGUL bigram flag has no effect here —
Korean words stay whole-word tokens, matching ClassicTokenizer behavior.
"""

from __future__ import annotations

# Halfwidth kana -> kana, index = codepoint - 0xFF65 (CJKWidthFilter.cs:47).
_KANA_NORM = [
    0x30FB, 0x30F2, 0x30A1, 0x30A3, 0x30A5, 0x30A7, 0x30A9, 0x30E3, 0x30E5,
    0x30E7, 0x30C3, 0x30FC, 0x30A2, 0x30A4, 0x30A6, 0x30A8, 0x30AA, 0x30AB,
    0x30AD, 0x30AF, 0x30B1, 0x30B3, 0x30B5, 0x30B7, 0x30B9, 0x30BB, 0x30BD,
    0x30BF, 0x30C1, 0x30C4, 0x30C6, 0x30C8, 0x30CA, 0x30CB, 0x30CC, 0x30CD,
    0x30CE, 0x30CF, 0x30D2, 0x30D5, 0x30D8, 0x30DB, 0x30DE, 0x30DF, 0x30E0,
    0x30E1, 0x30E2, 0x30E4, 0x30E6, 0x30E8, 0x30E9, 0x30EA, 0x30EB, 0x30EC,
    0x30ED, 0x30EF, 0x30F3, 0x3099, 0x309A,
]
# Kana combining deltas, index = codepoint - 0x30A6 (CJKWidthFilter.cs:94-96).
_KANA_COMBINE_VOICED = [
    78, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1, 0, 0, 1,
    0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 8, 8, 8, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1,
]
_KANA_COMBINE_HALF_VOICED = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 2, 0, 0, 2,
    0, 0, 2, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
]

_FULLWIDTH = {c: c - 0xFEE0 for c in range(0xFF01, 0xFF5F)}


def cjk_width_fold(text: str) -> str:
    """Fold fullwidth ASCII + halfwidth katakana (voice marks combined)."""
    if not any(0xFF01 <= ord(c) <= 0xFF9F for c in text):
        return text
    out: list[int] = []
    for ch in map(ord, text):
        if 0xFF01 <= ch <= 0xFF5E:
            out.append(ch - 0xFEE0)
        elif 0xFF65 <= ch <= 0xFF9F:
            if ch in (0xFF9E, 0xFF9F) and out and 0x30A6 <= out[-1] <= 0x30FD:
                table = _KANA_COMBINE_HALF_VOICED if ch == 0xFF9F else _KANA_COMBINE_VOICED
                delta = table[out[-1] - 0x30A6]
                if delta:
                    out[-1] += delta
                    continue
                out.append(_KANA_NORM[ch - 0xFF65])
            else:
                out.append(_KANA_NORM[ch - 0xFF65])
        else:
            out.append(ch)
    return "".join(map(chr, out))


class CJKWidthCharFilter:
    """Char-filter wrapper for ChainAnalyzer(char_filters=...)."""

    def __call__(self, text: str) -> str:
        return cjk_width_fold(text)

    def config(self) -> dict:
        return {"char_filter": "cjk_width"}


HAN = 1
HIRAGANA = 2
KATAKANA = 4

_HAN_RANGES = ((0x3400, 0x4DBF), (0x4E00, 0x9FFF), (0xF900, 0xFAFF), (0x3300, 0x337F))
_HIRA_RANGES = ((0x3040, 0x309F),)
_KATA_RANGES = ((0x30A0, 0x30FF), (0x31F0, 0x31FF))


def _script_of(ch: str) -> int:
    cp = ord(ch)
    for lo, hi in _HAN_RANGES:
        if lo <= cp <= hi:
            return HAN
    for lo, hi in _HIRA_RANGES:
        if lo <= cp <= hi:
            return HIRAGANA
    for lo, hi in _KATA_RANGES:
        if lo <= cp <= hi:
            return KATAKANA
    return 0


class CJKBigramFilter:
    """Join runs of adjacent single-CJK-char terms into overlapping bigrams.

    flags selects which scripts participate (HAN | HIRAGANA | KATAKANA, the
    reference default minus the inapplicable HANGUL); a lone CJK term (run of
    one) is always emitted as a unigram; output_unigrams=True also emits each
    run's unigrams alongside the bigrams (CJKBigramFilter.cs:131)."""

    def __init__(self, flags: int = HAN | HIRAGANA | KATAKANA, output_unigrams: bool = False):
        self.flags = flags
        self.output_unigrams = output_unigrams

    def _is_cjk(self, term: str) -> bool:
        return len(term) == 1 and bool(_script_of(term) & self.flags)

    def __call__(self, terms: list[str]) -> list[str]:
        out: list[str] = []
        run: list[str] = []

        def flush() -> None:
            if not run:
                return
            if len(run) == 1:
                out.append(run[0])
            else:
                if self.output_unigrams:
                    # reference order: unigram precedes the bigram it starts
                    for i in range(len(run) - 1):
                        out.append(run[i])
                        out.append(run[i] + run[i + 1])
                    out.append(run[-1])
                else:
                    out.extend(run[i] + run[i + 1] for i in range(len(run) - 1))
            run.clear()

        for t in terms:
            if self._is_cjk(t):
                run.append(t)
            else:
                flush()
                out.append(t)
        flush()
        return out

    def config(self) -> dict:
        return {"filter": "cjk_bigram", "flags": self.flags, "output_unigrams": self.output_unigrams}


def cjk_analyzer(stop_words=None, output_unigrams: bool = False):
    """CJKAnalyzer analog: standard chain + width fold + bigrams."""
    from .analysis import ENGLISH_STOP_WORDS, Analyzer
    from .analysis_ext import ChainAnalyzer

    base = Analyzer("standard", stop_words=ENGLISH_STOP_WORDS if stop_words is None else stop_words)
    return ChainAnalyzer(
        base,
        filters=(CJKBigramFilter(output_unigrams=output_unigrams),),
        char_filters=(CJKWidthCharFilter(),),
    )
