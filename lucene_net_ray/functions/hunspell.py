"""Hunspell affix-dictionary stemming (HunspellStemFilter analog).

Reference: /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Hunspell/
Dictionary.cs + HunspellStemFilter.cs:40 — stems are produced by reversing
SFX/PFX affix rules against a .dic word list. This is a clean-room SUBSET of
the public hunspell format: SFX/PFX blocks with strip/append/condition,
cross-product prefix+suffix application one level deep; compounding,
two-fold suffixes, flag compression modes (long/num/UTF-8 aliases) and
morphological fields are out of scope (documented). No bundled dictionaries
(none ship in this container) — callers supply .aff/.dic text, tests carry a
small synthetic pair.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class AffixRule:
    flag: str
    strip: str
    append: str
    condition: re.Pattern
    cross: bool


class HunspellDictionary:
    """Parsed .aff + .dic pair with affix-reversal stemming."""

    def __init__(self, aff_text: str, dic_text: str):
        self.suffixes: list[AffixRule] = []
        self.prefixes: list[AffixRule] = []
        self._parse_aff(aff_text)
        self.words: dict[str, frozenset[str]] = {}
        self._parse_dic(dic_text)

    def _parse_aff(self, text: str) -> None:
        lines = [ln.strip() for ln in text.splitlines()]
        i = 0
        while i < len(lines):
            parts = lines[i].split()
            if len(parts) >= 4 and parts[0] in ("SFX", "PFX") and parts[3].isdigit():
                kind, flag, cross, count = parts[0], parts[1], parts[2] == "Y", int(parts[3])
                for j in range(1, count + 1):
                    rp = lines[i + j].split()
                    # KIND FLAG strip append condition
                    strip = "" if rp[2] == "0" else rp[2]
                    append = "" if rp[3] == "0" else rp[3]
                    cond = rp[4] if len(rp) > 4 else "."
                    if kind == "SFX":
                        rx = re.compile(f"(?:{cond})$") if cond != "." else re.compile("")
                        self.suffixes.append(AffixRule(flag, strip, append, rx, cross))
                    else:
                        rx = re.compile(f"^(?:{cond})") if cond != "." else re.compile("")
                        self.prefixes.append(AffixRule(flag, strip, append, rx, cross))
                i += count + 1
            else:
                i += 1

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        start = 1 if lines and lines[0].strip().isdigit() else 0
        for ln in lines[start:]:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            if "/" in ln:
                word, flags = ln.split("/", 1)
                self.words[word] = frozenset(flags.strip())
            else:
                self.words[ln] = frozenset()

    # -- stemming ----------------------------------------------------------
    def _dict_ok(self, stem: str, flag: str | None) -> bool:
        fl = self.words.get(stem)
        if fl is None:
            return False
        return flag is None or flag in fl

    def _suffix_stems(self, w: str) -> list[tuple[str, str]]:
        """(stem, flag) candidates from reversing one suffix rule."""
        out = []
        for r in self.suffixes:
            if r.append and not w.endswith(r.append):
                continue
            stem = w[: len(w) - len(r.append)] + r.strip if r.append else w + r.strip
            if stem and r.condition.search(stem):
                out.append((stem, r.flag))
        return out

    def stem(self, word: str) -> list[str]:
        """All dictionary stems of `word`, sorted; [] when nothing matches
        (HunspellStemFilter keeps the original in that case)."""
        found: set[str] = set()
        if word in self.words:
            found.add(word)
        # suffix-only
        for stem, flag in self._suffix_stems(word):
            if self._dict_ok(stem, flag):
                found.add(stem)
        # prefix-only and prefix+suffix (cross products)
        for p in self.prefixes:
            if not word.startswith(p.append):
                continue
            base = p.strip + word[len(p.append) :]
            if not base or not p.condition.search(base):
                continue
            if self._dict_ok(base, p.flag):
                found.add(base)
            if p.cross:
                for stem, sflag in self._suffix_stems(base):
                    for sr in (r for r in self.suffixes if r.flag == sflag and r.cross):
                        break
                    else:
                        continue
                    fl = self.words.get(stem)
                    if fl is not None and p.flag in fl and sflag in fl:
                        found.add(stem)
        return sorted(found)


class HunspellStemFilter:
    """ChainAnalyzer term filter: replace each term by its dictionary stems
    (longest-first dedupe keeps all stems like the reference's
    HunspellStemFilter with dedup=true); unknown terms pass through."""

    def __init__(self, dictionary: HunspellDictionary, longest_only: bool = False):
        self.dictionary = dictionary
        self.longest_only = longest_only

    def __call__(self, terms: list[str]) -> list[str]:
        out: list[str] = []
        for t in terms:
            stems = self.dictionary.stem(t)
            if not stems:
                out.append(t)
            elif self.longest_only:
                out.append(max(stems, key=lambda s: (len(s), s)))
            else:
                out.extend(stems)
        return out

    def config(self) -> dict:
        return {
            "filter": "hunspell",
            "words": len(self.dictionary.words),
            "longest_only": self.longest_only,
        }
