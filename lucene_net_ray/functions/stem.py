"""PorterStemFilter + ASCIIFoldingFilter analogs (pure token functions).

Porter stemmer: clean-room implementation of the ORIGINAL published Porter
algorithm (M.F. Porter, "An algorithm for suffix stripping", 1980) — the same
algorithm behind the reference's PorterStemFilter
(/root/reference/src/Lucene.Net.Analysis.Common/Analysis/En/PorterStemFilter.cs:26,
PorterStemmer.cs derived from Porter's public C version). Verified against
the paper's published example pairs in tests/test_analysis_chains.py.

ASCII folding: maps accented/decorated Latin characters to ASCII
(/root/reference/src/Lucene.Net.Analysis.Common/Analysis/Miscellaneous/ASCIIFoldingFilter.cs).
The reference enumerates the mappings in a giant switch; here Unicode NFKD
decomposition + combining-mark strip covers the diacritics, plus an explicit
table for the ligature/special-letter cases NFKD leaves alone.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC){m}[V]: number of VC sequences."""
    m = 0
    i = 0
    n = len(stem)
    # skip initial consonants
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        # in vowel run
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """ends consonant-vowel-consonant where final consonant not w/x/y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


@lru_cache(maxsize=500_000)
def porter_stem(w: str) -> str:
    """Original Porter algorithm, steps 1a-5b."""
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break
    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break
    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not (stem and stem[-1] in "st"):
                break
            if _measure(stem) > 1:
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


_FOLD_SPECIAL = {
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE", "ß": "ss", "ẞ": "SS",
    "ø": "o", "Ø": "O", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "TH", "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
    "ı": "i", "ĸ": "q", "ŋ": "n", "Ŋ": "N", "ŧ": "t", "Ŧ": "T",
}


@lru_cache(maxsize=500_000)
def ascii_fold(s: str) -> str:
    """Fold accented Latin characters to their ASCII equivalents."""
    if s.isascii():
        return s
    out = []
    for ch in s:
        if ord(ch) < 128:
            out.append(ch)
            continue
        sp = _FOLD_SPECIAL.get(ch)
        if sp is not None:
            out.append(sp)
            continue
        dec = unicodedata.normalize("NFKD", ch)
        kept = "".join(c for c in dec if not unicodedata.combining(c))
        out.append(kept if kept else ch)
    return "".join(out)


# ---------------------------------------------------------------------------
# Savoy light/minimal stemmers (the reference's per-language *LightStemmer
# classes implement these published algorithms; ported with citations)
# ---------------------------------------------------------------------------

_DE_FOLD = str.maketrans(
    "äàáâöòóôïìíîüùúû",
    "aaaaooooiiiiuuuu",
)
_DE_ST_END = frozenset("bdfghklmnt")


@lru_cache(maxsize=200_000)
def german_light_stem(w: str) -> str:
    """GermanLightStemmer port (Savoy's light German algorithm; reference
    Analysis.Common/Analysis/De/GermanLightStemmer.cs)."""
    s = w.translate(_DE_FOLD)
    n = len(s)
    # step 1
    if n > 5 and s.endswith("ern"):
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in "mnrs":
        n -= 2
    elif n > 3 and s[n - 1] == "e":
        n -= 1
    elif n > 3 and s[n - 1] == "s" and s[n - 2] in _DE_ST_END:
        n -= 1
    # step 2
    if n > 5 and s[n - 3 : n] == "est":
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in "rn":
        n -= 2
    elif n > 4 and s[n - 2 : n] == "st" and s[n - 3] in _DE_ST_END:
        n -= 2
    return s[:n]


_ES_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


@lru_cache(maxsize=200_000)
def spanish_light_stem(w: str) -> str:
    """SpanishLightStemmer port (Savoy CLEF-2001; reference
    Analysis.Common/Analysis/Es/SpanishLightStemmer.cs)."""
    if len(w) < 5:
        return w
    s = list(w.translate(_ES_FOLD))
    n = len(s)
    last = s[n - 1]
    if last in "oae":
        return "".join(s[: n - 1])
    if last == "s":
        if s[n - 2] == "e" and s[n - 3] == "s" and s[n - 4] == "e":
            return "".join(s[: n - 2])
        if s[n - 2] == "e" and s[n - 3] == "c":
            s[n - 3] = "z"
            return "".join(s[: n - 2])
        if s[n - 2] in "oae":
            return "".join(s[: n - 2])
    return "".join(s)


@lru_cache(maxsize=200_000)
def french_minimal_stem(w: str) -> str:
    """FrenchMinimalStemmer port (Savoy's minimal French algorithm; reference
    Analysis.Common/Analysis/Fr/FrenchMinimalStemmer.cs)."""
    if len(w) < 6:
        return w
    s = list(w)
    n = len(s)
    if s[n - 1] == "x":
        if s[n - 3] == "a" and s[n - 2] == "u":
            s[n - 2] = "l"
        return "".join(s[: n - 1])
    if s[n - 1] == "s":
        n -= 1
    if s[n - 1] == "r":
        n -= 1
    if s[n - 1] == "e":
        n -= 1
    if s[n - 1] == "é":
        n -= 1
    if n >= 2 and s[n - 1] == s[n - 2]:
        n -= 1
    return "".join(s[:n])


from .kp import kp_stem  # noqa: E402
from .lovins import lovins_stem  # noqa: E402
from .rslp import brazilian_stem  # noqa: E402
from .snowball import (  # noqa: E402
    danish_stem,
    dutch_stem,
    french_stem,
    finnish_snowball_stem,
    hungarian_snowball_stem,
    german2_snowball_stem,
    german_snowball_stem,
    italian_stem,
    norwegian_stem,
    porter2_stem,
    portuguese_stem,
    romanian_stem,
    russian_stem,
    spanish_snowball_stem,
    swedish_stem,
)

STEMMERS = {
    "porter": porter_stem,
    "german": german_light_stem,
    "spanish": spanish_light_stem,
    "french": french_minimal_stem,
    "porter2": porter2_stem,
    "italian": italian_stem,
    "russian": russian_stem,
    "swedish": swedish_stem,
    "norwegian": norwegian_stem,
    "danish": danish_stem,
    "dutch": dutch_stem,
    "portuguese": portuguese_stem,
    "spanish_snowball": spanish_snowball_stem,
    "german_snowball": german_snowball_stem,
    "german2": german2_snowball_stem,
    "finnish_snowball": finnish_snowball_stem,
    "hungarian_snowball": hungarian_snowball_stem,
    "lovins": lovins_stem,
    "kp": kp_stem,
    "french_snowball": french_stem,
    "romanian": romanian_stem,
    "brazilian": brazilian_stem,
}


# ---------------------------------------------------------------------------
# Arabic light10 (Larkey, Ballesteros & Connell 2002) — the algorithm behind
# the reference's Analysis/Ar/ArabicNormalizer.cs + ArabicStemmer.cs
# ---------------------------------------------------------------------------

_AR_DIACRITICS = frozenset("ًٌٍَُِّْ")
_AR_NORM = str.maketrans({"أ": "ا", "إ": "ا", "آ": "ا", "ى": "ي", "ة": "ه"})
_AR_PREFIXES = ("وال", "بال", "كال", "فال", "ال", "لل", "و")
_AR_SUFFIXES = ("ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة", "ي")


@lru_cache(maxsize=200_000)
def arabic_normalize(w: str) -> str:
    """ArabicNormalizer: strip tashkeel + tatweel, fold hamza/teh forms."""
    w = "".join(c for c in w if c not in _AR_DIACRITICS and c != "ـ")
    return w.translate(_AR_NORM)


@lru_cache(maxsize=200_000)
def arabic_stem(w: str) -> str:
    """Light10: normalize, strip one definite-article prefix (remainder >= 2
    chars; bare 'و' needs >= 3) and then all matching suffixes (remainder >=
    2) — ArabicStemmer.cs semantics."""
    w = arabic_normalize(w)
    for p in _AR_PREFIXES:
        if w.startswith(p) and len(w) - len(p) >= (3 if p == "و" else 2):
            w = w[len(p):]
            break
    changed = True
    while changed:
        changed = False
        for s in _AR_SUFFIXES:
            if w.endswith(s) and len(w) - len(s) >= 2:
                w = w[: -len(s)]
                changed = True
                break
    return w


STEMMERS["arabic"] = arabic_stem


# ---------------------------------------------------------------------------
# Indonesian (Tala 2003) — semantics of the reference's
# Analysis/Id/IndonesianStemmer.cs:35 (flags gate illegal affix pairs;
# syllable budget: rules only fire while > 2 vowels remain)
# ---------------------------------------------------------------------------

_ID_V = frozenset("aeiou")


@lru_cache(maxsize=200_000)
def indonesian_stem(word: str, derivational: bool = True) -> str:
    w = word
    syll = sum(c in _ID_V for c in w)
    flags = set()

    def particle(w):
        nonlocal syll
        if w.endswith(("kah", "lah", "pun")):
            syll -= 1
            return w[:-3]
        return w

    def possessive(w):
        nonlocal syll
        if w.endswith(("ku", "mu")):
            syll -= 1
            return w[:-2]
        if w.endswith("nya"):
            syll -= 1
            return w[:-3]
        return w

    def first_prefix(w):
        nonlocal syll
        if w.startswith("meng"):
            flags.add("meng"); syll -= 1; return w[4:]
        if w.startswith("meny") and len(w) > 4 and w[4] in _ID_V:
            flags.add("meng"); syll -= 1; return "s" + w[4:]
        if w.startswith(("men", "mem")):
            flags.add("meng"); syll -= 1; return w[3:]
        if w.startswith("me"):
            flags.add("meng"); syll -= 1; return w[2:]
        if w.startswith("peng"):
            flags.add("peng"); syll -= 1; return w[4:]
        if w.startswith("peny") and len(w) > 4 and w[4] in _ID_V:
            flags.add("peng"); syll -= 1; return "s" + w[4:]
        if w.startswith("peny"):
            flags.add("peng"); syll -= 1; return w[4:]
        if w.startswith("pen") and len(w) > 3 and w[3] in _ID_V:
            flags.add("peng"); syll -= 1; return "t" + w[3:]
        if w.startswith(("pen", "pem")):
            flags.add("peng"); syll -= 1; return w[3:]
        if w.startswith("di"):
            flags.add("di"); syll -= 1; return w[2:]
        if w.startswith("ter"):
            flags.add("ter"); syll -= 1; return w[3:]
        if w.startswith("ke"):
            flags.add("ke"); syll -= 1; return w[2:]
        return w

    def second_prefix(w):
        nonlocal syll
        if w.startswith("ber"):
            flags.add("ber"); syll -= 1; return w[3:]
        if w == "belajar":
            flags.add("ber"); syll -= 1; return w[3:]
        if (
            w.startswith("be") and len(w) > 4
            and w[2] not in _ID_V and w[3] == "e" and w[4] == "r"
        ):
            flags.add("ber"); syll -= 1; return w[2:]
        if w.startswith("per"):
            syll -= 1; return w[3:]
        if w == "pelajar":
            syll -= 1; return w[3:]
        if w.startswith("pe"):
            flags.add("pe"); syll -= 1; return w[2:]
        return w

    def suffix(w):
        nonlocal syll
        if w.endswith("kan") and not flags & {"ke", "peng", "pe"}:
            syll -= 1; return w[:-3]
        if w.endswith("an") and not flags & {"di", "meng", "ter"}:
            syll -= 1; return w[:-2]
        if (
            w.endswith("i") and not w.endswith("si")
            and not flags & {"ber", "ke", "peng"}
        ):
            syll -= 1; return w[:-1]
        return w

    if syll > 2:
        w = particle(w)
    if syll > 2:
        w = possessive(w)
    if derivational:
        old = w
        if syll > 2:
            w = first_prefix(w)
        if w != old:  # a first-order rule fired: suffix, then 2nd prefix
            old = w
            if syll > 2:
                w = suffix(w)
            if w != old and syll > 2:
                w = second_prefix(w)
        else:
            if syll > 2:
                w = second_prefix(w)
            if syll > 2:
                w = suffix(w)
    return w


STEMMERS["indonesian"] = indonesian_stem


# ---------------------------------------------------------------------------
# Hindi light (Ramanathan & Rao 2003) — semantics of the reference's
# Analysis/Hi/HindiStemmer.cs:25 (longest of the published suffix table,
# guarded by minimum remaining length)
# ---------------------------------------------------------------------------

_HI_SUFFIXES = (
    (6, ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")),
    (5, ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
         "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
         "ियों", "ियां")),
    (4, ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
         "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
         "ुआं")),
    (3, ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं", "ती",
         "ता", "ाँ", "ां", "ों", "ें")),
    (2, ("ो", "े", "ू", "ु", "ी", "ि", "ा")),
)


#: simple one-to-one normalizations (reference Analysis/Hi/HindiNormalizer.cs:48
#: switch table — Pingali & Varma word normalization + Larkey et al additions):
#: candrabindu->bindu, precomposed-nukta foldings, chandra/short vowel
#: replacements, long->short independent and dependent vowels
_HI_NORM_MAP = {
    "\u0901": "\u0902",  # candrabindu -> bindu
    "\u0929": "\u0928",  # precomposed nukta forms
    "\u0931": "\u0930",
    "\u0934": "\u0933",
    "\u0958": "\u0915",
    "\u0959": "\u0916",
    "\u095A": "\u0917",
    "\u095B": "\u091C",
    "\u095C": "\u0921",
    "\u095D": "\u0922",
    "\u095E": "\u092B",
    "\u095F": "\u092F",
    "\u0945": "\u0947",  # chandra/short e -> e
    "\u0946": "\u0947",
    "\u0949": "\u094B",  # chandra/short o -> o
    "\u094A": "\u094B",
    "\u090D": "\u090F",  # chandra/short E -> E
    "\u090E": "\u090F",
    "\u0911": "\u0913",  # chandra/short O -> O
    "\u0912": "\u0913",
    "\u0972": "\u0905",  # candra A -> A
    "\u0906": "\u0905",  # long -> short independent vowels
    "\u0908": "\u0907",
    "\u090A": "\u0909",
    "\u0960": "\u090B",
    "\u0961": "\u090C",
    "\u0910": "\u090F",
    "\u0914": "\u0913",
    "\u0940": "\u093F",  # long -> short dependent vowels
    "\u0942": "\u0941",
    "\u0944": "\u0943",
    "\u0963": "\u0962",
    "\u0948": "\u0947",
    "\u094C": "\u094B",
}
#: deletions: nukta sign, zwnj/zwj, virama -- the shifted-in char is
#: reprocessed, exactly like the reference's in-place delete + i--
_HI_NORM_DEL = frozenset(("\u093C", "\u200C", "\u200D", "\u094D"))


@lru_cache(maxsize=200_000)
def hindi_normalize(w: str) -> str:
    """HindiNormalizer analog (Analysis/Hi/HindiNormalizer.cs:48): spelling-
    variation normalization for Devanagari. The companion
    IndicNormalizationFilter (Analysis/In/IndicNormalizer.cs:102) is a no-op
    in this reference tree — its script decompositions table is EMPTY
    (``decompositions = {}``), so there is nothing to replicate; documented
    here rather than silently skipped."""
    s = list(w)
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\u0928" and i + 1 < len(s) and s[i + 1] == "\u094D":
            s[i] = "\u0902"  # dead n (na + virama) -> anusvara
            del s[i + 1]
        elif c in _HI_NORM_DEL:
            del s[i]
            continue
        else:
            r = _HI_NORM_MAP.get(c)
            if r is not None:
                s[i] = r
        i += 1
    return "".join(s)


def hindi_lower(w: str) -> str:
    """HindiAnalyzer's pre-stop chain (Analysis/Hi/HindiAnalyzer.cs:145-151):
    LowerCase -> IndicNormalization (empty-table no-op here) ->
    HindiNormalization, all BEFORE the stop filter."""
    return hindi_normalize(w.lower())


@lru_cache(maxsize=200_000)
def hindi_stem(w: str) -> str:
    for min_len, sufs in _HI_SUFFIXES:
        if len(w) > min_len:
            for s in sufs:
                if w.endswith(s):
                    return w[: -len(s)]
    return w


# ---------------------------------------------------------------------------
# Czech light (Dolamic & Savoy) — semantics of the reference's
# Analysis/Cz/CzechStemmer.cs:30 (case endings, possessives, palatalization
# normalization)
# ---------------------------------------------------------------------------

_CZ_FINAL_V = frozenset("aeiouůyáéíýě")


@lru_cache(maxsize=200_000)
def czech_stem(word: str) -> str:
    w = word
    # remove case endings
    if len(w) > 7 and w.endswith("atech"):
        w = w[:-5]
    elif len(w) > 6 and w.endswith(("ětem", "etem", "atům")):
        w = w[:-4]
    elif len(w) > 5 and w.endswith(
        ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
         "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
         "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
    ):
        w = w[:-3]
    elif len(w) > 4 and w.endswith(
        ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým", "mi", "ou")
    ):
        w = w[:-2]
    elif len(w) > 3 and w[-1] in _CZ_FINAL_V:
        w = w[:-1]
    # remove possessives
    if len(w) > 5 and w.endswith(("ov", "in", "ův")):
        w = w[:-2]
    # normalize palatalization
    if not w:
        return w
    if w.endswith("čt"):
        return w[:-2] + "ck"
    if w.endswith("št"):
        return w[:-2] + "sk"
    if w[-1] in "cč":
        return w[:-1] + "k"
    if w[-1] in "zž":
        return w[:-1] + "h"
    if len(w) > 1 and w[-2] == "e":
        return w[:-2] + w[-1]
    if len(w) > 2 and w[-2] == "ů":
        return w[:-2] + "o" + w[-1]
    return w


STEMMERS["hindi"] = hindi_stem
STEMMERS["czech"] = czech_stem


# ---------------------------------------------------------------------------
# Bulgarian light (Savoy BUIR) — semantics of the reference's
# Analysis/Bg/BulgarianStemmer.cs:36 (article, plural, e-endings, ен/ъ fixes)
# ---------------------------------------------------------------------------

def _bg_article(w: str) -> str:
    if len(w) > 6 and w.endswith("ият"):
        return w[:-3]
    if len(w) > 5 and w.endswith(("ът", "то", "те", "та", "ия")):
        return w[:-2]
    if len(w) > 4 and w.endswith("ят"):
        return w[:-2]
    return w


def _bg_plural(w: str) -> str:
    if len(w) > 6:
        if w.endswith("овци"):
            return w[:-3]
        if w.endswith("ове"):
            return w[:-3]
        if w.endswith("еве"):
            return w[:-3] + "й"
    if len(w) > 5:
        if w.endswith("ища"):
            return w[:-3]
        if w.endswith("та"):
            return w[:-2]
        if w.endswith("ци"):
            return w[:-2] + "к"
        if w.endswith("зи"):
            return w[:-2] + "г"
        if w[-3] == "е" and w[-1] == "и":
            return w[:-3] + "я" + w[-2]
    if len(w) > 4:
        if w.endswith("си"):
            return w[:-2] + "х"
        if w.endswith("и"):
            return w[:-1]
    return w


@lru_cache(maxsize=200_000)
def bulgarian_stem(word: str) -> str:
    w = word
    if len(w) < 4:
        return w
    if len(w) > 5 and w.endswith("ища"):
        return w[:-3]
    w = _bg_article(w)
    w = _bg_plural(w)
    if len(w) > 3:
        if w.endswith("я"):
            w = w[:-1]
        if w.endswith(("а", "о", "е")):
            w = w[:-1]
    if len(w) > 4 and w.endswith("ен"):
        w = w[:-2] + "н"
    if len(w) > 5 and w[-2] == "ъ":
        w = w[:-2] + w[-1]
    return w


# ---------------------------------------------------------------------------
# Finnish light (Savoy CLEF-2003) — semantics of the reference's
# Analysis/Fi/FinnishLightStemmer.cs:35
# ---------------------------------------------------------------------------

_FI_FOLD = str.maketrans("äåö", "aao")
_FI_V = frozenset("aeiouy")


def _fi_step1(w: str) -> str:
    if len(w) > 8:
        if w.endswith("kin"):
            return _fi_step1(w[:-3])
        if w.endswith("ko"):
            return _fi_step1(w[:-2])
    if len(w) > 11:
        if w.endswith("dellinen"):
            return w[:-8]
        if w.endswith("dellisuus"):
            return w[:-9]
    return w


def _fi_step2(w: str) -> str:
    if len(w) > 5:
        if w.endswith(("lla", "tse", "sti")):
            return w[:-3]
        if w.endswith("ni"):
            return w[:-2]
        if w.endswith("aa"):
            return w[:-1]
    return w


def _fi_step3(w: str) -> str:
    if len(w) > 8:
        if w.endswith("nnen"):
            return w[:-4] + "s"
        if w.endswith("ntena"):
            return w[:-5] + "s"
        if w.endswith("tten"):
            return w[:-4]
        if w.endswith("eiden"):
            return w[:-5]
    if len(w) > 6:
        if w.endswith(("neen", "niin", "seen", "teen", "inen")):
            return w[:-4]
        if w[-3] == "h" and w[-2] in _FI_V and w[-1] == "n":
            return w[:-3]
        if w.endswith("den"):
            return w[:-3] + "s"
        if w.endswith("ksen"):
            return w[:-4] + "s"
        if w.endswith(("ssa", "sta", "lla", "lta", "tta", "ksi", "lle")):
            return w[:-3]
    if len(w) > 5:
        if w.endswith(("na", "ne")):
            return w[:-2]
        if w.endswith("nei"):
            return w[:-3]
    if len(w) > 4:
        if w.endswith(("ja", "ta")):
            return w[:-2]
        if w[-1] == "a":
            return w[:-1]
        if w[-1] == "n" and w[-2] in _FI_V:
            return w[:-2]
        if w[-1] == "n":
            return w[:-1]
    return w


def _fi_norm1(w: str) -> str:
    if len(w) > 5 and w.endswith("hde"):
        w = w[:-3] + "ksi"
    if len(w) > 4 and w.endswith(("ei", "at")):
        return w[:-2]
    if len(w) > 3 and w[-1] in "tsjeai":
        return w[:-1]
    return w


def _fi_norm2(w: str) -> str:
    if len(w) > 8 and w[-1] in "eou":
        w = w[:-1]
    if len(w) > 4:
        if w[-1] == "i":
            w = w[:-1]
        if len(w) > 4:
            out = [w[0]]
            for c in w[1:]:
                if c == out[-1] and c in "kpt":
                    continue
                out.append(c)
            w = "".join(out)
    return w


@lru_cache(maxsize=200_000)
def finnish_light_stem(word: str) -> str:
    if len(word) < 4:
        return word
    w = word.translate(_FI_FOLD)
    return _fi_norm2(_fi_norm1(_fi_step3(_fi_step2(_fi_step1(w)))))


STEMMERS["bulgarian"] = bulgarian_stem
STEMMERS["finnish"] = finnish_light_stem


# ---------------------------------------------------------------------------
# Hungarian light (Savoy) — semantics of the reference's
# Analysis/Hu/HungarianLightStemmer.cs:35 (fold, case, possessive, plural,
# final-vowel normalize; vowel set includes y)
# ---------------------------------------------------------------------------

_HU_FOLD = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")
_HU_V = frozenset("aeiouy")


def _hu_case(w: str) -> str:
    if len(w) > 6 and w.endswith("kent"):
        return w[:-4]
    if len(w) > 5:
        if w.endswith(("nak", "nek", "val", "vel", "ert", "rol", "ban",
                       "ben", "bol", "nal", "nel", "hoz", "hez", "tol")):
            return w[:-3]
        if w.endswith(("al", "el")) and w[-3] not in _HU_V and w[-3] == w[-4]:
            return w[:-3]
    if len(w) > 4:
        if w.endswith(("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                       "be", "ul", "ig")):
            return w[:-2]
        if w.endswith(("on", "en")) and w[-3] not in _HU_V:
            return w[:-2]
        if w[-1] in "tn":
            return w[:-1]
        if w[-1] in "ae" and w[-2] == w[-3] and w[-2] not in _HU_V:
            return w[:-2]
    return w


def _hu_possessive(w: str) -> str:
    if len(w) > 6:
        if w[-5] not in _HU_V and w.endswith(("atok", "otok", "etek")):
            return w[:-4]
        if w.endswith(("itek", "itok")):
            return w[:-4]
    if len(w) > 5:
        if w[-4] not in _HU_V and w.endswith(("unk", "tok", "tek")):
            return w[:-3]
        if w[-4] in _HU_V and w.endswith("juk"):
            return w[:-3]
        if w.endswith("ink"):
            return w[:-3]
    if len(w) > 4:
        if w[-3] not in _HU_V and w.endswith(("am", "em", "om", "ad", "ed", "od", "uk")):
            return w[:-2]
        if w[-3] in _HU_V and w.endswith(("nk", "ja", "je")):
            return w[:-2]
        if w.endswith(("im", "id", "ik")):
            return w[:-2]
    if len(w) > 3:
        if w[-1] in "ae" and w[-2] not in _HU_V:
            return w[:-1]
        if w[-1] in "md" and w[-2] in _HU_V:
            return w[:-1]
        if w[-1] == "i":
            return w[:-1]
    return w


def _hu_plural(w: str) -> str:
    if len(w) > 3 and w[-1] == "k":
        if w[-2] in "aoe" and len(w) > 4:
            return w[:-2]
        return w[:-1]
    return w


@lru_cache(maxsize=200_000)
def hungarian_light_stem(word: str) -> str:
    w = word.translate(_HU_FOLD)
    w = _hu_plural(_hu_possessive(_hu_case(w)))
    if len(w) > 3 and w[-1] in "aeio":
        w = w[:-1]
    return w


STEMMERS["hungarian"] = hungarian_light_stem


# ---------------------------------------------------------------------------
# Persian normalizer — Analysis/Fa/PersianNormalizer.cs:33 semantics
# (yeh/kaf/heh variant folding, hamza-above removal)
# ---------------------------------------------------------------------------

_FA_NORM = str.maketrans(
    {"ی": "ي", "ے": "ي", "ک": "ك",
     "ۀ": "ه", "ہ": "ه", "ٔ": None}
)


@lru_cache(maxsize=200_000)
def persian_normalize(w: str) -> str:
    return w.translate(_FA_NORM)


STEMMERS["persian"] = persian_normalize


# ---------------------------------------------------------------------------
# Latvian light (Rīga light stemmer) — semantics of the reference's
# Analysis/Lv/LatvianStemmer.cs:23 (the C#-converted file lost the affix
# initializer; the table below is the published Lucene LatvianStemmer one):
# strip the longest matching affix when the word keeps > vc vowels and >= 3
# chars of stem, then un-palatalize the boundary.
# ---------------------------------------------------------------------------

_LV_V = frozenset("aāeēiīouū")
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False), ("ai", 2, False),
    ("ei", 2, False), ("ām", 1, False), ("am", 1, False), ("ēm", 1, False),
    ("īm", 1, False), ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False), ("os", 1, True),
    ("ij", 1, False), ("īs", 1, False), ("ēs", 1, False), ("is", 1, False),
    ("ie", 1, False), ("u", 1, True), ("a", 1, False), ("i", 1, False),
    ("e", 1, False), ("ā", 1, False), ("ē", 1, False), ("ī", 1, False),
    ("ū", 1, False), ("o", 1, False), ("s", 0, False), ("š", 0, False),
)


def _lv_unpalatalize(w: str, removed_first: str) -> str:
    if removed_first == "u":
        if w.endswith("kš"):
            return w[:-2] + "kst"
        if w.endswith("ņņ"):
            return w[:-2] + "nn"
    if w.endswith(("pj", "bj", "mj", "vj")):
        return w[:-1]
    for suf, rep in (("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"),
                     ("žļ", "zl"), ("ļņ", "ln"), ("ļļ", "ll")):
        if w.endswith(suf):
            return w[:-2] + rep
    if w and w[-1] in "čļņ":
        return w[:-1] + {"č": "c", "ļ": "l", "ņ": "n"}[w[-1]]
    return w


@lru_cache(maxsize=200_000)
def latvian_stem(word: str) -> str:
    w = word
    nv = sum(c in _LV_V for c in w)
    for affix, vc, palatalizes in _LV_AFFIXES:
        if nv > vc and len(w) >= len(affix) + 3 and w.endswith(affix):
            stem = w[: -len(affix)]
            return _lv_unpalatalize(stem, affix[0]) if palatalizes else stem
    return w


STEMMERS["latvian"] = latvian_stem

from .greek import greek_stem  # noqa: E402

STEMMERS["greek"] = greek_stem


# ---------------------------------------------------------------------------
# Sorani Kurdish — semantics of the reference's Analysis/Ckb/
# SoraniNormalizer.cs (yeh/kaf/heh/reh folding, ZWNJ + harakat removal)
# and SoraniStemmer.cs (postposition, possessive, ezafe/definite endings)
# ---------------------------------------------------------------------------

import unicodedata as _ud

_CKB_MAP = {"ي": "ی", "ى": "ی", "ك": "ک",
            "ة": "ە", "ھ": "ه", "ڒ": "ڕ"}
_CKB_DEL = frozenset("ـًٌٍَُِّْ")


@lru_cache(maxsize=200_000)
def sorani_normalize(w: str) -> str:
    out: list[str] = []
    for ch in w:
        if ch == "‌":  # ZWNJ: heh before it becomes AE
            if out and out[-1] == "ه":
                out[-1] = "ە"
            continue
        if ch in _CKB_DEL or _ud.category(ch) == "Cf":
            continue
        out.append(_CKB_MAP.get(ch, ch))
    s = "".join(out)
    if s.endswith("ه"):  # final heh -> AE
        s = s[:-1] + "ە"
    if s.startswith("ر"):  # initial reh -> rreh
        s = "ڕ" + s[1:]
    return s


@lru_cache(maxsize=200_000)
def sorani_stem(word: str) -> str:
    w = sorani_normalize(word)
    # postposition
    if len(w) > 5 and w.endswith("دا"):
        w = w[:-2]
    elif len(w) > 4 and w.endswith("نا"):
        w = w[:-1]
    elif len(w) > 6 and w.endswith("ەوە"):
        w = w[:-3]
    # possessive pronoun
    if len(w) > 6 and w.endswith(("مان", "یان", "تان")):
        w = w[:-3]
    # ezafe / definite / plural endings (first match returns)
    if len(w) > 6 and w.endswith("ێکی"):
        return w[:-3]
    if len(w) > 7 and w.endswith("یەکی"):
        return w[:-4]
    if len(w) > 5 and w.endswith("ێک"):
        return w[:-2]
    if len(w) > 6 and w.endswith("یەک"):
        return w[:-3]
    if len(w) > 6 and w.endswith("ەکە"):
        return w[:-3]
    if len(w) > 5 and w.endswith("کە"):
        return w[:-2]
    if len(w) > 7 and w.endswith("ەکان"):
        return w[:-4]
    if len(w) > 6 and w.endswith("کان"):
        return w[:-3]
    if len(w) > 7 and w.endswith("یانی"):
        return w[:-4]
    if len(w) > 6 and w.endswith("انی"):
        return w[:-3]
    if len(w) > 6 and w.endswith("یان"):
        return w[:-3]
    if len(w) > 5 and w.endswith("ان"):
        return w[:-2]
    if len(w) > 7 and w.endswith("یانە"):
        return w[:-4]
    if len(w) > 6 and w.endswith("انە"):
        return w[:-3]
    if len(w) > 5 and w.endswith(("ایە", "ەیە")):
        return w[:-2]
    if len(w) > 4 and w.endswith("ە"):
        return w[:-1]
    if len(w) > 4 and w.endswith("ی"):
        return w[:-1]
    return w


STEMMERS["sorani"] = sorani_stem


# ---------------------------------------------------------------------------
# Turkish + Irish case handling (pre-stopword CASE_FOLDS seam; the standard
# chain's plain str.lower() is replaced by these when the analyzer kind
# selects them)
# ---------------------------------------------------------------------------

_TR_I_CAP = "I"      # I
_TR_I_DOTTED_CAP = "İ"  # İ
_TR_DOTLESS_I = "ı"  # ı
_COMBINING_DOT_ABOVE = "̇"


def turkish_lower(w: str) -> str:
    """ApostropheFilter + TurkishLowerCaseFilter analog (reference
    Analysis/Tr/ApostropheFilter.cs:34 — truncate at the first ' or ’,
    suffixes after apostrophes are proper-name inflections — and
    Analysis/Tr/TurkishLowerCaseFilter.cs:39 — İ->i; I->ı unless followed by
    combining-dot-above, which marks a dotted capital and is consumed)."""
    for apo in ("'", "’"):
        cut = w.find(apo)
        if cut >= 0:
            w = w[:cut]
    out: list[str] = []
    i, n = 0, len(w)
    while i < n:
        ch = w[i]
        if ch == _TR_I_CAP:
            # dotted if followed by (nonspacing marks then) combining dot
            j = i + 1
            while j < n and unicodedata.combining(w[j]) and w[j] != _COMBINING_DOT_ABOVE:
                j += 1
            if j < n and w[j] == _COMBINING_DOT_ABOVE:
                out.append("i")
                out.append(w[i + 1 : j])  # keep intervening marks
                i = j + 1
                continue
            out.append(_TR_DOTLESS_I)
            i += 1
            continue
        if ch == _TR_I_DOTTED_CAP:
            out.append("i")
            i += 1
            continue
        if ch == _COMBINING_DOT_ABOVE and out and out[-1] and out[-1][-1] == "i":
            i += 1  # drop redundant dot after i (İ.lower() artifacts)
            continue
        out.append(ch.lower())
        i += 1
    return "".join(out)


_GA_UPPER_VOWELS = frozenset("AEIOUÁÉÍÓÚ")
_GA_HYPHENATIONS = frozenset(("h", "n", "t"))
_GA_ARTICLES = ("d'", "m'", "b'", "d’", "m’", "b’")


def irish_lower(w: str) -> str:
    """Irish chain analog (reference Analysis/Ga/IrishAnalyzer.cs:129):
    pre-lowercase stop of bare hyphenation particles {h,n,t}; elision of the
    articles d'/m'/b'; IrishLowerCaseFilter.cs:30 — nAthair -> n-athair,
    tUisce -> t-uisce (prothetic n-/t- before an uppercase vowel keeps its
    case-marking as a hyphen). Returns '' when the token is stopped."""
    if w.lower() in _GA_HYPHENATIONS:
        return ""
    lw = w.lower()
    for art in _GA_ARTICLES:
        if lw.startswith(art) and len(w) > 2:
            w = w[2:]
            break
    if len(w) > 1 and w[0] in ("n", "t") and w[1] in _GA_UPPER_VOWELS:
        return w[0] + "-" + w[1:].lower()
    return w.lower()


from .ca_eu_hy import (  # noqa: E402
    armenian_light_stem,
    basque_light_stem,
    catalan_light_stem,
    catalan_lower,
)

CASE_FOLDS = {
    "turkish": turkish_lower,
    "irish": irish_lower,
    "catalan": catalan_lower,
    # HindiAnalyzer's LowerCase -> IndicNorm (empty-table no-op in this
    # tree) -> HindiNorm pre-stop chain (Analysis/Hi/HindiAnalyzer.cs:145)
    "hindi": hindi_lower,
}


from .turkish import turkish_snowball_stem  # noqa: E402

STEMMERS["turkish_snowball"] = turkish_snowball_stem

from .galician import galician_minimal_stem, galician_stem  # noqa: E402

STEMMERS["galician"] = galician_stem
STEMMERS["galician_minimal"] = galician_minimal_stem
STEMMERS["catalan"] = catalan_light_stem
STEMMERS["basque"] = basque_light_stem
STEMMERS["armenian"] = armenian_light_stem
