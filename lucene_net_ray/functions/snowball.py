"""Snowball stemmers: English (Porter2), Italian, Russian, Swedish,
Norwegian, Danish, Dutch, Portuguese, Spanish, German.

Clean-room implementations of the PUBLISHED Snowball algorithm definitions
(M.F. Porter, snowballstem.org — "The <language> stemming algorithm" pages),
the same algorithms behind the reference's SnowballFilter
(/root/reference/src/Lucene.Net.Analysis.Common/Analysis/Snowball/SnowballFilter.cs:30
and the generated stemmers under Tartarus/Snowball/Ext/). No reference code
was consulted; only the public algorithm prose.

Semantics shared by all three:
- regions R1/R2: R1 = region after the first non-vowel following a vowel;
  R2 = the same definition applied within R1. Suffix tests "in R1/R2" mean
  the suffix starts at or after the region start.
- `among` semantics: the LONGEST suffix in a group that matches within the
  region limit decides; if its side-condition then fails, the whole group
  fails (no backtracking to shorter entries) — but an entry that merely
  extends beyond the region limit is skipped in favor of shorter entries,
  mirroring Snowball's setlimit behavior.
"""

from __future__ import annotations

from functools import lru_cache

# ---------------------------------------------------------------------------
# English — Porter2
# ---------------------------------------------------------------------------

_EN_V = frozenset("aeiouy")  # 'Y' (marked consonant y) is NOT a vowel
_EN_DOUBLE = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_LI = frozenset("cdeghkmnrt")
_EN_EXC = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EN_EXC1A = frozenset(
    ["inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed"]
)

_EN_STEP2 = (
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"), ("ousness", "ous"),
    ("iveness", "ive"), ("tional", "tion"), ("biliti", "ble"), ("lessli", "less"),
    ("entli", "ent"), ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"),
    ("anci", "ance"), ("abli", "able"), ("izer", "ize"), ("ator", "ate"),
    ("alli", "al"), ("bli", "ble"), ("ogi", None), ("li", None),
)
_EN_STEP3 = (
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"), ("icate", "ic"),
    ("iciti", "ic"), ("ative", None), ("ical", "ic"), ("ness", ""), ("ful", ""),
)
_EN_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ism",
    "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
)


def _en_r1(w: str) -> int:
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            return len(pre)
    return _region_after_vc(w, _EN_V, 0)


def _region_after_vc(w: str, vowels: frozenset, start: int) -> int:
    for i in range(start + 1, len(w)):
        if w[i] not in vowels and w[i - 1] in vowels:
            return i + 1
    return len(w)


def _en_short_syllable_at_end(w: str) -> bool:
    n = len(w)
    if n >= 3 and w[-2] in _EN_V and w[-1] not in _EN_V and w[-1] not in "wxY" and w[-3] not in _EN_V:
        return True
    if n == 2 and w[0] in _EN_V and w[1] not in _EN_V:
        return True
    return False


@lru_cache(maxsize=200_000)
def porter2_stem(word: str) -> str:
    w = word
    if w.startswith("'"):
        w = w[1:]
    if len(w) <= 2:
        return w
    if w in _EN_EXC:
        return _EN_EXC[w]
    # prelude: mark consonant y as Y
    chars = list(w)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _EN_V:
            chars[i] = "Y"
    w = "".join(chars)
    r1 = _en_r1(w)
    r2 = _region_after_vc(w, _EN_V, r1)

    # step 0: apostrophe suffixes
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-2] if len(w) - 3 > 1 else w[:-1]
    elif w.endswith("ss") or w.endswith("us"):
        pass
    elif w.endswith("s"):
        if any(c in _EN_V for c in w[:-2]):
            w = w[:-1]
    if w in _EN_EXC1A:
        return w
    # step 1b
    done_1b = False
    for suf in ("eedly", "eed"):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + "ee"
            done_1b = True
            break
    if not done_1b:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if any(c in _EN_V for c in stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_EN_DOUBLE):
                        w = w[:-1]
                    elif r1 >= len(w) and _en_short_syllable_at_end(w):
                        w += "e"
                break
    # step 1c
    if len(w) > 2 and w[-1] in "yY" and w[-2] not in _EN_V:
        w = w[:-1] + "i"
    # step 2 (R1)
    for suf, rep in _EN_STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if w.endswith("logi"):
                        w = w[:-1]
                elif suf == "li":
                    if len(w) > 2 and w[-3] in _EN_LI:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break
    # step 3 (R1; 'ative' needs R2)
    for suf, rep in _EN_STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break
    # step 4 (R2)
    for suf in _EN_STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) > 3 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break
    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (len(w) - 1 >= r1 and not _en_short_syllable_at_end(w[:-1])):
            w = w[:-1]
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) > 1 and w[-2] == "l":
        w = w[:-1]
    return w.replace("Y", "y")


# ---------------------------------------------------------------------------
# shared among() helper (Snowball setlimit + longest-match semantics)
# ---------------------------------------------------------------------------

def _among(w: str, region: int, entries) -> tuple[str, int] | None:
    """entries: ((suffix, tag), ...) sorted longest-first. Returns the
    longest (suffix, tag) matching within the region, or None. Entries whose
    suffix would extend before `region` are skipped (out of limit); the
    caller applies tag side-conditions, whose failure must NOT fall back."""
    for s, tag in entries:
        if w.endswith(s) and len(w) - len(s) >= region:
            return s, tag
    return None


def _sorted_entries(*groups) -> tuple:
    ent = []
    for sufs, tag in groups:
        ent.extend((s, tag) for s in sufs)
    ent.sort(key=lambda e: len(e[0]), reverse=True)
    return tuple(ent)


# ---------------------------------------------------------------------------
# Russian
# ---------------------------------------------------------------------------

_RU_V = frozenset("аеиоуыэюя")

_RU_PERF_GERUND = _sorted_entries(
    (("в", "вши", "вшись"), 1),
    (("ив", "ивши", "ившись", "ыв", "ывши", "ывшись"), 2),
)
_RU_ADJECTIVE = _sorted_entries(
    (
        (
            "ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой", "ем",
            "им", "ым", "ом", "его", "ого", "ему", "ому", "их", "ых", "ую",
            "юю", "ая", "яя", "ою", "ею",
        ),
        2,
    )
)
_RU_PARTICIPLE = _sorted_entries(
    (("ем", "нн", "вш", "ющ", "щ"), 1),
    (("ивш", "ывш", "ующ"), 2),
)
_RU_REFLEXIVE = _sorted_entries((("ся", "сь"), 2))
_RU_VERB = _sorted_entries(
    (
        ("ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но", "ет",
         "ют", "ны", "ть", "ешь", "нно"),
        1,
    ),
    (
        ("ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли", "ей", "уй",
         "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ят", "ует", "уют",
         "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю"),
        2,
    ),
)
_RU_NOUN = _sorted_entries(
    (
        ("а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи", "ии",
         "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием", "ем", "ам",
         "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию", "ью", "ю", "ия",
         "ья", "я"),
        2,
    )
)
_RU_SUPERLATIVE = _sorted_entries((("ейш", "ейше"), 2))
_RU_DERIVATIONAL = _sorted_entries((("ост", "ость"), 2))


def _ru_try(w: str, rv: int, entries) -> str | None:
    """Remove the matched suffix, honoring group-1's preceding-а/я test
    (the а/я stays; its position must also lie in RV)."""
    m = _among(w, rv, entries)
    if m is None:
        return None
    s, tag = m
    base = len(w) - len(s)
    if tag == 1:
        if base - 1 >= rv and w[base - 1] in "ая":
            return w[:base]
        return None  # condition failure aborts the whole group
    return w[:base]


@lru_cache(maxsize=200_000)
def russian_stem(word: str) -> str:
    w = word.replace("ё", "е")
    rv = len(w)
    for i, c in enumerate(w):
        if c in _RU_V:
            rv = i + 1
            break
    r1 = _region_after_vc(w, _RU_V, 0)
    r2 = _region_after_vc(w, _RU_V, r1)

    # step 1
    nw = _ru_try(w, rv, _RU_PERF_GERUND)
    if nw is not None:
        w = nw
    else:
        nw = _ru_try(w, rv, _RU_REFLEXIVE)
        if nw is not None:
            w = nw
        nw = _ru_try(w, rv, _RU_ADJECTIVE)
        if nw is not None:
            w = nw
            nw = _ru_try(w, rv, _RU_PARTICIPLE)
            if nw is not None:
                w = nw
        else:
            nw = _ru_try(w, rv, _RU_VERB)
            if nw is not None:
                w = nw
            else:
                nw = _ru_try(w, rv, _RU_NOUN)
                if nw is not None:
                    w = nw
    # step 2
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]
    # step 3 (R2)
    nw = _ru_try(w, r2, _RU_DERIVATIONAL)
    if nw is not None:
        w = nw
    # step 4
    if w.endswith("нн") and len(w) - 2 >= rv:
        w = w[:-1]
    else:
        m = _among(w, rv, _RU_SUPERLATIVE)
        if m is not None:
            w = w[: len(w) - len(m[0])]
            if w.endswith("нн") and len(w) - 2 >= rv:
                w = w[:-1]
        elif w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Italian
# ---------------------------------------------------------------------------

_IT_V = frozenset("aeiouàèìòù")
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")
_IT_PRONOUNS = tuple(
    sorted(
        [
            "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
            "sene", "gliela", "gliele", "glieli", "glielo", "gliene", "mela",
            "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
            "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
            "veli", "velo", "vene",
        ],
        key=len,
        reverse=True,
    )
)
# step-1 suffixes: (suffix, action). Actions: "R2" delete in R2; "RV" delete
# in RV; ("R2", replacement); "amente"/"ità"/"ivX"/"azione" get bespoke code.
_IT_STEP1 = tuple(
    sorted(
        [
            ("amente", "amente"),
            *[(s, "R2") for s in (
                "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi",
                "ismo", "ismi", "abile", "abili", "ibile", "ibili", "ista",
                "iste", "isti", "istà", "istè", "istì", "oso", "osi", "osa",
                "ose", "mente", "atrice", "atrici", "ante", "anti",
            )],
            *[(s, "azione") for s in ("azione", "azioni", "atore", "atori")],
            ("logia", ("R2", "log")), ("logie", ("R2", "log")),
            *[(s, ("R2", "u")) for s in ("uzione", "uzioni", "usione", "usioni")],
            ("enza", ("R2", "ente")), ("enze", ("R2", "ente")),
            *[(s, "RV") for s in ("amento", "amenti", "imento", "imenti")],
            ("ità", "ità"),
            *[(s, "ivX") for s in ("ivo", "ivi", "iva", "ive")],
        ],
        key=lambda e: len(e[0]),
        reverse=True,
    )
)
_IT_STEP2 = tuple(
    sorted(
        [
            "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
            "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
            "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
            "erà", "eranno", "erebbe", "erebbero", "erei", "eremmo", "eremo",
            "ereste", "eresti", "erete", "erò", "erono", "essero", "ete",
            "eva", "evamo", "evano", "evate", "evi", "evo", "Iamo", "iamo",
            "immo", "irà", "iranno", "irebbe", "irebbero", "irei", "iremmo",
            "iremo", "ireste", "iresti", "irete", "irò", "irono", "isca",
            "iscano", "isce", "isci", "isco", "ita", "ite", "iti", "ito",
            "iva", "ivamo", "ivano", "ivate", "ivi", "ivo", "ono", "uta",
            "ute", "uti", "uto", "ere", "ire", "ar", "ir",
        ],
        key=len,
        reverse=True,
    )
)


def _rv_romance(w: str, V: frozenset) -> int:
    n = len(w)
    if n < 2:
        return n
    if w[1] not in V:  # second letter a consonant
        for i in range(2, n):
            if w[i] in V:
                return i + 1
        return n
    if w[0] in V:  # first two letters vowels
        for i in range(2, n):
            if w[i] not in V:
                return i + 1
        return n
    return 3 if n >= 3 else n  # consonant-vowel


@lru_cache(maxsize=200_000)
def italian_stem(word: str) -> str:
    w = word.translate(_IT_ACUTE)
    chars = list(w)
    for i, c in enumerate(chars):
        if c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
        elif c in "ui" and 0 < i < len(chars) - 1 and chars[i - 1] in _IT_V and chars[i + 1] in _IT_V:
            chars[i] = "U" if c == "u" else "I"
    w = "".join(chars)
    rv = _rv_romance(w, _IT_V)
    r1 = _region_after_vc(w, _IT_V, 0)
    r2 = _region_after_vc(w, _IT_V, r1)

    # step 0: attached pronoun after ando/endo (delete) or ar/er/ir (-> e)
    for p in _IT_PRONOUNS:
        if w.endswith(p) and len(w) - len(p) >= rv:
            base = w[: len(w) - len(p)]
            if (base.endswith("ando") or base.endswith("endo")) and len(base) - 4 >= rv:
                w = base
            elif (base.endswith("ar") or base.endswith("er") or base.endswith("ir")) and len(base) - 2 >= rv:
                w = base + "e"
            break

    removed = False
    m = None
    for s, action in _IT_STEP1:
        if w.endswith(s):
            m = (s, action)
            break
    if m is not None:
        s, action = m
        base = len(w) - len(s)
        if action == "R2":
            if base >= r2:
                w, removed = w[:base], True
        elif action == "RV":
            if base >= rv:
                w, removed = w[:base], True
        elif action == "amente":
            if base >= r1:
                w, removed = w[:base], True
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                elif w.endswith("abil") and len(w) - 4 >= r2:
                    w = w[:-4]
                elif (w.endswith("os") or w.endswith("ic")) and len(w) - 2 >= r2:
                    w = w[:-2]
        elif action == "azione":
            if base >= r2:
                w, removed = w[:base], True
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif action == "ità":
            if base >= r2:
                w, removed = w[:base], True
                if w.endswith("abil") and len(w) - 4 >= r2:
                    w = w[:-4]
                elif (w.endswith("ic") or w.endswith("iv")) and len(w) - 2 >= r2:
                    w = w[:-2]
        elif action == "ivX":
            if base >= r2:
                w, removed = w[:base], True
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic") and len(w) - 2 >= r2:
                        w = w[:-2]
        else:  # ("R2", replacement)
            reg, rep = action
            if base >= r2:
                w, removed = w[:base] + rep, True

    if not removed:
        for s in _IT_STEP2:
            if w.endswith(s) and len(w) - len(s) >= rv:
                w = w[: len(w) - len(s)]
                break

    # step 3a: final vowel (not u), then a preceding i, both in RV
    if w and w[-1] in "aeioàèìò" and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= rv:
            w = w[:-1]
    # step 3b
    if (w.endswith("ch") or w.endswith("gh")) and len(w) - 2 >= rv:
        w = w[:-1]
    return w.replace("I", "i").replace("U", "u")


SNOWBALL_STEMMERS = {
    "porter2": porter2_stem,
    "italian": italian_stem,
    "russian": russian_stem,
}


# ---------------------------------------------------------------------------
# Scandinavian family: Swedish, Norwegian, Danish (published definitions:
# "The Swedish/Norwegian/Danish stemming algorithm", snowballstem.org).
# Shared shape: R1 (adjusted so >= 3 chars precede it), one big suffix step,
# a consonant-pair step, and a small cleanup step.
# ---------------------------------------------------------------------------

def _scand_r1(w: str, vowels: frozenset) -> int:
    return max(_region_after_vc(w, vowels, 0), 3)


_SV_V = frozenset("aeiouyäåö")
_SV_S_END = frozenset("bcdfghjklmnoprtvy")
_SV_STEP1 = tuple(sorted(
    ["a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande", "arne",
     "are", "aste", "en", "anden", "aren", "heten", "ern", "ar", "er",
     "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades", "andes",
     "ens", "arens", "hetens", "erns", "at", "andet", "het", "ast"],
    key=len, reverse=True))
_SV_STEP3 = ("fullt", "löst", "els", "lig", "ig")


@lru_cache(maxsize=200_000)
def swedish_stem(word: str) -> str:
    w = word
    r1 = _scand_r1(w, _SV_V)
    matched = None
    for suf in _SV_STEP1:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            matched = suf
            break
    if matched:
        w = w[: -len(matched)]
    elif w.endswith("s") and len(w) - 1 >= r1 and len(w) >= 2 and w[-2] in _SV_S_END:
        w = w[:-1]
    for suf in ("dd", "gd", "nn", "dt", "gt", "kt", "tt"):
        if w.endswith(suf) and len(w) - 2 >= r1:
            w = w[:-1]
            break
    for suf in _SV_STEP3:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            if suf == "löst":
                w = w[:-1]  # -> lös
            elif suf == "fullt":
                w = w[:-1]  # -> full
            else:
                w = w[: -len(suf)]
            break
    return w


_NO_V = frozenset("aeiouyæåø")
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")
_NO_STEP1 = tuple(sorted(
    [("a", "d"), ("e", "d"), ("ede", "d"), ("ande", "d"), ("ende", "d"),
     ("ane", "d"), ("ene", "d"), ("hetene", "d"), ("en", "d"), ("heten", "d"),
     ("ar", "d"), ("er", "d"), ("heter", "d"), ("as", "d"), ("es", "d"),
     ("edes", "d"), ("endes", "d"), ("enes", "d"), ("hetenes", "d"),
     ("ens", "d"), ("hetens", "d"), ("ers", "d"), ("ets", "d"), ("et", "d"),
     ("het", "d"), ("ast", "d"), ("erte", "er"), ("ert", "er"), ("s", "s")],
    key=lambda e: len(e[0]), reverse=True))
_NO_STEP3 = tuple(sorted(
    ["leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov", "slov",
     "hetslov"], key=len, reverse=True))


@lru_cache(maxsize=200_000)
def norwegian_stem(word: str) -> str:
    w = word
    r1 = _scand_r1(w, _NO_V)
    for suf, action in _NO_STEP1:
        if not (w.endswith(suf) and len(w) - len(suf) >= r1):
            continue
        if action == "d":
            w = w[: -len(suf)]
        elif action == "er":
            w = w[: -len(suf)] + "er"
        else:  # s: valid s-ending, or k not preceded by a vowel
            prev = w[-2] if len(w) >= 2 else ""
            if prev in _NO_S_END or (
                prev == "k" and (len(w) < 3 or w[-3] not in _NO_V)
            ):
                w = w[:-1]
        break
    for suf in ("dt", "vt"):
        if w.endswith(suf) and len(w) - 2 >= r1:
            w = w[:-1]
            break
    for suf in _NO_STEP3:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)]
            break
    return w


_DA_V = frozenset("aeiouyæåø")
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")
_DA_STEP1 = tuple(sorted(
    ["hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene", "erne",
     "ere", "en", "heden", "eren", "er", "heder", "erer", "heds", "es",
     "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens", "erens",
     "ers", "ets", "erets", "et", "eret"], key=len, reverse=True))


@lru_cache(maxsize=200_000)
def danish_stem(word: str) -> str:
    w = word
    r1 = _scand_r1(w, _DA_V)

    def consonant_pair(w: str) -> str:
        for suf in ("gd", "dt", "gt", "kt"):
            if w.endswith(suf) and len(w) - 2 >= r1:
                return w[:-1]
        return w

    matched = None
    for suf in _DA_STEP1:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            matched = suf
            break
    if matched:
        w = w[: -len(matched)]
    elif w.endswith("s") and len(w) - 1 >= r1 and len(w) >= 2 and w[-2] in _DA_S_END:
        w = w[:-1]
    w = consonant_pair(w)
    if w.endswith("igst"):
        w = w[:-2]
    for suf in ("elig", "løst", "lig", "els", "ig"):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            if suf == "løst":
                w = w[:-1]  # -> løs
            else:
                w = w[: -len(suf)]
                w = consonant_pair(w)
            break
    if (
        len(w) >= 2
        and w[-1] == w[-2]
        and w[-1] not in _DA_V
        and len(w) - 1 >= r1
    ):
        w = w[:-1]  # undouble
    return w


SNOWBALL_STEMMERS.update(
    {"swedish": swedish_stem, "norwegian": norwegian_stem, "danish": danish_stem}
)


# ---------------------------------------------------------------------------
# Dutch ("The Dutch stemming algorithm", snowballstem.org)
# ---------------------------------------------------------------------------

_NL_V = frozenset("aeiouyè")
_NL_ACCENT = str.maketrans("äáëéïíöóüú", "aaeeiioouu")


def _nl_undouble(w: str) -> str:
    return w[:-1] if w.endswith(("kk", "dd", "tt")) else w


@lru_cache(maxsize=200_000)
def dutch_stem(word: str) -> str:
    w = word.translate(_NL_ACCENT)
    # prelude: initial y, y after vowel -> Y; i between vowels -> I
    chars = list(w)
    for i, c in enumerate(chars):
        if c == "y" and (i == 0 or chars[i - 1] in _NL_V):
            chars[i] = "Y"
        elif c == "i" and 0 < i < len(chars) - 1 and chars[i - 1] in _NL_V and chars[i + 1] in _NL_V:
            chars[i] = "I"
    w = "".join(chars)
    r1 = max(_region_after_vc(w, _NL_V, 0), 3)
    r2 = _region_after_vc(w, _NL_V, _region_after_vc(w, _NL_V, 0))

    # step 1 (longest of heden / ene,en / se,s)
    if w.endswith("heden") and len(w) - 5 >= r1:
        w = w[:-5] + "heid"
    else:
        done = False
        for suf in ("ene", "en"):
            if w.endswith(suf) and len(w) - len(suf) >= r1:
                base = w[: -len(suf)]
                if base and base[-1] not in _NL_V and not base.endswith("gem"):
                    w = _nl_undouble(base)
                done = True
                break
        if not done:
            for suf in ("se", "s"):
                if w.endswith(suf) and len(w) - len(suf) >= r1:
                    base = w[: -len(suf)]
                    if base and base[-1] not in _NL_V and base[-1] != "j":
                        w = base
                    break

    # step 2: suffix e after a non-vowel, in R1; remember for 3b's 'bar'
    e_removed = False
    if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 and w[-2] not in _NL_V:
        w = _nl_undouble(w[:-1])
        e_removed = True

    # step 3a: heid (R2, not after c), then a preceding en as in step 1
    if w.endswith("heid") and len(w) - 4 >= r2 and (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if w.endswith("en") and len(w) - 2 >= r1:
            base = w[:-2]
            if base and base[-1] not in _NL_V and not base.endswith("gem"):
                w = _nl_undouble(base)

    # step 3b: d-suffixes (longest of end/ing/lijk/baar/bar/ig), in R2
    for suf in ("lijk", "baar", "end", "ing", "bar", "ig"):
        if not (w.endswith(suf) and len(w) - len(suf) >= r2):
            continue
        if suf in ("end", "ing"):
            w = w[: -len(suf)]
            if w.endswith("ig") and len(w) - 2 >= r2 and (len(w) < 3 or w[-3] != "e"):
                w = w[:-2]
            else:
                w = _nl_undouble(w)
        elif suf == "ig":
            if len(w) - 2 >= r2 and (len(w) < 3 or w[-3] != "e"):
                w = w[:-2]
        elif suf == "lijk":
            w = w[:-4]
            if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 and w[-2] not in _NL_V:
                w = _nl_undouble(w[:-1])
        elif suf == "baar":
            w = w[:-4]
        elif suf == "bar" and e_removed:
            w = w[:-3]
        break

    # step 4: undouble vowel (C V V D, V in aeou, D a non-vowel other than I)
    if (
        len(w) >= 4
        and w[-1] not in _NL_V
        and w[-1] != "I"
        and w[-2] == w[-3]
        and w[-2] in "aeou"
        and w[-4] not in _NL_V
    ):
        w = w[:-2] + w[-1]
    return w.replace("Y", "y").replace("I", "i")


SNOWBALL_STEMMERS["dutch"] = dutch_stem


# ---------------------------------------------------------------------------
# Portuguese ("The Portuguese stemming algorithm", snowballstem.org)
# ---------------------------------------------------------------------------

_PT_V = frozenset("aeiouáéíóúâêô")

_PT_R2_DELETE = (
    "amentos", "imentos", "amento", "imento", "adoras", "adores", "aço~es",
    "ismos", "istas", "adora", "aça~o", "antes", "ância", "ezas", "icos",
    "icas", "ismo", "ável", "ível", "ista", "osos", "osas", "ador", "ante",
    "eza", "ico", "ica", "oso", "osa",
)
_PT_VERB = tuple(sorted(
    ["ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá", "era",
     "irá", "ava", "asse", "esse", "isse", "aste", "este", "iste", "ei",
     "arei", "erei", "irei", "am", "iam", "ariam", "eriam", "iriam", "aram",
     "eram", "iram", "avam", "em", "arem", "erem", "irem", "assem", "essem",
     "issem", "ado", "ido", "ando", "endo", "indo", "ara~o", "era~o",
     "ira~o", "ar", "er", "ir", "as", "adas", "idas", "ias", "arias",
     "erias", "irias", "arás", "aras", "erás", "eras", "irás", "avas", "es",
     "ardes", "erdes", "irdes", "ares", "eres", "ires", "asses", "esses",
     "isses", "astes", "estes", "istes", "is", "ais", "eis", "íeis",
     "aríeis", "eríeis", "iríeis", "áreis", "areis", "éreis", "ereis",
     "íreis", "ireis", "ásseis", "ésseis", "ísseis", "áveis", "ados",
     "idos", "ámos", "amos", "íamos", "aríamos", "eríamos", "iríamos",
     "áramos", "éramos", "íramos", "ávamos", "emos", "aremos", "eremos",
     "iremos", "ássemos", "êssemos", "íssemos", "imos", "armos", "ermos",
     "irmos", "eu", "iu", "ou", "ira", "iras"],
    key=len, reverse=True))


@lru_cache(maxsize=200_000)
def portuguese_stem(word: str) -> str:
    w = word.replace("ã", "a~").replace("õ", "o~")
    rv = _rv_romance(w, _PT_V)
    r1 = _region_after_vc(w, _PT_V, 0)
    r2 = _region_after_vc(w, _PT_V, r1)

    removed = False
    # step 1: standard suffixes — longest match decides
    cands = sorted(
        set(_PT_R2_DELETE)
        | {"logias", "logia", "uço~es", "uça~o", "ências", "ência", "amente",
           "mente", "idades", "idade", "ivas", "ivos", "iva", "ivo", "iras",
           "ira"},
        key=len, reverse=True,
    )
    m = next((s for s in cands if w.endswith(s)), None)
    if m is not None:
        base = len(w) - len(m)
        if m in ("logias", "logia"):
            if base >= r2:
                w, removed = w[:base] + "log", True
        elif m in ("uço~es", "uça~o"):
            if base >= r2:
                w, removed = w[:base] + "u", True
        elif m in ("ências", "ência"):
            if base >= r2:
                w, removed = w[:base] + "ente", True
        elif m == "amente":
            if base >= r1:
                w, removed = w[:base], True
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                elif (w.endswith("os") or w.endswith("ic") or w.endswith("ad")) and len(w) - 2 >= r2:
                    w = w[:-2]
        elif m == "mente":
            if base >= r2:
                w, removed = w[:base], True
                for pre in ("ante", "avel", "ível"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: -len(pre)]
                        break
        elif m in ("idades", "idade"):
            if base >= r2:
                w, removed = w[:base], True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: -len(pre)]
                        break
        elif m in ("ivas", "ivos", "iva", "ivo"):
            if base >= r2:
                w, removed = w[:base], True
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif m in ("iras", "ira"):
            if base >= rv and base >= 1 and w[base - 1] == "e":
                w, removed = w[:base] + "ir", True
        else:  # plain delete-in-R2 group
            if base >= r2:
                w, removed = w[:base], True

    # step 2: verb suffixes in RV, only if step 1 removed nothing
    if not removed:
        for s in _PT_VERB:
            if w.endswith(s) and len(w) - len(s) >= rv:
                w, removed = w[: -len(s)], True
                break

    # step 3: a final i after c, in RV, only if something was removed
    if removed and w.endswith("i") and len(w) - 1 >= rv and len(w) >= 2 and w[-2] == "c":
        w = w[:-1]

    # step 4: residual suffix, only if steps 1 AND 2 did nothing
    if not removed:
        for s in ("os", "a", "i", "o", "á", "í", "ó"):
            if w.endswith(s) and len(w) - len(s) >= rv:
                w = w[: -len(s)]
                break

    # step 5: residual e / é / ê in RV, then gu/ci cleanup; or ç -> c
    if w and w[-1] in "eéê" and len(w) - 1 >= rv:
        w = w[:-1]
        if (w.endswith("gu") or w.endswith("ci")) and len(w) - 1 >= rv:
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"
    return w.replace("a~", "ã").replace("o~", "õ")


SNOWBALL_STEMMERS["portuguese"] = portuguese_stem


# ---------------------------------------------------------------------------
# Spanish ("The Spanish stemming algorithm", snowballstem.org)
# ---------------------------------------------------------------------------

_ES_V = frozenset("aeiouáéíóúü")
_ES_PRON = tuple(sorted(
    ["me", "se", "sela", "selo", "selas", "selos", "la", "le", "lo", "las",
     "les", "los", "nos"], key=len, reverse=True))
_ES_DEACCENT = str.maketrans("áéíóú", "aeiou")
_ES_R2_DELETE = (
    "amientos", "imientos", "amiento", "imiento", "anzas", "ismos", "ables",
    "ibles", "istas", "anza", "icos", "icas", "ismo", "able", "ible",
    "ista", "osos", "osas", "ico", "ica", "oso", "osa",
)
_ES_ADOR = ("adoras", "adores", "aciones", "adora", "ación", "ador",
            "antes", "ancias", "ante", "ancia")
_ES_VERB2B = tuple(sorted(
    ["arían", "arías", "arán", "arás", "aríais", "aría", "aréis", "aríamos",
     "aremos", "ará", "aré", "erían", "erías", "erán", "erás", "eríais",
     "ería", "eréis", "eríamos", "eremos", "erá", "eré", "irían", "irías",
     "irán", "irás", "iríais", "iría", "iréis", "iríamos", "iremos", "irá",
     "iré", "aba", "ada", "ida", "ía", "ara", "iera", "ad", "ed", "id",
     "ase", "iese", "aste", "iste", "an", "aban", "ían", "aran", "ieran",
     "asen", "iesen", "aron", "ieron", "ado", "ido", "ando", "iendo", "ió",
     "ar", "er", "ir", "as", "abas", "adas", "idas", "ías", "aras",
     "ieras", "ases", "ieses", "ís", "áis", "abais", "íais", "arais",
     "ierais", "aseis", "ieseis", "asteis", "isteis", "ados", "idos",
     "amos", "ábamos", "íamos", "imos", "áramos", "iéramos", "iésemos",
     "ásemos", "en", "es", "éis", "emos"],
    key=len, reverse=True))
_ES_Y_SUF = tuple(sorted(
    ["ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó", "yas", "yes",
     "yais", "yamos"], key=len, reverse=True))


@lru_cache(maxsize=200_000)
def spanish_snowball_stem(word: str) -> str:
    w = word
    rv = _rv_romance(w, _ES_V)
    r1 = _region_after_vc(w, _ES_V, 0)
    r2 = _region_after_vc(w, _ES_V, r1)

    # step 0: attached pronoun after a gerund/infinitive base, in RV; an
    # accented ending (case a: iéndo/ándo/ár/ér/ír) is deaccented
    for p in _ES_PRON:
        if w.endswith(p) and len(w) - len(p) >= rv:
            base = w[: len(w) - len(p)]
            low = base.translate(_ES_DEACCENT)
            for g in ("iendo", "ando", "ar", "er", "ir"):
                if low.endswith(g) and len(base) - len(g) >= rv:
                    w = base[: -len(g)] + g  # pronoun dropped, ending deaccented
                    break
            else:
                if (
                    base.endswith("yendo")
                    and len(base) >= 6
                    and base[-6] == "u"
                    and len(base) - 5 >= rv
                ):
                    w = base
            break

    removed = False
    cands = sorted(
        set(_ES_R2_DELETE) | set(_ES_ADOR)
        | {"logías", "logía", "uciones", "ución", "encias", "encia",
           "amente", "mente", "idades", "idad", "ivas", "ivos", "iva", "ivo"},
        key=len, reverse=True)
    m = next((s for s in cands if w.endswith(s)), None)
    if m is not None:
        base = len(w) - len(m)
        if m in ("logías", "logía"):
            if base >= r2:
                w, removed = w[:base] + "log", True
        elif m in ("uciones", "ución"):
            if base >= r2:
                w, removed = w[:base] + "u", True
        elif m in ("encias", "encia"):
            if base >= r2:
                w, removed = w[:base] + "ente", True
        elif m == "amente":
            if base >= r1:
                w, removed = w[:base], True
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                elif (w.endswith("os") or w.endswith("ic") or w.endswith("ad")) and len(w) - 2 >= r2:
                    w = w[:-2]
        elif m == "mente":
            if base >= r2:
                w, removed = w[:base], True
                for pre in ("ante", "able", "ible"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: -len(pre)]
                        break
        elif m in ("idades", "idad"):
            if base >= r2:
                w, removed = w[:base], True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: -len(pre)]
                        break
        elif m in ("ivas", "ivos", "iva", "ivo"):
            if base >= r2:
                w, removed = w[:base], True
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif m in _ES_ADOR:
            if base >= r2:
                w, removed = w[:base], True
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        else:
            if base >= r2:
                w, removed = w[:base], True

    if not removed:
        # step 2a: verb suffixes beginning with y, preceded by u, in RV
        for s in _ES_Y_SUF:
            if (
                w.endswith(s)
                and len(w) - len(s) >= rv
                and len(w) - len(s) >= 1
                and w[len(w) - len(s) - 1] == "u"
            ):
                w, removed = w[: -len(s)], True
                break
    if not removed:
        # step 2b: other verb suffixes in RV
        for s in _ES_VERB2B:
            if w.endswith(s) and len(w) - len(s) >= rv:
                w = w[: -len(s)]
                if s in ("en", "es", "éis", "emos") and w.endswith("gu") and len(w) - 1 >= rv:
                    w = w[:-1]
                removed = True
                break

    # step 3: residual suffix in RV
    for s in ("os", "a", "o", "á", "í", "ó"):
        if w.endswith(s) and len(w) - len(s) >= rv:
            w = w[: -len(s)]
            break
    else:
        if w and w[-1] in "eé" and len(w) - 1 >= rv:
            w = w[:-1]
            if w.endswith("gu") and len(w) - 1 >= rv:
                w = w[:-1]
    return w.translate(_ES_DEACCENT)


SNOWBALL_STEMMERS["spanish_snowball"] = spanish_snowball_stem


# ---------------------------------------------------------------------------
# German ("The German stemming algorithm", snowballstem.org)
# ---------------------------------------------------------------------------

_DE_V = frozenset("aeiouyäöü")
_DE_S_END = frozenset("bdfghklmnrt")
_DE_ST_END = frozenset("bdfghklmnt")
_DE_UNUMLAUT = str.maketrans("äöü", "aou")


@lru_cache(maxsize=200_000)
def german_snowball_stem(word: str) -> str:
    w = word.replace("ß", "ss")
    chars = list(w)
    for i, c in enumerate(chars):  # u/y between vowels are consonants
        if c in "uy" and 0 < i < len(chars) - 1 and chars[i - 1] in _DE_V and chars[i + 1] in _DE_V:
            chars[i] = c.upper()
    w = "".join(chars)
    return _german_steps(w)


def german2_snowball_stem(word: str) -> str:
    """Snowball "german2" variant (reference contrib
    Snowball/SF/Snowball/Ext/German2Stemmer.cs): identical steps to German,
    but the prelude additionally folds the typewriter umlaut spellings
    ae/oe/ue to ä/ö/ü — EXCEPT after q ('qu' consumes its u) — so
    'schoen' and 'schön' stem identically. U/Y marking happens first, on
    the original text, so a u already marked as consonant (between vowels)
    is not folded."""
    chars = list(word)
    for i, c in enumerate(chars):
        if c in "uy" and 0 < i < len(chars) - 1 and chars[i - 1] in _DE_V and chars[i + 1] in _DE_V:
            chars[i] = c.upper()
    out: list[str] = []
    i = 0
    fold = {"a": "ä", "o": "ö", "u": "ü"}
    while i < len(chars):
        c = chars[i]
        nxt = chars[i + 1] if i + 1 < len(chars) else ""
        if c == "ß":
            out.append("ss")
            i += 1
        elif c == "q" and nxt == "u":
            out.append("qu")
            i += 2
        elif c in fold and nxt == "e":
            out.append(fold[c])
            i += 2
        else:
            out.append(c)
            i += 1
    return _german_steps("".join(out))


def _german_steps(w: str) -> str:
    r1 = max(_region_after_vc(w, _DE_V, 0), 3)
    r2 = _region_after_vc(w, _DE_V, _region_after_vc(w, _DE_V, 0))

    # step 1
    for suf in ("ern", "em", "er", "en", "es", "e", "s"):
        if not (w.endswith(suf) and len(w) - len(suf) >= r1):
            continue
        if suf in ("ern", "em", "er"):
            w = w[: -len(suf)]
        elif suf in ("en", "es", "e"):
            w = w[: -len(suf)]
            if w.endswith("niss"):
                w = w[:-1]
        else:  # s
            if len(w) >= 2 and w[-2] in _DE_S_END:
                w = w[:-1]
        break
    # step 2
    for suf in ("est", "en", "er", "st"):
        if not (w.endswith(suf) and len(w) - len(suf) >= r1):
            continue
        if suf == "st":
            if len(w) >= 6 and w[-3] in _DE_ST_END:  # st-ending with 3+ before
                w = w[:-2]
        else:
            w = w[: -len(suf)]
        break
    # step 3: d-suffixes
    for suf in ("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik"):
        if not (w.endswith(suf) and len(w) - len(suf) >= r2):
            continue
        if suf in ("end", "ung"):
            w = w[: -len(suf)]
            if w.endswith("ig") and len(w) - 2 >= r2 and (len(w) < 3 or w[-3] != "e"):
                w = w[:-2]
        elif suf in ("ig", "ik", "isch"):
            if len(w) < len(suf) + 1 or w[-len(suf) - 1] != "e":
                w = w[: -len(suf)]
        elif suf in ("lich", "heit"):
            w = w[: -len(suf)]
            for pre in ("er", "en"):
                if w.endswith(pre) and len(w) - 2 >= r1:
                    w = w[:-2]
                    break
        elif suf == "keit":
            w = w[: -len(suf)]
            for pre in ("lich", "ig"):
                if w.endswith(pre) and len(w) - len(pre) >= r2:
                    w = w[: -len(pre)]
                    break
        break
    return w.translate(_DE_UNUMLAUT).replace("U", "u").replace("Y", "y")


SNOWBALL_STEMMERS["german_snowball"] = german_snowball_stem
SNOWBALL_STEMMERS["german2"] = german2_snowball_stem


# ---------------------------------------------------------------------------
# French ("The French stemming algorithm", snowballstem.org)
# ---------------------------------------------------------------------------

_FR_V = frozenset("aeiouyâàëéêèïîôûù")
_FR_STEP1 = tuple(sorted(
    ["ance", "iqUe", "isme", "able", "iste", "eux", "ances", "iqUes",
     "ismes", "ables", "istes", "atrice", "ateur", "ation", "atrices",
     "ateurs", "ations", "logie", "logies", "usion", "ution", "usions",
     "utions", "ence", "ences", "ement", "ements", "ité", "ités", "if",
     "ive", "ifs", "ives", "eaux", "aux", "euse", "euses", "issement",
     "issements", "amment", "emment", "ment", "ments"],
    key=len, reverse=True))
_FR_STEP2A = tuple(sorted(
    ["îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai", "iraIent",
     "irais", "irait", "iras", "irent", "irez", "iriez", "irions", "irons",
     "iront", "is", "issaIent", "issais", "issait", "issant", "issante",
     "issantes", "issants", "isse", "issent", "isses", "issez", "issiez",
     "issions", "issons", "it"], key=len, reverse=True))
_FR_STEP2B_RV = tuple(sorted(
    ["é", "ée", "ées", "és", "èrent", "er", "era", "erai", "eraIent",
     "erais", "erait", "eras", "erez", "eriez", "erions", "erons", "eront",
     "ez", "iez"], key=len, reverse=True))
_FR_STEP2B_A = tuple(sorted(
    ["âmes", "ât", "âtes", "a", "ai", "aIent", "ais", "ait", "ant", "ante",
     "antes", "ants", "as", "asse", "assent", "asses", "assiez", "assions"],
    key=len, reverse=True))


def _fr_rv(w: str) -> int:
    n = len(w)
    if n >= 3 and w[0] in _FR_V and w[1] in _FR_V:
        return 3
    for pre in ("par", "col", "tap"):  # exceptional RV starters
        if w.startswith(pre):
            return 3
    for i in range(1, n):
        if w[i] in _FR_V:
            return i + 1
    return n


@lru_cache(maxsize=200_000)
def french_stem(word: str) -> str:
    chars = list(word)
    n = len(chars)
    for i, c in enumerate(chars):
        prev_v = i > 0 and chars[i - 1] in _FR_V
        next_v = i < n - 1 and chars[i + 1] in _FR_V
        if c in "ui" and prev_v and next_v:
            chars[i] = c.upper()
        elif c == "y" and (prev_v or next_v):
            chars[i] = "Y"
        elif c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
    w = "".join(chars)
    rv = _fr_rv(w)
    r1 = _region_after_vc(w, _FR_V, 0)
    r2 = _region_after_vc(w, _FR_V, r1)

    altered = False
    do_2a = True
    m = next((s for s in _FR_STEP1 if w.endswith(s)), None)
    if m is not None:
        base = len(w) - len(m)
        if m in ("ance", "iqUe", "isme", "able", "iste", "eux", "ances",
                 "iqUes", "ismes", "ables", "istes"):
            if base >= r2:
                w, altered, do_2a = w[:base], True, False
        elif m in ("atrice", "ateur", "ation", "atrices", "ateurs", "ations"):
            if base >= r2:
                w, altered, do_2a = w[:base], True, False
                if w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif m in ("logie", "logies"):
            if base >= r2:
                w, altered, do_2a = w[:base] + "log", True, False
        elif m in ("usion", "ution", "usions", "utions"):
            if base >= r2:
                w, altered, do_2a = w[:base] + "u", True, False
        elif m in ("ence", "ences"):
            if base >= r2:
                w, altered, do_2a = w[:base] + "ent", True, False
        elif m in ("ement", "ements"):
            if base >= rv:
                w, altered, do_2a = w[:base], True, False
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                elif w.endswith("eus"):
                    if len(w) - 3 >= r2:
                        w = w[:-3]
                    elif len(w) - 3 >= r1:
                        w = w[:-3] + "eux"
                elif (w.endswith("abl") or w.endswith("iqU")) and len(w) - 3 >= r2:
                    w = w[:-3]
                elif (w.endswith("ièr") or w.endswith("Ièr")) and len(w) - 3 >= rv:
                    w = w[:-3] + "i"
        elif m in ("ité", "ités"):
            if base >= r2:
                w, altered, do_2a = w[:base], True, False
                if w.endswith("abil"):
                    if len(w) - 4 >= r2:
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif m in ("if", "ive", "ifs", "ives"):
            if base >= r2:
                w, altered, do_2a = w[:base], True, False
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic"):
                        if len(w) - 2 >= r2:
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif m == "eaux":
            w, altered, do_2a = w[:-1], True, False  # eaux -> eau
        elif m == "aux":
            if base >= r1:
                w, altered, do_2a = w[:base] + "al", True, False
        elif m in ("euse", "euses"):
            if base >= r2:
                w, altered, do_2a = w[:base], True, False
            elif base >= r1:
                w, altered, do_2a = w[:base] + "eux", True, False
        elif m in ("issement", "issements"):
            if base >= r1 and base >= 1 and w[base - 1] not in _FR_V:
                w, altered, do_2a = w[:base], True, False
        elif m == "amment":
            if base >= rv:
                w, altered = w[:base] + "ant", True  # 2a still runs
        elif m == "emment":
            if base >= rv:
                w, altered = w[:base] + "ent", True
        elif m in ("ment", "ments"):
            if base >= 1 and w[base - 1] in _FR_V and base - 1 >= rv:
                w, altered = w[:base], True

    removed_2 = False
    if do_2a or not altered:
        for s in _FR_STEP2A:
            base = len(w) - len(s)
            if w.endswith(s) and base >= rv and base >= 1 and w[base - 1] not in _FR_V and base - 1 >= rv:
                w, removed_2, altered = w[:base], True, True
                break
        if not removed_2:
            # step 2b
            if w.endswith("ions") and len(w) - 4 >= r2:
                w, removed_2, altered = w[:-4], True, True
            else:
                m2 = next(
                    (s for s in sorted(_FR_STEP2B_RV + _FR_STEP2B_A, key=len, reverse=True)
                     if w.endswith(s)),
                    None,
                )
                if m2 is not None and len(w) - len(m2) >= rv:
                    w = w[: len(w) - len(m2)]
                    removed_2 = altered = True
                    if m2 in _FR_STEP2B_A and w.endswith("e") and len(w) - 1 >= rv:
                        w = w[:-1]

    if altered:
        # step 3
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4
        if w.endswith("s") and len(w) >= 2 and w[-2] not in "aiouès":
            w = w[:-1]
        if w.endswith("ion") and len(w) - 3 >= r2 and len(w) >= 4 and w[-4] in "st":
            w = w[:-3]
        else:
            m4 = next((s for s in ("ière", "Ière", "ier", "Ier") if w.endswith(s)), None)
            if m4 is not None and len(w) - len(m4) >= rv:
                w = w[: len(w) - len(m4)] + "i"
            elif w.endswith("e") and len(w) - 1 >= rv:
                w = w[:-1]
            elif w.endswith("guë") and len(w) - 1 >= rv:
                w = w[:-1]

    # step 5: undouble
    for suf in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(suf):
            w = w[:-1]
            break
    # step 6: un-accent é/è followed by non-vowels at the end
    i = len(w) - 1
    seen_cons = False
    while i >= 0:
        if w[i] in _FR_V:
            if seen_cons and w[i] in "éè":
                w = w[:i] + "e" + w[i + 1 :]
            break
        seen_cons = True
        i -= 1
    return w.replace("I", "i").replace("U", "u").replace("Y", "y")


SNOWBALL_STEMMERS["french"] = french_stem


# ---------------------------------------------------------------------------
# Romanian (Snowball Romanian; reference ships the generated program at
# /root/reference/src/contrib/Snowball/SF/Snowball/Ext/RomanianStemmer.cs and
# wires it through Analysis/Ro/RomanianAnalyzer.cs:31 — suffix tables a_1..a_5
# verified against that file; cedilla forms ş/ţ per the reference, with
# comma-below ș/ț folded to them on input)
# ---------------------------------------------------------------------------

_RO_V = frozenset("aăâeiîou")  # a ă â e i î o u
_RO_FOLD = str.maketrans({"ș": "ş", "ț": "ţ"})  # ș->ş ț->ţ

_RO_STEP0 = _sorted_entries(
    (("ul", "ului"), "del"),
    (("aua",), "a"),
    (("ea", "ele", "elor"), "e"),
    (("iua", "iei", "ii", "ilor", "iilor", "iile"), "i"),
    (("ile",), "i_ab"),  # -> i unless preceded by 'ab'
    (("atei",), "at"),
    (("aţia", "aţie"), "aţi"),
)
_RO_COMBO = _sorted_entries(
    (("abilitate", "abilitati", "abilităi", "abilităţi"), "abil"),
    (("ibilitate",), "ibil"),
    (("ivitate", "ivitati", "ivităi", "ivităţi"), "iv"),
    (
        ("icitate", "icitati", "icităi", "icităţi", "icatori",
         "icator", "icala", "icale", "icali", "icală", "ical", "iciva",
         "icive", "icivi", "icivă", "iciv"),
        "ic",
    ),
    (
        ("ativa", "ative", "ativi", "ativă", "ativ", "aţiune",
         "atoare", "ătoare", "atori", "ători", "ator", "ător"),
        "at",
    ),
    (
        ("itiva", "itive", "itivi", "itivă", "itiv", "iţiune",
         "itoare", "itori", "itor"),
        "it",
    ),
)
_RO_STD = _sorted_entries(
    (
        ("ica", "abila", "ibila", "oasa", "ata", "ita", "anta", "uta", "iva",
         "ic", "ice", "abile", "ibile", "oase", "ate", "itate", "ite", "ante",
         "ute", "ive", "ici", "abili", "ibili", "atori", "osi", "ati", "itati",
         "iti", "anti", "uti", "ivi", "ităi", "oşi", "ităţi",
         "abil", "ibil", "ator", "os", "at", "it", "ant", "ut", "iv",
         "ică", "abilă", "ibilă", "oasă", "ată",
         "ită", "antă", "ută", "ivă"),
        "del",
    ),
    (("iune", "iuni"), "tiune"),  # require preceding ţ, which becomes t
    (("ista", "isme", "iste", "isti", "işti", "istă", "ism", "ist"), "ist"),
)
# verb suffixes: tag 1 requires a preceding consonant-or-'u' (itself in RV)
_RO_VERB = _sorted_entries(
    (
        ("ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere", "ire",
         "âre", "ase", "ise", "use", "âse", "eşte",
         "ăşte", "eze", "ai", "eai", "iai", "eşti",
         "ăşti", "ui", "ezi", "âi", "aşi", "aseşi",
         "iseşi", "useşi", "âseşi", "işi", "uşi",
         "âşi", "eaţi", "iaţi", "arăţi",
         "aserăţi", "iserăţi", "userăţi",
         "âserăţi", "irăţi", "urăţi",
         "ârăţi", "am", "eam", "iam", "asem", "isem", "usem",
         "âsem", "arăm", "aserăm", "iserăm", "userăm",
         "âserăm", "irăm", "urăm", "ârăm", "au",
         "eau", "iau", "indu", "ându", "ez", "ească", "ară",
         "aseră", "iseră", "useră", "âseră",
         "iră", "ură", "âră", "ează"),
        1,
    ),
    (
        ("se", "sese", "sei", "seşi", "seseşi", "aţi",
         "eţi", "iţi", "âţi", "serăţi",
         "seserăţi", "em", "sesem", "im", "âm", "ăm",
         "serăm", "seserăm", "seră", "seseră"),
        2,
    ),
)
_RO_FINAL_VOWEL = ("ie", "a", "e", "i", "ă")


@lru_cache(maxsize=200_000)
def romanian_stem(word: str) -> str:
    w = word.translate(_RO_FOLD)
    # prelude: i/u between vowels -> I/U
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "iu" and chars[i - 1] in _RO_V and chars[i + 1] in _RO_V:
            chars[i] = "I" if chars[i] == "i" else "U"
    w = "".join(chars)
    rv = _rv_romance(w, _RO_V)
    r1 = _region_after_vc(w, _RO_V, 0)
    r2 = _region_after_vc(w, _RO_V, r1)

    # step 0 (R1)
    m = _among(w, 0, _RO_STEP0)
    if m is not None:
        s, tag = m
        base = len(w) - len(s)
        if base >= r1:
            if tag == "del":
                w = w[:base]
            elif tag == "i_ab":
                if not w[:base].endswith("ab"):
                    w = w[:base] + "i"
            else:
                w = w[:base] + tag

    # step 1 (combo suffixes, R1, repeat) + step 2 (standard, R2)
    removed = False
    while True:
        m = _among(w, 0, _RO_COMBO)
        if m is None:
            break
        s, rep = m
        base = len(w) - len(s)
        if base < r1:
            break
        w = w[:base] + rep
        removed = True
    m = _among(w, 0, _RO_STD)
    if m is not None:
        s, tag = m
        base = len(w) - len(s)
        if base >= r2:
            if tag == "del":
                w, removed = w[:base], True
            elif tag == "tiune":
                if w[:base].endswith("ţ"):
                    w, removed = w[: base - 1] + "t", True
            else:
                w, removed = w[:base] + "ist", True

    # step 3 (verb suffixes, entirely within RV) only if steps 1-2 removed nothing
    if not removed:
        m = _among(w, rv, _RO_VERB)
        if m is not None:
            s, tag = m
            base = len(w) - len(s)
            if tag == 2:
                w = w[:base]
            elif base - 1 >= rv and (w[base - 1] not in _RO_V or w[base - 1] == "u"):
                w = w[:base]

    # step 4: final vowel (RV)
    for s in _RO_FINAL_VOWEL:
        if w.endswith(s) and len(w) - len(s) >= rv:
            w = w[: len(w) - len(s)]
            break
    return w.replace("I", "i").replace("U", "u")


SNOWBALL_STEMMERS["romanian"] = romanian_stem


# ---------------------------------------------------------------------------
# Finnish ("The Finnish stemming algorithm", snowballstem.org; structure and
# rule data pinned from the reference's generated
# contrib/Snowball/SF/Snowball/Ext/FinnishStemmer.cs — clean-room rewrite)
# ---------------------------------------------------------------------------

_FI_V = frozenset("aeiouyäö")           # g_v
_FI_V_RESTR = frozenset("aeiouäö")      # g_V (no y) — the LV/VI vowel class
_FI_AEI = frozenset("aeiä")             # g_AEI
_FI_PARTICLE_END = frozenset("aeinotuyäö")  # g_particle_end (vowels + n, t)
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_PARTICLES = ("kään", "kaan", "sti", "han", "hän", "kin", "pa", "pä", "ko", "kö")
_FI_POSS = ("nsa", "nsä", "mme", "nne", "si", "ni", "an", "än", "en")
# a_6 longest-first; value = condition key
_FI_CASE = (
    ("seen", "LONG"), ("siin", "VI"), ("tten", "VI"),
    ("han", "a"), ("hen", "e"), ("hin", "i"), ("hon", "o"), ("hän", "ä"), ("hön", "ö"),
    ("den", "VI"),
    ("lla", None), ("ssa", None), ("lta", None), ("sta", None), ("tta", "e"),
    ("llä", None), ("ssä", None), ("ltä", None), ("stä", None), ("ttä", "e"),
    ("lle", None), ("ine", None), ("ksi", None),
    ("na", None), ("ta", None), ("nä", None), ("tä", None),
    ("n", "N"), ("a", "CV"), ("ä", "CV"),
)
_FI_OTHER = ("imma", "impa", "immi", "impi", "immä", "impä", "eja", "ejä",
             "mma", "mpa", "mmi", "mpi", "mmä", "mpä")


def _fi_ends_long(w: str) -> bool:
    return any(w.endswith(lv) for lv in _FI_LONG)


def _fi_among(w: str, sufs, limit: int) -> str | None:
    """Longest suffix of ``w`` whose match fits entirely at or after
    ``limit`` — snowball find_among_b under setlimit: a longer suffix that
    would cross the limit cannot match, and a shorter one is tried."""
    best = None
    for s in sufs:
        if w.endswith(s) and len(w) - len(s) >= limit:
            if best is None or len(s) > len(best):
                best = s
    return best


def finnish_snowball_stem(word: str) -> str:
    w = word
    p1 = _region_after_vc(w, _FI_V, 0)
    p2 = _region_after_vc(w, _FI_V, p1)
    ending_removed = False

    # step 1: particle etc (a_0 under setlimit p1; conditions unrestricted)
    suf = _fi_among(w, _FI_PARTICLES, p1)
    if suf == "sti":
        if len(w) - 3 >= p2:
            w = w[:-3]
    elif suf is not None:
        if len(w) > len(suf) and w[-len(suf) - 1] in _FI_PARTICLE_END:
            w = w[: -len(suf)]

    # step 2: possessive (a_4 under setlimit p1)
    suf = _fi_among(w, _FI_POSS, p1)
    if suf is not None:
        stem_ = w[: -len(suf)]
        if suf == "si":
            if not stem_.endswith("k"):
                w = stem_
        elif suf == "ni":
            w = stem_
            if w.endswith("kse"):
                w = w[:-1] + "i"
        elif suf in ("nsa", "nsä", "mme", "nne"):
            w = stem_
        elif suf == "an":
            if stem_.endswith(("lla", "na", "ssa", "ta", "lta", "sta")):
                w = stem_
        elif suf == "än":
            if stem_.endswith(("llä", "nä", "ssä", "tä", "ltä", "stä")):
                w = stem_
        elif suf == "en":
            if stem_.endswith(("lle", "ine")):
                w = stem_

    # step 3: case endings (a_6 under setlimit p1)
    suf = _fi_among(w, [c for c, _ in _FI_CASE], p1)
    if suf is not None:
        cond = dict(_FI_CASE)[suf]
        stem_ = w[: -len(suf)]
        if cond is None:
            w = stem_
            ending_removed = True
        elif cond in ("a", "e", "i", "o", "ä", "ö"):
            if stem_.endswith(cond):
                w = stem_
                ending_removed = True
        elif cond == "LONG":
            if _fi_ends_long(stem_):
                w = stem_
                ending_removed = True
        elif cond == "VI":
            if stem_.endswith("i") and len(stem_) >= 2 and stem_[-2] in _FI_V_RESTR:
                w = stem_
                ending_removed = True
        elif cond == "N":  # 'n': delete; LONG or 'ie' before eats one more
            w = stem_
            ending_removed = True
            if _fi_ends_long(w) or w.endswith("ie"):
                w = w[:-1]
        elif cond == "CV":  # 'a'/'ä' preceded by consonant + vowel
            if len(stem_) >= 2 and stem_[-1] in _FI_V and stem_[-2] not in _FI_V:
                w = stem_
                ending_removed = True

    # step 4: other endings (a_7 under setlimit p2)
    suf = _fi_among(w, _FI_OTHER, p2)
    if suf is not None:
        if suf in ("mma", "mpa", "mmi", "mpi", "mmä", "mpä"):
            if not w[: -len(suf)].endswith("po"):
                w = w[: -len(suf)]
        else:
            w = w[: -len(suf)]

    # step 5: plurals
    if ending_removed:
        if w and w[-1] in "ij" and len(w) - 1 >= p1:
            w = w[:-1]
    else:
        if w.endswith("t") and len(w) - 1 >= p1 and len(w) >= 2 and w[-2] in _FI_V:
            w = w[:-1]
            suf = _fi_among(w, ("imma", "mma"), p2)
            if suf == "imma" or (suf == "mma" and not w[:-3].endswith("po")):
                w = w[: -len(suf)]

    # step 6: tidy — four rules under setlimit p1 (the WHOLE window of each
    # match, condition chars included, must sit in R1), then the final
    # consonant undoubling with the limit restored
    if len(w) - 2 >= p1 and _fi_ends_long(w):
        w = w[:-1]  # undouble long vowel: remove ONE char
    if len(w) - 2 >= p1 and w[-1] in _FI_AEI and w[-2] not in _FI_V:
        w = w[:-1]
    if len(w) - 2 >= p1 and (w.endswith("oj") or w.endswith("uj")):
        w = w[:-1]
    if len(w) - 2 >= p1 and w.endswith("jo"):
        w = w[:-1]
    # undouble final consonant before trailing vowels (NOT limited to R1)
    i = len(w) - 1
    while i >= 0 and w[i] in _FI_V:
        i -= 1
    if i >= 1 and w[i] not in _FI_V and w[i - 1] == w[i]:
        w = w[:i] + w[i + 1 :]
    return w


SNOWBALL_STEMMERS["finnish_snowball"] = finnish_snowball_stem


# ---------------------------------------------------------------------------
# Hungarian ("The Hungarian stemming algorithm", snowballstem.org; rule data
# pinned from the reference's generated
# contrib/Snowball/SF/Snowball/Ext/HungarianStemmer.cs — clean-room rewrite.
# The legacy file encodes ő/ű as õ/û (ISO-8859-2 artefact); modern
# codepoints are used here.)
# ---------------------------------------------------------------------------

_HU_V = frozenset("aeiouáéíóöőúüű")
_HU_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES = (
    "ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
    "pp", "rr", "ss", "tt", "vv", "zz",
)
# each table: (suffix, replacement-or-None-for-delete), longest-match wins
_HU_CASE = (
    "anként", "enként", "onként", "képpen", "ként", "képp", "ban", "ben", "nak", "nek", "val",
    "vel", "nál", "nél", "ból", "ról", "tól", "ből", "ről", "től", "kor",
    "ba", "be", "ra", "re", "ig", "ul", "ül", "an", "en", "on", "ön", "at",
    "et", "ot", "öt", "ért", "hez", "hoz", "höz", "vá", "vé", "n", "t",
)
_HU_CASE_SPECIAL = {"én": "e", "án": "a", "ánként": "a"}
_HU_CASE_OTHER = {"astul": None, "estül": None, "stul": None, "stül": None,
                  "ástul": "a", "éstül": "e"}
_HU_PLURAL = {"ák": "a", "ék": "e", "ök": None, "ak": None, "ok": None,
              "ek": None, "k": None}
_HU_OWNED = {"áéi": "a", "ééi": "e", "éi": None, "áké": "a", "éké": "e",
             "aké": None, "eké": None, "oké": None, "öké": None, "ké": None,
             "éé": "e", "é": None}
_HU_SING_OWNER = {
    "ájuk": "a", "éjük": "e", "unk": None, "ünk": None, "ánk": "a",
    "énk": "e", "juk": None, "jük": None, "ád": "a", "éd": "e",
    "ad": None, "ed": None, "od": None, "öd": None, "ja": None, "je": None,
    "ám": "a", "ém": "e", "am": None, "em": None, "om": None, "nk": None,
    "uk": None, "ük": None, "d": None, "m": None, "a": None, "e": None,
    "o": None, "á": "a", "é": "e",
}
_HU_PLUR_OWNER = {
    "jaitok": None, "jeitek": None, "áitok": "a", "éitek": "e",
    "jaink": None, "jeink": None, "aitok": None, "eitek": None,
    "áink": "a", "éink": "e", "jaid": None, "jeid": None, "jaik": None,
    "jeik": None, "jaim": None, "jeim": None, "aink": None, "eink": None,
    "itek": None, "áid": "a", "éid": "e", "áik": "a", "éik": "e",
    "áim": "a", "éim": "e", "aid": None, "eid": None, "aik": None,
    "eik": None, "aim": None, "eim": None, "ink": None, "jai": None,
    "jei": None, "ái": "a", "éi": "e", "ai": None, "ei": None, "id": None,
    "ik": None, "im": None, "i": None,
}


def _hu_p1(w: str) -> int:
    """Hungarian R1: word starts with a vowel -> after the first consonant
    or consonant digraph; starts with a consonant -> after the first vowel."""
    if not w:
        return 0
    if w[0] in _HU_V:
        for i in range(1, len(w)):
            if w[i] not in _HU_V:
                for d in _HU_DIGRAPHS:
                    if w.startswith(d, i):
                        return i + len(d)
                return i + 1
        return len(w)
    for i in range(1, len(w)):
        if w[i] in _HU_V:
            return i + 1
    return len(w)


def _hu_among(w: str, table, p1: int):
    """Longest-suffix match; R1 is a POST-condition (match start >= p1) —
    on failure the whole step fails, no fallback (no setlimit in the
    Hungarian script, unlike Finnish)."""
    sufs = table if not isinstance(table, dict) else table.keys()
    best = None
    for s in sufs:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    if best is None or len(w) - len(best) < p1:
        return None
    return best


def _hu_ends_double(w: str) -> bool:
    return any(w.endswith(d) for d in _HU_DOUBLES)


def _hu_undouble(w: str) -> str:
    """Remove the second-to-last character (the generated r_undouble:
    next, hop 1, delete) — 'bott' -> 'bot', 'meccs' -> 'mecs'."""
    return w[:-2] + w[-1] if len(w) >= 2 else w


def _hu_v_ending(w: str, p1: int) -> str:
    if w.endswith("á") and len(w) - 1 >= p1:
        return w[:-1] + "a"
    if w.endswith("é") and len(w) - 1 >= p1:
        return w[:-1] + "e"
    return w


def hungarian_snowball_stem(word: str) -> str:
    w = word
    p1 = _hu_p1(w)

    # instrum: al/el in R1 preceded by a double consonant, delete + undouble
    suf = _hu_among(w, ("al", "el"), p1)
    if suf is not None and _hu_ends_double(w[:-2]):
        w = _hu_undouble(w[:-2])

    # case endings, then v_ending
    suf = _hu_among(w, _HU_CASE, p1)
    if suf is not None:
        w = _hu_v_ending(w[: -len(suf)], p1)

    # case_special: én/án/ánként -> e/a/a
    suf = _hu_among(w, _HU_CASE_SPECIAL, p1)
    if suf is not None:
        w = w[: -len(suf)] + _HU_CASE_SPECIAL[suf]

    # case_other: stul/stül family
    suf = _hu_among(w, _HU_CASE_OTHER, p1)
    if suf is not None:
        rep = _HU_CASE_OTHER[suf]
        w = w[: -len(suf)] + (rep or "")

    # factive: á/é in R1 preceded by a double consonant, delete + undouble
    suf = _hu_among(w, ("á", "é"), p1)
    if suf is not None and _hu_ends_double(w[:-1]):
        w = _hu_undouble(w[:-1])

    # owned / sing_owner / plur_owner / plural
    for table in (_HU_OWNED, _HU_SING_OWNER, _HU_PLUR_OWNER, _HU_PLURAL):
        suf = _hu_among(w, table, p1)
        if suf is not None:
            rep = table[suf]
            w = w[: -len(suf)] + (rep or "")
    return w


SNOWBALL_STEMMERS["hungarian_snowball"] = hungarian_snowball_stem
