"""Kraaij-Pohlmann stemmer for Dutch (clean-room).

The reference ships this as generated Snowball output
(`contrib/Snowball/SF/Snowball/Ext/KpStemmer.cs`, selected via
``SnowballAnalyzer("Kp")``). This implementation re-derives the published
Kraaij & Pohlmann (1994) algorithm as plain string functions in the style of
functions/snowball.py, with every condition evaluated with full-string
visibility instead of a cursor machine. Semantics verified rule-by-rule
against the generated reference code, with ONE documented deviation: the
shipped ``r_VX`` (KpStemmer.cs:140-178) collapses both exits of its
or-construct onto the same label (``goto lab2_brk`` for success AND
failure of the vowel test), so the shipped VX degenerates to a literal
"ij" check. The identical or-construct is converted correctly elsewhere
in the same file (e.g. :245-283), so this is a site-specific
transliteration bug, not intended semantics; we implement the published
VX predicate (vowel OR "ij" one position back). Consequence: diminutives
like omaatje stem to omaa here vs omaat under the shipped binary. The
classic vocabulary vectors
(dagen→daag, filosofie→filosoof, gegeven→geef, lichamelijke→lichamelijk)
are hand-traced in tests/test_kp.py.

Structure (kraaij_pohlmann, backwardmode except the ge- handling):
  - measure: p1/p2 marks where a "syllable" counts `ij` as ONE vowel unit
  - Step_1/2/3/4: suffix strippers with R1/R2 + V/VX/C digraph-aware
    guards and vowel lengthening after open-syllable deletions
  - Lose_prefix / Lose_infix: forward-mode removal of the `ge-` participle
    marker (re-measuring afterwards), each followed by Step_1c (d/t)
  - Step_7 (kt/ft/pt) and Step_6 (undouble + v→f/z→s), the latter gated on
    "something stemmed OR an infix ge was removed"
  - y-protection: `y` word-initially or after a vowel is marked `Y`
    (consonant for every test) and restored at the end
"""

from __future__ import annotations

_V = frozenset("aeiouy")
_V_WX = frozenset("aeiouywx")
_AOU = frozenset("aou")
_AIOU = frozenset("aiou")


def _measure(w: str) -> tuple[int, int]:
    """p1/p2: positions after the consonant that closes the 1st/2nd
    vowel-unit run, where 'ij' counts as a single vowel unit."""
    n = len(w)
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in _V:
        i += 1
    cnt = 0
    while i < n:
        if w[i : i + 2] == "ij":
            i += 2
        elif w[i] in _V:
            i += 1
        else:
            break
        cnt += 1
    if cnt == 0 or i >= n or w[i] in _V:
        return p1, p2
    i += 1
    p1 = i
    while i < n and w[i] not in _V:
        i += 1
    cnt = 0
    while i < n:
        if w[i : i + 2] == "ij":
            i += 2
        elif w[i] in _V:
            i += 1
        else:
            break
        cnt += 1
    if cnt == 0 or i >= n or w[i] in _V:
        return p1, p2
    p2 = i + 1
    return p1, p2


def _test_v(w: str, c: int) -> bool:
    """V: char before position c is a vowel, or the 'ij' digraph ends at c."""
    return (c >= 1 and w[c - 1] in _V) or (c >= 2 and w[c - 2 : c] == "ij")


def _test_vx(w: str, c: int) -> bool:
    """VX: V holds one position earlier (skip one char backward first).

    Published-KP semantics. The shipped reference's r_VX is mangled (see
    module docstring): its vowel branch is dead code and only the "ij"
    literal survives. We keep the published predicate.
    """
    return c >= 1 and _test_v(w, c - 1)


def _test_c(w: str, c: int) -> bool:
    """C: not the 'ij' digraph, and the char before c is a non-vowel."""
    if c >= 2 and w[c - 2 : c] == "ij":
        return False
    return c >= 1 and w[c - 1] not in _V


def _lengthen_v(w: str) -> str:
    """After an open-syllable deletion: double a/o/u (or e under stricter
    conditions) before a final non-wx consonant: dag→daag, gegev→gegeev."""
    n = len(w)
    if n < 2 or w[-1] in _V_WX:
        return w
    c = n - 1  # cursor after consuming the final consonant
    ch = w[c - 1]
    if ch in _AOU:
        # test (non-v or atlimit) before the vowel
        if c - 1 == 0 or w[c - 2] not in _V:
            return w[: c - 1] + ch + w[c - 1 :]
        return w
    if ch == "e":
        i = c - 1  # index of the 'e'
        if i == 0:
            cur = 0
        elif w[i - 1] not in _V:
            cur = i - 1
        else:
            return w
        if cur >= 1 and w[cur - 1] in _AIOU:
            return w
        # not (next AIOU non-v)
        if cur >= 3 and w[cur - 2] in _AIOU and w[cur - 3] not in _V:
            return w
        return w[:i] + "e" + w[i:]
    return w


def _step1(w: str, p1: int) -> tuple[str, bool]:
    n = len(w)
    if w.endswith("nde"):
        return w[: n - 3] + "nd", True
    if w.endswith("ies"):
        c = n - 3
        if c >= p1:
            return w[:c] + "ie", True
        return w, False
    if w.endswith("aus"):
        c = n - 3
        if c >= p1 and _test_v(w, c):
            return w[:c] + "au", True
        return w, False
    if w.endswith("'s"):
        return w[: n - 2], True
    if w.endswith("es"):
        c = n - 2
        if w[c - 2 : c] == "ar" and c - 2 >= p1 and _test_c(w, c - 2):
            return _lengthen_v(w[: c - 2]), True
        if w[c - 2 : c] == "er" and c - 2 >= p1 and _test_c(w, c - 2):
            return w[: c - 2], True
        if c >= p1 and _test_c(w, c):
            return w[:c] + "e", True
        return w, False
    if w.endswith("en"):
        c = n - 2
        if w[c - 3 : c] == "hed" and c - 3 >= p1:
            return w[: c - 3] + "heid", True
        if w[c - 2 : c] == "nd":
            return w[:c], True
        if w[c - 1 : c] == "d" and c - 1 >= p1 and _test_c(w, c - 1):
            return w[: c - 1], True
        if c >= 1 and w[c - 1] in "ij" and _test_v(w, c - 1):
            return w[:c], True
        if c >= p1 and _test_c(w, c):
            return _lengthen_v(w[:c]), True
        return w, False
    if w.endswith("s"):
        c = n - 1
        if (
            c >= p1
            and not (w[c - 1 : c] == "t" and c - 1 >= p1)
            and _test_c(w, c)
        ):
            return w[:c], True
        return w, False
    return w, False


def _step2(w: str, p1: int) -> tuple[str, bool]:
    n = len(w)
    if w.endswith("ische"):
        c = n - 5
        if c >= p1:
            return w[:c] + "isch", True
        return w, False
    if w.endswith("lijke"):
        c = n - 5
        if c >= p1:
            return w[:c] + "lijk", True
        return w, False
    if w.endswith("ieve"):
        c = n - 4
        if c >= p1 and _test_c(w, c):
            return w[:c] + "ief", True
        return w, False
    if w.endswith("ene"):
        c = n - 3
        if c >= p1 and _test_c(w, c):
            return _lengthen_v(w[:c] + "en"), True
        return w, False
    if w.endswith("je"):
        c = n - 2
        if w[c - 2 : c] == "'t":
            return w[: c - 2], True
        if w[c - 2 : c] == "et" and c - 2 >= p1 and _test_c(w, c - 2):
            return w[: c - 2], True
        if w[c - 3 : c] == "rnt":
            return w[: c - 3] + "rn", True
        if w[c - 1 : c] == "t" and c - 1 >= p1 and _test_vx(w, c - 1):
            return w[: c - 1], True
        if w[c - 3 : c] == "ink":
            return w[: c - 3] + "ing", True
        if w[c - 2 : c] == "mp":
            return w[: c - 2] + "m", True
        if w[c - 1 : c] == "'" and c - 1 >= p1:
            return w[: c - 1], True
        if c >= p1 and _test_c(w, c):
            return w[:c], True
        return w, False
    for suf, rep, need_c, attach in (
        ("ge", "g", False, False),
        ("de", "", True, False),
        ("te", "t", False, False),
        ("se", "s", False, False),
        ("re", "r", False, False),
        ("le", "l", False, True),
    ):
        if w.endswith(suf):
            c = n - 2
            if c >= p1 and (not need_c or _test_c(w, c)):
                out = w[:c] + rep
                return (_lengthen_v(out) if attach else out), True
            return w, False
    return w, False


def _step3(w: str, p1: int, p2: int) -> tuple[str, bool]:
    n = len(w)
    if w.endswith("iteit"):
        c = n - 5
        if c >= p1:
            return _lengthen_v(w[:c]), True
        return w, False
    for suf, kind in (
        ("heid", "del"),
        ("atie", "eer"),
        ("isme", "len"),
        ("arij", "aar"),
        ("erij", "len"),
        ("rder", "r"),
        ("ster", "del"),
    ):
        if w.endswith(suf):
            c = n - 4
            if kind == "r":
                return w[:c] + "r", True  # unconditional
            if kind == "eer":
                if c >= p1:
                    return w[:c] + "eer", True
                return w, False
            if kind == "aar":
                if c >= p1 and _test_c(w, c):
                    return w[:c] + "aar", True
                return w, False
            if kind == "len":
                if c >= p1:
                    return _lengthen_v(w[:c]), True
                return w, False
            if c >= p1:  # "del"
                return w[:c], True
            return w, False
    for suf, kind in (
        ("fie", "f"),
        ("gie", "g"),
        ("ing", "len"),
        ("sel", "del"),
        ("dst", "d"),
        ("tst", "t"),
    ):
        if w.endswith(suf):
            c = n - 3
            if kind in ("f", "g"):
                if c >= p2:
                    return _lengthen_v(w[:c] + kind), True
                return w, False
            if kind == "len":
                if c >= p1:
                    return _lengthen_v(w[:c]), True
                return w, False
            if kind == "del":
                if c >= p1:
                    return w[:c], True
                return w, False
            # dst/tst -> d/t with R1 C
            if c >= p1 and _test_c(w, c):
                return w[:c] + kind, True
            return w, False
    return w, False


_STEP4_A3 = (
    # (suffix, replacement, condition): longest-match order
    ("achtiger", "", "r1"),
    ("achtigst", "", "r1"),
    ("ioneel", "ie", "r1"),
    ("achtig", "", "r1"),
    ("eriger", None, "r1c_len"),
    ("erigst", None, "r1c_len"),
    ("lijker", "lijk", "r1"),
    ("lijkst", "lijk", "r1"),
    ("atief", "eer", "r1"),
    ("baar", "", "r1"),
    ("naar", "n", "r1v"),
    ("laar", "l", "r1v"),
    ("raar", "r", "r1v"),
    ("tant", "teer", "r1"),
    ("erig", None, "r1c_len"),
    ("end", None, "r1c_len"),
)


def _step4(w: str, p1: int) -> tuple[str, bool]:
    n = len(w)
    for suf, rep, cond in _STEP4_A3:
        if not w.endswith(suf):
            continue
        c = n - len(suf)
        if cond == "r1":
            if c >= p1:
                return w[:c] + rep, True
        elif cond == "r1v":
            if c >= p1 and _test_v(w, c):
                return w[:c] + rep, True
        else:  # r1c_len
            if c >= p1 and _test_c(w, c):
                return _lengthen_v(w[:c]), True
        break  # matched longest suffix but condition failed -> try a_4
    for suf in ("iger", "igst", "ig"):
        if w.endswith(suf):
            c = n - len(suf)
            if c >= p1 and _test_c(w, c):
                return _lengthen_v(w[:c]), True
            return w, False
    return w, False


def _step7(w: str) -> tuple[str, bool]:
    for suf, rep in (("kt", "k"), ("ft", "f"), ("pt", "p")):
        if w.endswith(suf):
            return w[:-2] + rep, True
    return w, False


_DOUBLES = frozenset(
    ("bb", "cc", "dd", "ff", "gg", "hh", "jj", "kk", "ll", "mm", "nn",
     "pp", "qq", "rr", "ss", "tt", "vv", "ww", "xx", "zz")
)


def _step6(w: str) -> tuple[str, bool]:
    if len(w) >= 2 and w[-2:] in _DOUBLES:
        return w[:-1], True
    if w.endswith("v"):
        return w[:-1] + "f", True
    if w.endswith("z"):
        return w[:-1] + "s", True
    return w, False


def _step1c(w: str, p1: int) -> tuple[str, bool]:
    n = len(w)
    if w.endswith("d"):
        c = n - 1
        if c >= p1 and _test_c(w, c) and not (
            w[c - 1 : c] == "n" and c - 1 >= p1
        ):
            return w[:c], True
        return w, False
    if w.endswith("t"):
        c = n - 1
        if c >= p1 and _test_c(w, c) and not (
            w[c - 1 : c] == "h" and c - 1 >= p1
        ):
            return w[:c], True
        return w, False
    return w, False


def _has_v_then_cons(w: str, start: int) -> bool:
    """goto v, goto non-v from ``start``: a vowel exists at/after start with
    a later non-vowel after it ('Y' counts as non-vowel)."""
    n = len(w)
    i = start
    while i < n and w[i] not in _V:
        i += 1
    if i >= n:
        return False
    while i < n and w[i] in _V:
        # note: plain grouping scan (no 'ij' digraph here, as in the original)
        i += 1
    return i < n


def _lose_prefix(w: str) -> tuple[str, bool]:
    if w.startswith("ge") and len(w) >= 5 and _has_v_then_cons(w, 2):
        return w[2:], True
    return w, False


def _lose_infix(w: str) -> tuple[str, bool]:
    g = w.find("ge", 1)
    if g < 0:
        return w, False
    if len(w) >= g + 5 and _has_v_then_cons(w, g + 2):
        return w[:g] + w[g + 2 :], True
    return w, False


def kp_stem(word: str) -> str:
    w = word
    if not w:
        return w
    y_found = False
    if w[0] == "y":
        w = "Y" + w[1:]
        y_found = True
    chars = list(w)
    for k in range(1, len(chars)):
        if chars[k] == "y" and chars[k - 1] in _V:
            chars[k] = "Y"
            y_found = True
    w = "".join(chars)

    p1, p2 = _measure(w)
    stemmed = False
    w, ch = _step1(w, p1)
    stemmed |= ch
    w, ch = _step2(w, p1)
    stemmed |= ch
    w, ch = _step3(w, p1, p2)
    stemmed |= ch
    w, ch = _step4(w, p1)
    stemmed |= ch

    w2, ok = _lose_prefix(w)
    if ok:
        w = w2
        p1, p2 = _measure(w)
        w, _ = _step1c(w, p1)
    ge_removed = False
    w2, ok = _lose_infix(w)
    if ok:
        w = w2
        ge_removed = True
        p1, p2 = _measure(w)
        w, _ = _step1c(w, p1)

    w, ch = _step7(w)
    stemmed |= ch
    if stemmed or ge_removed:
        w, _ = _step6(w)

    if y_found:
        w = w.replace("Y", "y")
    return w
