"""Turkish Snowball stemmer (Çilden's algorithm).

Reference: the generated Snowball program the reference ships at
/root/reference/src/contrib/Snowball/SF/Snowball/Ext/TurkishStemmer.cs
(wired through Analysis/Tr/TurkishAnalyzer.cs). Control flow, suffix tables
(a_0..a_23), vowel-harmony groupings and the optional-consonant/vowel marker
semantics were decoded from that file routine-by-routine; this is a
re-implementation over plain Python strings, not a transliteration of the
goto-based generated code.

Snowball semantics reproduced exactly, including the quirks:
  - `or` alternatives restore the CURSOR only — string deletions made by a
    failed later part of an alternative persist (e.g. the lAr delete inside
    branch L398 survives into the L400 alternative).
  - the (ndAn|nU)+lArI branch (source line 384) matches without deleting.
  - when stem_nominal_verb_suffixes takes the bare-lAr branch it unsets
    continue_stemming_noun_suffixes, which skips noun suffixes AND the
    postlude (Stem() returns early; SnowballFilter keeps whatever is in the
    buffer, so the deletion itself sticks).
  - the reserved words ("ad", "soyad") suppress the postlude only.
"""

from __future__ import annotations

from functools import lru_cache

_VOW = frozenset("aeıiöoüu")
_U = frozenset("ıiuü")
# vowel-harmony classes keyed by the LAST vowel of the candidate
_HARMONY = {
    "a": frozenset("aıou"),
    "e": frozenset("eiöü"),
    "ı": frozenset("aı"),
    "i": frozenset("ei"),
    "o": frozenset("ou"),
    "u": frozenset("ou"),
    "ö": frozenset("öü"),
    "ü": frozenset("öü"),
}

def _longest(sufs):
    return tuple(sorted(sufs, key=len, reverse=True))

_A0 = _longest(("m", "n", "miz", "niz", "muz", "nuz", "müz", "nüz", "mız", "nız"))
_A1 = _longest(("leri", "ları"))
_A2 = _longest(("ni", "nu", "nü", "nı"))
_A3 = _longest(("in", "un", "ün", "ın"))
_A4 = _longest(("a", "e"))
_A5 = _longest(("na", "ne"))
_A6 = _longest(("da", "ta", "de", "te"))
_A7 = _longest(("nda", "nde"))
_A8 = _longest(("dan", "tan", "den", "ten"))
_A9 = _longest(("ndan", "nden"))
_A10 = _longest(("la", "le"))
_A11 = _longest(("ca", "ce"))
_A12 = _longest(("im", "um", "üm", "ım"))
_A13 = _longest(("sin", "sun", "sün", "sın"))
_A14 = _longest(("iz", "uz", "üz", "ız"))
_A15 = _longest(("siniz", "sunuz", "sünüz", "sınız"))
_A16 = _longest(("lar", "ler"))
_A17 = _longest(("niz", "nuz", "nüz", "nız"))
_A18 = _longest(("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır"))
_A19 = _longest(("casına", "cesine"))
_A20 = _longest((
    "di", "ti", "dik", "tik", "duk", "tuk", "dük", "tük", "dık", "tık",
    "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım",
    "din", "tin", "dun", "tun", "dün", "tün", "dın", "tın",
    "du", "tu", "dü", "tü", "dı", "tı",
))
_A21 = _longest(("sa", "se", "sak", "sek", "sam", "sem", "san", "sen"))
_A22 = _longest(("miş", "muş", "müş", "mış"))


class _Ctx:
    __slots__ = ("w", "c", "ket", "continue_noun")

    def __init__(self, w: str):
        self.w = w
        self.c = len(w)
        self.ket = len(w)
        self.continue_noun = True

    # save/restore cursor as distance-from-end (survives deletions at the end)
    def save(self) -> int:
        return len(self.w) - self.c

    def restore(self, d: int) -> None:
        self.c = len(self.w) - d

    def mark(self) -> None:  # snowball '['
        self.ket = self.c

    def delete(self) -> None:  # snowball '] delete' with bra = cursor
        self.w = self.w[: self.c] + self.w[self.ket :]
        self.ket = self.c


def _among(ctx: _Ctx, table) -> bool:
    head = ctx.w[: ctx.c]
    for s in table:
        if head.endswith(s):
            ctx.c -= len(s)
            return True
    return False


def _eq(ctx: _Ctx, s: str) -> bool:
    if ctx.w[: ctx.c].endswith(s):
        ctx.c -= len(s)
        return True
    return False


def _harmony(ctx: _Ctx) -> bool:
    """check_vowel_harmony (test-only): last vowel of w[:c] must be preceded
    somewhere by a vowel of its harmony class."""
    w, i = ctx.w, ctx.c - 1
    while i >= 0 and w[i] not in _VOW:
        i -= 1
    if i < 0:
        return False
    group = _HARMONY[w[i]]
    j = i - 1
    while j >= 0 and w[j] not in group:
        j -= 1
    return j >= 0


def _opt_cons(ctx: _Ctx, ch: str) -> bool:
    """mark_suffix_with_optional_{n,s,y}_consonant: consume ch when a vowel
    precedes it; fail when ch present without a preceding vowel; without ch,
    require the char two back to be a vowel (cursor untouched)."""
    w, c = ctx.w, ctx.c
    if c >= 1 and w[c - 1] == ch:
        if c >= 2 and w[c - 2] in _VOW:
            ctx.c = c - 1
            return True
        return False
    if c >= 2 and w[c - 2] in _VOW:
        return True
    return False


def _opt_u(ctx: _Ctx) -> bool:
    """mark_suffix_with_optional_U_vowel: mirror of _opt_cons with the U
    vowels and a consonant (non-vowel) requirement two back."""
    w, c = ctx.w, ctx.c
    if c >= 1 and w[c - 1] in _U:
        if c >= 2 and w[c - 2] not in _VOW:
            ctx.c = c - 1
            return True
        return False
    if c >= 2 and w[c - 2] not in _VOW:
        return True
    return False


# --- suffix markers (each may move the cursor on success) -------------------

def _m_possessives(ctx):
    return _among(ctx, _A0) and _opt_u(ctx)

def _m_sU(ctx):
    if not _harmony(ctx):
        return False
    if ctx.c >= 1 and ctx.w[ctx.c - 1] in _U:
        ctx.c -= 1
        return _opt_cons(ctx, "s")
    return False

def _m_lArI(ctx):
    return _among(ctx, _A1)

def _m_yU(ctx):
    if not _harmony(ctx):
        return False
    if ctx.c >= 1 and ctx.w[ctx.c - 1] in _U:
        ctx.c -= 1
        return _opt_cons(ctx, "y")
    return False

def _m_nU(ctx):
    return _harmony(ctx) and _among(ctx, _A2)

def _m_nUn(ctx):
    return _harmony(ctx) and _among(ctx, _A3) and _opt_cons(ctx, "n")

def _m_yA(ctx):
    return _harmony(ctx) and _among(ctx, _A4) and _opt_cons(ctx, "y")

def _m_nA(ctx):
    return _harmony(ctx) and _among(ctx, _A5)

def _m_DA(ctx):
    return _harmony(ctx) and _among(ctx, _A6)

def _m_ndA(ctx):
    return _harmony(ctx) and _among(ctx, _A7)

def _m_DAn(ctx):
    return _harmony(ctx) and _among(ctx, _A8)

def _m_ndAn(ctx):
    return _harmony(ctx) and _among(ctx, _A9)

def _m_ylA(ctx):
    return _harmony(ctx) and _among(ctx, _A10) and _opt_cons(ctx, "y")

def _m_ki(ctx):
    return _eq(ctx, "ki")

def _m_ncA(ctx):
    return _harmony(ctx) and _among(ctx, _A11) and _opt_cons(ctx, "n")

def _m_yUm(ctx):
    return _harmony(ctx) and _among(ctx, _A12) and _opt_cons(ctx, "y")

def _m_sUn(ctx):
    return _harmony(ctx) and _among(ctx, _A13)

def _m_yUz(ctx):
    return _harmony(ctx) and _among(ctx, _A14) and _opt_cons(ctx, "y")

def _m_sUnUz(ctx):
    return _among(ctx, _A15)

def _m_lAr(ctx):
    return _harmony(ctx) and _among(ctx, _A16)

def _m_nUz(ctx):
    return _harmony(ctx) and _among(ctx, _A17)

def _m_DUr(ctx):
    return _harmony(ctx) and _among(ctx, _A18)

def _m_cAsInA(ctx):
    return _among(ctx, _A19)

def _m_yDU(ctx):
    return _harmony(ctx) and _among(ctx, _A20) and _opt_cons(ctx, "y")

def _m_ysA(ctx):
    return _among(ctx, _A21) and _opt_cons(ctx, "y")

def _m_ymUs(ctx):
    return _harmony(ctx) and _among(ctx, _A22) and _opt_cons(ctx, "y")

def _m_yken(ctx):
    return _eq(ctx, "ken") and _opt_cons(ctx, "y")


def _first(ctx, *marks) -> bool:
    """snowball `or` over markers: each alternative starts from the same
    cursor; the first success stands."""
    d = ctx.save()
    for m in marks:
        ctx.restore(d)
        if m(ctx):
            return True
    ctx.restore(d)
    return False


def _stem_nominal_verb_suffixes(ctx: _Ctx) -> bool:
    ctx.mark()
    ctx.continue_noun = True
    d1 = ctx.save()
    # 1: ymUs_ | yDU | ysA | yken
    if _first(ctx, _m_ymUs, _m_yDU, _m_ysA, _m_yken):
        ctx.delete()
        return True
    ctx.restore(d1)
    # 2: cAsInA (sUnUz|lAr|yUm|sUn|yUz|true) ymUs_
    if _m_cAsInA(ctx):
        _first(ctx, _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz)  # optional
        if _m_ymUs(ctx):
            ctx.delete()
            return True
    ctx.restore(d1)
    # 3: lAr ] delete try([ (DUr|yDU|ysA|ymUs_)); unset continue flag
    if _m_lAr(ctx):
        ctx.delete()
        d4 = ctx.save()
        ctx.mark()
        if not _first(ctx, _m_DUr, _m_yDU, _m_ysA, _m_ymUs):
            ctx.restore(d4)
        ctx.continue_noun = False
        ctx.delete()
        return True
    ctx.restore(d1)
    # 4: nUz (yDU|ysA)
    if _m_nUz(ctx) and _first(ctx, _m_yDU, _m_ysA):
        ctx.delete()
        return True
    ctx.restore(d1)
    # 5: (sUnUz|yUz|sUn|yUm) ] delete try([ ymUs_)
    if _first(ctx, _m_sUnUz, _m_yUz, _m_sUn, _m_yUm):
        ctx.delete()
        d8 = ctx.save()
        ctx.mark()
        if not _m_ymUs(ctx):
            ctx.restore(d8)
        ctx.delete()
        return True
    ctx.restore(d1)
    # 6: DUr ] delete try([ (sUnUz|lAr|yUm|sUn|yUz|true) ymUs_)
    if not _m_DUr(ctx):
        return False
    ctx.delete()
    d9 = ctx.save()
    ctx.mark()
    _first(ctx, _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz)  # optional
    if not _m_ymUs(ctx):
        ctx.restore(d9)
    ctx.delete()
    return True


def _try_lar_chain(ctx: _Ctx) -> None:
    """try([ mark_lAr ] delete stem_suffix_chain_before_ki) — the common
    trailing combination; cursor-restores on failure, deletions persist."""
    d = ctx.save()
    ctx.mark()
    if _m_lAr(ctx):
        ctx.delete()
        if not _chain_ki(ctx):
            ctx.restore(d)
    else:
        ctx.restore(d)


def _chain_ki(ctx: _Ctx) -> bool:
    ctx.mark()
    if not _m_ki(ctx):
        return False
    d1 = ctx.save()
    # alt 1: DA
    if _m_DA(ctx):
        ctx.delete()
        d2 = ctx.save()
        ctx.mark()
        d3 = ctx.save()
        if _m_lAr(ctx):
            ctx.delete()
            d4 = ctx.save()
            if not _chain_ki(ctx):
                ctx.restore(d4)
        else:
            ctx.restore(d3)
            if _m_possessives(ctx):
                ctx.delete()
                d5 = ctx.save()
                ctx.mark()
                if _m_lAr(ctx):
                    ctx.delete()
                    if not _chain_ki(ctx):
                        ctx.restore(d5)
                else:
                    ctx.restore(d5)
            else:
                ctx.restore(d2)  # whole try fails
        return True
    ctx.restore(d1)
    # alt 2: nUn
    if _m_nUn(ctx):
        ctx.delete()
        d6 = ctx.save()
        ctx.mark()
        d7 = ctx.save()
        if _m_lArI(ctx):
            ctx.delete()
        else:
            ctx.restore(d7)
            ctx.mark()
            if _first(ctx, _m_possessives, _m_sU):
                ctx.delete()
                _try_lar_chain(ctx)
            else:
                ctx.restore(d7)
                if not _chain_ki(ctx):
                    ctx.restore(d6)  # whole try fails
        return True
    ctx.restore(d1)
    # alt 3: ndA
    if not _m_ndA(ctx):
        return False
    d10 = ctx.save()
    if _m_lArI(ctx):
        ctx.delete()
        return True
    ctx.restore(d10)
    if _m_sU(ctx):
        ctx.delete()
        _try_lar_chain(ctx)
        return True
    ctx.restore(d10)
    return _chain_ki(ctx)


def _stem_noun_suffixes(ctx: _Ctx) -> bool:
    d1 = ctx.save()
    # b1 (L362): [lAr] delete try(chain_ki)
    ctx.mark()
    if _m_lAr(ctx):
        ctx.delete()
        d2 = ctx.save()
        if not _chain_ki(ctx):
            ctx.restore(d2)
        return True
    ctx.restore(d1)
    # b2 (L364): [ncA] delete try(lArI | (poss|sU)+lar-chain | lAr+chain)
    ctx.mark()
    if _m_ncA(ctx):
        ctx.delete()
        d3 = ctx.save()
        d4 = ctx.save()
        ctx.mark()
        if _m_lArI(ctx):
            ctx.delete()
        else:
            ctx.restore(d4)
            ctx.mark()
            if _first(ctx, _m_possessives, _m_sU):
                ctx.delete()
                _try_lar_chain(ctx)
            else:
                ctx.restore(d4)
                ctx.mark()
                if _m_lAr(ctx):
                    ctx.delete()
                    if not _chain_ki(ctx):
                        ctx.restore(d3)
                else:
                    ctx.restore(d3)
        return True
    ctx.restore(d1)
    # b3 (L374): [(ndA|nA) (lArI] del | sU] del try(lar-chain) | chain_ki)]
    ctx.mark()
    if _first(ctx, _m_ndA, _m_nA):
        d10 = ctx.save()
        if _m_lArI(ctx):
            ctx.delete()
            return True
        ctx.restore(d10)
        if _m_sU(ctx):
            ctx.delete()
            _try_lar_chain(ctx)
            return True
        ctx.restore(d10)
        if _chain_ki(ctx):
            return True
    ctx.restore(d1)
    # b4 (L384): [(ndAn|nU) (sU] del try(lar-chain) | lArI<no delete>)]
    ctx.mark()
    if _first(ctx, _m_ndAn, _m_nU):
        d11 = ctx.save()
        if _m_sU(ctx):
            ctx.delete()
            _try_lar_chain(ctx)
            return True
        ctx.restore(d11)
        if _m_lArI(ctx):
            return True  # reference quirk: matches but deletes nothing
    ctx.restore(d1)
    # b5 (L386): [DAn] delete try([ poss|lAr|chain paths)
    ctx.mark()
    if _m_DAn(ctx):
        ctx.delete()
        d13 = ctx.save()
        ctx.mark()
        d14 = ctx.save()
        if _m_possessives(ctx):
            ctx.delete()
            _try_lar_chain(ctx)
        else:
            ctx.restore(d14)
            if _m_lAr(ctx):
                ctx.delete()
                d16 = ctx.save()
                if not _chain_ki(ctx):
                    ctx.restore(d16)
            else:
                ctx.restore(d14)
                if not _chain_ki(ctx):
                    ctx.restore(d13)
        return True
    ctx.restore(d1)
    # b6 (L396): [(nUn|ylA)] delete try(lAr+chain | (poss|sU)+lar-chain | chain)
    ctx.mark()
    if _first(ctx, _m_nUn, _m_ylA):
        ctx.delete()
        d18 = ctx.save()
        d19 = ctx.save()
        ok = False
        ctx.mark()
        if _m_lAr(ctx):
            ctx.delete()
            if _chain_ki(ctx):
                ok = True
        if not ok:
            ctx.restore(d19)
            ctx.mark()
            if _first(ctx, _m_possessives, _m_sU):
                ctx.delete()
                _try_lar_chain(ctx)
                ok = True
        if not ok:
            ctx.restore(d19)
            if not _chain_ki(ctx):
                ctx.restore(d18)
        return True
    ctx.restore(d1)
    # b7 (L406): [lArI] delete
    ctx.mark()
    if _m_lArI(ctx):
        ctx.delete()
        return True
    ctx.restore(d1)
    # b8 (L408): chain_ki
    if _chain_ki(ctx):
        return True
    ctx.restore(d1)
    # b9 (L410): [(DA|yU|yA)] delete try([ ((poss ] del try([lAr)) | lAr) ] del [ chain)
    ctx.mark()
    if _first(ctx, _m_DA, _m_yU, _m_yA):
        ctx.delete()
        d23 = ctx.save()
        ctx.mark()
        d24 = ctx.save()
        matched = False
        if _m_possessives(ctx):
            ctx.delete()
            d25 = ctx.save()
            ctx.mark()
            if not _m_lAr(ctx):
                ctx.restore(d25)
            matched = True
        if not matched:
            ctx.restore(d24)
            if not _m_lAr(ctx):
                ctx.restore(d23)
                return True  # try failed, branch still succeeds
        ctx.delete()
        ctx.mark()
        if not _chain_ki(ctx):
            ctx.restore(d23)
        return True
    ctx.restore(d1)
    # b10 (L412): [(poss|sU)] delete try(lar-chain)
    ctx.mark()
    if _first(ctx, _m_possessives, _m_sU):
        ctx.delete()
        _try_lar_chain(ctx)
        return True
    return False


def _append_u(ctx: _Ctx) -> bool:
    w = ctx.w
    if not w.endswith(("d", "g")):
        return False
    i = len(w) - 1
    while i >= 0 and w[i] not in _VOW:
        i -= 1
    if i < 0:
        return False
    v = w[i]
    if v in "aı":
        ctx.w = w + "ı"
    elif v in "ei":
        ctx.w = w + "i"
    elif v in "ou":
        ctx.w = w + "u"
    else:  # ö/ü
        ctx.w = w + "ü"
    return True


_LAST_CONS = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


@lru_cache(maxsize=200_000)
def turkish_snowball_stem(word: str) -> str:
    if sum(1 for ch in word if ch in _VOW) < 2:
        return word  # more_than_one_syllable_word gate
    ctx = _Ctx(word)
    _stem_nominal_verb_suffixes(ctx)
    ctx.c = len(ctx.w)
    if not ctx.continue_noun:
        return ctx.w  # Stem() bails before noun suffixes AND postlude
    _stem_noun_suffixes(ctx)
    ctx.c = len(ctx.w)
    # postlude (suppressed for reserved words)
    if ctx.w in ("ad", "soyad"):
        return ctx.w
    _append_u(ctx)
    w = ctx.w
    last = _LAST_CONS.get(w[-1:]) if w else None
    if last is not None:
        w = w[:-1] + last
    return w
