"""Brazilian Portuguese stemmer (Orengo/RSLP-flavored, Analysis/Br analog).

Reference semantics (tables + control flow verified line-by-line, not copied):
  /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Br/BrazilianStemmer.cs:24
    changeTerm (:259): lowercase + strip accents (á/â/ã->a, é/ê->e, í->i,
      ó/ô/õ->o, ú/ü->u, ç->c, ñ->n) — the whole algorithm runs accent-free,
      unlike Snowball Portuguese.
    getR1 (:131) / getRV (:190): region STARTS as in Snowball but with a
      last-char guard (a region that would start at/after the final char is
      null, and null regions fail every suffix test).
    Stem flow (:68-83): step1 (noun/adjective suffixes); if nothing removed,
      step2 (verb suffixes); step3 (i-after-c) if 1/2 removed else step4
      (residual os/a/i/o); step5 (final e, with gu/ci undouble).
  The full RSLP rule-file engine (Analysis/Pt/RSLPStemmerBase.cs) loads
  galician.rslp from an embedded resource that is NOT present in the
  reference tree, so the Galician RSLP stemmer remains scoped out; Brazilian
  is hand-coded in the reference and reproduced here.
"""

from __future__ import annotations

from functools import lru_cache

_BR_FOLD = str.maketrans(
    {
        "á": "a", "â": "a", "ã": "a",
        "é": "e", "ê": "e",
        "í": "i",
        "ó": "o", "ô": "o", "õ": "o",
        "ú": "u", "ü": "u",
        "ç": "c", "ñ": "n",
    }
)
_BR_V = frozenset("aeiou")


def _br_r1(w: str, start: int = 0) -> int | None:
    """Region start index per getR1 (BrazilianStemmer.cs:131): after the
    first non-vowel following the first vowel, both strictly before the
    last char; None when no such boundary exists."""
    i = len(w) - 1
    j = start
    while j < i and w[j] not in _BR_V:
        j += 1
    if j >= i:
        return None
    while j < i and w[j] in _BR_V:
        j += 1
    if j >= i:
        return None
    return j + 1


def _br_rv(w: str) -> int | None:
    """Region start per getRV (BrazilianStemmer.cs:190)."""
    i = len(w) - 1
    if i > 0 and w[1] not in _BR_V:
        j = 2
        while j < i and w[j] not in _BR_V:
            j += 1
        if j < i:
            return j + 1
    if i > 1 and w[0] in _BR_V and w[1] in _BR_V:
        j = 2
        while j < i and w[j] in _BR_V:
            j += 1
        if j < i:
            return j + 1
    if i > 2:
        return 3
    return None


# step1 rules in cascade order: (suffix, min CT length, region, replacement,
# required preceding suffix or None). Region "R2"/"R1"/"RV"; replacement ""
# = delete. BrazilianStemmer.cs:429-678.
_BR_STEP1 = (
    ("uciones", 0, "R2", "u", None),
    ("imentos", 6, "R2", "", None),
    ("amentos", 6, "R2", "", None),
    ("adores", 6, "R2", "", None),
    ("adoras", 6, "R2", "", None),
    ("logias", 6, "R2", "log", None),
    ("encias", 6, "R2", "ente", None),
    ("amente", 6, "R1", "", None),
    ("idades", 6, "R2", "", None),
    ("acoes", 5, "R2", "", None),
    ("imento", 5, "R2", "", None),
    ("amento", 5, "R2", "", None),
    ("adora", 5, "R2", "", None),
    ("ismos", 5, "R2", "", None),
    ("istas", 5, "R2", "", None),
    ("logia", 5, "R2", "log", None),
    ("ucion", 5, "R2", "u", None),
    ("encia", 5, "R2", "ente", None),
    ("mente", 5, "R2", "", None),
    ("idade", 5, "R2", "", None),
    ("acao", 4, "R2", "", None),
    ("ezas", 4, "R2", "", None),
    ("icos", 4, "R2", "", None),
    ("icas", 4, "R2", "", None),
    ("ismo", 4, "R2", "", None),
    ("avel", 4, "R2", "", None),
    ("ivel", 4, "R2", "", None),
    ("ista", 4, "R2", "", None),
    ("osos", 4, "R2", "", None),
    ("osas", 4, "R2", "", None),
    ("ador", 4, "R2", "", None),
    ("ivas", 4, "R2", "", None),
    ("ivos", 4, "R2", "", None),
    ("iras", 4, "RV", "ir", "e"),
    ("eza", 3, "R2", "", None),
    ("ico", 3, "R2", "", None),
    ("ica", 3, "R2", "", None),
    ("oso", 3, "R2", "", None),
    ("osa", 3, "R2", "", None),
    ("iva", 3, "R2", "", None),
    ("ivo", 3, "R2", "", None),
    ("ira", 3, "RV", "ir", "e"),
)

# step2 verb suffixes, cascade order, all tested against RV
# (BrazilianStemmer.cs:680-1288).
_BR_STEP2 = (
    "issemos", "essemos", "assemos", "ariamos", "eriamos", "iriamos",
    "iremos", "eremos", "aremos", "avamos", "iramos", "eramos", "aramos",
    "asseis", "esseis", "isseis", "arieis", "erieis", "irieis",
    "irmos", "iamos", "armos", "ermos", "areis", "ereis", "ireis",
    "asses", "esses", "isses", "astes", "assem", "essem", "issem",
    "ardes", "erdes", "irdes", "ariam", "eriam", "iriam", "arias",
    "erias", "irias", "estes", "istes", "aveis",
    "aria", "eria", "iria", "asse", "esse", "isse", "aste", "este",
    "iste", "arei", "erei", "irei", "aram", "eram", "iram", "avam",
    "arem", "erem", "irem", "ando", "endo", "indo", "arao", "erao",
    "irao", "adas", "idas", "aras", "eras", "iras", "avas", "ares",
    "eres", "ires", "ados", "idos", "amos", "emos", "imos", "ieis",
    "ada", "ida", "ara", "era", "ira", "iam", "ado", "ido", "ias",
    "ais", "eis", "ear",
    "ia", "ei", "am", "em", "ar", "er", "ir", "as", "es", "is",
    "eu", "iu", "ou",
)


def _fits(w: str, suf: str, region: int | None) -> bool:
    return region is not None and w.endswith(suf) and len(w) - len(suf) >= region


@lru_cache(maxsize=200_000)
def brazilian_stem(word: str) -> str:
    if len(word) < 3 or not word.isalpha():
        return word  # isStemmable/isIndexable guard: pass through unchanged
    w = word.lower().translate(_BR_FOLD)
    r1 = _br_r1(w)
    r2 = _br_r1(w, r1) if r1 is not None else None
    rv = _br_rv(w)
    regions = {"R1": r1, "R2": r2, "RV": rv}

    altered = False
    for suf, minlen, reg, rep, prec in _BR_STEP1:
        if len(w) >= minlen and _fits(w, suf, regions[reg]):
            if prec is not None and not w[: len(w) - len(suf)].endswith(prec):
                continue
            w = w[: len(w) - len(suf)] + rep
            altered = True
            break
    if not altered and rv is not None:
        for suf in _BR_STEP2:
            if _fits(w, suf, rv):
                w = w[: len(w) - len(suf)]
                altered = True
                break

    # regions are fixed strings in the reference; ours are start indexes into
    # the ORIGINAL w, still valid after suffix removal (prefix unchanged)
    if altered:
        # step3: i preceded by c, both within RV (suffixPreceded(RV,"i","c"))
        if _fits(w, "ci", rv):
            w = w[:-1]
    else:
        # step4: residual suffix
        for suf in ("os", "a", "i", "o"):
            if _fits(w, suf, rv):
                w = w[: len(w) - len(suf)]
                break
    # step5: final e; gue -> g, cie -> c (preceding pair must sit in RV too)
    if _fits(w, "e", rv):
        if _fits(w, "gue", rv):
            w = w[:-2]
        elif _fits(w, "cie", rv):
            w = w[:-2]
        else:
            w = w[:-1]
    return w
