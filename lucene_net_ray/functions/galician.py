"""Galician stemmers (Analysis/Gl analog) — clean-room RSLP-G.

Reference surface: Analysis/Gl/GalicianStemmer.cs:35 and
GalicianMinimalStemmer.cs:32 both load step tables from an embedded
``galician.rslp`` resource that is ABSENT from the reference tree, so
rule-for-rule parity is unverifiable. These implementations are derived
clean-room from the published RSLP algorithm structure (Orengo & Huyck, "A
Stemming Algorithm for the Portuguese Language", SPIRE 2001 — ordered step
cascade: Plural -> Adverb -> Augmentative/Diminutive -> Noun -> Verb ->
Vowel, longest-suffix-first with per-rule minimum stem lengths and exception
lists) adapted to standard Galician (RAG) morphology:

  plural   -ns->-n (camións->camión), -ais->-al (animais->animal),
           -eis->-el (papeis->papel), -ois->-ol (caracois->caracol),
           -ís->-il (cadrís->cadril), -les->-l (soles->sol),
           -res->-r (mulleres->muller), -ces->-z (luces->luz),
           -ses->-s (meses->mes), default -s; invariables (luns, martes,
           país, ...) pass through.
  adverb   -mente (exception: semente).
  aug/dim  -iño/-iña, -ote/-ota, -azo/-aza, -ísimo/-ísima.
  noun     productive derivational suffixes (-acion/-icion/-sion/-cion,
           -idade, -ismo, -ista, -encia/-ancia, -mento, -ador, -eiro, ...).
  verb     regular -ar/-er/-ir conjugation endings.
  vowel    final thematic a/e/o.
Accents are stripped LAST (the RSLP "remove accents" final step), so region
checks see the accented forms. The minimal stemmer is the Plural step alone,
mirroring GalicianMinimalStemmer's single-step use of the rule file.
"""

from __future__ import annotations

from functools import lru_cache

_GL_UNFOLD = str.maketrans(
    {
        "á": "a", "â": "a", "ã": "a",
        "é": "e", "ê": "e",
        "í": "i",
        "ó": "o", "ô": "o", "õ": "o",
        "ú": "u", "ü": "u",
    }
)

# invariable / deceptive-s words the plural step must never touch
_PLURAL_EXCEPTIONS = frozenset(
    {
        "luns", "martes", "mércores", "xoves", "venres",  # weekdays
        "país", "deus", "campus", "virus", "oasis", "atlas", "gas",
        "lapis", "pires", "mais", "xamais", "apenas",
    }
)
_IRREGULAR_PLURALS = {"pais": "pai"}  # -ais rule would give *pal

# (suffix, min remaining stem length, replacement) — longest first, first hit
# wins, RSLP rule-row shape
_PLURAL_RULES = (
    ("ns", 1, "n"),
    ("ais", 3, "al"),
    ("eis", 2, "el"),
    ("ois", 2, "ol"),
    ("ís", 3, "il"),
    ("les", 2, "l"),
    ("res", 3, "r"),
    ("ces", 2, "z"),
    ("ses", 2, "s"),
    ("s", 2, ""),
)

_DIM_EXCEPTIONS = frozenset(
    {"camiño", "cariño", "veciño", "sobriño", "padriño", "muíño", "campiño"}
)
_DIM_RULES = (
    ("ísimo", 3, ""),
    ("ísima", 3, ""),
    ("iño", 3, ""),
    ("iña", 3, ""),
    ("ote", 3, ""),
    ("ota", 3, ""),
    ("azo", 3, ""),
    ("aza", 3, ""),
)

_NOUN_RULES = (
    ("abilidade", 2, ""),
    ("amento", 3, ""),
    ("imento", 3, ""),
    ("adora", 3, ""),
    ("ación", 3, ""),
    ("ición", 3, ""),
    ("encia", 3, ""),
    ("ancia", 3, ""),
    ("idade", 3, ""),
    ("mento", 4, ""),
    ("ación", 3, ""),
    ("ador", 3, ""),
    ("ante", 3, ""),
    ("cion", 3, ""),
    ("sión", 3, ""),
    ("ción", 3, ""),
    ("ismo", 3, ""),
    ("ista", 3, ""),
    ("eiro", 3, ""),
    ("eira", 3, ""),
    ("oso", 3, ""),
    ("osa", 3, ""),
    ("ivo", 3, ""),
    ("iva", 3, ""),
    ("ez", 4, ""),
)

# regular conjugation endings, longest first
_VERB_RULES = (
    "ariamos", "eriamos", "iriamos", "aríamos", "eríamos", "iríamos",
    "aremos", "eremos", "iremos", "abamos", "ábamos", "iamos", "íamos",
    "aredes", "eredes", "iredes", "abades", "iades",
    "arían", "erían", "irían", "arías", "erías", "irías",
    "aría", "ería", "iría", "aches", "iches",
    "aban", "abas", "aron", "eron", "iron", "ando", "endo", "indo",
    "arán", "erán", "irán", "arás", "erás", "irás", "aria",
    "amos", "emos", "imos", "ades", "edes", "ides", "aste", "iste",
    "aba", "ara", "era", "ira", "ían", "ías", "ará", "erá", "irá",
    "ade", "ede", "ide", "aró",
    "ei", "ou", "eu", "iu", "ín", "ía", "an", "en", "ar", "er", "ir",
    "as", "es", "is", "a", "e", "o",
)


def _apply(w: str, rules, exceptions=frozenset()) -> tuple[str, bool]:
    if w in exceptions:
        return w, False
    for suf, minlen, rep in rules:
        if w.endswith(suf) and len(w) - len(suf) >= minlen:
            return w[: len(w) - len(suf)] + rep, True
    return w, False


@lru_cache(maxsize=200_000)
def galician_minimal_stem(word: str) -> str:
    """GalicianMinimalStemmer analog: the RSLP Plural step only."""
    w = word.lower()
    if len(w) < 3 or not w.endswith(("s", "ns")):
        return w
    if w in _PLURAL_EXCEPTIONS:
        return w
    if w in _IRREGULAR_PLURALS:
        return _IRREGULAR_PLURALS[w]
    # first-person-plural verb endings are not noun plurals (the RSLP rule
    # files carry these as per-rule exception lists)
    if w.endswith(("amos", "emos", "imos")):
        return w
    return _apply(w, _PLURAL_RULES)[0]


@lru_cache(maxsize=200_000)
def galician_stem(word: str) -> str:
    """Full RSLP-G cascade; accents stripped last (the RSLP final step)."""
    w = word.lower()
    if len(w) < 3:
        return w.translate(_GL_UNFOLD)
    w = galician_minimal_stem(w)
    # adverb
    if w.endswith("mente") and len(w) - 5 >= 4 and w != "semente":
        w = w[:-5]
    changed = True
    w, _ = _apply(w, _DIM_RULES, _DIM_EXCEPTIONS)
    w2, noun_hit = _apply(w, _NOUN_RULES)
    if noun_hit:
        w = w2
    else:
        # verb endings only when no derivational suffix matched (RSLP order)
        for suf in _VERB_RULES:
            if w.endswith(suf) and len(w) - len(suf) >= 3:
                w = w[: len(w) - len(suf)]
                break
        else:
            changed = False
        if not changed and len(w) >= 4 and w[-1] in "aeo":
            w = w[:-1]  # vowel step
    return w.translate(_GL_UNFOLD)
