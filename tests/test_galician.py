"""Galician stemmers — clean-room RSLP-G (Analysis/Gl analog; the reference's
galician.rslp resource is absent from its tree, so these vectors define the
contract from standard RAG morphology, documented in functions/galician.py)."""

import pytest

from lucene_net_ray.functions.analysis import Analyzer
from lucene_net_ray.functions.galician import galician_minimal_stem, galician_stem


@pytest.mark.parametrize(
    "plural,singular",
    [
        ("camións", "camión"),
        ("cans", "can"),
        ("animais", "animal"),
        ("papeis", "papel"),
        ("caracois", "caracol"),
        ("cadrís", "cadril"),
        ("soles", "sol"),
        ("mulleres", "muller"),
        ("luces", "luz"),
        ("veces", "vez"),
        ("meses", "mes"),
        ("casas", "casa"),
        ("libros", "libro"),
        ("pais", "pai"),  # irregular: the -ais rule would give *pal
    ],
)
def test_minimal_plural_reduction(plural, singular):
    assert galician_minimal_stem(plural) == singular


@pytest.mark.parametrize("word", ["luns", "martes", "mércores", "xoves", "venres", "país", "virus"])
def test_minimal_invariables_pass_through(word):
    assert galician_minimal_stem(word) == word


def test_minimal_singular_untouched():
    for w in ("can", "animal", "papel", "muller"):
        assert galician_minimal_stem(w) == w


def test_full_stemmer_conflates_inflections():
    """The point of a stemmer: one conflation class per lemma family."""
    # adverb
    assert galician_stem("rapidamente") == galician_stem("rapida")
    # diminutive
    assert galician_stem("neniño") == galician_stem("nen")
    # noun derivation
    assert galician_stem("felicidade") == galician_stem("felic")
    assert galician_stem("constitución") == galician_stem("constitu")
    # verb conjugation family
    forms = ["cantar", "cantaba", "cantaron", "cantando", "cantamos"]
    stems = {galician_stem(w) for w in forms}
    assert stems == {"cant"}
    # plurals feed the cascade
    assert galician_stem("animais") == galician_stem("animal")


def test_full_stemmer_strips_accents_last():
    assert "ó" not in galician_stem("camións")
    assert galician_stem("camións") == galician_stem("camion")


def test_galician_analyzer_kind_wired():
    a = Analyzer(kind="galician", stop_words=None)
    assert a("os camións cantaban") == ["os", "camion", "cant"]
    m = Analyzer(kind="galician_minimal", stop_words=None)
    # the 2-letter article 'os' is below the minimum stemmable length
    assert m("os camións pasan") == ["os", "camión", "pasan"]
