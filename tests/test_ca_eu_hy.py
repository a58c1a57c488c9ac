"""Catalan / Basque / Armenian analyzers (reference Analysis/{Ca,Eu,Hy}
shells; light stemmers with documented provenance — functions/ca_eu_hy.py)."""

import pytest

from lucene_net_ray.functions.analysis import Analyzer
from lucene_net_ray.functions.ca_eu_hy import (
    armenian_light_stem,
    basque_light_stem,
    catalan_light_stem,
    catalan_lower,
)


# --- Catalan elision: the one tree-verified piece (CatalanAnalyzer.cs
# DEFAULT_ARTICLES = {d,l,m,n,s,t}) ----------------------------------------
@pytest.mark.parametrize(
    "tok,expected",
    [
        ("l'home", "home"),
        ("L'Home", "home"),
        ("d'aigua", "aigua"),
        ("s'ha", "ha"),
        ("m'agrada", "agrada"),
        ("n'hi", "hi"),
        ("t'estimo", "estimo"),
        ("l’home", "home"),  # typographic apostrophe
        ("carn", "carn"),  # no apostrophe
        ("x'abc", "x'abc"),  # not an article -> untouched
        ("ll'x", "ll'x"),  # apostrophe not at index 1 -> untouched
    ],
)
def test_catalan_elision(tok, expected):
    assert catalan_lower(tok) == expected


CATALAN_GROUPS = [
    # (conflation family, common stem)
    (["casa", "cases"], "cas"),
    (["gos", "gossos", "gossa"], "gos"),
    (["nació", "nacions"], "naci"),
    (["amic", "amics"], "amic"),
    (["ràpid", "ràpida", "ràpides", "ràpidament", "rapidíssim"], "rapid"),
    (["porta", "portes"], "port"),
    (["home", "homes"], "hom"),
    (["cançó", "cançons"], "canc"),
]


@pytest.mark.parametrize("family,stem", CATALAN_GROUPS)
def test_catalan_conflation(family, stem):
    for w in family:
        assert catalan_light_stem(w) == stem, w


EU_GROUPS = [
    (["etxe", "etxea", "etxeak", "etxean", "etxeko", "etxetik", "etxera",
      "etxekoa"], "etxe"),
    (["gizon", "gizonaren", "gizonarekin", "gizonek", "gizonen"], "gizon"),
    (["liburu", "liburua", "liburuak"], "liburu"),
    (["mendi", "mendietan", "mendietako", "mendietatik"], "mendi"),
]


@pytest.mark.parametrize("family,stem", EU_GROUPS)
def test_basque_conflation(family, stem):
    for w in family:
        assert basque_light_stem(w) == stem, w


HY_GROUPS = [
    (["ծառ", "ծառը", "ծառեր", "ծառերի", "ծառերից", "ծառերով", "ծառում",
      "ծառի"], "ծառ"),
    (["լեզու", "լեզուներ", "լեզուների", "լեզուներում"], "լեզու"),
    (["երեխա", "երեխան", "երեխաները", "երեխաներին"], "երեխա"),
]


@pytest.mark.parametrize("family,stem", HY_GROUPS)
def test_armenian_conflation(family, stem):
    for w in family:
        assert armenian_light_stem(w) == stem, w


def test_armenian_bare_forms_stable():
    # ու-final bare nouns keep their ն (the article-ն vowel condition —
    # տուն/գարուն are nominatives, not articled forms)
    assert armenian_light_stem("տուն") == "տուն"
    assert armenian_light_stem("գարուն") == "գարուն"
    # the documented miss this buys: լեզուն (article) does not conflate
    assert armenian_light_stem("լեզուն") == "լեզուն"
    # short words never stripped below 3 chars
    assert armenian_light_stem("նա") == "նա"
    assert basque_light_stem("ura") == "ura"  # stem would be 2 chars


def test_analyzer_kinds_end_to_end():
    ca = Analyzer(kind="catalan", stop_words=frozenset({"de", "la", "el"}))
    assert ca("L'home de la casa i les cases") == [
        "hom", "cas", "i", "les", "cas"
    ]
    eu = Analyzer(kind="basque", stop_words=frozenset({"eta"}))
    assert eu("etxea eta etxeak") == ["etxe", "etxe"]
    hy = Analyzer(kind="armenian", stop_words=frozenset({"եվ"}))
    assert hy("ծառերը եվ ծառերի") == ["ծառ", "ծառ"]


def test_indexed_conflation_round_trip(tmp_path):
    """Index with the Catalan analyzer; singular query matches plural doc."""
    import pyarrow as pa

    from lucene_net_ray.state.segment import build_segment

    an = Analyzer(kind="catalan", stop_words=frozenset({"les", "de"}))
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "content": pa.array(
                ["les cases de pedra", "un gos i dos gossos"], type=pa.string()
            ),
        }
    )
    build_segment(tbl, seg_id=0, doc_base=0, out_dir=str(tmp_path), analyzer=an)
    import pyarrow.parquet as pq

    terms = pq.read_table(str(tmp_path / "seg000000" / "terms.parquet"))
    vocab = set(terms.column("term").to_pylist())
    assert "cas" in vocab and "gos" in vocab
    assert "cases" not in vocab and "gossos" not in vocab
