"""Hunspell affix-dictionary subset (Analysis/Hunspell/Dictionary.cs analog).

Synthetic .aff/.dic pair modeled on the public en_US affix style."""

from lucene_net_ray.functions.analysis import Analyzer
from lucene_net_ray.functions.analysis_ext import ChainAnalyzer
from lucene_net_ray.functions.hunspell import HunspellDictionary, HunspellStemFilter

AFF = """
SET UTF-8

PFX U Y 1
PFX U   0     un         .

SFX S Y 3
SFX S   y     ies        [^aeiou]y
SFX S   0     s          [^sxy]
SFX S   0     es         [sx]

SFX D Y 3
SFX D   0     d          e
SFX D   y     ied        [^aeiou]y
SFX D   0     ed         [^ey]
"""

DIC = """6
cat/S
box/S
pony/S
walk/DS
tie/D
lock/USD
"""


def _d():
    return HunspellDictionary(AFF, DIC)


def test_parse():
    d = _d()
    assert d.words["cat"] == frozenset("S")
    assert d.words["lock"] == frozenset("USD")
    assert len(d.suffixes) == 6 and len(d.prefixes) == 1


def test_suffix_stemming():
    d = _d()
    assert d.stem("cats") == ["cat"]
    assert d.stem("boxes") == ["box"]
    assert d.stem("ponies") == ["pony"]
    assert d.stem("walked") == ["walk"]
    assert d.stem("tied") == ["tie"]
    assert d.stem("walks") == ["walk"]
    # condition gates: 'boxs' reverses via the [^sxy] rule to stem 'box'
    # but the condition rejects x -> no stem
    assert d.stem("boxs") == []
    # flag gates: 'cat' has S but not D -> 'cated' has no stem
    assert d.stem("cated") == []
    # dictionary word itself is its own stem
    assert d.stem("walk") == ["walk"]
    assert d.stem("zzz") == []


def test_prefix_and_cross_product():
    d = _d()
    assert d.stem("unlock") == ["lock"]
    # cross product: un + lock + ed (PFX U cross, SFX D cross, both flags on lock)
    assert d.stem("unlocked") == ["lock"]
    # prefix without the flag is rejected
    assert d.stem("unwalk") == []


def test_chain_filter_and_indexing(tmp_path):
    import pyarrow as pa

    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import TermQuery

    f = HunspellStemFilter(_d())
    chain = ChainAnalyzer(base=Analyzer(stop_words=None), filters=(f,))
    assert chain("the cats walked") == ["the", "cat", "walk"]
    idx = str(tmp_path / "idx")
    build_index_from_table(
        pa.table({"content": ["cats walked here", "pony unlocked boxes"]}),
        idx, analyzer=chain,
    )
    s = Searcher(idx, use_actors=False)
    assert {h for h, _ in s.search(TermQuery(term="walk"), k=5)} == {0}
    assert {h for h, _ in s.search(TermQuery(term="lock"), k=5)} == {1}
