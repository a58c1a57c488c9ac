"""Round-3 late language additions: Turkish (case fold + Snowball stemmer),
Irish case handling, Romanian Snowball, Brazilian RSLP-style, CJK width +
bigrams. Vectors are hand-traced through the reference implementations
(contrib/Snowball/SF/Snowball/Ext/{Turkish,Romanian}Stemmer.cs,
Analysis/Br/BrazilianStemmer.cs, Analysis/Cjk/*.cs, Analysis/Tr/*.cs,
Analysis/Ga/IrishLowerCaseFilter.cs)."""

import pytest

from lucene_net_ray.functions.analysis import Analyzer
from lucene_net_ray.functions.cjk import (
    CJKBigramFilter,
    cjk_analyzer,
    cjk_width_fold,
)
from lucene_net_ray.functions.rslp import brazilian_stem
from lucene_net_ray.functions.snowball import romanian_stem
from lucene_net_ray.functions.stem import irish_lower, turkish_lower
from lucene_net_ray.functions.turkish import turkish_snowball_stem


# --- Turkish ---------------------------------------------------------------

@pytest.mark.parametrize(
    "word,expected",
    [
        ("kitapları", "kitap"),        # lArI branch
        ("kitaplarında", "kitap"),     # ndA + lArI
        ("arabalarında", "araba"),
        ("evler", "ev"),               # bare lAr (unsets continue flag)
        ("güzelliği", "güzellik"),     # yU + final ğ->k devoicing
        ("ağaçlar", "ağaç"),
        ("kediler", "kedi"),
        ("gözlerim", "göz"),           # lAr + possessive chain
        ("çocuklarımızın", "çocuk"),   # nUn + possessive + lAr chain
        ("türkiyede", "türkiye"),      # DA locative
        ("ad", "ad"),                  # reserved word
        ("soyad", "soyad"),            # reserved word
        ("ev", "ev"),                  # single syllable: untouched
        ("okudum", "okudu"),           # possessive 'um' + d -> append u
    ],
)
def test_turkish_snowball(word, expected):
    assert turkish_snowball_stem(word) == expected


def test_turkish_lowercase_and_apostrophe():
    assert turkish_lower("İstanbul'daki") == "istanbul"  # apostrophe truncation
    assert turkish_lower("IŞIK") == "ışık"  # I -> dotless ı
    assert turkish_lower("İZMİR") == "izmir"  # İ -> i
    assert turkish_lower("DİYARBAKIR") == "diyarbakır"
    # I followed by combining dot above is a dotted capital -> i, dot consumed
    assert turkish_lower("İstanbul") == "istanbul"
    assert turkish_lower("Ankara’nın") == "ankara"  # curly apostrophe


def test_turkish_analyzer_chain():
    a = Analyzer("turkish", stop_words=frozenset({"ve", "bir"}))
    assert a("İstanbul'daki Kitapları VE Ağaçlar") == ["istanbul", "kitap", "ağaç"]


# --- Irish -----------------------------------------------------------------

def test_irish_lowercase():
    assert irish_lower("nAthair") == "n-athair"   # prothetic n-
    assert irish_lower("tUISCE") == "t-uisce"     # prothetic t-
    assert irish_lower("nathair") == "nathair"    # lowercase vowel: no hyphen
    assert irish_lower("d'Oifig") == "oifig"      # article elision
    assert irish_lower("m’athair") == "athair"
    assert irish_lower("n") == ""                 # hyphenation particle stopped
    assert irish_lower("T") == ""
    assert irish_lower("Gaeilge") == "gaeilge"


def test_irish_analyzer():
    a = Analyzer("irish", stop_words=frozenset({"an", "agus"}))
    assert a("An nAthair agus d'Oifig n t") == ["n-athair", "oifig"]


# --- Romanian --------------------------------------------------------------

@pytest.mark.parametrize(
    "word,expected",
    [
        ("copilului", "copil"),       # step0 ului
        ("lucrurilor", "lucrur"),     # step0 ilor -> i, final-vowel i
        ("frumoasa", "frumoas"),      # final vowel
        ("abilitate", "abil"),        # combo suffix
        ("naţionale", "naţional"),
        ("studiilor", "stud"),        # iilor -> i, then final i dropped in RV
        ("importanţa", "importanţ"),
        ("acţiunile", "acţiun"),      # step0 ile -> i (not ab-), vowel drop
        ("ștergere", "şterg"),        # comma-below s folded; verb 'ere' in RV
        ("aveau", "aveau"),           # verb suffix blocked outside RV
    ],
)
def test_romanian_snowball(word, expected):
    assert romanian_stem(word) == expected


# --- Brazilian -------------------------------------------------------------

@pytest.mark.parametrize(
    "word,expected",
    [
        ("bebê", "beb"),              # accent strip + step4/5
        ("bebendo", "beb"),           # verb endo
        ("beber", "beb"),
        ("menina", "menin"),
        ("meninas", "menin"),
        ("quilométricas", "quilometr"),
        ("bobagem", "bobag"),
        ("constituição", "constituica"),
        ("aproximação", "aproxim"),   # step1 acao in R2
        ("chegou", "cheg"),           # verb ou
        ("ambiental", "ambiental"),   # nothing strippable
        ("ab", "ab"),                 # too short: untouched
    ],
)
def test_brazilian(word, expected):
    assert brazilian_stem(word) == expected


def test_brazilian_non_alpha_passthrough():
    assert brazilian_stem("abc123") == "abc123"


# --- CJK -------------------------------------------------------------------

def test_cjk_width_fold():
    assert cjk_width_fold("Ｔｅｓｔ　１２３４") == "Test　1234"
    assert cjk_width_fold("ｶﾀｶﾅ") == "カタカナ"
    assert cjk_width_fold("ｳﾞｨｯﾂ") == "ヴィッツ"      # voiced combine ｳ+ﾞ -> ヴ
    assert cjk_width_fold("ﾊﾟﾅｿﾆｯｸ") == "パナソニック"  # half-voiced ﾊ+ﾟ -> パ
    assert cjk_width_fold("plain ascii") == "plain ascii"


def test_cjk_bigram_runs():
    f = CJKBigramFilter()
    # lucene TestCJKBigramFilter-style: a run becomes overlapping bigrams
    assert f(list("多くの学生")) == ["多く", "くの", "の学", "学生"]
    # a lone CJK char stays a unigram
    assert f(["a", "中", "b"]) == ["a", "中", "b"]
    # non-CJK tokens break runs
    assert f(["中", "文", "abc", "日", "本"]) == ["中文", "abc", "日本"]


def test_cjk_bigram_output_unigrams():
    f = CJKBigramFilter(output_unigrams=True)
    assert f(list("中文字")) == ["中", "中文", "文", "文字", "字"]


def test_cjk_analyzer_end_to_end():
    a = cjk_analyzer(stop_words=frozenset())
    assert a("多くの学生が試験に落ちた") == [
        "多く", "くの", "の学", "学生", "生が", "が試",
        "試験", "験に", "に落", "落ち", "ちた",
    ]
    # width folding feeds tokenization: halfwidth kana bigrams like real kana
    assert a("中文ｶﾅ x") == ["中文", "文カ", "カナ", "x"]


def test_cjk_index_and_search(tmp_path, ray_session):
    """CJK analyzer plugs into the standard build/search path: querying a
    bigram term hits the right docs."""
    import pyarrow as pa

    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import TermQuery

    docs = ["学生が試験", "学生は多い", "hello world"]
    meta = build_index_from_table(
        pa.table({"content": docs}),
        str(tmp_path / "idx"),
        analyzer=cjk_analyzer(stop_words=frozenset()),
        target_rows_per_segment=10,
    )
    s = Searcher(meta, use_actors=False)
    assert s.count(TermQuery(term="学生")) == 2
    assert s.count(TermQuery(term="試験")) == 1
    assert s.count(TermQuery(term="hello")) == 1
