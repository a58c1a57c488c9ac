"""Snowball stemmer conformance + indexed conflation round trips.

Vectors are hand-derived from the published Snowball algorithm definitions
(snowballstem.org) — each one traced through the algorithm prose; grouped by
the rule they exercise. Reference analog: SnowballFilter.cs:30 +
Tartarus/Snowball/Ext generated stemmers.
"""

import pyarrow as pa
import pytest

from lucene_net_ray.functions.analysis import Analyzer
from lucene_net_ray.functions.snowball import italian_stem, porter2_stem, russian_stem


PORTER2_VECTORS = {
    # exceptional forms
    "skis": "ski", "dying": "die", "news": "news", "sky": "sky",
    # step 0 / 1a
    "dogs'": "dog", "boy's": "boy", "caresses": "caress", "ties": "tie",
    "cries": "cri", "gaps": "gap", "gas": "gas", "this": "this", "us": "us",
    # 1a exceptions
    "inning": "inning", "proceed": "proceed", "exceed": "exceed",
    # step 1b + fixups
    "agreed": "agre", "feed": "feed", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail", "filing": "file",
    # 1c
    "happy": "happi", "cry": "cri", "by": "by", "say": "say",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "format", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # regions with special prefixes
    "generously": "generous", "communication": "communic",
}

ITALIAN_VECTORS = {
    "abbandonata": "abbandon", "abbandonate": "abbandon", "abbandonare": "abbandon",
    "pronto": "pront", "pronti": "pront", "nazionale": "nazional",
    "felicità": "felic", "biologia": "biolog", "vendere": "vend",
    "cantava": "cant", "cantavano": "cant",  # verb suffixes in RV
    "generoso": "gener", "generosità": "generos",  # oso in R2; ità
}

RUSSIAN_VECTORS = {
    "книгами": "книг", "книга": "книг", "книги": "книг", "книгу": "книг",
    "красивый": "красив", "красивая": "красив", "красивыми": "красив",
    "читала": "чита", "читали": "чита",
    "важность": "важност",
    "делавшись": "дела",  # perfective gerund (group 1 after а)
    "бегство": "бегств",  # no matching ending in RV
}


@pytest.mark.parametrize("word,expect", sorted(PORTER2_VECTORS.items()))
def test_porter2_vectors(word, expect):
    assert porter2_stem(word) == expect


@pytest.mark.parametrize("word,expect", sorted(ITALIAN_VECTORS.items()))
def test_italian_vectors(word, expect):
    assert italian_stem(word) == expect


@pytest.mark.parametrize("word,expect", sorted(RUSSIAN_VECTORS.items()))
def test_russian_vectors(word, expect):
    assert russian_stem(word) == expect


def test_porter2_idempotent_on_own_output():
    # a stemmer output fed back in must be stable for common cases (the
    # conflation-class property indexing relies on)
    for w in ["running", "happiness", "relational", "nationality", "hopefulness"]:
        s = porter2_stem(w)
        assert porter2_stem(s) == s or len(porter2_stem(s)) <= len(s)


@pytest.mark.parametrize(
    "kind,doc,query_word",
    [
        ("english_snowball", "the runner was running happily", "runs"),
        ("italian", "le parole abbandonate restano abbandonata qui", "abbandonare"),
        ("russian", "красивая книга лежит на столе книгами", "книгу"),
    ],
)
def test_indexed_conflation_roundtrip(kind, doc, query_word, tmp_path):
    """Index with the language analyzer; a differently-inflected query form
    must hit the document (the whole point of stemming at index time)."""
    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import TermQuery
    from lucene_net_ray.state.index import IndexMeta

    an = Analyzer(kind=kind, stop_words=None)
    tbl = pa.table({"doc_id": pa.array([0], type=pa.int64()), "content": [doc]})
    idx = str(tmp_path / f"idx_{kind}")
    build_index_from_table(tbl, idx, analyzer=an)
    s = Searcher(IndexMeta(idx), use_actors=False)
    term = an(query_word)[0]
    hits = s.search(TermQuery(field="content", term=term), k=5)
    assert [d for d, _ in hits] == [0]


SWEDISH_VECTORS = {
    "bilarna": "bil", "flickorna": "flick", "stolen": "stol",
    "friskt": "frisk", "farlig": "far", "klubbarnas": "klubb",
    "jaktkarlens": "jaktkarl", "possessiv": "possessiv",
}

NORWEGIAN_VECTORS = {
    "huset": "hus", "kirken": "kirk", "hans": "han",
    "kjærlighetene": "kjær", "bok": "bok",
}

DANISH_VECTORS = {
    "huset": "hus", "søde": "sød", "hallen": "hal",
    "billigst": "bil", "venligst": "ven", "bog": "bog",
}


@pytest.mark.parametrize("word,expect", sorted(SWEDISH_VECTORS.items()))
def test_swedish_vectors(word, expect):
    from lucene_net_ray.functions.snowball import swedish_stem

    assert swedish_stem(word) == expect


@pytest.mark.parametrize("word,expect", sorted(NORWEGIAN_VECTORS.items()))
def test_norwegian_vectors(word, expect):
    from lucene_net_ray.functions.snowball import norwegian_stem

    assert norwegian_stem(word) == expect


@pytest.mark.parametrize("word,expect", sorted(DANISH_VECTORS.items()))
def test_danish_vectors(word, expect):
    from lucene_net_ray.functions.snowball import danish_stem

    assert danish_stem(word) == expect


@pytest.mark.parametrize(
    "kind,doc,query_word",
    [
        ("swedish", "bilarna står på gatan", "bilar"),
        ("norwegian", "kirken ligger ved huset", "kirke"),
        ("danish", "hallen ved huset er stor", "hallerne"),
    ],
)
def test_scandinavian_conflation_roundtrip(kind, doc, query_word, tmp_path):
    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import TermQuery
    from lucene_net_ray.state.index import IndexMeta

    an = Analyzer(kind=kind, stop_words=None)
    tbl = pa.table({"doc_id": pa.array([0], type=pa.int64()), "content": [doc]})
    idx = str(tmp_path / f"idx_{kind}")
    build_index_from_table(tbl, idx, analyzer=an)
    s = Searcher(IndexMeta(idx), use_actors=False)
    term = an(query_word)[0]
    hits = s.search(TermQuery(field="content", term=term), k=5)
    assert [d for d, _ in hits] == [0]


DUTCH_VECTORS = {
    # vectors traced rule-by-rule through the published algorithm
    "lichamelijk": "licham", "lichamelijke": "licham",
    "opheffen": "opheff",  # en removed; undouble is kk/dd/tt only
    "bedoeling": "bedoel", "maan": "man", "vrolijkheid": "vrolijk",
    "kleinigheden": "kleinig",  # heden->heid (step1), heid removed in R2 (3a)
    "zakken": "zak",  # en removed, kk undoubled
    "beste": "best", "bestes": "bestes",  # s after vowel: invalid s-ending
}


@pytest.mark.parametrize("word,expect", sorted(DUTCH_VECTORS.items()))
def test_dutch_vectors(word, expect):
    from lucene_net_ray.functions.snowball import dutch_stem

    assert dutch_stem(word) == expect


def test_dutch_conflation_roundtrip(tmp_path):
    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import TermQuery
    from lucene_net_ray.state.index import IndexMeta

    an = Analyzer(kind="dutch", stop_words=None)
    tbl = pa.table(
        {"doc_id": pa.array([0], type=pa.int64()),
         "content": ["de zakken staan bij de bedoeling"]}
    )
    idx = str(tmp_path / "idx_nl")
    build_index_from_table(tbl, idx, analyzer=an)
    s = Searcher(IndexMeta(idx), use_actors=False)
    term = an("zak")[0]
    hits = s.search(TermQuery(field="content", term=term), k=5)
    assert [d for d, _ in hits] == [0]


PORTUGUESE_VECTORS = {
    "abandonada": "abandon", "cantando": "cant", "felicidade": "felic",
    "biologia": "biolog", "menina": "menin", "almoço": "almoc",
    "bananeira": "bananeir", "nacionalidade": "nacional",
    "importantes": "import", "canções": "cançõ",
    "generosamente": "gener",  # amente in R1, then os in R2
}


@pytest.mark.parametrize("word,expect", sorted(PORTUGUESE_VECTORS.items()))
def test_portuguese_vectors(word, expect):
    from lucene_net_ray.functions.snowball import portuguese_stem

    assert portuguese_stem(word) == expect


def test_portuguese_conflation_roundtrip(tmp_path):
    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import TermQuery
    from lucene_net_ray.state.index import IndexMeta

    an = Analyzer(kind="portuguese", stop_words=None)
    tbl = pa.table(
        {"doc_id": pa.array([0], type=pa.int64()),
         "content": ["as meninas cantando na praça abandonada"]}
    )
    idx = str(tmp_path / "idx_pt")
    build_index_from_table(tbl, idx, analyzer=an)
    s = Searcher(IndexMeta(idx), use_actors=False)
    term = an("cantar")[0]
    hits = s.search(TermQuery(field="content", term=term), k=5)
    assert [d for d, _ in hits] == [0]


SPANISH_SNOWBALL_VECTORS = {
    "cantando": "cant", "felicidad": "felic", "biología": "biolog",
    "niñas": "niñ", "importantes": "import", "generosamente": "gener",
    "canciones": "cancion", "comiéndoselo": "com", "cantándosela": "cant",
    "guerra": "guerr", "lógicas": "logic",  # postlude deaccents
}


@pytest.mark.parametrize("word,expect", sorted(SPANISH_SNOWBALL_VECTORS.items()))
def test_spanish_snowball_vectors(word, expect):
    from lucene_net_ray.functions.snowball import spanish_snowball_stem

    assert spanish_snowball_stem(word) == expect


def test_spanish_snowball_conflation_roundtrip(tmp_path):
    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import TermQuery
    from lucene_net_ray.state.index import IndexMeta

    an = Analyzer(kind="spanish_snowball", stop_words=None)
    tbl = pa.table(
        {"doc_id": pa.array([0], type=pa.int64()),
         "content": ["las niñas cantando canciones importantes"]}
    )
    idx = str(tmp_path / "idx_es2")
    build_index_from_table(tbl, idx, analyzer=an)
    s = Searcher(IndexMeta(idx), use_actors=False)
    term = an("cantar")[0]
    hits = s.search(TermQuery(field="content", term=term), k=5)
    assert [d for d, _ in hits] == [0]


GERMAN_SNOWBALL_VECTORS = {
    "bücher": "buch", "kinder": "kind", "freundlichkeit": "freundlich",
    "schönheit": "schonheit", "aufgaben": "aufgab", "häuser": "haus",
    "verständnisse": "verstandnis", "bedeutung": "bedeut",
}


@pytest.mark.parametrize("word,expect", sorted(GERMAN_SNOWBALL_VECTORS.items()))
def test_german_snowball_vectors(word, expect):
    from lucene_net_ray.functions.snowball import german_snowball_stem

    assert german_snowball_stem(word) == expect


def test_german_snowball_conflation_roundtrip(tmp_path):
    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import TermQuery
    from lucene_net_ray.state.index import IndexMeta

    an = Analyzer(kind="german_snowball", stop_words=None)
    tbl = pa.table(
        {"doc_id": pa.array([0], type=pa.int64()),
         "content": ["die bücher der kinder mit bedeutung"]}
    )
    idx = str(tmp_path / "idx_de2")
    build_index_from_table(tbl, idx, analyzer=an)
    s = Searcher(IndexMeta(idx), use_actors=False)
    term = an("buch")[0]
    hits = s.search(TermQuery(field="content", term=term), k=5)
    assert [d for d, _ in hits] == [0]


FRENCH_SNOWBALL_VECTORS = {
    "continuité": "continu", "majestueux": "majestu", "grandement": "grand",
    "chantaient": "chant", "mangeassent": "mang", "belle": "bel",
    "nationale": "national", "importantes": "import", "jouer": "jou",
    "volontairement": "volontair",
    "création": "création",  # R2 empty: ation/ion cannot delete
    "chanteur": "chanteur",  # ateur outside R2
}


@pytest.mark.parametrize("word,expect", sorted(FRENCH_SNOWBALL_VECTORS.items()))
def test_french_snowball_vectors(word, expect):
    from lucene_net_ray.functions.snowball import french_stem

    assert french_stem(word) == expect


def test_french_snowball_conflation_roundtrip(tmp_path):
    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import TermQuery
    from lucene_net_ray.state.index import IndexMeta

    an = Analyzer(kind="french_snowball", stop_words=None)
    tbl = pa.table(
        {"doc_id": pa.array([0], type=pa.int64()),
         "content": ["ils chantaient grandement dans la belle salle"]}
    )
    idx = str(tmp_path / "idx_fr2")
    build_index_from_table(tbl, idx, analyzer=an)
    s = Searcher(IndexMeta(idx), use_actors=False)
    term = an("chanter")[0]
    hits = s.search(TermQuery(field="content", term=term), k=5)
    assert [d for d, _ in hits] == [0]


# ---------------------------------------------------------------------------
# German2 variant (reference contrib Snowball/SF/Snowball/Ext/German2Stemmer.cs)
# ---------------------------------------------------------------------------


def test_german2_folds_typewriter_umlauts():
    from lucene_net_ray.functions.snowball import (
        german2_snowball_stem as g2,
        german_snowball_stem as g1,
    )

    # the defining property: ae/oe/ue spellings conflate with umlaut forms
    for ae, um in [("schoen", "schön"), ("koennen", "können"), ("fuer", "für"),
                   ("haeuser", "häuser"), ("gruesse", "grüße"), ("uebung", "übung")]:
        assert g2(ae) == g2(um), (ae, um)
    # 'qu' protects its u from the ue fold
    for w in ("quelle", "bequem", "quer"):
        assert g2(w) == g1(w), w
    # words without the digraphs behave exactly like German
    for w in ("aufeinander", "kategorie", "abendessen", "laufen", "kinder"):
        assert g2(w) == g1(w), w
    # plain German does NOT fold (the variants differ where they should)
    assert g1("schoen") != g1("schön")


def test_german2_analyzer_kind():
    from lucene_net_ray.functions.analysis import Analyzer

    a = Analyzer(kind="german2")
    assert a("die schoenen Haeuser") == a("die schönen Häuser")


# ---------------------------------------------------------------------------
# Finnish Snowball (rule data pinned from the reference's generated
# contrib/Snowball/SF/Snowball/Ext/FinnishStemmer.cs; vectors hand-traced
# through that code — see functions/snowball.py provenance note)
# ---------------------------------------------------------------------------


def test_finnish_snowball_traced_vectors():
    from lucene_net_ray.functions.snowball import finnish_snowball_stem as f

    # case endings + i-plural
    assert f("talossa") == "talo"    # talo+ssa
    assert f("taloissa") == "talo"   # talo+i+ssa (i_plural after case)
    assert f("talon") == "talo"      # genitive n
    assert f("taloja") == "talo"     # tidy AEI + oj rules
    # possessive chain then case then i-plural
    assert f("käsissäni") == "käs"   # käsi+ssä+ni
    # particle (kö after particle_end 'n') then case n
    assert f("menenkö") == "mene"
    assert f("menen") == "mene"      # conflates with the particle form
    # 'kaan' is a particle here (preceded by n), then n-case + i-plural
    assert f("kuninkaan") == "kun"
    assert f("hännän") == "hän"      # n-case, AEI tidy, nn undouble
    assert f("hännät") == "hän"      # t-plural path conflates
    # sti particle needs R2 (p2=6 > 5 here) -> only the AEI tidy fires
    assert f("nopeasti") == "nopeast"


def test_finnish_snowball_conflation_groups():
    from lucene_net_ray.functions.snowball import finnish_snowball_stem as f

    groups = [
        ("talossa", "taloissa", "talon", "taloja"),
        ("menen", "menenkö"),
        ("hännän", "hännät"),
    ]
    for g in groups:
        stems = {f(w) for w in g}
        assert len(stems) == 1, (g, stems)


def test_finnish_snowball_among_limit_fallback():
    from lucene_net_ray.functions.snowball import _fi_among

    # the longest suffix crossing the limit is skipped for a shorter fit
    assert _fi_among("massa", ("ssa", "a"), 3) == "a"
    assert _fi_among("talossa", ("ssa", "a"), 3) == "ssa"
    assert _fi_among("xy", ("ssa", "a"), 99) is None


def test_finnish_snowball_analyzer_kind():
    from lucene_net_ray.functions.analysis import Analyzer

    a = Analyzer(kind="finnish_snowball")
    assert a("menen taloissa") == a("menenkö talossa")


# ---------------------------------------------------------------------------
# Hungarian Snowball (rule data pinned from the reference's generated
# contrib/Snowball/SF/Snowball/Ext/HungarianStemmer.cs; vectors hand-traced)
# ---------------------------------------------------------------------------


def test_hungarian_snowball_traced_vectors():
    from lucene_net_ray.functions.snowball import hungarian_snowball_stem as h

    # case endings
    assert h("házakban") == "ház"     # ban + plural ak
    assert h("kertben") == "kert"
    assert h("autóval") == "autó"
    assert h("darabonként") == "darab"  # onként distributive
    # instrum assimilation: bot+tal -> delete al, undouble tt
    assert h("bottal") == "bot"
    # possessives
    assert h("házam") == "ház"        # am sing_owner
    assert h("háza") == "ház"         # a sing_owner
    assert h("házaim") == "ház"       # aim plur_owner
    # plural
    assert h("házak") == "ház"
    assert h("emberek") == "ember"
    assert h("embereknek") == "ember"  # nek case then plural
    # á/é restoration (ák -> a needs the suffix inside R1)
    assert h("almák") == "alma"
    assert h("kezét") == "kez"         # ét case + v_ending
    # R1 guards: short words keep suffix-looking tails (among picks the
    # LONGEST match and fails on its R1 check without fallback)
    assert h("fa") == "fa"
    assert h("fák") == "fák"


def test_hungarian_snowball_conflation_groups():
    from lucene_net_ray.functions.snowball import hungarian_snowball_stem as h

    groups = [
        ("házakban", "házak", "házam", "háza", "házaim"),
        ("emberek", "embereknek"),
    ]
    for g in groups:
        stems = {h(w) for w in g}
        assert len(stems) == 1, (g, stems)


def test_hungarian_snowball_analyzer_kind():
    from lucene_net_ray.functions.analysis import Analyzer

    a = Analyzer(kind="hungarian_snowball")
    assert a("a házakban emberek") == a("a házak embereknek")


# ---------------------------------------------------------------------------
# Lovins stemmer (Lovins 1968; data pinned from the reference's
# contrib/Snowball/SF/Snowball/Ext/LovinsStemmer.cs among tables)
# ---------------------------------------------------------------------------


def test_lovins_published_examples():
    from lucene_net_ray.functions.lovins import lovins_stem as L

    # the paper's flagship conflation: magnesia / magnesite family
    assert L("magnesia") == "magnes"
    assert L("magnesite") == "magnes"
    assert L("magnesian") == "magnes"
    # transformation rules
    assert L("sitting") == "sit"        # ing removed, tt undoubled
    assert L("induction") == "induc"    # ion removed, uct -> uc
    assert L("believes") == "belief"    # es removed (E), iev -> ief
    assert L("involution") == "involut" # ion removed (Q)
    assert L("matrices") == "matric"
    # famous documented shortcoming: longest-match 'ationally' fails its
    # min-stem-3 condition and Lovins does NOT fall back to 'ally'
    assert L("nationally") == "nationally"


def test_lovins_conditions():
    from lucene_net_ray.functions.lovins import lovins_stem as L

    # E: do not remove after e ('es' ending, stem would end e)
    assert L("bees") == "bees"          # stem 'be' too short anyway (min 2: 'be' ok but ends e)
    # G: 'ication' only after f
    assert L("magnification") == "magnif"
    assert L("publication") == "publication"  # stem 'publ' does not end f
    # V: 'us' only after c
    assert L("focus") == "foc"
    assert L("virus") == "virus"
    # Y: 'eal'/'ear' only after 'in'
    assert L("lineal") == "lin"
    assert L("appeal") == "appeal"


def test_lovins_analyzer_kind():
    from lucene_net_ray.functions.analysis import Analyzer

    a = Analyzer(kind="lovins")
    assert a("sitting induction believes") == ["sit", "induc", "belief"]
    assert a("magnesia magnesite") == ["magnes", "magnes"]
