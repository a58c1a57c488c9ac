"""EnglishAnalyzer chain: PorterStemFilter + ASCIIFoldingFilter analogs.

Porter conformance vectors are full-pipeline outputs for the example words in
Porter's 1980 paper (the paper lists per-step illustrations; these are the
end-to-end stems, cross-checked against the canonical implementation)."""

import numpy as np
import pyarrow as pa

from lucene_net_ray.functions.analysis import Analyzer
from lucene_net_ray.functions.stem import ascii_fold, porter_stem
from lucene_net_ray.pipelines.build import build_index_from_table
from lucene_net_ray.pipelines.search import Searcher
from lucene_net_ray.query import parse_query

PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "hesitanci": "hesit", "digitizer": "digit", "radicalli": "radic",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
    # full-pipeline results where the paper's per-step illustration differs
    "differentli": "differ", "electriciti": "electr", "electrical": "electr",
}


def test_porter_vectors():
    for w, expected in PORTER_VECTORS.items():
        assert porter_stem(w) == expected, (w, porter_stem(w), expected)


def test_ascii_folding():
    assert ascii_fold("naïve") == "naive"
    assert ascii_fold("café") == "cafe"
    assert ascii_fold("résumé") == "resume"
    assert ascii_fold("straße") == "strasse"
    assert ascii_fold("œuvre") == "oeuvre"
    assert ascii_fold("łódź") == "lodz"
    assert ascii_fold("ascii stays") == "ascii stays"
    assert ascii_fold("日本") == "日本"  # non-Latin untouched


def test_english_analyzer_chain():
    an = Analyzer(kind="english")
    # stopwords removed BEFORE stemming (so 'this' is dropped, not stemmed)
    assert an("the cats were motoring happily") == ["cat", "were", "motor", "happili"]
    # standard grammar still applies (possessive, acronym)
    assert an("O'Reilly's U.S.A. trains") == ["o'reilli", "usa", "train"]


def test_fold_analyzer():
    an = Analyzer(ascii_fold=True)
    assert an("naïve café résumé") == ["naive", "cafe", "resume"]
    both = Analyzer(kind="english", ascii_fold=True)
    assert both("caresses naïvely") == ["caress", "naiv"]


def test_english_index_and_search(tmp_path):
    docs = [
        "the motoring enthusiast was driving",
        "motors and engines galore",
        "completely unrelated text here",
        "she motored happily onward",
    ]
    idx = str(tmp_path / "idx")
    meta = build_index_from_table(
        pa.table({"content": docs}), idx, analyzer_kind="english", target_rows_per_segment=2
    )
    s = Searcher(meta, use_actors=False)
    an = Analyzer(kind="english")
    # query analyzed with the same chain: 'motoring' -> 'motor' matches
    # motoring / motors / motored docs
    q = parse_query("motoring", analyzer=an)
    assert s.count(q) == 3
    hits = s.search(q, k=5)
    assert {d for d, _ in hits} == {0, 1, 3}
    # fast build path == per-doc analyze (field lengths)
    import pyarrow.parquet as pq

    from lucene_net_ray.state.index import IndexMeta

    lens = []
    for d in IndexMeta(idx).segment_dirs:
        lens.extend(pq.read_table(d + "/docs.parquet", columns=["field_len"]).column("field_len").to_pylist())
    assert lens == [len(an(t)) for t in docs]


def test_english_positions_phrase(tmp_path):
    docs = ["the cats were motoring fast", "motoring cats arrive"]
    idx = str(tmp_path / "idx")
    build_index_from_table(
        pa.table({"content": docs}), idx, analyzer_kind="english",
        index_options="positions", target_rows_per_segment=10,
    )
    s = Searcher(idx, use_actors=False)
    an = Analyzer(kind="english")
    # stemmed phrase with a stopword gap: 'cats were motoring' -> cat _ motor
    q = parse_query('"cats were motoring"', analyzer=an)
    assert s.count(q) == 1
    assert s.search(q, k=2)[0][0] == 0


def test_lm_dirichlet_hand_vectors(tmp_path):
    """LM-Dirichlet parity with a hand-computed reference formula
    (LMDirichletSimilarity.cs): boost*(ln(1+tf/(mu*p_c)) + ln(mu/(dl+mu)))
    clipped at 0, p_c=(ttf+1)/(T+1), dl = byte315-decoded length."""
    import math

    from lucene_net_ray.functions.norms import NORM_TABLE
    from lucene_net_ray.pipelines.scorer import LMSegmentScorer
    from lucene_net_ray.state.index import IndexMeta
    from lucene_net_ray.state.segment import SegmentReader

    docs = ["alpha beta alpha gamma", "beta beta delta", "alpha epsilon zeta eta"]
    idx = str(tmp_path / "idx")
    meta = build_index_from_table(pa.table({"content": docs}), idx, target_rows_per_segment=10)
    reader = SegmentReader(IndexMeta(idx).segment_dirs[0])
    T = meta.sum_ttf
    stats = {"max_doc": meta.max_doc, "sum_ttf": T, "ttf": {"alpha": 3, "beta": 3}}
    sc = LMSegmentScorer(reader, stats, model="dirichlet", mu=2000.0)
    dids, scores = sc.score_term("alpha")
    assert dids.tolist() == [0, 2]
    for did, tf in zip(dids.tolist(), (2, 1)):
        dl = float(NORM_TABLE[reader.norms[did]])
        p_c = (3 + 1.0) / (T + 1.0)
        exp = max(0.0, np.float32(math.log(1 + tf / (2000.0 * p_c)) + math.log(2000.0 / (dl + 2000.0))))
        got = float(scores[dids.tolist().index(did)])
        assert np.float32(got) == np.float32(exp), (did, got, exp)
    # jelinek-mercer variant and boolean sum
    from lucene_net_ray.query import BooleanClause, BooleanQuery, TermQuery

    jm = LMSegmentScorer(reader, stats, model="jelinek_mercer", lam=0.1)
    d_j, s_j = jm.score_term("beta")
    assert d_j.tolist() == [0, 1]
    assert all(s > 0 for s in s_j.tolist())
    q = BooleanQuery(clauses=(BooleanClause(TermQuery(term="alpha"), "MUST"),
                              BooleanClause(TermQuery(term="beta"), "SHOULD")))
    docs_b, scores_b = sc.evaluate(q)
    assert docs_b.tolist() == [0, 2]
    # doc 0 gets alpha+beta, doc 2 alpha only
    assert scores_b[0] > scores_b[1]


def test_dfr_ib_hand_vectors(tmp_path):
    """DFR InL2 and IB LL-DF-H2 parity with hand-computed reference formulas
    (DFRSimilarity.cs / IBSimilarity.cs component classes)."""
    import math

    from lucene_net_ray.functions.norms import NORM_TABLE
    from lucene_net_ray.pipelines.scorer import DFRSegmentScorer, IBSegmentScorer
    from lucene_net_ray.query import BooleanClause, BooleanQuery, TermQuery
    from lucene_net_ray.state.index import IndexMeta
    from lucene_net_ray.state.segment import SegmentReader

    docs = ["alpha beta alpha gamma", "beta beta delta", "alpha epsilon zeta eta"]
    idx = str(tmp_path / "idx")
    meta = build_index_from_table(pa.table({"content": docs}), idx, target_rows_per_segment=10)
    reader = SegmentReader(IndexMeta(idx).segment_dirs[0])
    N, T = meta.max_doc, meta.sum_ttf
    avgdl = T / N
    stats = {"max_doc": N, "sum_ttf": T, "df": {"alpha": 2, "beta": 2}, "ttf": {"alpha": 3, "beta": 3}}

    dfr = DFRSegmentScorer(reader, stats, basic_model="In", after_effect="L", normalization="H2", c=1.0)
    dids, scores = dfr.score_term("alpha")
    assert dids.tolist() == [0, 2]
    for i, (did, tf) in enumerate(zip(dids.tolist(), (2, 1))):
        dl = float(NORM_TABLE[reader.norms[did]])
        tfn = tf * math.log2(1 + avgdl / dl)
        exp = np.float32((1.0 / (1.0 + tfn)) * tfn * math.log2((N + 1) / (2 + 0.5)))
        assert np.float32(scores[i]) == exp, (did, float(scores[i]), float(exp))

    ib = IBSegmentScorer(reader, stats, distribution="LL", lambda_model="DF", normalization="H2", c=1.0)
    dids, scores = ib.score_term("beta")
    assert dids.tolist() == [0, 1]
    for i, (did, tf) in enumerate(zip(dids.tolist(), (1, 2))):
        dl = float(NORM_TABLE[reader.norms[did]])
        tfn = tf * math.log2(1 + avgdl / dl)
        lam = (2 + 1.0) / (N + 1.0)
        exp = np.float32(-math.log(lam / (tfn + lam)))
        assert np.float32(scores[i]) == exp, (did, float(scores[i]), float(exp))

    # boolean algebra inherited: MUST alpha + SHOULD beta sums per doc
    q = BooleanQuery(clauses=(BooleanClause(TermQuery(term="alpha"), "MUST"),
                              BooleanClause(TermQuery(term="beta"), "SHOULD")))
    db, sb = dfr.evaluate(q)
    assert db.tolist() == [0, 2] and sb[0] > sb[1]


def test_dfr_gpdbe_hand_vectors(tmp_path):
    """DFR basic models G/P/D/Be parity with hand-computed reference formulas
    (BasicModelG.cs / BasicModelP.cs / BasicModelD.cs / BasicModelBE.cs)."""
    import math

    from lucene_net_ray.functions.norms import NORM_TABLE
    from lucene_net_ray.pipelines.scorer import DFRSegmentScorer
    from lucene_net_ray.state.index import IndexMeta
    from lucene_net_ray.state.segment import SegmentReader

    docs = ["alpha beta alpha gamma", "beta beta delta", "alpha epsilon zeta eta"]
    idx = str(tmp_path / "idx")
    meta = build_index_from_table(pa.table({"content": docs}), idx, target_rows_per_segment=10)
    reader = SegmentReader(IndexMeta(idx).segment_dirs[0])
    N, T = meta.max_doc, meta.sum_ttf
    avgdl = T / N
    stats = {"max_doc": N, "sum_ttf": T, "df": {"alpha": 2}, "ttf": {"alpha": 3}}
    ttf, df = 3, 2

    def expected(model, tf, dl):
        tfn = tf * math.log2(1 + avgdl / dl)
        F = ttf + 1.0
        if model == "G":
            lam = F / (N + F)
            info = math.log2(lam + 1.0) + tfn * math.log2((1 + lam) / lam)
        elif model == "P":
            lam = (ttf + 1.0) / (N + 1.0)
            info = (tfn * math.log2(tfn / lam)
                    + (lam + 1 / (12 * tfn) - tfn) * math.log2(math.e)
                    + 0.5 * math.log2(2 * math.pi * tfn))
        elif model == "D":
            phi = tfn / F
            nphi = 1 - phi
            p = 1.0 / (N + 1)
            Dv = phi * math.log2(phi / p) + nphi * math.log2(nphi / (1 - p))
            info = Dv * F + 0.5 * math.log2(1 + 2 * math.pi * tfn * nphi)
        else:  # Be
            def f(n, m):
                return (m + 0.5) * math.log2(n / m) + (n - m) * math.log2(n)
            info = -math.log2((N - 1) * math.e) + f(N + F - 1, N + F - tfn - 2) - f(F, F - tfn)
        return max(0.0, np.float32((1.0 / (1.0 + tfn)) * info))

    for model in ("G", "P", "D", "Be"):
        sc = DFRSegmentScorer(reader, stats, basic_model=model, after_effect="L",
                              normalization="H2", c=1.0)
        dids, scores = sc.score_term("alpha")
        assert dids.tolist() == [0, 2], model
        for i, tf in enumerate((2, 1)):
            dl = float(NORM_TABLE[reader.norms[dids[i]]])
            exp = expected(model, tf, dl)
            assert np.float32(scores[i]) == np.float32(exp), (model, float(scores[i]), exp)


def test_sweetspot_hand_vectors(tmp_path):
    """SweetSpotSimilarity parity: plateaued lengthNorm + baseline tf
    (Misc/SweetSpotSimilarity.cs ComputeLengthNorm/BaselineTf)."""
    import math

    from lucene_net_ray.pipelines.scorer import SweetSpotSegmentScorer
    from lucene_net_ray.query import TermQuery
    from lucene_net_ray.state.index import IndexMeta
    from lucene_net_ray.state.segment import SegmentReader

    docs = ["alpha beta alpha gamma", "beta beta delta", "alpha epsilon zeta eta"]
    idx = str(tmp_path / "idx")
    meta = build_index_from_table(pa.table({"content": docs}), idx, target_rows_per_segment=10)
    reader = SegmentReader(IndexMeta(idx).segment_dirs[0])
    N = meta.max_doc
    stats = {"max_doc": N, "df": {"alpha": 2}}
    sc = SweetSpotSegmentScorer(reader, stats, ln_min=3, ln_max=4, steepness=0.5)
    docs_o, scores = sc.evaluate(TermQuery(term="alpha"))
    assert docs_o.tolist() == [0, 2]
    idf = np.float32(math.log(N / (2 + 1.0)) + 1.0)
    qn = np.float32(1.0 / math.sqrt(float(np.float32(idf) * np.float32(idf))))
    for i, (tf, flen) in enumerate(((2, 4), (1, 4))):
        # lengths 4 sit inside the [3,4] plateau -> norm exactly 1
        norm = 1.0 / math.sqrt(0.5 * (abs(flen - 3) + abs(flen - 4) - 1) + 1.0)
        exp = np.float32(np.float32(math.sqrt(tf)) * idf * np.float32(idf * qn) * np.float32(norm))
        assert np.float32(scores[i]) == exp, (i, float(scores[i]), float(exp))
    # plateau: both docs have 4 terms -> norms identical and == 1
    lens = np.asarray(reader.doc_values("field_len"), dtype=np.float32)
    from lucene_net_ray.functions.similarity_classic import sweetspot_length_norm

    nn = sweetspot_length_norm(lens, 3, 4, 0.5)
    assert np.allclose(nn, 1.0)
    # hyperbolic tf variant runs and is monotone in tf
    hy = SweetSpotSegmentScorer(reader, stats, hyperbolic={"h_min": 0.0, "h_max": 2.0})
    d2, s2 = hy.evaluate(TermQuery(term="alpha"))
    assert d2.tolist() == [0, 2] and s2[0] > s2[1]


def test_language_light_stemmers():
    from lucene_net_ray.functions.stem import (
        french_minimal_stem,
        german_light_stem,
        spanish_light_stem,
    )

    # German light (Savoy): plural/case suffixes + umlaut folding
    for w, e in [("häusern", "haus"), ("kindern", "kind"), ("bücher", "buch"),
                 ("katzen", "katz"), ("hunden", "hund"), ("tages", "tag")]:
        assert german_light_stem(w) == e, w
    # Spanish light: vowel plural endings, -ces -> -z
    for w, e in [("casas", "cas"), ("veces", "vez"), ("libros", "libr"),
                 ("meses", "mes"), ("gatos", "gat"), ("gato", "gato")]:
        assert spanish_light_stem(w) == e, w
    # French minimal: -x/-aux, plural/infinitive/final-e chain, doubled letter
    for w, e in [("chevaux", "cheval"), ("maisons", "maison"), ("belles", "bel"),
                 ("manger", "mang"), ("arbres", "arbr"), ("arbre", "arbre")]:
        assert french_minimal_stem(w) == e, w


def test_language_analyzer_index(tmp_path):
    docs = ["die häusern hier", "das haus dort", "nichts relevantes"]
    idx = str(tmp_path / "idx")
    meta = build_index_from_table(
        pa.table({"content": docs}), idx,
        analyzer=Analyzer(kind="german", stop_words=frozenset({"die", "das"})),
        target_rows_per_segment=10,
    )
    s = Searcher(meta, use_actors=False)
    an = Analyzer(kind="german", stop_words=frozenset({"die", "das"}))
    # 'häusern' and 'haus' conflate
    q = parse_query("häusern", analyzer=an)
    assert s.count(q) == 2


def test_arabic_light10():
    """Arabic light10 (Analysis/Ar/ArabicStemmer.cs + ArabicNormalizer.cs):
    definite-article prefixes and attached suffixes strip; hamza/teh forms
    normalize; the كتب family conflates."""
    from lucene_net_ray.functions.stem import arabic_normalize, arabic_stem

    assert arabic_stem("الكتاب") == "كتاب"
    assert arabic_stem("والكتب") == "كتب"
    assert arabic_stem("مكتبة") == "مكتب"
    assert arabic_stem("كتابها") == "كتاب"
    assert arabic_stem("للكتاب") == "كتاب"
    assert arabic_normalize("أحمد") == "احمد"
    assert arabic_normalize("مدرسة") == "مدرسه"
    # short remainders are protected
    assert arabic_stem("وال") == "وال"
    # analyzer kind plugs in
    an = Analyzer(kind="arabic", stop_words=None)
    assert an("الكتاب والكتب") == ["كتاب", "كتب"]


def test_indonesian_stemmer():
    """Tala-algorithm vectors (Analysis/Id/IndonesianStemmer.cs:35 semantics:
    particle -> possessive -> prefix/suffix with illegal-pair flags)."""
    from lucene_net_ray.functions.stem import indonesian_stem

    vectors = {
        "bukunya": "buku", "bukukah": "buku", "menyapu": "sapu",
        "penulis": "tulis", "penyakit": "sakit", "membaca": "baca",
        "berlari": "lari", "kemampuan": "mampu", "pembangunan": "bangun",
        "belajar": "ajar", "makanan": "makan", "dimakan": "makan",
        "mengambil": "ambil",
        # illegal pair: ke- removed blocks -kan removal
        "kekurangan": "kurang",
        # syllable budget: short words untouched
        "itu": "itu",
    }
    for w, e in vectors.items():
        assert indonesian_stem(w) == e, (w, indonesian_stem(w), e)
    an = Analyzer(kind="indonesian", stop_words=None)
    assert an("membaca bukunya") == ["baca", "buku"]


def test_hindi_and_czech_stemmers():
    """HindiStemmer.cs:25 suffix table (strict len > N guards) and
    CzechStemmer.cs:30 case/possessive/palatalization semantics."""
    from lucene_net_ray.functions.stem import czech_stem, hindi_stem

    assert hindi_stem("लड़की") == "लड़क"
    assert hindi_stem("लड़कियों") == "लड़क"
    assert hindi_stem("खाना") == "खा"     # len guard: 3-char suffix needs len>4
    assert hindi_stem("घर") == "घर"       # too short to stem
    assert czech_stem("pánové") == "pán"
    assert czech_stem("městech") == "měst"
    assert czech_stem("matčin") == "matk"   # possessive then č->k
    assert czech_stem("ženami") == "žn"     # e-deletion palatalization
    assert czech_stem("prací") == "prak"
    for kind, text, probe in [("hindi", "लड़कियों", "लड़की"), ("czech", "pánové", "pán")]:
        an = Analyzer(kind=kind, stop_words=None)
        assert an(text)[0] == an(probe)[0]


def test_bulgarian_and_finnish_stemmers():
    """BulgarianStemmer.cs:36 (article/plural/е-endings) and
    FinnishLightStemmer.cs:35 (Savoy CLEF-2003) semantics."""
    from lucene_net_ray.functions.stem import bulgarian_stem, finnish_light_stem

    # Bulgarian: definite articles and plurals conflate to the stem
    assert bulgarian_stem("градът") == "град"
    assert bulgarian_stem("градове") == "град"
    assert bulgarian_stem("книгите") == "книг"
    assert bulgarian_stem("хубава") == "хубав"
    assert bulgarian_stem("ден") == "ден"  # < 4 chars: untouched
    # Finnish: case endings strip, folded vowels, kpt undoubling
    assert finnish_light_stem("taloissa") == "talo"
    assert finnish_light_stem("autoilla") == "auto"
    assert finnish_light_stem("presidentti") == "president"
    assert finnish_light_stem("pöytä") == "poy"  # norm1 strips final t
    for kind, a_, b_ in [("bulgarian", "градът", "градове"), ("finnish", "taloissa", "talo")]:
        an = Analyzer(kind=kind, stop_words=None)
        assert an(a_)[0] == an(b_)[0]


def test_hungarian_light_stemmer():
    """HungarianLightStemmer.cs:35 semantics (fold, case, possessive,
    plural, final-vowel normalize)."""
    from lucene_net_ray.functions.stem import hungarian_light_stem

    assert hungarian_light_stem("házak") == "haz"
    assert hungarian_light_stem("házban") == "haz"
    assert hungarian_light_stem("könyvek") == "konyv"
    assert hungarian_light_stem("könyvet") == "konyv"
    assert hungarian_light_stem("emberek") == "ember"
    an = Analyzer(kind="hungarian", stop_words=None)
    assert an("házak házban")[0] == an("házak házban")[1]


def test_persian_normalizer():
    from lucene_net_ray.functions.stem import persian_normalize

    assert persian_normalize("یےکۀہ") == "ييكهه"
    assert persian_normalize("هٔ") == "ه"  # hamza-above removed
    an = Analyzer(kind="persian", stop_words=None)
    assert an("کی") == ["كي"]


def test_latvian_stemmer():
    """LatvianStemmer.cs:23 semantics (affix table + unpalatalization)."""
    from lucene_net_ray.functions.stem import latvian_stem

    assert latvian_stem("cilvēkiem") == "cilvēk"
    assert latvian_stem("grāmatas") == "grāmat"
    assert latvian_stem("valodās") == "valod"
    assert latvian_stem("tirgus") == "tirg"
    assert latvian_stem("ceļu") == "cel"   # u-affix palatalizes ļ -> l
    assert latvian_stem("zem") == "zem"    # stem floor: >= 3 chars remain
    an = Analyzer(kind="latvian", stop_words=None)
    assert an("grāmatas grāmatām")[0] == an("grāmatas grāmatām")[1]


def test_sorani_stemmer():
    """SoraniNormalizer.cs + SoraniStemmer.cs semantics."""
    from lucene_net_ray.functions.stem import sorani_normalize, sorani_stem

    assert sorani_normalize("كتاب") == "کتاب"   # arabic kaf -> keheh
    assert sorani_normalize("رەش") == "ڕەش"     # initial reh -> rreh
    assert sorani_stem("پیاوەکان") == "پیاو"    # definite plural
    assert sorani_stem("پیاوان") == "پیاو"      # indefinite plural
    assert sorani_stem("پیاوێک") == "پیاو"      # indefinite singular
    an = Analyzer(kind="sorani", stop_words=None)
    assert an("پیاوەکان پیاوان")[0] == an("پیاوەکان پیاوان")[1]
