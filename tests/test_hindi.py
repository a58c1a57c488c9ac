"""HindiNormalizer analog + UAX#29 mark gluing in the standard grammar.

Reference: Analysis/Hi/HindiNormalizer.cs:48 (Pingali & Varma normalization
+ Larkey et al additions), Analysis/Hi/HindiAnalyzer.cs:145 chain order,
Analysis/Hi/HindiStemmer.cs. The reference's IndicNormalizationFilter
(Analysis/In/IndicNormalizer.cs:102) carries an EMPTY decompositions table
in this tree, so it contributes nothing to replicate.
"""

from lucene_net_ray.functions.analysis import Analyzer
from lucene_net_ray.functions.stem import hindi_lower, hindi_normalize, hindi_stem


def test_candrabindu_to_bindu():
    assert hindi_normalize("अँ") == "अं"


def test_dead_n_to_anusvara():
    # na + virama -> anusvara, virama consumed
    assert hindi_normalize("अन्") == "अं"


def test_nukta_deletions():
    assert hindi_normalize("\u0915\u093C") == "\u0915"  # decomposed qa (ka+nukta)
    assert hindi_normalize("\u0958") == "\u0915"  # precomposed qa
    assert hindi_normalize("ज़") == "ज"  # za -> ja
    assert hindi_normalize("ड़") == "ड"  # rra -> dda


def test_virama_and_zwj_zwnj_deleted():
    assert hindi_normalize("क्त") == "कत"
    assert hindi_normalize("क‌त") == "कत"
    assert hindi_normalize("क‍त") == "कत"


def test_chandra_vowel_replacements():
    assert hindi_normalize("ॅ") == "े"
    assert hindi_normalize("ॉ") == "ो"
    assert hindi_normalize("ऑ") == "ओ"
    assert hindi_normalize("ॲ") == "अ"


def test_long_to_short_vowels():
    assert hindi_normalize("आ") == "अ"  # AA -> A
    assert hindi_normalize("ई") == "इ"  # II -> I
    assert hindi_normalize("ी") == "ि"  # ii matra -> i matra
    assert hindi_normalize("ै") == "े"  # ai -> e
    assert hindi_normalize("ौ") == "ो"  # au -> o


def test_spelling_variants_conflate():
    # three spellings of 'English' (anusvara vs candrabindu, nukta vs not,
    # conjunct vs not) all normalize identically
    variants = ["अँगरेज़ी", "अंगरेजी", "अंग्रेज़ी"]
    outs = {hindi_normalize(v) for v in variants}
    assert outs == {"अंगरेजि"}


def test_hindi_lower_includes_case_fold():
    assert hindi_lower("ABCी") == "abcि"


def test_analyzer_chain_conflates_variants():
    a = Analyzer(kind="hindi")
    toks = a("अँगरेज़ी अंगरेजी अंग्रेज़ी")
    assert len(set(toks)) == 1 and len(toks) == 3


def test_analyzer_chain_stems_plural():
    a = Analyzer(kind="hindi")
    # plural kitaabeN (books) and singular kitaab conflate via the stemmer
    assert a("किताबें किताब") == ["किताब", "किताब"]
    # the stem runs AFTER normalization (reference chain order)
    assert hindi_stem(hindi_normalize("किताबें")) == a("किताबें")[0]


def test_marks_glue_in_standard_grammar():
    # UAX#29 Extend: matras/harakat continue the token instead of splitting
    std = Analyzer(kind="standard")
    assert std("अँगरेज़ी") == ["अँगरेज़ी"]
    assert std("كِتَابٌ") == ["كِتَابٌ"]
    # NFD Latin text stays whole too
    assert std("café") == ["café"]
    # ASCII behavior unchanged
    assert std("The quick.brown a.b.c.") == ["quick.brown", "abc"]


def test_simple_analyzer_still_splits_at_marks():
    # SimpleAnalyzer = LetterTokenizer: Character.isLetter excludes marks
    assert Analyzer(kind="simple")("caféx") == ["cafe", "x"]


def test_indexed_round_trip(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_net_ray.pipelines.build import build_index
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import TermQuery

    docs = pa.table(
        {
            "doc_id": pa.array(range(4), type=pa.int64()),
            "content": [
                "अँगरेज़ी भाषा",
                "अंगरेजी सीखना",
                "अंग्रेज़ी बोलना",
                "किताबें पढ़ना",
            ],
        }
    )
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    pq.write_table(docs, str(corpus / "part-0.parquet"))
    meta = build_index(
        str(corpus), str(tmp_path / "idx"), analyzer=Analyzer(kind="hindi"),
        target_rows_per_segment=2,
    )
    s = Searcher(meta, use_actors=False)
    # query terms go through the same chain (normalize + stem), as the
    # classic parser would do with this analyzer
    term = Analyzer(kind="hindi")("अंग्रेज़ी")[0]
    hits = s.search(TermQuery(field="content", term=term), k=10)
    assert sorted(d for d, _ in hits) == [0, 1, 2]


def test_zwnj_zwj_glue_through_tokenizer():
    # UAX#29 WB4 ignores Format/ZWJ: joiners must not split the token, so
    # the normalizer's joiner deletion is reachable (regression)
    assert Analyzer(kind="standard")("क्‌त") == ["क्‌त"]
    assert Analyzer(kind="hindi")("क्‌त") == ["कत"]
    assert Analyzer(kind="hindi")("क्‍त") == ["कत"]


def test_zwsp_still_separates_words():
    # U+200B is Cf but Word_Break=Other — it must SPLIT, unlike ZWNJ/ZWJ
    assert Analyzer(kind="standard")("foo​bar") == ["foo", "bar"]
