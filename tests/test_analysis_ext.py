"""Synonym / Shingle / NGram analysis extensions (pluggable chain)."""

import pyarrow as pa

from lucene_net_ray.functions.analysis import Analyzer
from lucene_net_ray.functions.analysis_ext import (
    ChainAnalyzer,
    NGramAnalyzer,
    ShingleFilter,
    SynonymFilter,
)
from lucene_net_ray.pipelines.build import build_index_from_table
from lucene_net_ray.pipelines.search import Searcher
from lucene_net_ray.query import TermQuery, parse_query


def test_synonym_filter():
    syn = SynonymFilter({"fast": ["quick", "rapid"], "car": ["auto"]})
    assert syn(["the", "fast", "car"]) == ["the", "fast", "quick", "rapid", "car", "auto"]
    rep = SynonymFilter({"fast": ["quick"]}, include_original=False)
    assert rep(["fast", "dog"]) == ["quick", "dog"]


def test_shingle_filter():
    sh = ShingleFilter(min_size=2, max_size=3)
    assert sh(["a", "b", "c"]) == ["a", "a b", "a b c", "b", "b c", "c"]
    no_uni = ShingleFilter(min_size=2, max_size=2, output_unigrams=False)
    assert no_uni(["a", "b", "c"]) == ["a b", "b c"]


def test_ngram_analyzer():
    ng = NGramAnalyzer(min_gram=2, max_gram=3)
    assert ng("AbC") == ["ab", "abc", "bc"]
    edge = NGramAnalyzer(min_gram=1, max_gram=3, edge=True)
    assert edge("Spark") == ["s", "sp", "spa"]


def test_chain_analyzer_index_and_search(tmp_path):
    """Synonym-expanded index: querying either the original term or a synonym
    hits the same docs (SynonymFilter.cs keepOrig semantics)."""
    chain = ChainAnalyzer(
        base=Analyzer(),
        filters=(SynonymFilter({"fast": ["quick"]}), ShingleFilter(min_size=2, max_size=2)),
    )
    docs = ["the fast car", "a slow bicycle", "fast trains move"]
    idx = str(tmp_path / "idx")
    meta = build_index_from_table(
        pa.table({"content": docs}), idx, analyzer=chain, target_rows_per_segment=10
    )
    s = Searcher(meta, use_actors=False)
    assert s.count(TermQuery(term="fast")) == 2
    assert s.count(TermQuery(term="quick")) == 2  # injected synonym indexed
    assert s.count(TermQuery(term="fast quick")) == 2  # shingle over injection
    assert s.count(TermQuery(term="slow bicycle")) == 1  # plain shingle
    # manifest records the chain config for add_documents compatibility
    assert s.index.manifest["analyzer"]["kind"] == "chain"


def test_ngram_index_substring_search(tmp_path):
    """NGram index: substring matching via gram terms (the NGramTokenizer
    use-case: infix search without wildcards)."""
    ng = NGramAnalyzer(min_gram=3, max_gram=3)
    docs = ["sparkling", "parquet", "nothing"]
    idx = str(tmp_path / "idx")
    meta = build_index_from_table(
        pa.table({"content": docs}), idx, analyzer=ng, target_rows_per_segment=10
    )
    s = Searcher(meta, use_actors=False)
    assert s.count(TermQuery(term="par")) == 2  # sPARkling + PARquet
    assert s.count(TermQuery(term="kli")) == 1
    assert s.count(TermQuery(term="zzz")) == 0


def test_common_grams_and_length_filter():
    from lucene_net_ray.functions.analysis_ext import CommonGramsFilter, LengthFilter

    cg = CommonGramsFilter(frozenset({"of", "the"}))
    assert cg(["flight", "of", "navigator"]) == [
        "flight", "flight_of", "of", "of_navigator", "navigator",
    ]
    lf = LengthFilter(min_len=3, max_len=5)
    assert lf(["a", "abc", "abcdef", "abcd"]) == ["abc", "abcd"]


def test_char_filters_and_chain(tmp_path):
    from lucene_net_ray.functions.analysis_ext import (
        ChainAnalyzer,
        HTMLStripCharFilter,
        MappingCharFilter,
    )

    strip = HTMLStripCharFilter()
    assert strip("<p>Hello <b>world</b> &amp; more</p>") == " Hello  world  & more "
    assert strip("<!-- note --><div a='x'>y</div>") == "  y "
    mapping = MappingCharFilter({"c++": "cplusplus", "#": "sharp"})
    assert mapping("c++ and c#") == "cplusplus and csharp"

    chain = ChainAnalyzer(char_filters=(strip, mapping))
    assert chain("<i>c++</i> code") == ["cplusplus", "code"]

    # full index round trip through the chain
    docs = ["<h1>Fast c++ engines</h1>", "plain text only"]
    idx = str(tmp_path / "idx")
    meta = build_index_from_table(pa.table({"content": docs}), idx, analyzer=chain)
    s = Searcher(meta, use_actors=False)
    assert s.count(TermQuery(term="cplusplus")) == 1
    assert s.count(TermQuery(term="h1")) == 0  # tags never indexed


def test_pattern_analyzer():
    """PatternTokenizer.cs:38 semantics: group>=0 emits matches, group==-1
    splits on the pattern."""
    from lucene_net_ray.functions.analysis_ext import PatternAnalyzer

    split = PatternAnalyzer(r"[,;]\s*")
    assert split("Foo, bar; Baz,qux") == ["foo", "bar", "baz", "qux"]
    match = PatternAnalyzer(r"[a-z]+", group=0)
    assert match("ab12cd ef") == ["ab", "cd", "ef"]
    group = PatternAnalyzer(r"'([^']+)'", group=1)
    assert group("'quoted' not 'this too'") == ["quoted", "this too"]
    # pluggable into the index build like other analyzers
    import pyarrow as pa

    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import TermQuery
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        build_index_from_table(
            pa.table({"content": ["Alpha, beta; gamma", "beta; delta"]}),
            d + "/idx",
            analyzer=split,
        )
        s = Searcher(d + "/idx", use_actors=False)
        assert {h for h, _ in s.search(TermQuery(term="beta"), k=5)} == {0, 1}


def test_dictionary_compound_filter():
    """DictionaryCompoundWordTokenFilter.cs:30: original token kept, dictionary
    subwords injected after it."""
    from lucene_net_ray.functions.analysis import Analyzer
    from lucene_net_ray.functions.analysis_ext import ChainAnalyzer, DictionaryCompoundFilter

    f = DictionaryCompoundFilter(["soft", "ball", "team", "donau", "dampf", "schiff"])
    assert f(["softballteam"]) == ["softballteam", "soft", "ball", "team"]
    assert f(["ball"]) == ["ball"]  # below min_word_size: not decomposed
    assert f(["donaudampfschiff"]) == ["donaudampfschiff", "donau", "dampf", "schiff"]
    # longest-match mode: 'soft' wins over any shorter dict entry at offset 0
    f2 = DictionaryCompoundFilter(["so", "soft"], only_longest_match=True)
    assert f2(["software"]) == ["software", "soft"]
    chain = ChainAnalyzer(base=Analyzer(stop_words=None), filters=(f,))
    assert chain("the softballteam") == ["the", "softballteam", "soft", "ball", "team"]


def test_fuzzy_suggester():
    """FuzzySuggester.cs:60: typo-tolerant prefix lookup, exact first char,
    short keys fall back to exact."""
    import ray.data

    from lucene_net_ray.pipelines.suggest import FuzzySuggester

    rows = [
        {"suggestion": "spark cluster", "weight": 90},
        {"suggestion": "sharp knife", "weight": 70},
        {"suggestion": "spork", "weight": 50},
        {"suggestion": "unrelated", "weight": 99},
    ]
    sg = FuzzySuggester(ray.data.from_items(rows), max_edits=1)
    got = sg.lookup("spork")  # 1 edit from 'spark'
    assert ("spork", 50) in got and ("spark cluster", 90) in got
    assert got[0] == ("spark cluster", 90)  # weight order, like the reference
    assert ("unrelated", 99) not in got  # first char must match
    # short key: exact prefix only
    assert sg.lookup("sp") == [("spark cluster", 90), ("spork", 50)]


def test_pattern_replace_filter():
    """PatternReplaceFilter.cs:32: per-term regex replace, first-only mode,
    empty results kept unless a LengthFilter drops them."""
    from lucene_net_ray.functions.analysis_ext import LengthFilter, PatternReplaceFilter

    f = PatternReplaceFilter(r"o+", "0")
    assert f(["foo", "book", "xyz"]) == ["f0", "b0k", "xyz"]
    first = PatternReplaceFilter(r"o", "0", all=False)
    assert first(["foo"]) == ["f0o"]
    # emptied term is kept (reference behavior); LengthFilter cleans up
    gone = PatternReplaceFilter(r".*", "")
    assert gone(["abc"]) == ["", ""] or gone(["abc"])[0] == ""
    assert LengthFilter(min_len=1)(gone(["abc"])) == []


def test_pattern_replace_char_filter():
    """PatternReplaceCharFilter.cs:36: pre-tokenization stream replace,
    composable in a ChainAnalyzer."""
    from lucene_net_ray.functions.analysis import Analyzer
    from lucene_net_ray.functions.analysis_ext import ChainAnalyzer, PatternReplaceCharFilter

    cf = PatternReplaceCharFilter(r"(\d+)-(?=\d)", r"\1")
    assert cf("call 123-456-789 now") == "call 123456789 now"
    chain = ChainAnalyzer(base=Analyzer(), char_filters=(cf,))
    assert "123456789" in chain("call 123-456-789 now")


def test_pattern_capture_group_filter():
    """PatternCaptureGroupTokenFilter.cs:50: one token per non-empty capture
    per match; preserve_original keeps the whole term, whole-term captures
    deduped; unmatched terms pass through."""
    from lucene_net_ray.functions.analysis_ext import PatternCaptureGroupFilter

    # camelCase splitter (the canonical Lucene example)
    camel = PatternCaptureGroupFilter([r"([A-Z]{2,})", r"(?<![A-Z])([A-Z][a-z]+)", r"(?:^|\b|(?<=[0-9_])|(?<=[A-Z]{2}))([a-z]+)", r"([0-9]+)"], preserve_original=True)
    assert camel(["MyFooClass"]) == ["MyFooClass", "My", "Foo", "Class"]
    # no-match passthrough (both modes)
    assert PatternCaptureGroupFilter([r"(\d+)"], preserve_original=False)(["abc"]) == ["abc"]
    # preserve_original=False emits only captures when any match
    only = PatternCaptureGroupFilter([r"([a-z]+)@([a-z]+)"], preserve_original=False)
    assert only(["user@host"]) == ["user", "host"]
    # whole-term capture skipped when preserving the original
    keep = PatternCaptureGroupFilter([r"([a-z]+)"], preserve_original=True)
    assert keep(["abc"]) == ["abc"]


def test_stem_filter_keyword_protocol():
    """SetKeywordMarkerFilter + KeywordRepeatFilter + RemoveDuplicates chain
    semantics (the reference's recommended stem-with-original chain)."""
    from lucene_net_ray.functions.analysis import Analyzer
    from lucene_net_ray.functions.analysis_ext import (
        ChainAnalyzer,
        RemoveDuplicatesFilter,
        StemFilter,
    )

    plain = StemFilter("porter")
    assert plain(["running", "flies"]) == ["run", "fli"]
    # protected words skip the stemmer
    marked = StemFilter("porter", protected={"running"})
    assert marked(["running", "flies"]) == ["running", "fli"]
    # repeat emits original + stem when they differ, stem alone otherwise
    rpt = StemFilter("porter", repeat=True)
    assert rpt(["running", "dog"]) == ["running", "run", "dog"]
    # full chain: whitespace base + repeat-stem + dedup
    chain = ChainAnalyzer(
        base=Analyzer(kind="whitespace"),
        filters=(StemFilter("porter", repeat=True), RemoveDuplicatesFilter()),
    )
    assert chain("running dog dogs") == ["running", "run", "dog", "dogs", "dog"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        StemFilter("klingon")


def test_limit_truncate_capitalization_filters():
    from lucene_net_ray.functions.analysis_ext import (
        CapitalizationFilter,
        LimitTokenCountFilter,
        TruncateTokenFilter,
    )

    assert LimitTokenCountFilter(2)(["a", "b", "c", "d"]) == ["a", "b"]
    assert LimitTokenCountFilter(10)(["a"]) == ["a"]
    assert TruncateTokenFilter(3)(["hello", "ab", "xyz"]) == ["hel", "ab", "xyz"]
    cap = CapitalizationFilter(keep={"iPhone"})
    assert cap(["hello", "WORLD", "iPhone", ""]) == ["Hello", "World", "iPhone", ""]
    import pytest as _p
    with _p.raises(ValueError):
        LimitTokenCountFilter(0)
    with _p.raises(ValueError):
        TruncateTokenFilter(0)


def test_dictionary_segmenter_thai_seam(tmp_path):
    """The Thai analyzer seam (reference Analysis/Th/ThaiAnalyzer.cs):
    dictionary segmentation plugs in as a char filter ahead of the standard
    chain, and the segmented index serves queries — proving a user-supplied
    dictionary closes the gap without engine changes."""
    import pyarrow as pa

    from lucene_net_ray.functions.analysis import Analyzer
    from lucene_net_ray.functions.analysis_ext import (
        ChainAnalyzer,
        DictionarySegmenterCharFilter,
    )

    # toy Thai lexicon: ภาษา (language) ไทย (Thai) ทดสอบ (test)
    seg = DictionarySegmenterCharFilter(["ภาษา", "ไทย", "ทดสอบ"])
    an = ChainAnalyzer(base=Analyzer(stop_words=None), char_filters=(seg,))
    assert an("ภาษาไทย") == ["ภาษา", "ไทย"]
    # mixed-script input: only the Thai run is segmented
    assert an("hello ภาษาไทยทดสอบ world") == ["hello", "ภาษา", "ไทย", "ทดสอบ", "world"]
    # characters outside the dictionary alphabet pass through untouched
    assert an("ภาษา ฽฽") == ["ภาษา", "฽฽"]

    # the seam works end-to-end: segmented docs are searchable by word
    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import TermQuery

    docs = ["ภาษาไทยทดสอบ", "ภาษาอื่น"]
    tbl = pa.table({"content": [" ".join(an(d)) for d in docs]})
    idx = str(tmp_path / "th")
    build_index_from_table(tbl, idx, target_rows_per_segment=2)
    s = Searcher(idx, use_actors=False)
    assert [d for d, _ in s.search(TermQuery(term="ไทย"), k=5)] == [0]
    assert {d for d, _ in s.search(TermQuery(term="ภาษา"), k=5)} == {0, 1}


def test_query_auto_stopword_analyzer(tmp_path):
    """df-derived stopwords (QueryAutoStopWordAnalyzer): terms above the df
    threshold vanish from query analysis; both threshold forms agree."""
    import pyarrow as pa

    from lucene_net_ray.functions.analysis_ext import query_auto_stopword_analyzer
    from lucene_net_ray.pipelines.build import build_index_from_table

    docs = [f"ubiquitous filler{i % 2} rare{i}" for i in range(50)]
    tbl = pa.table({"content": docs})
    idx = str(tmp_path / "idx")
    build_index_from_table(tbl, idx, target_rows_per_segment=20)

    an = query_auto_stopword_analyzer(idx, max_doc_freq=30)
    assert "ubiquitous" in an.auto_stop_words  # df=50 > 30
    assert "filler0" not in an.auto_stop_words  # df=25
    assert an("ubiquitous rare7 filler0") == ["rare7", "filler0"]

    an2 = query_auto_stopword_analyzer(idx, max_percent_docs=0.6)
    assert an2.auto_stop_words == an.auto_stop_words

    import pytest as _pt

    with _pt.raises(ValueError):
        query_auto_stopword_analyzer(idx)


# ---------------------------------------------------------------------------
# PositionFilter + TeeSink (reference Analysis/Position/PositionFilter.cs,
# Analysis/Sinks/TeeSinkTokenFilter.cs)
# ---------------------------------------------------------------------------


def test_position_filter_stacks_positions():
    from lucene_net_ray.functions.analysis import Analyzer
    from lucene_net_ray.functions.analysis_ext import PositionFilterAnalyzer

    a = PositionFilterAnalyzer(Analyzer())
    terms, pos = a.analyze_text_positions("quick brown fox")
    assert terms == ["quick", "brown", "fox"]
    assert pos == [0, 0, 0]  # default increment 0 stacks everything
    a2 = PositionFilterAnalyzer(Analyzer(), position_increment=5)
    _, pos2 = a2.analyze_text_positions("quick brown fox")
    assert pos2 == [0, 5, 10]
    # first token keeps the base position (stopword shifts it)
    terms3, pos3 = PositionFilterAnalyzer(Analyzer()).analyze_text_positions("the quick fox")
    assert terms3 == ["quick", "fox"] and pos3 == [1, 1]


def test_position_filter_autophrase_matches():
    # stacked positions make 'quick fox' an exact phrase at slop 0 against a
    # multi-term query analyzed through the filter
    import pyarrow as pa

    from lucene_net_ray.flexible import StandardQueryParser
    from lucene_net_ray.functions.analysis import Analyzer
    from lucene_net_ray.functions.analysis_ext import PositionFilterAnalyzer
    from lucene_net_ray.query import PhraseQuery

    a = PositionFilterAnalyzer(Analyzer())
    terms, pos = a.analyze_text_positions("quick brown fox")
    q = PhraseQuery(field="content", terms=tuple(terms), positions=tuple(pos), slop=0)
    # all positions equal -> phrase constraints collapse to co-occurrence
    assert len(set(q.positions)) == 1


def test_tee_sink_single_pass_multi_field():
    from lucene_net_ray.functions.analysis import Analyzer
    from lucene_net_ray.functions.analysis_ext import TeeSinkAnalyzer
    from lucene_net_ray.functions.stem import porter_stem

    calls = []

    class CountingAnalyzer(Analyzer):
        def __call__(self, text):
            calls.append(text)
            return super().__call__(text)

    def stem_chain(terms):
        return [porter_stem(t) for t in terms]

    def short_only(terms):
        return [t for t in terms if len(t) <= 4]

    tee = TeeSinkAnalyzer(
        CountingAnalyzer(), sinks={"stemmed": stem_chain, "short": (short_only,)}
    )
    out = tee.analyze_sinks("running dogs quickly")
    assert out["stemmed"] == ["run", "dog", "quickli"]
    assert out["short"] == ["dogs"]
    assert calls == ["running dogs quickly"]  # ONE tokenization pass
