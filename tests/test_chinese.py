"""Analysis/Cn ChineseAnalyzer analog (functions/chinese.py).

Vectors mirror the reference semantics (ChineseTokenizer.cs:112 switch,
ChineseFilter.cs:66 switch): cased-letter/digit runs buffer into one
lowercased token, every Lo char is its own token, the filter drops the
30 stop words, single ascii letters, and digit-initial tokens.
"""

from lucene_net_ray.functions.analysis import Analyzer
from lucene_net_ray.functions.chinese import (
    CHINESE_STOP_WORDS,
    chinese_filter,
    chinese_terms,
    chinese_tokens,
)


def test_han_chars_tokenize_singly():
    assert chinese_tokens("中华人民共和国") == tuple("中华人民共和国")


def test_latin_runs_buffer_and_lowercase():
    assert chinese_tokens("Hello World") == ("hello", "world")


def test_mixed_han_latin_digits():
    # digits join letter runs in the TOKENIZER; han breaks the run
    assert chinese_tokens("abc123中xyz") == ("abc123", "中", "xyz")


def test_punctuation_and_marks_break():
    assert chinese_tokens("a-b c.d") == ("a", "b", "c", "d")


def test_filter_drops_stopwords_single_letters_and_numbers():
    toks = chinese_tokens("good is a test 123 中")
    assert toks == ("good", "is", "a", "test", "123", "中")
    # 'is' stopword; 'a' single letter; '123' digit-initial; han survives
    assert chinese_filter(toks) == ("good", "test", "中")


def test_digit_initial_tokens_drop_even_with_letters():
    assert chinese_terms("123abc abc123") == ("abc123",)


def test_stop_check_precedes_length_check():
    # every stop word is >1 char; dropped by the stop table, not length
    for w in sorted(CHINESE_STOP_WORDS)[:5]:
        assert chinese_terms(w) == ()


def test_analyzer_kind_chinese():
    a = Analyzer(kind="chinese")
    assert a("我是中国人。 This is a Test.") == [
        "我", "是", "中", "国", "人", "test",
    ]  # 'this'/'is' stopwords, 'a' single letter
    terms, rels, consumed = a.analyze_positions("我是abc")
    assert terms == ("我", "是", "abc")
    assert rels == (0, 1, 2) and consumed == 3


def test_analyzer_kind_chinese_custom_stops():
    a = Analyzer(kind="chinese", stop_words=frozenset({"test"}))
    assert a("good test 中") == ["good", "中"]


def test_indexed_round_trip(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_net_ray.pipelines.build import build_index
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import PhraseQuery, TermQuery

    docs = pa.table(
        {
            "doc_id": pa.array(range(3), type=pa.int64()),
            "content": ["我是中国人", "中文 search test", "no han here"],
        }
    )
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    pq.write_table(docs, str(corpus / "part-0.parquet"))
    meta = build_index(
        str(corpus), str(tmp_path / "idx"), analyzer=Analyzer(kind="chinese"),
        target_rows_per_segment=2, index_options="positions",
    )
    s = Searcher(meta, use_actors=False)
    hits = s.search(TermQuery(field="content", term="中"), k=10)
    assert sorted(d for d, _ in hits) == [0, 1]
    # consecutive han chars are consecutive positions -> phrase matches
    ph = PhraseQuery(field="content", terms=("中", "国"), slop=0)
    assert [d for d, _ in s.search(ph, k=10)] == [0]


def test_default_stop_list_is_chinese_not_english():
    # regression: 'an'/'a'-style words are NOT in ChineseFilter's 30-word
    # list — the default must not silently fall back to the English set
    a = Analyzer(kind="chinese")
    assert a("an apple") == ["an", "apple"]
    assert a("that apple") == ["apple"]  # 'that' IS in the Chinese list


def test_whole_document_path_not_cached():
    from lucene_net_ray.functions import chinese as cn

    big = "word " * 100  # > 64 chars: must bypass the lru
    before = cn._chinese_tokens_cached.cache_info().currsize
    cn.chinese_tokens(big)
    assert cn._chinese_tokens_cached.cache_info().currsize == before


def test_java_one_to_one_lowercase():
    # 'İ'.lower() would inject a combining dot; the 1:1 map must not
    assert chinese_tokens("İstanbul") == ("istanbul",)
