"""contrib/Core Analysis.Ext analyzers (Analysis.Ext.cs): the class-doc
examples verbatim."""

import pyarrow as pa

from lucene_net_ray.functions.analysis import Analyzer


def test_unaccented_word_analyzer_reference_example():
    """UnaccentedWordAnalyzer (Analysis.Ext.cs:125-132):
    every non-letter-or-digit char separates words; lowercase + fold."""
    a = Analyzer(kind="letter_digit")
    out = a("Name.Surname@gmail.com 123.456 ğüşıöç%ĞÜŞİÖÇ$ΑΒΓΔΕΖ#АБВГДЕ SSß")
    assert out == [
        "name", "surname", "gmail", "com", "123", "456",
        "gusioc", "gusioc",
        "αβγδεζ",
        "абвгде",
        "ssss",
    ]


def test_single_char_token_analyzer_reference_example():
    """SingleCharTokenAnalyzer (Analysis.Ext.cs:31-44):
    [SomeUser@GMAIL.com 1234567890] -> one token per folded char."""
    a = Analyzer(kind="single_char")
    out = a("SomeUser@GMAIL.com 1234567890")
    assert out == list("someusergmailcom1234567890")


def test_single_char_positions_support_phrase_like_search(tmp_path):
    """The reference usage searches phrases like "gmail.com 1234" against a
    single-char index: consecutive char positions make that a phrase
    match. Build + phrase-search through the engine."""
    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import parse_query

    docs = ["SomeUser@GMAIL.com 1234567890", "other@example.org 555"]
    idx = str(tmp_path / "idx")
    build_index_from_table(
        pa.table({"content": docs}), idx,
        analyzer=Analyzer(kind="single_char"),
        index_options="positions", target_rows_per_segment=10,
    )
    s = Searcher(idx, use_actors=False)
    q = parse_query('"678"', analyzer=Analyzer(kind="single_char"))
    # chars 678 occur consecutively only in doc 0
    hits = {d for d, _ in s.search(q, k=10)}
    assert hits == {0}
    # multi-word phrase spanning the fold: "gmail.com 1234" (reference
    # usage example) — char positions run consecutively through the doc
    q2 = parse_query('"gmailcom1234"', analyzer=Analyzer(kind="single_char"))
    assert {d for d, _ in s.search(q2, k=10)} == {0}


def test_java_per_char_lowercase_final_sigma():
    """Java Character.toLowerCase is per-char: a word-final Σ lowers to σ
    (U+03C3), not Python's contextual final sigma ς (U+03C2) — index and
    query terms must agree for Greek text."""
    a = Analyzer(kind="letter_digit")
    assert a("ΝΙΚΟΣ") == ["νικοσ"]
    assert a("ΝΙΚΟΣ") == a("νικοσ")  # query side typed with plain sigma
    s = Analyzer(kind="single_char")
    assert s("ΑΣ") == ["α", "σ"]


def test_letter_digit_positions_cached_path_matches_scan():
    """analyze_positions (per-ws-token memoized path) and __call__ (whole
    text scan) agree term-for-term."""
    a = Analyzer(kind="letter_digit")
    text = "Name.Surname@gmail.com ΝΙΚΟΣ İstanbul x86_64"
    via_positions = [
        t for tok in text.split() for t in a.analyze_positions(tok)[0]
    ]
    assert via_positions == a(text)
