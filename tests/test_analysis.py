"""Analyzer conformance vectors derived from the jflex grammar
(StandardTokenizerImpl.jflex:97-155) + a brute-force maximal-munch oracle."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_net_ray.functions import analysis as an
from lucene_net_ray.functions.analysis import (
    Analyzer,
    analyze,
    analyze_with_positions,
    tokenize_raw,
)

# (input, expected [(token, type)]) — derived by hand from the grammar.
TOKENIZER_VECTORS = [
    ("hello world", [("hello", "<ALPHANUM>"), ("world", "<ALPHANUM>")]),
    ("U.S.A.", [("U.S.A.", "<ACRONYM>")]),
    ("U.S.A", [("U.S.A", "<HOST>")]),
    ("AT&T", [("AT&T", "<COMPANY>")]),
    ("Excite@Home", [("Excite@Home", "<COMPANY>")]),
    ("dev@example.com", [("dev@example.com", "<EMAIL>")]),
    ("System.IO.TextReader", [("System.IO.TextReader", "<HOST>")]),
    ("a.b.c", [("a.b.c", "<HOST>")]),
    ("3.14", [("3.14", "<HOST>")]),  # HOST listed before NUM, equal length
    ("x86_64", [("x86_64", "<NUM>")]),
    ("foo_bar", [("foo", "<ALPHANUM>"), ("bar", "<ALPHANUM>")]),
    ("v1.2.3", [("v1.2.3", "<HOST>")]),  # dots only -> HOST wins over NUM at equal length
    ("127.0.0.1", [("127.0.0.1", "<HOST>")]),
    ("don't", [("don't", "<APOSTROPHE>")]),
    ("O'Reilly's", [("O'Reilly's", "<APOSTROPHE>")]),
    ("i18n utf8", [("i18n", "<ALPHANUM>"), ("utf8", "<ALPHANUM>")]),
    # NUM can out-munch HOST when non-dot separators extend it
    ("1.2-a", [("1.2-a", "<NUM>")]),
    # ... and HOST out-munches NUM when dots carry further
    ("1.2.a.b", [("1.2.a.b", "<HOST>")]),
    ("src/module2/File3.cs", [("src/module2/File3", "<NUM>"), ("cs", "<ALPHANUM>")]),
    # ACRONYM_DEP -> HOST with trailing dot removed
    ("a1.b2.", [("a1.b2", "<HOST>")]),
    ("one,2", [("one,2", "<NUM>")]),
    ("quick brown-fox", [("quick", "<ALPHANUM>"), ("brown", "<ALPHANUM>"), ("fox", "<ALPHANUM>")]),
    ("", []),
    ("...", []),
]


@pytest.mark.parametrize("text,expected", TOKENIZER_VECTORS)
def test_tokenizer_vectors(text, expected):
    assert tokenize_raw(text) == expected


def test_standard_filter_and_lowercase():
    assert analyze("U.S.A.") == ["usa"]
    assert analyze("O'Reilly's") == ["o'reilly"]
    assert analyze("Don'T") == ["don't"]
    assert analyze("FooBar FOO") == ["foobar", "foo"]


def test_stop_filter_and_positions():
    toks, incrs = analyze_with_positions("the quick a fox")
    assert toks == ["quick", "fox"]
    assert incrs == [2, 2]
    toks, incrs = analyze_with_positions("quick the the the fox")
    assert incrs == [1, 4]


def test_all_33_stopwords_dropped():
    text = (
        "a an and are as at be but by for if in into is it no not of on or such "
        "that the their then there these they this to was will with"
    )
    assert analyze(text) == []


def test_max_token_length_skips_and_counts_position():
    long_tok = "x" * 256
    toks, incrs = analyze_with_positions(f"alpha {long_tok} beta")
    assert toks == ["alpha", "beta"]
    assert incrs == [1, 2]
    assert analyze("y" * 255) == ["y" * 255]


def test_field_length_is_post_stop_count():
    assert len(analyze("the quick brown fox is here")) == 4  # the/is dropped


# --- brute-force maximal-munch oracle vs the fast cluster lexer -----------

_RULES = [(t, re.compile(p + r"\Z")) for t, p in an._RULES]


def _oracle_lex(s: str):
    out = []
    i, n = 0, len(s)
    while i < n:
        best = None  # (len, priority, type)
        for length in range(n - i, 0, -1):
            seg = s[i : i + length]
            for typ, rx in _RULES:
                if rx.fullmatch(seg):
                    pri = an._PRIORITY[typ]
                    if best is None or length > best[0] or (length == best[0] and pri < best[1]):
                        if best is None or length >= best[0]:
                            best = (length, pri, typ)
            if best is not None:
                break  # longest found (scanning lengths descending)
        if best:
            out.append((s[i : i + best[0]], best[2]))
            i += best[0]
        else:
            i += 1
    return out


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=list("ab1._-/,'&@ ") + ["Z", "9"],
        min_size=0,
        max_size=18,
    )
)
def test_fast_lexer_matches_bruteforce_oracle(s):
    fast = [
        (tok, typ) if typ != "<ACRONYM_DEP>" else (tok, typ)
        for tok, typ in _concat_clusters(s)
    ]
    assert fast == _oracle_lex_text(s)


def _concat_clusters(s):
    out = []
    for m in an._CLUSTER_RE.finditer(s):
        out.extend(an._lex_cluster_uncached(m.group()))
    return out


def _oracle_lex_text(s):
    out = []
    for m in an._CLUSTER_RE.finditer(s):
        out.extend(_oracle_lex(m.group()))
    return out


def test_analyzer_kinds():
    assert Analyzer("whitespace")("The quick FOX") == ["The", "quick", "FOX"]
    assert Analyzer("simple")("Foo3Bar baz") == ["foo", "bar", "baz"]
    assert Analyzer("keyword")("The quick FOX") == ["The quick FOX"]
