"""WordDelimiterFilter + Miscellaneous filter wave vectors.

Vectors mirror the documented examples in the reference javadoc
(Analysis/Miscellaneous/WordDelimiterFilter.cs:41-87) and the
Path/Reverse/Scandinavian filter docs.
"""

from lucene_net_ray.functions.analysis_misc import (
    CodepointCountFilter,
    HyphenatedWordsFilter,
    KeepWordFilter,
    PathHierarchyAnalyzer,
    ReverseStringFilter,
    ScandinavianFoldingFilter,
    ScandinavianNormalizationFilter,
    StemmerOverrideFilter,
    TrimFilter,
)
from lucene_net_ray.functions.worddelimiter import (
    CATENATE_ALL,
    CATENATE_NUMBERS,
    CATENATE_WORDS,
    GENERATE_NUMBER_PARTS,
    GENERATE_WORD_PARTS,
    PRESERVE_ORIGINAL,
    SPLIT_ON_CASE_CHANGE,
    SPLIT_ON_NUMERICS,
    STEM_ENGLISH_POSSESSIVE,
    WordDelimiterFilter,
)

DEFAULT = (
    GENERATE_WORD_PARTS
    | GENERATE_NUMBER_PARTS
    | SPLIT_ON_CASE_CHANGE
    | SPLIT_ON_NUMERICS
    | STEM_ENGLISH_POSSESSIVE
)


def wdf(flags=DEFAULT, **kw):
    return WordDelimiterFilter(flags, **kw)


def test_intra_word_delimiters():
    assert wdf()(["Wi-Fi"]) == ["Wi", "Fi"]


def test_case_transitions():
    assert wdf()(["PowerShot"]) == ["Power", "Shot"]


def test_acronym_case_rule():
    # upper run followed by a lower char breaks before the last upper
    assert wdf()(["XLDatabase"]) == ["XL", "Database"]


def test_letter_digit_transitions():
    assert wdf()(["SD500"]) == ["SD", "500"]
    assert wdf()(["Power2Shot"]) == ["Power", "2", "Shot"]


def test_leading_trailing_delimiters_ignored():
    assert wdf()(["//hello---there,"]) == ["hello", "there"]


def test_possessive_stemming():
    assert wdf()(["O'Neil's"]) == ["O", "Neil"]
    # without the flag the s survives as a subword
    no_poss = DEFAULT & ~STEM_ENGLISH_POSSESSIVE
    assert wdf(no_poss)(["O'Neil's"]) == ["O", "Neil", "s"]


def test_no_case_split_when_flag_off():
    flags = DEFAULT & ~SPLIT_ON_CASE_CHANGE
    assert wdf(flags)(["PowerShot"]) == ["PowerShot"]


def test_no_numeric_split_when_flag_off():
    flags = DEFAULT & ~SPLIT_ON_NUMERICS
    # single mixed subword == whole token: passes through unchanged
    assert wdf(flags)(["SD500"]) == ["SD500"]


def test_catenate_words():
    flags = GENERATE_WORD_PARTS | CATENATE_WORDS
    assert wdf(flags)(["wi-fi"]) == ["wi", "fi", "wifi"]


def test_catenate_words_without_parts():
    # catenation alone: single emission of the joined run
    assert wdf(CATENATE_WORDS)(["wi-fi"]) == ["wifi"]


def test_catenate_numbers():
    flags = GENERATE_NUMBER_PARTS | CATENATE_NUMBERS
    assert wdf(flags)(["500-42"]) == ["500", "42", "50042"]


def test_catenate_all():
    flags = GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | SPLIT_ON_NUMERICS | CATENATE_ALL
    assert wdf(flags)(["wi-fi-4000"]) == ["wi", "fi", "4000", "wifi4000"]


def test_word_and_number_runs_flush_independently():
    flags = (
        GENERATE_WORD_PARTS
        | GENERATE_NUMBER_PARTS
        | CATENATE_WORDS
        | CATENATE_NUMBERS
        | SPLIT_ON_NUMERICS
    )
    # words run (wi, fi) flushes when the digits arrive
    assert wdf(flags)(["wi-fi-4000-42"]) == ["wi", "fi", "wifi", "4000", "42", "400042"]


def test_preserve_original():
    flags = DEFAULT | PRESERVE_ORIGINAL
    assert wdf(flags)(["Wi-Fi"]) == ["Wi-Fi", "Wi", "Fi"]


def test_all_delimiters_dropped_unless_preserved():
    assert wdf()(["---"]) == []
    assert wdf(DEFAULT | PRESERVE_ORIGINAL)(["---"]) == ["---"]


def test_plain_token_passthrough():
    # no delimiters, no transitions: unchanged even with no GENERATE flags
    assert wdf(0)(["hello"]) == ["hello"]


def test_protected_words_skipped():
    f = WordDelimiterFilter(DEFAULT, prot_words=frozenset(["Wi-Fi"]))
    assert f(["Wi-Fi", "Power-Shot"]) == ["Wi-Fi", "Power", "Shot"]


def test_generate_word_parts_only_drops_numbers():
    flags = GENERATE_WORD_PARTS | SPLIT_ON_NUMERICS
    assert wdf(flags)(["SD500"]) == ["SD"]


# ---------------------------------------------------------------------------
# Miscellaneous wave
# ---------------------------------------------------------------------------


def test_trim():
    assert TrimFilter()([" a ", "b", "  "]) == ["a", "b", ""]


def test_keep_word():
    assert KeepWordFilter(frozenset(["a", "c"]))(["a", "b", "c"]) == ["a", "c"]


def test_codepoint_count():
    f = CodepointCountFilter(min_cp=2, max_cp=3)
    # astral char counts as ONE code point
    assert f(["a", "ab", "abc", "abcd", "x\U0001F600"]) == ["ab", "abc", "x\U0001F600"]


def test_hyphenated_words():
    assert HyphenatedWordsFilter()(["hyphen-", "ated", "word"]) == [
        "hyphenated",
        "word",
    ]
    # trailing unpaired hyphen token: hyphen dropped
    assert HyphenatedWordsFilter()(["dangl-"]) == ["dangl"]
    # a bare hyphen is NOT a hyphenation artifact
    assert HyphenatedWordsFilter()(["-", "x"]) == ["-", "x"]


def test_scandinavian_normalization():
    f = ScandinavianNormalizationFilter()
    assert f(["räksmörgås"]) == ["ræksmørgås"]
    assert f(["raeksmoergaas"]) == ["ræksmørgås"]
    assert f(["blåbærsyltetøj"]) == ["blåbærsyltetøj"]


def test_scandinavian_folding():
    f = ScandinavianFoldingFilter()
    assert f(["räksmörgås"]) == ["raksmorgas"]
    assert f(["blåbærsyltetøj"]) == ["blabarsyltetoj"]
    assert f(["raeksmoergaas"]) == ["raksmorgas"]


def test_stemmer_override():
    f = StemmerOverrideFilter({"running": "run"})
    assert f(["running", "runner"]) == ["run", "runner"]
    assert "run" in f.protect


def test_stemmer_override_protects_from_stemmer():
    from lucene_net_ray.functions.analysis_ext import StemFilter

    ov = StemmerOverrideFilter({"mice": "mouse"})
    stem = StemFilter("porter", protected=ov.protect)
    out = stem(ov(["mice", "houses"]))
    assert out[0] == "mouse"  # not re-stemmed to 'mous'


def test_reverse_string():
    assert ReverseStringFilter()(["abc"]) == ["cba"]
    assert ReverseStringFilter(marker="\u0001")(["abc"]) == ["\u0001cba"]


def test_path_hierarchy_forward():
    a = PathHierarchyAnalyzer()
    assert a("/a/b/c") == ["/a", "/a/b", "/a/b/c"]
    assert a("a/b/c") == ["a", "a/b", "a/b/c"]


def test_path_hierarchy_skip():
    a = PathHierarchyAnalyzer(skip=1)
    assert a("/a/b/c") == ["/b", "/b/c"]


def test_path_hierarchy_replacement():
    a = PathHierarchyAnalyzer(delimiter="\\", replacement="/")
    assert a("c:\\temp\\file") == ["c:", "c:/temp", "c:/temp/file"]


def test_path_hierarchy_reverse():
    a = PathHierarchyAnalyzer(reverse=True)
    assert a("/a/b/c") == ["/a/b/c", "a/b/c", "b/c", "c"]


def test_wdf_in_chain_analyzer():
    from lucene_net_ray.functions.analysis import Analyzer
    from lucene_net_ray.functions.analysis_ext import ChainAnalyzer

    chain = ChainAnalyzer(
        base=Analyzer(kind="whitespace"),
        filters=(WordDelimiterFilter(DEFAULT),),
    )
    # whitespace base lowercases? whichever — assert via set on lowered forms
    out = chain("wi-fi powershot")
    assert "wi" in out and "fi" in out
