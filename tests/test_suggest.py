"""AnalyzingSuggester + WordBreakSpellChecker analogs."""

import pyarrow as pa
import ray.data

from lucene_net_ray.pipelines.build import build_index_from_table
from lucene_net_ray.pipelines.search import Searcher
from lucene_net_ray.pipelines.suggest import (
    AnalyzingSuggester,
    suggest_word_breaks,
    suggest_word_combinations,
)


def test_analyzing_suggester():
    rows = [
        {"suggestion": "The Big Lebowski", "weight": 90},
        {"suggestion": "Big Fish", "weight": 70},
        {"suggestion": "big trouble", "weight": 50},
        {"suggestion": "Smallville", "weight": 99},
    ]
    sg = AnalyzingSuggester(ray.data.from_items(rows))
    # 'the' is a stopword: analyzed key of "The Big Lebowski" starts with 'big'
    got = sg.lookup("big", k=3)
    assert got == [("The Big Lebowski", 90), ("Big Fish", 70), ("big trouble", 50)]
    # analyzed lookup: case/stopwords in the prefix are normalized too
    assert sg.lookup("The BIG", k=2) == [("The Big Lebowski", 90), ("Big Fish", 70)]
    assert sg.lookup("zzz") == []


def test_word_break_spellchecker(tmp_path):
    docs = ["lucene net engine", "net search engine", "whole lucenenet word here"]
    idx = str(tmp_path / "idx")
    build_index_from_table(pa.table({"content": docs}), idx)
    s = Searcher(idx, use_actors=False)
    # 'lucenenet' splits into in-dictionary 'lucene' + 'net'
    breaks = suggest_word_breaks(s, "lucenenet")
    assert breaks and breaks[0][0] == ("lucene", "net")
    # adjacent 'lucene net' combines into the in-dictionary 'lucenenet'
    combos = suggest_word_combinations(s, ["lucene", "net", "engine"])
    assert combos and combos[0][0] == "lucenenet"
    assert suggest_word_breaks(s, "qqqqqq") == []


def test_freetext_suggester_backoff():
    """FreeTextSuggester analog: highest-order context wins; unseen contexts
    back off with ALPHA; partial trailing token filters by prefix."""
    from lucene_net_ray.pipelines.suggest import FreeTextSuggester

    rows = [
        {"text": "foo bar baz"},
        {"text": "foo bar boo"},
        {"text": "foo bar baz"},
        {"text": "qux bar zap"},
    ]
    sg = FreeTextSuggester(ray.data.from_items(rows), grams=3)
    # trigram context "foo bar" -> baz (2/3) over boo (1/3)
    got = sg.lookup("foo bar ", k=3)
    assert [t for t, _ in got][:2] == ["baz", "boo"]
    assert abs(got[0][1] - 2 / 3) < 1e-9
    # zap only follows "qux bar": after "foo bar" it appears via backoff to
    # the bigram "bar *" context, weighted by ALPHA
    zap = dict(got).get("zap")
    assert zap is not None and zap < got[1][1]
    # partial token filters: "foo b" -> completions of b* after "foo"
    got2 = sg.lookup("foo b", k=5)
    assert [t for t, _ in got2][:1] == ["bar"]
    assert all(t.startswith("b") for t, _ in got2)
    # unseen context backs off to unigrams
    got3 = sg.lookup("unseen words here zz", k=2)
    assert got3 == [] or all(t.startswith("zz") for t, _ in got3)
    got4 = sg.lookup("totally unseen ", k=2)
    assert len(got4) == 2  # unigram fallback still suggests something
