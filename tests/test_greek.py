"""Greek stemmer (GreekStemmer.cs:44 — Ntais' algorithm as shipped,
including the rule-8 precedence quirk) + GreekLowerCaseFilter folding."""

import pytest

from lucene_net_ray.functions.analysis import Analyzer
from lucene_net_ray.functions.greek import greek_lowercase, greek_stem

VECTORS = {
    # rule 0 protected-stem nouns
    "καθεστωτοσ": "καθεστ", "καθεστωτα": "καθεστ", "γεγονοτα": "γεγον",
    "φωτα": "φω", "φωσ": "φωσ",  # < 4 chars: untouched
    # noun/adjective cases conflate
    "ανθρωποι": "ανθρωπ", "ανθρωπων": "ανθρωπ", "ανθρωποσ": "ανθρωπ",
    "βιβλια": "βιβλ", "βιβλιου": "βιβλ", "βιβλιων": "βιβλ",
    "ελληνικα": "ελλην", "ελληνικου": "ελλην",
    # verb forms conflate
    "γραφουμε": "γραφ", "γραφετε": "γραφ", "γραφουν": "γραφ",
    # lowercase filter folds tonos + final sigma
    "Ελληνικά": "ελλην", "φωτοσ": "φω",
    # too short: untouched (after folding)
    "και": "και",
}


@pytest.mark.parametrize("word,expect", sorted(VECTORS.items()))
def test_greek_vectors(word, expect):
    assert greek_stem(word) == expect


def test_greek_lowercase_folding():
    assert greek_lowercase("Ελληνικός") == "ελληνικοσ"
    assert greek_lowercase("ΐϊΰϋ") == "ιιυυ"


def test_greek_conflation_roundtrip(tmp_path):
    import pyarrow as pa

    from lucene_net_ray.pipelines.build import build_index_from_table
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import TermQuery
    from lucene_net_ray.state.index import IndexMeta

    an = Analyzer(kind="greek", stop_words=None)
    tbl = pa.table(
        {"doc_id": pa.array([0], type=pa.int64()),
         "content": ["τα βιβλια των ανθρωπων"]}
    )
    idx = str(tmp_path / "idx_el")
    build_index_from_table(tbl, idx, analyzer=an)
    s = Searcher(IndexMeta(idx), use_actors=False)
    term = an("βιβλιου")[0]
    hits = s.search(TermQuery(field="content", term=term), k=5)
    assert [d for d, _ in hits] == [0]
