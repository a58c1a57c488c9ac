"""Kraaij-Pohlmann Dutch stemmer (functions/kp.py) — clean-room analog of
the reference's contrib/Snowball/SF/Snowball/Ext/KpStemmer.cs (selected via
SnowballAnalyzer("Kp")). Vectors hand-traced through the published algorithm
rule by rule (measure marks included in comments)."""

from lucene_net_ray.functions.kp import (
    _lengthen_v,
    _measure,
    kp_stem,
)


def test_kp_measure_ij_digraph():
    # 'ij' counts as ONE vowel unit; p1/p2 mark after the closing consonant
    assert _measure("dagen") == (3, 5)        # d|a|g -> 3, e|n -> 5
    assert _measure("mijn") == (4, 4)         # m|ij|n -> 4, no second run
    assert _measure("e") == (1, 1)            # no closing consonant -> n
    assert _measure("b") == (1, 1)
    assert _measure("gegeven") == (3, 5)


def test_kp_lengthen_v():
    assert _lengthen_v("dag") == "daag"       # AOU after consonant start
    assert _lengthen_v("gegev") == "gegeev"   # e-case
    assert _lengthen_v("aardappel") == "aardappel"  # not(next AIOU non-v)
    assert _lengthen_v("dauw") == "dauw"      # final w in v_WX: no-op
    assert _lengthen_v("boot") == "boot"      # vowel before AOU: no doubling


def test_kp_traced_vectors():
    # plural/verb -en with open-syllable lengthening
    assert kp_stem("dagen") == "daag"
    assert kp_stem("spelen") == "speel"
    assert kp_stem("bomen") == "boom"
    # -en with undoubling via Step_6 (stemmed gate)
    assert kp_stem("katten") == "kat"
    # z -> s / v -> f finals (Step_6)
    assert kp_stem("huizen") == "huis"
    assert kp_stem("brieven") == "brief"
    # ge- prefix loss + Step_1c + Step_6
    assert kp_stem("gegeven") == "geef"
    # -atie -> -eer
    assert kp_stem("informatie") == "informeer"
    assert kp_stem("demonstratie") == "demonstreer"
    # -fie/-gie -> f/g + lengthen (R2)
    assert kp_stem("filosofie") == "filosoof"
    assert kp_stem("analogie") == "analoog"
    # -lijke -> -lijk (Step_2); 'lijk' itself is NOT in Step_4
    assert kp_stem("lichamelijke") == "lichamelijk"
    assert kp_stem("koninklijke") == "koninklijk"
    # heden -> heid (Step_1), heid deleted in R1 (Step_3), then the blind
    # Lose_infix removes the internal 'ge' (the algorithm's documented
    # aggressiveness — KpStemmer.cs Lose_infix has no semantic guard)
    assert kp_stem("mogelijkheden") == "molijk"
    # -en after 'nd' keeps the participle stem (branch 'nd': delete en only)
    assert kp_stem("honden") == "hond"
    # Step_3 'arij'->'aar' then Step_4 'laar'->'l' chain
    assert kp_stem("metselarij") == "metsel"
    # diminutives (Step_2 'je' branches)
    assert kp_stem("boompje") == "boom"       # mpje -> m
    # inkje -> ing (Step_2), then Step_3 'ing' deletes + lengthens: koon
    assert kp_stem("koninkje") == "koon"
    assert kp_stem("koningen") == "koon"      # conflates with the diminutive
    # plural -s with C guard
    assert kp_stem("jongens") == "jongen"
    # R1 guards keep short words intact
    assert kp_stem("de") == "de"
    assert kp_stem("en") == "en"
    assert kp_stem("appel") == "appel"


def test_kp_y_protection():
    # y after vowel is marked as consonant for all tests, restored at end
    assert kp_stem("baby") == "baby"
    out = kp_stem("mayonaise")
    assert "Y" not in out


def test_kp_conflation_groups():
    groups = [
        ("dagen", "daag"),
        ("huizen", "huis"),
        ("katten", "kat"),
    ]
    for word, stem in groups:
        assert kp_stem(word) == stem
        assert kp_stem(stem) in (stem, kp_stem(stem))  # idempotent-ish


def test_kp_analyzer_kind(tmp_path):
    from lucene_net_ray.functions.analysis import Analyzer

    a = Analyzer(kind="dutch_kp")
    assert a("de dagen katten") == a("de daag kat")


def test_kp_indexed_roundtrip(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_net_ray.functions.analysis import Analyzer
    from lucene_net_ray.pipelines.build import build_index
    from lucene_net_ray.pipelines.search import Searcher
    from lucene_net_ray.query import parse_query

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "content": [
                "de dagen van katten",
                "een dag met de kat",
                "honden en brieven",
            ],
        }
    )
    pq.write_table(docs, str(corpus / "part-0.parquet"))
    meta = build_index(
        str(corpus),
        str(tmp_path / "idx"),
        analyzer=Analyzer(kind="dutch_kp"),
        target_rows_per_segment=2,
    )
    s = Searcher(meta, use_actors=False)
    ana = Analyzer(kind="dutch_kp")
    # 'katten' and 'kat' conflate to 'kat': both docs 0 and 1 match
    hits = s.search(parse_query("katten", analyzer=ana), k=10)
    assert sorted(d for d, _ in hits) == [0, 1]
    # 'dagen' stems to 'daag' (lengthened); bare 'dag' does NOT lengthen
    # (lengthen_V only follows a suffix removal), so only doc 0 matches
    hits = s.search(parse_query("dagen", analyzer=ana), k=10)
    assert [d for d, _ in hits] == [0]
    hits = s.search(parse_query("brief", analyzer=ana), k=10)
    assert [d for d, _ in hits] == [2]
