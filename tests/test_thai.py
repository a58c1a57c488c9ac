"""Out-of-the-box Thai analyzer (reference Analysis/Th/ThaiAnalyzer.cs /
ThaiTokenizer.cs): shipped default lexicon + ICU-style DP segmentation."""

import pyarrow as pa
import pytest

from lucene_net_ray.functions.thai import DEFAULT_THAI_WORDS, thai_analyzer


@pytest.mark.parametrize(
    "text,expected",
    [
        # the canonical upstream ThaiAnalyzer vector
        (
            "การที่ได้ต้องแสดงว่างานดี",
            ["การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี"],
        ),
        # the in-tree ThaiTokenizer.cs:46 probe
        ("ภาษาไทย", ["ภาษา", "ไทย"]),
        ("ผมรักภาษาไทยมาก", ["ผม", "รัก", "ภาษา", "ไทย", "มาก"]),
        ("แมวกินปลาในตลาด", ["แมว", "กิน", "ปลา", "ใน", "ตลาด"]),
    ],
)
def test_thai_conformance(text, expected):
    assert thai_analyzer()(text) == expected


def test_dp_beats_greedy_on_shadowed_boundary():
    # ว่างานดี: greedy longest-match takes ว่าง (in the lexicon) and strands
    # าน; the DP picks ว่า|งาน|ดี (no unknown chars)
    assert "ว่าง" in DEFAULT_THAI_WORDS
    assert thai_analyzer()("ว่างานดี") == ["ว่า", "งาน", "ดี"]


def test_mixed_script_only_thai_segmented():
    assert thai_analyzer()("hello ภาษาไทย world") == [
        "hello", "ภาษา", "ไทย", "world"
    ]


def test_unknown_span_passes_through():
    out = thai_analyzer()("ฤๅชาฎกภาษาไทย")
    assert out[-2:] == ["ภาษา", "ไทย"]
    assert out[0] == "ฤๅชาฎก"  # glued unknown span, one token


def test_stopwords_and_extra_words():
    an = thai_analyzer(stop_words=frozenset({"ที่", "ได้"}),
                       extra_words=("ลูเซน",))
    assert an("การที่ได้ต้องแสดงว่างานดี") == [
        "การ", "ต้อง", "แสดง", "ว่า", "งาน", "ดี"
    ]
    assert an("ลูเซนดี") == ["ลูเซน", "ดี"]


def test_indexed_round_trip(tmp_path):
    """Index unsegmented Thai without a user-supplied lexicon; a word query
    finds the doc."""
    import pyarrow.parquet as pq

    from lucene_net_ray.state.segment import build_segment

    an = thai_analyzer()
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "content": pa.array(
                ["การที่ได้ต้องแสดงว่างานดี", "ผมรักภาษาไทย"], type=pa.string()
            ),
        }
    )
    build_segment(tbl, seg_id=0, doc_base=0, out_dir=str(tmp_path), analyzer=an)
    terms = pq.read_table(str(tmp_path / "seg000000" / "terms.parquet"))
    vocab = set(terms.column("term").to_pylist())
    assert {"งาน", "ดี", "ภาษา", "ไทย"} <= vocab
    assert "ว่างานดี" not in vocab  # segmentation actually happened
