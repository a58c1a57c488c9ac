"""Offsets-at-index + PostingsHighlighter analog (SURVEY.md §2.7).

Reference: Postingshighlight/PostingsHighlighter.cs:91 — highlight from
stored offsets, never re-analyzing the document."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_net_ray.pipelines.build import build_index_from_table
from lucene_net_ray.pipelines.collectors import highlight, postings_highlight
from lucene_net_ray.pipelines.search import Searcher
from lucene_net_ray.query import parse_query
from lucene_net_ray.state.index import IndexMeta
from lucene_net_ray.state.segment import SegmentReader, _ws_token_char_offsets


def test_ws_token_char_offsets_vectorized():
    texts = ["  hello world ", "a", "", "tab\there\nnew", "ünïcode  txt"]
    import pyarrow.compute as pc

    ws = pc.utf8_split_whitespace(pa.array(texts))
    counts = pc.list_value_length(ws).to_numpy(zero_copy_only=False)
    s, e = _ws_token_char_offsets(texts, counts)
    # reconstruct every token by slicing; must equal Arrow's flattened split
    # exactly (including its empty edge tokens)
    flat = []
    doc_tok = np.repeat(np.arange(len(texts)), counts)
    for d, ts, te in zip(doc_tok, s, e):
        flat.append(texts[d][ts:te])
    assert flat == pc.list_flatten(ws).to_pylist()


@pytest.fixture(scope="module")
def offsets_index(tmp_path_factory):
    docs = [
        "The quick brown fox jumps. The lazy dog sleeps here. Nothing else matters now.",
        "public static void main. import java util. public class Foo extends Bar.",
        "alpha beta gamma delta. epsilon zeta eta theta.",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(docs)), type=pa.int64()), "content": docs}
    )
    idx = str(tmp_path_factory.mktemp("offidx"))
    build_index_from_table(
        tbl,
        idx,
        target_rows_per_segment=2,
        index_options="offsets",
        stored_columns=("content",),
    )
    return IndexMeta(idx), docs


def test_offsets_roundtrip_against_positions(offsets_index):
    meta, docs = offsets_index
    for seg in meta.segment_dirs:
        r = SegmentReader(seg)
        assert r.has_positions and r.has_offsets
        for term in ["public", "fox", "beta"]:
            docids, tfs, flat, occ = r.positions(term)
            for j, d in enumerate(docids):
                starts, ends = r.position_char_offsets(int(d))
                text = docs[r.doc_base + int(d)]
                for p in flat[occ[j] : occ[j + 1]]:
                    # the stored offsets must point at a ws token whose
                    # analysis contains the term
                    tok = text[starts[p] : ends[p]]
                    from lucene_net_ray.functions.analysis import Analyzer

                    assert term in Analyzer()(tok), (term, tok)


def test_postings_highlight_matches_and_wraps(offsets_index):
    meta, docs = offsets_index
    s = Searcher(meta, use_actors=False)
    q = parse_query("+public +import")
    frags = postings_highlight(s, 1, q, max_passages=3)
    assert frags, "expected passages"
    joined = " ".join(frags)
    assert "<b>public</b>" in joined and "<b>import</b>" in joined
    # wrapped substrings are exact stored tokens
    for f in frags:
        assert "<b></b>" not in f


def test_postings_highlight_no_reanalysis_needed(offsets_index):
    """The doc text reaches the highlighter only via stored fields; passages
    with no match never appear, and passage count respects the cap."""
    meta, _ = offsets_index
    s = Searcher(meta, use_actors=False)
    frags = postings_highlight(s, 0, parse_query("fox lazy"), max_passages=1)
    assert len(frags) == 1
    assert "<b>fox</b>" in frags[0] or "<b>lazy</b>" in frags[0]
    assert "Nothing else" not in frags[0]


def test_postings_highlight_parity_with_reanalyze(offsets_index):
    """Both highlighters must mark the same terms on the same doc."""
    meta, docs = offsets_index
    s = Searcher(meta, use_actors=False)
    q = parse_query("gamma epsilon")
    ph = " ".join(postings_highlight(s, 2, q, max_passages=2))
    rh = " ".join(highlight(s, docs[2], q, fragment_size=4, max_fragments=2))
    for t in ["gamma", "epsilon"]:
        assert (f"<b>{t}</b>" in ph) == (f"<b>{t}</b>" in rh)


def test_offsets_survive_merge(offsets_index, tmp_path):
    """Docs tables carry pos_start/pos_end through merge unchanged, so the
    merged layout serves offsets too."""
    meta, docs = offsets_index
    from lucene_net_ray.pipelines.merge import MergedIndexReader, merge_index

    out = str(tmp_path / "merged")
    merge_index(meta, out, bucket_size=2)
    mr = MergedIndexReader(out)
    docids, tfs, flat, occ = mr.positions("public")
    assert docids.size > 0
    # the full PostingsHighlighter path works on the merged layout too
    from lucene_net_ray.pipelines.merge import MergedSearcher

    ms = MergedSearcher(out)
    q = parse_query("+public +import")
    frags = postings_highlight(ms, 1, q, max_passages=3)
    seg = Searcher(meta, use_actors=False)
    assert frags == postings_highlight(seg, 1, q, max_passages=3)
    assert "<b>public</b>" in " ".join(frags)


def test_check_index_validates_offsets(offsets_index):
    from lucene_net_ray.state.checkindex import check_index

    meta, docs = offsets_index
    totals = check_index(meta)
    assert totals["docs"] == len(docs)
