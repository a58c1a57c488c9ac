"""Postings codec round-trip property tests, incl. block boundaries 127/128/129
(mirrors BasePostingsFormatTestCase.cs:76 randomized round-trips)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_net_ray.functions import codec


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=200))
@settings(max_examples=200, deadline=None)
def test_vbyte_round_trip(values):
    arr = np.array(values, dtype=np.uint64)
    enc = codec.vbyte_encode(arr)
    dec = codec.vbyte_decode(enc)
    assert np.array_equal(dec, arr)
    assert int(codec.vbyte_lengths(arr).sum()) == enc.size


@pytest.mark.parametrize("n", [0, 1, 2, 127, 128, 129, 255, 256, 257, 1000])
def test_postings_round_trip_block_boundaries(n):
    rng = np.random.default_rng(n)
    docids = np.sort(rng.choice(50_000, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 300, size=n).astype(np.int64)
    norms = rng.integers(1, 255, size=50_000).astype(np.uint8)
    doc_s, frq_s, blocks = codec.encode_postings(docids, tfs, norms)
    d2, t2 = codec.decode_postings(doc_s, frq_s)
    assert np.array_equal(d2, docids)
    assert np.array_equal(t2, tfs)
    nblocks = (n + 127) // 128
    assert blocks["last_doc"].size == nblocks
    for bi in range(nblocks):
        lo, hi = bi * 128, min((bi + 1) * 128, n)
        assert blocks["last_doc"][bi] == docids[hi - 1]
        assert blocks["max_tf"][bi] == tfs[lo:hi].max()
        assert blocks["min_normb"][bi] == norms[docids[lo:hi]].max()


def test_splice_first_delta():
    docids = np.array([5, 9, 300, 301], dtype=np.int64)
    tfs = np.ones(4, dtype=np.int64)
    doc_s, frq_s, _ = codec.encode_postings(docids, tfs)
    # rebase chunk as if appended after a segment whose last doc was 1000
    spliced = codec.splice_first_delta(doc_s, (1000 + 5) - 990)
    d2, _ = codec.decode_postings(np.frombuffer(spliced, dtype=np.uint8), frq_s)
    assert d2[0] == 15
    assert np.array_equal(np.diff(d2), np.diff(docids))
