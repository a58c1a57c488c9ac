"""Delta-gap + variable-byte posting-list codec with 128-doc block directories.

Semantics follow the reference's postings model (docIDs strictly increasing,
delta-gapped, variable-byte compressed, skip entry every 128 docs):
  /root/reference/src/Lucene.Net.Core/Codecs/Lucene41/Lucene41PostingsWriter.cs:309,461-481
  /root/reference/src/Lucene.Net.Core/Codecs/Lucene41/Lucene41SkipWriter.cs:68-69

Layout differs deliberately (we are not binary-compatible): each term's
postings are TWO contiguous vByte streams — doc-deltas then freqs — so decode
is fully vectorized in numpy (no interleaved parsing). The per-term block
directory carries, per 128-posting block:
  last_doc  : last (local) docID in the block          -> skip list
  doc_boff  : byte offset of the block in the doc stream
  frq_boff  : byte offset of the block in the freq stream
  max_tf    : max term frequency in the block           -> block-max WAND
  min_normb : norm byte minimizing decoded length in the block (see search)

vByte format: little-endian 7-bit groups, high bit set = continuation
(same convention as the reference's vInt, DataOutput.WriteVInt).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # Lucene41PostingsFormat.cs:376


def vbyte_encode(values: np.ndarray, lens: np.ndarray | None = None) -> np.ndarray:
    """Vectorized vByte encode of a uint64/int64 array -> uint8 array.

    Pass precomputed ``lens`` (from vbyte_lengths) to skip the length scan —
    the segment writer needs both the stream AND the per-value lengths, and
    computing them twice dominated build profiles."""
    vals = np.asarray(values, dtype=np.uint64)
    if vals.size == 0:
        return np.empty(0, dtype=np.uint8)
    if lens is None:
        lens = vbyte_lengths(vals)
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    total = int(lens.sum())
    out = np.zeros(total, dtype=np.uint8)
    max_len = int(lens.max())
    for k in range(max_len):
        mask = lens > k
        byte = ((vals[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (lens[mask] - 1 > k).astype(np.uint8) << 7
        out[offs[mask] + k] = byte | cont
    return out


def vbyte_decode(buf: np.ndarray) -> np.ndarray:
    """Vectorized vByte decode of a uint8 array -> uint64 array."""
    b = np.asarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    terminal = (b & 0x80) == 0
    ends = np.flatnonzero(terminal)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lens = ends - starts + 1
    out = np.zeros(ends.size, dtype=np.uint64)
    max_len = int(lens.max())
    for k in range(max_len):
        mask = lens > k
        out[mask] |= (b[starts[mask] + k] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * k)
    return out


def vbyte_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length of each value (for block offset computation).

    Branch-free comparison chain — one compare+add pass per 7-bit level
    actually present (no full-array shift copies)."""
    vals = np.asarray(values, dtype=np.uint64)
    lens = np.ones(vals.shape, dtype=np.int64)
    if vals.size:
        vmax = int(vals.max())
        k = 1
        while vmax >> (7 * k):
            lens += vals >= (np.uint64(1) << np.uint64(7 * k))
            k += 1
    return lens


def encode_postings(
    docids: np.ndarray, tfs: np.ndarray, norm_bytes_by_doc: np.ndarray | None = None
) -> tuple[bytes, bytes, dict[str, np.ndarray]]:
    """Encode one term's postings.

    docids: strictly increasing local docIDs (int64), tfs: int64 freqs,
    norm_bytes_by_doc: uint8 array indexed by local docID (for min_normb;
    byte315 encodes 1/sqrt(len), so max byte = min decoded length).
    Returns (doc_stream, frq_stream, blocks) where blocks is a dict of
    per-block numpy arrays (last_doc, doc_boff, frq_boff, max_tf, min_normb).
    """
    docids = np.asarray(docids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    n = docids.size
    deltas = np.empty(n, dtype=np.int64)
    if n:
        deltas[0] = docids[0]
        np.subtract(docids[1:], docids[:-1], out=deltas[1:])
    doc_stream = vbyte_encode(deltas)
    frq_stream = vbyte_encode(tfs)

    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    block_starts = np.arange(nblocks) * BLOCK_SIZE
    block_ends = np.minimum(block_starts + BLOCK_SIZE, n)
    doc_lens = vbyte_lengths(deltas)
    frq_lens = vbyte_lengths(tfs)
    doc_cum = np.concatenate(([0], np.cumsum(doc_lens)))
    frq_cum = np.concatenate(([0], np.cumsum(frq_lens)))
    last_doc = docids[block_ends - 1] if n else np.empty(0, dtype=np.int64)
    max_tf = np.array(
        [tfs[s:e].max() for s, e in zip(block_starts, block_ends)], dtype=np.int64
    )
    if norm_bytes_by_doc is not None and n:
        # byte315 encodes 1/sqrt(len): a larger byte means a smaller decoded
        # length, so the block's MAX byte gives the min decoded length — the
        # score-maximizing norm for the WAND upper bound
        nb = np.asarray(norm_bytes_by_doc, dtype=np.uint8)
        min_normb = np.array(
            [nb[docids[s:e]].max() for s, e in zip(block_starts, block_ends)],
            dtype=np.uint8,
        )
    else:
        min_normb = np.full(nblocks, 255, dtype=np.uint8)
    blocks = {
        "last_doc": last_doc.astype(np.int64),
        "doc_boff": doc_cum[block_starts].astype(np.int64),
        "frq_boff": frq_cum[block_starts].astype(np.int64),
        "max_tf": max_tf,
        "min_normb": min_normb,
    }
    return doc_stream.tobytes(), frq_stream.tobytes(), blocks


def decode_postings(doc_stream: bytes | np.ndarray, frq_stream: bytes | np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode one term's postings -> (docids int64, tfs int64)."""
    deltas = vbyte_decode(np.frombuffer(doc_stream, dtype=np.uint8)).astype(np.int64)
    docids = np.cumsum(deltas)
    tfs = vbyte_decode(np.frombuffer(frq_stream, dtype=np.uint8)).astype(np.int64)
    return docids, tfs


def splice_first_delta(doc_stream: bytes, new_first_delta: int) -> bytes:
    """Rewrite the first delta of a doc stream (O(1) merge rebase).

    Concatenating per-segment streams into a global stream only requires the
    first delta of each chunk to become (global_first_docid - prev_chunk_last);
    the rest of the bytes are reused verbatim.
    """
    b = np.frombuffer(doc_stream, dtype=np.uint8)
    if b.size == 0:
        return doc_stream
    # length of the first encoded value
    end = 0
    while b[end] & 0x80:
        end += 1
    end += 1
    head = vbyte_encode(np.array([new_first_delta], dtype=np.uint64)).tobytes()
    return head + doc_stream[end:]
