"""Lossy 8-bit length-norm encoding (Lucene SmallFloat byte315) and the BM25
norm decode table.

Replicates the semantics of the reference:
  /root/reference/src/Lucene.Net.Core/Util/SmallFloat.cs:93-121
  /root/reference/src/Lucene.Net.Core/Search/Similarities/BM25Similarity.cs:111-123,150-159

The norm byte for a document field is ``FloatToByte315(boost / sqrt(fieldLength))``
with boost=1 and fieldLength = number of tokens kept after stop filtering.
BM25 decodes it back to an approximate field length through NORM_TABLE
(``1 / (Byte315ToFloat(b) ** 2)``). Two documents whose lengths quantize to the
same byte score identically — this lossiness must be preserved for
rank-identical results.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "float_to_byte315",
    "byte315_to_float",
    "encode_norm",
    "encode_norm_array",
    "NORM_TABLE",
    "BYTE315_DECODE",
    "length_bucket_table",
]


def float_to_byte315(f: float) -> int:
    """floatToByte(f, mantissaBits=3, zeroExp=15) -> unsigned byte 0..255."""
    bits = int(np.float32(f).view(np.int32))
    smallfloat = bits >> (24 - 3)
    if smallfloat <= ((63 - 15) << 3):
        return 0 if bits <= 0 else 1
    if smallfloat >= ((63 - 15) << 3) + 0x100:
        return 255
    return smallfloat - ((63 - 15) << 3)


def byte315_to_float(b: int) -> float:
    """byteToFloat(b, mantissaBits=3, zeroExponent=15); b is unsigned 0..255."""
    if b == 0:
        return 0.0
    bits = (b & 0xFF) << (24 - 3)
    bits += (63 - 15) << 24
    return float(np.int32(bits).view(np.float32))


# BM25Similarity.NORM_TABLE: decoded approximate field length per norm byte.
# NORM_TABLE[0] = 1/(0*0) = +inf in IEEE math, like the reference (float 1/0).
with np.errstate(divide="ignore"):
    NORM_TABLE = np.array(
        [np.float32(1.0) / (np.float32(byte315_to_float(i)) * np.float32(byte315_to_float(i))) for i in range(256)],
        dtype=np.float32,
    )


# TFIDFSimilarity.DecodeNormValue analog: byte -> decoded boost/sqrt(len)
# float32 (NormValueSource semantics; NORM_TABLE above is BM25's 1/decode^2).
BYTE315_DECODE = np.array([byte315_to_float(i) for i in range(256)], dtype=np.float32)


def encode_norm(field_length: int, boost: float = 1.0) -> int:
    """BM25Similarity.EncodeNormValue: byte315(boost / sqrt(fieldLength)).

    fieldLength == 0 gives boost/0 = +inf -> byte 255 (the C# cast of -1 sbyte).
    """
    with np.errstate(divide="ignore"):
        f = np.float32(boost) / np.sqrt(np.float32(field_length), dtype=np.float32)
    return float_to_byte315(float(f))


def encode_norm_array(field_lengths: np.ndarray, boost: float = 1.0) -> np.ndarray:
    """Vectorized encode_norm over an int array of field lengths -> uint8."""
    lens = np.asarray(field_lengths, dtype=np.float32)
    with np.errstate(divide="ignore"):
        f = (np.float32(boost) / np.sqrt(lens, dtype=np.float32)).astype(np.float32)
    bits = f.view(np.int32)
    smallfloat = bits >> (24 - 3)
    lo = (63 - 15) << 3
    out = (smallfloat - lo).astype(np.int64)
    out[smallfloat <= lo] = np.where(bits[smallfloat <= lo] <= 0, 0, 1)
    out[smallfloat >= lo + 0x100] = 255
    return out.astype(np.uint8)


def length_bucket_table(max_length: int = 10_000_000) -> list[tuple[int, int, int]]:
    """Ranges of integer field lengths that share a norm byte.

    Returns [(len_lo, len_hi, norm_byte), ...] covering 1..max_length, used to
    embed the byte315 quantization in standalone SQL oracles. Boundaries are
    derived from the decode table and then verified against the real encoder
    at both edges of every range.
    """
    # encode is monotone non-increasing in length; find the switch points.
    out: list[tuple[int, int, int]] = []
    lo = 1
    cur = encode_norm(1)
    length = 1
    while length <= max_length:
        b = cur
        # exponential + binary search for the last length with the same byte
        step = 1
        hi = length
        while True:
            nxt = hi + step
            if nxt > max_length or encode_norm(nxt) != b:
                break
            hi = nxt
            step *= 2
        # binary refine between hi and min(hi+step, max_length+1)
        lo_s, hi_s = hi, min(hi + step, max_length + 1)
        while lo_s + 1 < hi_s:
            mid = (lo_s + hi_s) // 2
            if encode_norm(mid) == b:
                lo_s = mid
            else:
                hi_s = mid
        out.append((lo, lo_s, b))
        length = lo_s + 1
        lo = length
        if length <= max_length:
            cur = encode_norm(length)
    return out
