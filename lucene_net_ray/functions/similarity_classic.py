"""Classic TF-IDF (Lucene DefaultSimilarity) as an alternative Similarity.

Reference: /root/reference/src/Lucene.Net.Core/Search/Similarities/DefaultSimilarity.cs:119-160
  tf         = sqrt(freq)                      (float32)
  idf        = ln(N / (df + 1)) + 1            (float32)
  lengthNorm = byte315 round-trip of 1/sqrt(fieldLength) — SAME norm byte as
               BM25, decoded with Byte315ToFloat directly
  queryWeight = idf * boost; queryNorm = 1/sqrt(sum of squared queryWeights)
  per-term doc score = tf(d) * idf * (queryWeight * queryNorm) * norm(d)
  coord       = overlap / maxOverlap, multiplied into boolean sums

Combination here is the simplified sum * coord (the reference's BS2 coordination
nest is approximated; scores are cross-checked against our own oracle, and the
point of this module is the Similarity EXTENSION surface — SURVEY.md §2.8).
"""

from __future__ import annotations

import math

import numpy as np

from .norms import byte315_to_float

# decoded lengthNorm per norm byte (float32 table, like TFIDF's NORM_TABLE)
CLASSIC_NORM_TABLE = np.array([byte315_to_float(i) for i in range(256)], dtype=np.float32)


def classic_idf(df: int, max_doc: int) -> np.float32:
    return np.float32(math.log(max_doc / (df + 1.0)) + 1.0)


def classic_tf(freq: np.ndarray) -> np.ndarray:
    return np.sqrt(freq.astype(np.float32), dtype=np.float32)


def query_norm(sum_squared_weights: float) -> np.float32:
    if sum_squared_weights <= 0:
        return np.float32(1.0)
    return np.float32(1.0 / math.sqrt(sum_squared_weights))


def coord(overlap: np.ndarray, max_overlap: int) -> np.ndarray:
    return (overlap.astype(np.float32) / np.float32(max_overlap)).astype(np.float32)


# --- SweetSpotSimilarity (reference Misc/SweetSpotSimilarity.cs) ------------
# lengthNorm plateaus at 1/sqrt(1)=1 inside [ln_min, ln_max] and falls off
# with `steepness` outside; tf has a baseline (flat then sqrt) and a
# hyperbolic variant. Our doc store keeps EXACT field lengths, so the norm is
# computed from field_len at query time instead of the byte-quantized norm
# (strictly more precise than the reference's encoded byte).


def sweetspot_length_norm(
    field_lens: np.ndarray, ln_min: int = 1, ln_max: int = 1, steepness: float = 0.5
) -> np.ndarray:
    l = field_lens.astype(np.float32)
    val = steepness * (np.abs(l - ln_min) + np.abs(l - ln_max) - (ln_max - ln_min)) + 1.0
    return (1.0 / np.sqrt(val)).astype(np.float32)


def sweetspot_baseline_tf(freq: np.ndarray, base: float = 0.0, tf_min: float = 0.0) -> np.ndarray:
    tf = freq.astype(np.float32)
    out = np.where(
        tf <= tf_min, np.float32(base), np.sqrt(tf + base * base - tf_min, dtype=np.float32)
    ).astype(np.float32)
    out[tf == 0] = np.float32(0.0)
    return out


def sweetspot_hyperbolic_tf(
    freq: np.ndarray,
    h_min: float = 0.0,
    h_max: float = 2.0,
    h_base: float = np.e,
    h_xoffset: float = 10.0,
) -> np.ndarray:
    tf = freq.astype(np.float64)
    x = tf - h_xoffset
    pb, nb = np.power(h_base, x), np.power(h_base, -x)
    out = h_min + ((h_max - h_min) / 2.0) * ((pb - nb) / (pb + nb) + 1.0)
    out = out.astype(np.float32)
    out[tf == 0] = np.float32(0.0)
    return out
