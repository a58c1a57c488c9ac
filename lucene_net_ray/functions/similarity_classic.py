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
