"""Okapi BM25 exactly as the reference computes it, including float32 rounding.

Reference: /root/reference/src/Lucene.Net.Core/Search/Similarities/BM25Similarity.cs
  idf:        :68-71   ln(1 + (N - df + 0.5)/(df + 0.5)), then cast to float32
  avgdl:      :92-103  float32(sumTotalTermFreq / (double) maxDoc)
  cache[256]: :232-236 float32(k1 * ((1-b) + b * NORM_TABLE[i] / avgdl))
  weight:     :338-343 idf * queryBoost * topLevelBoost   (queryNorm ignored)
  WeightValue::259     weight * (k1 + 1)
  score:      :264-269 WeightValue * freq / (freq + cache[normByte])

All multiplies/divides happen in float32 (C# float arithmetic); we use numpy
float32 ops at the same points so scores are bit-identical run to run and
rank-identical to the reference.
"""

from __future__ import annotations

import math

import numpy as np

from .norms import NORM_TABLE

K1_DEFAULT = np.float32(1.2)
B_DEFAULT = np.float32(0.75)


def idf(df: int, max_doc: int) -> np.float32:
    """float32(ln(1 + (N - df + 0.5) / (df + 0.5)))."""
    return np.float32(math.log(1.0 + (max_doc - df + 0.5) / (df + 0.5)))


def avg_field_length(sum_total_term_freq: int, max_doc: int) -> np.float32:
    if sum_total_term_freq <= 0:
        return np.float32(1.0)
    return np.float32(sum_total_term_freq / float(max_doc))


def norm_cache(avgdl: np.float32, k1: np.float32 = K1_DEFAULT, b: np.float32 = B_DEFAULT) -> np.ndarray:
    """cache[i] = k1 * ((1 - b) + b * decode(i) / avgdl), float32 each op."""
    k1 = np.float32(k1)
    b = np.float32(b)
    dl = NORM_TABLE  # float32[256]
    with np.errstate(over="ignore", invalid="ignore"):
        cache = (k1 * ((np.float32(1.0) - b) + (b * dl).astype(np.float32) / np.float32(avgdl))).astype(np.float32)
    return cache


def term_weight_value(term_idf: np.float32, boost: float = 1.0, k1: np.float32 = K1_DEFAULT) -> np.float32:
    """weight * (k1 + 1) with weight = idf * boost (topLevelBoost folded in)."""
    w = np.float32(np.float32(term_idf) * np.float32(boost))
    return np.float32(w * (np.float32(k1) + np.float32(1.0)))


def score_tf(
    tfs: np.ndarray, norm_bytes: np.ndarray, weight_value: np.float32, cache: np.ndarray
) -> np.ndarray:
    """Vectorized per-doc term score: WeightValue * tf / (tf + cache[normb])."""
    tf32 = tfs.astype(np.float32)
    c = cache[norm_bytes]
    return ((np.float32(weight_value) * tf32) / (tf32 + c)).astype(np.float32)


def block_max_score(max_tf: np.ndarray, min_normb: np.ndarray, weight_value: np.float32, cache: np.ndarray) -> np.ndarray:
    """Upper bound on any doc's score within a block: maximize tf, minimize dl.

    tf/(tf+c) is increasing in tf and decreasing in c, so using the block's
    max tf together with the smallest cache value (largest norm byte = shortest
    decoded length... cache is increasing in decoded length dl, and dl is
    decreasing in the norm byte, so cache[max byte] is the minimum) yields a
    valid upper bound even if no single doc attains both.
    """
    tf32 = max_tf.astype(np.float32)
    c = cache[min_normb]
    return ((np.float32(weight_value) * tf32) / (tf32 + c)).astype(np.float32)
