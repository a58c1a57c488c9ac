"""Text-analysis operators for large-scale training-data pipelines.

All are batch transforms over Arrow batches (map_batches, zero-copy in),
designed to stream: no full materialization, no cross-row state. Formulas are
deliberately expressible in ANSI SQL so the driver's DuckDB oracle can verify
them value-exactly (see __ray_entry__.oracle_sql).

Operators: per-doc token counting (analyzer + whitespace + BPE-ish regex),
language ID (stopword-list n-gram heuristic), quality scoring
(length/punct/stopword ratios), and document fingerprinting (rolling hash).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.analysis import ENGLISH_STOP_WORDS, Analyzer

# A BPE-ish pre-tokenization regex (GPT-2 style, simplified to what Python re
# supports): word pieces, numbers, punctuation runs, whitespace collapsed.
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")

# Tiny seed stopword lists per language for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "is", "of", "to", "in", "a", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "se", "del", "las"),
    "de": ("der", "die", "und", "das", "ist", "von", "den", "mit", "für", "auf"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"),
}

_STOP_LIST = sorted(ENGLISH_STOP_WORDS)


def token_count_batch(batch: pa.Table, *, text_column: str = "text") -> pa.Table:
    """Per-doc token counts: whitespace, analyzer (post-stop), and BPE-ish.

    Columns out: doc id passthrough + n_ws / n_terms / n_bpe (int64).
    """
    analyzer = Analyzer()
    texts = batch.column(text_column).to_pylist()
    n_ws = [len(t.split()) for t in texts]
    n_terms = [len(analyzer(t)) for t in texts]
    n_bpe = [len(BPE_RE.findall(t)) for t in texts]
    out = {c: batch.column(c) for c in batch.column_names if c != text_column}
    out.update(
        {
            "n_ws": pa.array(n_ws, type=pa.int64()),
            "n_terms": pa.array(n_terms, type=pa.int64()),
            "n_bpe": pa.array(n_bpe, type=pa.int64()),
        }
    )
    return pa.table(out)


def lang_id_batch(batch: pa.Table, *, text_column: str = "text") -> pa.Table:
    """Heuristic language ID: argmax of per-language marker-word hit counts.

    Deterministic tie-break: higher count wins, then language code ascending;
    docs with zero hits everywhere get 'und'. SQL-expressible (the oracle
    reproduces the same counts with list_filter + the same word lists).
    """
    texts = batch.column(text_column).to_pylist()
    langs = []
    scores = []
    for t in texts:
        toks = t.split()
        best_lang, best_n = "und", 0
        for lang in sorted(LANG_MARKERS):
            n = sum(1 for w in toks if w in LANG_MARKERS[lang])
            if n > best_n:
                best_lang, best_n = lang, n
        langs.append(best_lang)
        scores.append(best_n)
    out = {c: batch.column(c) for c in batch.column_names if c != text_column}
    out["pred_lang"] = pa.array(langs, type=pa.string())
    out["marker_hits"] = pa.array(scores, type=pa.int64())
    return pa.table(out)


def quality_score_batch(batch: pa.Table, *, text_column: str = "text") -> pa.Table:
    """Quality features + score, all with SQL-parity integer/float math:

      n_chars, n_tokens (whitespace), mean_token_len = n_nonspace/n_tokens,
      stop_ratio = stopword tokens / tokens, alpha_ratio = alnum chars/chars,
      score = stop_ratio * 0.5 + least(n_tokens, 100)/100 * 0.3 + alpha_ratio * 0.2
    """
    texts = batch.column(text_column).to_pylist()
    rows = {
        "n_chars": [],
        "n_tokens": [],
        "n_stop": [],
        "n_alpha": [],
        "quality": [],
    }
    stops = ENGLISH_STOP_WORDS
    for t in texts:
        toks = t.split()
        n_chars = len(t)
        n_tokens = len(toks)
        n_stop = sum(1 for w in toks if w in stops)
        n_alpha = sum(1 for ch in t if ch.isalnum())
        stop_ratio = n_stop / n_tokens if n_tokens else 0.0
        alpha_ratio = n_alpha / n_chars if n_chars else 0.0
        score = stop_ratio * 0.5 + min(n_tokens, 100) / 100.0 * 0.3 + alpha_ratio * 0.2
        rows["n_chars"].append(n_chars)
        rows["n_tokens"].append(n_tokens)
        rows["n_stop"].append(n_stop)
        rows["n_alpha"].append(n_alpha)
        rows["quality"].append(round(score, 6))
    out = {c: batch.column(c) for c in batch.column_names if c != text_column}
    out.update(
        {
            "n_chars": pa.array(rows["n_chars"], type=pa.int64()),
            "n_tokens": pa.array(rows["n_tokens"], type=pa.int64()),
            "n_stop": pa.array(rows["n_stop"], type=pa.int64()),
            "n_alpha": pa.array(rows["n_alpha"], type=pa.int64()),
            "quality": pa.array(rows["quality"], type=pa.float64()),
        }
    )
    return pa.table(out)


FP_MOD = (1 << 61) - 1
FP_BASE = 1_000_003


def fingerprint_batch(batch: pa.Table, *, text_column: str = "text") -> pa.Table:
    """Order-sensitive document fingerprint: polynomial rolling hash over the
    whitespace token stream, mod 2^61-1. Equal texts => equal fingerprints;
    cheap pre-filter for exact dedup at scale (64-bit instead of 32-byte).
    """
    texts = batch.column(text_column).to_pylist()
    fps = []
    for t in texts:
        h = 0
        for w in t.split():
            wh = 0
            for ch in w:
                wh = (wh * 131 + ord(ch)) % FP_MOD
            h = (h * FP_BASE + wh + 1) % FP_MOD
        fps.append(h)
    out = {c: batch.column(c) for c in batch.column_names if c != text_column}
    out["fingerprint"] = pa.array(fps, type=pa.int64())
    return pa.table(out)
