"""Naive Bayes text classification (SimpleNaiveBayesClassifier analog).

Reference: /root/reference/src/Lucene.Net.Classification/SimpleNaiveBayesClassifier.cs:34
— assign argmax_c log P(c) + sum_w log P(w|c) with P(c) = docCount(c)/N and
Laplace-smoothed P(w|c) = (tf(w,c)+1)/(tokens(c)+|V|). The reference pulls
the counts from index term statistics; here training is a Ray aggregation
over a labeled Dataset (per-batch pre-aggregated (label, token, n) partials
-> one groupby sum — the combiner-before-shuffle pattern), and inference is
a stateless map_batches against the broadcast model.

The model (per-class token log-likelihood tables) is assumed broadcastable —
vocab x classes. At 100 TB, cap the vocabulary (min_count / top-K by tf)
before broadcasting; the training aggregate itself never materializes rows.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.analysis import Analyzer

_NB_ANALYZE_MEMO: dict[str, tuple[str, ...]] = {}  # unique ws token -> terms


def train_naive_bayes(
    ds: ray.data.Dataset,
    *,
    text_column: str = "text",
    label_column: str = "label",
    min_count: int = 1,
) -> dict:
    """Returns the model dict: {"classes": {label: {"log_prior", "tokens",
    "counts": {token: n}}}, "vocab_size": V, "n_docs": N}."""
    analyzer = Analyzer()

    def partials(batch: pa.Table) -> pa.Table:
        # unique-token memo pattern (textstats._split_ws): StandardTokenizer
        # terms never span whitespace, so analyze each UNIQUE ws token once
        # (process-wide memo), then expand per occurrence with numpy — the
        # round-2 version re-analyzed every row in Python
        from .textstats import _split_ws

        uniq, idx, doc_idx, n = _split_ws(batch, text_column)
        memo = _NB_ANALYZE_MEMO
        tlists = []
        for u in uniq:
            v = memo.get(u)
            if v is None:
                v = tuple(analyzer(u))
                if len(memo) < 2_000_000:
                    memo[u] = v
            tlists.append(v)
        tlen = np.fromiter((len(t) for t in tlists), dtype=np.int64, count=len(tlists))
        term_to_id: dict[str, int] = {}
        flat_ids = np.empty(int(tlen.sum()), dtype=np.int64)
        pos = 0
        for ts in tlists:
            for t in ts:
                flat_ids[pos] = term_to_id.setdefault(t, len(term_to_id))
                pos += 1
        offs = np.concatenate(([0], np.cumsum(tlen)))
        occ_tlen = tlen[idx]
        total = int(occ_tlen.sum())
        excl = np.concatenate(([0], np.cumsum(occ_tlen)[:-1]))
        gather = np.repeat(offs[idx] - excl, occ_tlen) + np.arange(total, dtype=np.int64)
        occ_term = flat_ids[gather]
        occ_doc = np.repeat(doc_idx, occ_tlen)

        lab = batch.column(label_column)
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        denc = lab.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        lab_idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        lab_names = denc.dictionary.to_pylist()
        nlab, nterm = len(lab_names), len(term_to_id)

        out_lab, out_tok, out_n = [], [], []
        if nterm and occ_term.size:
            key = lab_idx[occ_doc] * nterm + occ_term
            cnt = np.bincount(key, minlength=nlab * nterm).reshape(nlab, nterm)
            terms_arr = np.empty(nterm, dtype=object)
            for t, i in term_to_id.items():
                terms_arr[i] = t
            li, ti = np.nonzero(cnt)
            out_lab = [lab_names[i] for i in li]
            out_tok = terms_arr[ti].tolist()
            out_n = cnt[li, ti].tolist()
        docs_per_lab = np.bincount(lab_idx, minlength=nlab)
        out_lab += lab_names
        out_tok += [""] * nlab
        out_n += docs_per_lab.tolist()
        return pa.table(
            {
                "label": pa.array(out_lab, type=pa.string()),
                "token": pa.array(out_tok, type=pa.string()),
                "n": pa.array(out_n, type=pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["label", "token"])
        .sum("n")
    )
    rows = counts.take_all()  # model-sized, not corpus-sized
    classes: dict = {}
    vocab: set = set()
    n_docs = 0
    for r in rows:
        lbl, tok, n = r["label"], r["token"], int(r["sum(n)"])
        cls = classes.setdefault(lbl, {"doc_count": 0, "tokens": 0, "counts": {}})
        if tok == "":
            cls["doc_count"] += n
            n_docs += n
        elif n >= min_count:
            cls["counts"][tok] = n
            cls["tokens"] += n
            vocab.add(tok)
    for lbl, cls in classes.items():
        cls["log_prior"] = math.log(cls["doc_count"] / n_docs)
    return {"classes": classes, "vocab_size": len(vocab), "n_docs": n_docs}


def nb_log_scores(model: dict, tokens: list[str]) -> dict[str, float]:
    """Per-class log score of one token list."""
    V = model["vocab_size"]
    out = {}
    for lbl, cls in model["classes"].items():
        denom = cls["tokens"] + V
        s = cls["log_prior"]
        counts = cls["counts"]
        for t in tokens:
            s += math.log((counts.get(t, 0) + 1.0) / denom)
        out[lbl] = s
    return out


def classify_dataset(
    ds: ray.data.Dataset,
    model: dict,
    *,
    text_column: str = "text",
) -> ray.data.Dataset:
    """Adds ``pred_label`` (argmax class; ties broken by label asc)."""
    model_ref = ray.put(model)
    analyzer = Analyzer()

    def predict(batch: pa.Table) -> pa.Table:
        m = ray.get(model_ref)
        preds = []
        for txt in batch.column(text_column).to_pylist():
            scores = nb_log_scores(m, analyzer(txt))
            best = max(sorted(scores), key=lambda l: scores[l])
            preds.append(best)
        return batch.append_column("pred_label", pa.array(preds, type=pa.string()))

    return ds.map_batches(predict, batch_format="pyarrow")
