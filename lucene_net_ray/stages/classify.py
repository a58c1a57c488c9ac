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
from collections import Counter

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.analysis import Analyzer


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
        labels = batch.column(label_column).to_pylist()
        texts = batch.column(text_column).to_pylist()
        agg: Counter = Counter()
        doc_counts: Counter = Counter()
        for lbl, txt in zip(labels, texts):
            doc_counts[lbl] += 1
            for tok in analyzer(txt):
                agg[(lbl, tok)] += 1
        rows = [
            {"label": l, "token": t, "n": n} for (l, t), n in agg.items()
        ] + [{"label": l, "token": "", "n": n} for l, n in doc_counts.items()]
        return pa.Table.from_pylist(rows)

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
