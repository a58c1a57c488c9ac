"""Training-set decontamination: drop documents overlapping a benchmark set.

The standard LLM-pipeline guard against test-set leakage (e.g. the GPT-3 /
PaLM appendix decontamination procedures — public methodology): a document is
contaminated when it shares an exact token n-gram with any benchmark text.

Two methods, one semantics:
  substring  exact n-gram STRINGS (space-joined token windows) are broadcast
             once and each batch drops docs containing any of them
             (pc.match_substring per gram — vectorized over the batch; gram
             count is benchmark-sized, thousands not billions). This variant
             is SQL-expressible and carries a hash-exact oracle.
  shingle    the scale path: contaminant n-grams are HASHED into one
             broadcast uint64 set, each doc's rolling shingle hashes are
             checked with np.isin — O(tokens) per doc independent of gram
             count, the right shape when the benchmark suite is large.
             Superset-of-substring semantics for full-length grams verified
             in tests (hash collisions can only over-drop, never leak);
             grams SHORTER than ngram only match in substring mode.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def contaminant_grams(texts: list[str], *, ngram: int = 8) -> list[str]:
    """One leading n-gram per benchmark text (space-joined tokens; texts
    shorter than ngram use all their tokens). Deterministic."""
    out = []
    for t in texts:
        toks = t.split(" ")
        out.append(" ".join(toks[: min(ngram, len(toks))]))
    return out


def decontaminate(
    ds: ray.data.Dataset,
    grams: list[str],
    *,
    text_column: str = "text",
    method: str = "substring",
    ngram: int = 8,
    threshold: int = 1,
) -> ray.data.Dataset:
    """Rows of ``ds`` whose text does NOT overlap the contaminant grams."""
    if method == "substring":
        grams_ref = ray.put([g for g in grams if g])

        def drop_contaminated(batch: pa.Table) -> pa.Table:
            gs = ray.get(grams_ref)
            col = batch.column(text_column)
            keep = np.ones(batch.num_rows, dtype=bool)
            for g in gs:
                keep &= ~pc.match_substring(col, g).to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(keep))

        return ds.map_batches(drop_contaminated, batch_format="pyarrow")

    if method == "shingle":
        from .dedup import MinHasher

        hasher = MinHasher(num_perm=1, shingle_size=ngram)
        # each contaminant gram is (at most) one k-window -> exactly one hash
        gram_hashes = {int(hasher.shingles(g)[0]) for g in grams if g.strip()}
        hs_ref = ray.put(np.array(sorted(gram_hashes), dtype=np.uint64))

        def drop_by_shingles(batch: pa.Table) -> pa.Table:
            hs = ray.get(hs_ref)
            keep = []
            for t in batch.column(text_column).to_pylist():
                sh = hasher.shingles(t)
                hits = int(np.isin(sh, hs).sum()) if sh.size else 0
                keep.append(hits < threshold)
            return batch.filter(pa.array(keep))

        return ds.map_batches(drop_by_shingles, batch_format="pyarrow")

    raise ValueError(f"unknown method {method!r}")
