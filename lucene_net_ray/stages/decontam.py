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


def decontaminate_semantic(
    ds: "ray.data.Dataset",
    bench_vectors: "np.ndarray",
    *,
    vec_column: str = "embedding",
    id_column: str = "vec_id",
    threshold: float = 0.95,
    keep_similarity: bool = True,
):
    """Embedding-level train/test decontamination: drop rows whose MAX
    cosine similarity to ANY benchmark vector reaches ``threshold`` — the
    semantic complement of the n-gram paths above (catches paraphrased
    benchmark leakage that substring/shingle matching misses).

    Scale plan: the benchmark side is the SMALL side by construction
    (eval-set embeddings) — broadcast once via ray.put, one float64 matmul
    per batch against it, a single streaming pass over the corpus; no
    shuffle, no materialization. ``keep_similarity`` appends the audit
    column max_benchmark_cos (rounded 6, half-away like DuckDB ROUND).
    Cosine is computed dot/(|a|*|b|) to mirror SQL
    list_cosine_similarity's formula."""
    import numpy as _np
    import pyarrow as _pa

    from .ann import _as_matrix

    b = _np.asarray(bench_vectors, dtype=_np.float64)
    bn = _np.linalg.norm(b, axis=1)
    bn = _np.where(bn == 0, 1.0, bn)
    b_ref = ray.put((b, bn))

    def keep(batch: _pa.Table) -> _pa.Table:
        bmat, bnorm = ray.get(b_ref)
        m = _as_matrix(batch.column(vec_column)).astype(_np.float64)
        mn = _np.linalg.norm(m, axis=1)
        mn = _np.where(mn == 0, 1.0, mn)
        cos = (m @ bmat.T) / (mn[:, None] * bnorm[None, :])
        mx = cos.max(axis=1) if bmat.shape[0] else _np.zeros(m.shape[0])
        mask = mx < threshold
        out = batch.filter(_pa.array(mask))
        if keep_similarity:
            out = out.append_column(
                "max_benchmark_cos",
                _pa.array(_np.floor(mx[mask] * 1e6 + 0.5) / 1e6),
            )
        return out

    return ds.map_batches(keep, batch_format="pyarrow")
