"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is normalized once,
``ray.put`` once, and every map_batches task does ONE numpy matmul per batch
against it (broadcast, never re-shipped per batch), emitting per-batch local
top-k rows; a tiny groupby(query_id) reduce keeps the global top-k. Linear
scan per batch, fully vectorized, embarrassingly parallel — the right
baseline at any corpus size.

Scale path: LSH-bucketed variant (random hyperplane signs -> bucket key);
queries probe only their own bucket (+ optional multi-probe neighbors), so
each query touches ~1/2^bits of the corpus. Approximate by construction —
verified in tests for recall against brute force, not exactness.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _as_matrix(col: pa.ChunkedArray) -> np.ndarray:
    arr = col.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _round6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6 if x >= 0 else -math.floor(-x * 1e6 + 0.5) / 1e6


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    *,
    k: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    query_ids: list[int] | None = None,
) -> list[dict]:
    """Exact cosine top-k for each query vector.

    Returns rows {query_id, rank, vec_id, cosine} sorted by
    (query_id, cosine desc, vec_id asc). Cosine computed in float64.
    """
    q = np.asarray(queries, dtype=np.float64)
    qn = _normalize(q)
    q_ref = ray.put(qn)  # broadcast once
    qids = query_ids or list(range(q.shape[0]))

    def score_batch(batch: pa.Table) -> pa.Table:
        qmat = ray.get(q_ref)
        vecs = _normalize(_as_matrix(batch.column(vec_column)))
        ids = batch.column(id_column).to_numpy()
        sims = vecs @ qmat.T  # (batch, nq)
        nq = qmat.shape[0]
        kk = min(k, sims.shape[0])
        out_q, out_id, out_sim = [], [], []
        for qi in range(nq):
            col = sims[:, qi]
            idx = np.lexsort((ids, -col))[:kk]  # local top-k, ties by vec_id
            out_q.extend([qids[qi]] * kk)
            out_id.extend(ids[idx].tolist())
            out_sim.extend(col[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "cosine": pa.array(out_sim, type=pa.float64()),
            }
        )

    partials = ds.map_batches(score_batch, batch_format="pyarrow", batch_size=4096)

    # tiny reduce: k rows per (query, batch) -> global k per query
    out: list[dict] = []
    per_q: dict[int, list] = {}
    for row in partials.iter_rows():
        per_q.setdefault(row["query_id"], []).append((row["cosine"], -row["vec_id"]))
    for qid in sorted(per_q):
        best = heapq.nlargest(k, per_q[qid])
        for rank, (sim, nid) in enumerate(best, 1):
            out.append({"query_id": qid, "rank": rank, "vec_id": -nid, "cosine": _round6(sim)})
    return out


class LshIndexStage:
    """Actor-pool stage: assign random-hyperplane LSH bucket keys.

    Hyperplanes are built once per actor from the seed (stateful init),
    applied vectorized per batch.
    """

    def __init__(self, dim: int, bits: int = 8, seed: int = 99):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((bits, dim))
        self.bits = bits

    def key_for(self, vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ self.planes.T) > 0
        return (signs.astype(np.int64) * (1 << np.arange(self.bits, dtype=np.int64))).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _as_matrix(batch.column("embedding"))
        keys = self.key_for(vecs)
        return batch.append_column("bucket", pa.array(keys, type=pa.int64()))


def lsh_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    *,
    k: int = 10,
    bits: int = 6,
    seed: int = 99,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> list[dict]:
    """Approximate cosine top-k: only the query's own LSH bucket is scanned."""
    q = np.asarray(queries, dtype=np.float64)
    dim = q.shape[1]
    stage = LshIndexStage(dim, bits=bits, seed=seed)
    bucketed = ds.map_batches(
        LshIndexStage,
        fn_constructor_kwargs={"dim": dim, "bits": bits, "seed": seed},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    qkeys = stage.key_for(q)
    wanted = pa.array(sorted({int(x) for x in qkeys}), type=pa.int64())

    def keep_wanted(batch: pa.Table) -> pa.Table:
        mask = pa.compute.is_in(batch.column("bucket"), value_set=wanted)
        return batch.filter(mask)

    sub = bucketed.map_batches(keep_wanted, batch_format="pyarrow")
    out: list[dict] = []
    qn = _normalize(q)
    rows = sub.take_all()  # bucket-filtered side is small by construction
    if not rows:
        return out
    sub_tbl = pa.Table.from_pylist(rows)
    vecs = _normalize(_as_matrix(sub_tbl.column(vec_column)))
    ids = sub_tbl.column(id_column).to_numpy()
    buckets = sub_tbl.column("bucket").to_numpy()
    for qi in range(q.shape[0]):
        mask = buckets == qkeys[qi]
        if not mask.any():
            continue
        sims = vecs[mask] @ qn[qi]
        bids = ids[mask]
        idx = np.lexsort((bids, -sims))[:k]
        for rank, j in enumerate(idx, 1):
            out.append(
                {
                    "query_id": qi,
                    "rank": rank,
                    "vec_id": int(bids[j]),
                    "cosine": _round6(float(sims[j])),
                }
            )
    return out
