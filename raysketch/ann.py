"""Similarity search over an embedding column (list<float>).

brute_force_topk   exact cosine top-k: per-batch numpy matmul against a
                   broadcast query matrix (ray.put once, read per actor),
                   local top-k per batch, tiny final merge on the driver.
ivf_topk           IVF-bucketed scale path: k-means-lite centroids (sampled,
                   seeded), vectors sharded by nearest centroid, queries
                   probe only the nprobe nearest buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from .util import pool


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(ds, vec_col: str, id_col: str,
                     queries: np.ndarray, k: int = 10,
                     concurrency: int = 4) -> pd.DataFrame:
    """(query_id, rank, vec_id, cosine) for each query row, exact.

    Scale shape: the query matrix is broadcast (ray.put) and every data
    batch computes `batch_unit @ Q.T` locally, emitting only its local
    top-k rows; the driver merges num_batches*k candidate rows per query."""
    import ray

    q_unit = _unit(np.asarray(queries, dtype=np.float64))
    qref = ray.put(q_unit)

    class TopK:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = np.stack(batch[vec_col].to_pandas().values).astype(np.float64)
            ids = np.asarray(batch[id_col])
            sim = _unit(vecs) @ self.q.T             # (n, nq)
            kk = min(k, sim.shape[0])
            top = np.argpartition(-sim, kk - 1, axis=0)[:kk]  # (kk, nq)
            nq = sim.shape[1]
            out_q = np.repeat(np.arange(nq), kk)
            out_i = top.T.reshape(-1)
            return pa.table({
                "query_id": pa.array(out_q.astype(np.int64)),
                "vec_id": pa.array(ids[out_i]),
                "cosine": pa.array(sim[out_i, out_q]),
            })

    cand = ds.map_batches(TopK, batch_format="pyarrow",
                          concurrency=pool(concurrency)).to_pandas()
    cand = cand.sort_values(["query_id", "cosine", "vec_id"],
                            ascending=[True, False, True])
    out = cand.groupby("query_id", as_index=False).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount()
    return out[["query_id", "rank", "vec_id", "cosine"]].reset_index(drop=True)


def ivf_topk(ds, vec_col: str, id_col: str, queries: np.ndarray,
             k: int = 10, n_centroids: int = 16, nprobe: int = 4,
             train_sample: int = 2048, seed: int = 11,
             concurrency: int = 4) -> pd.DataFrame:
    """Approximate top-k: vectors assigned to their nearest centroid bucket
    (the shuffle key), queries probe only `nprobe` buckets.  Centroids are
    trained driver-side on a small seeded sample (k-means, few iters) --
    the scale path where brute force's full scan is too expensive."""
    import ray

    sample = ds.random_sample(
        min(1.0, train_sample / max(1, ds.count())), seed=seed).to_pandas()
    train = _unit(np.stack(sample[vec_col].values).astype(np.float64))
    rng = np.random.default_rng(seed)
    cent = train[rng.choice(len(train), min(n_centroids, len(train)),
                            replace=False)]
    for _ in range(8):  # lloyd iterations, driver-side, tiny
        assign = np.argmax(train @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = _unit(train[m].mean(axis=0, keepdims=True))[0]
    cref = ray.put(cent)

    q_unit = _unit(np.asarray(queries, dtype=np.float64))
    q_buckets = np.argsort(-(q_unit @ cent.T), axis=1)[:, :nprobe]
    wanted = [set() for _ in range(len(cent))]
    for qi, bs in enumerate(q_buckets):
        for b in bs:
            wanted[int(b)].add(qi)
    qref = ray.put((q_unit, [np.array(sorted(w), dtype=np.int64)
                             for w in wanted]))

    class BucketTopK:
        def __init__(self):
            self.cent = ray.get(cref)
            self.q, self.wanted = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _unit(np.stack(
                batch[vec_col].to_pandas().values).astype(np.float64))
            ids = np.asarray(batch[id_col])
            assign = np.argmax(vecs @ self.cent.T, axis=1)
            outs = {"query_id": [], "vec_id": [], "cosine": []}
            for b in np.unique(assign):
                qids = self.wanted[int(b)]
                if not len(qids):
                    continue
                m = assign == b
                sim = vecs[m] @ self.q[qids].T
                kk = min(k, sim.shape[0])
                top = np.argpartition(-sim, kk - 1, axis=0)[:kk]
                for col, qi in enumerate(qids):
                    sel = top[:, col]
                    outs["query_id"].extend([int(qi)] * len(sel))
                    outs["vec_id"].extend(ids[m][sel].tolist())
                    outs["cosine"].extend(sim[sel, col].tolist())
            return pa.table({
                "query_id": pa.array(outs["query_id"], pa.int64()),
                "vec_id": pa.array(outs["vec_id"], pa.int64()),
                "cosine": pa.array(outs["cosine"], pa.float64()),
            })

    cand = ds.map_batches(BucketTopK, batch_format="pyarrow",
                          concurrency=pool(concurrency)).to_pandas()
    if not len(cand):
        return pd.DataFrame({"query_id": [], "rank": [], "vec_id": [],
                             "cosine": []})
    cand = cand.sort_values(["query_id", "cosine", "vec_id"],
                            ascending=[True, False, True])
    out = cand.groupby("query_id", as_index=False).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount()
    return out[["query_id", "rank", "vec_id", "cosine"]].reset_index(drop=True)
