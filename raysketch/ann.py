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


class IvfIndex:
    """Descriptor of a PERSISTED centroid-partitioned index: one parquet
    file per centroid bucket under index_dir (bucket_{b}.parquet holding
    (id, unit-normalized vector)), plus centroids.npy + META.json.  The
    index is built once and searched many times; each search reads ONLY
    the nprobe bucket files its queries map to -- the filter-table
    checkpoint pattern applied to ANN."""

    def __init__(self, index_dir: str, centroids: np.ndarray):
        self.index_dir = index_dir
        self.centroids = np.asarray(centroids, dtype=np.float64)

    def bucket_path(self, b: int) -> str:
        import os
        return os.path.join(self.index_dir, f"bucket_{int(b)}.parquet")

    def probe_buckets(self, queries: np.ndarray,
                      nprobe: int) -> np.ndarray:
        """(nq, nprobe) nearest-centroid bucket ids per query row."""
        q_unit = _unit(np.asarray(queries, dtype=np.float64))
        nprobe = min(nprobe, len(self.centroids))
        return np.argsort(-(q_unit @ self.centroids.T),
                          axis=1)[:, :nprobe]


def train_centroids(ds, vec_col: str, n_centroids: int = 16,
                    train_sample: int = 2048, seed: int = 11) -> np.ndarray:
    """K-means centroids from a distributed seeded sample: the sample is
    drawn cluster-side (random_sample prunes inside each block) and only
    ~train_sample rows reach the driver for the tiny Lloyd loop."""
    sample = ds.random_sample(
        min(1.0, train_sample / max(1, ds.count())), seed=seed).to_pandas()
    train = _unit(np.stack(sample[vec_col].values).astype(np.float64))
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(train))
    # k-means++ seeding (squared cosine distance): spread the initial
    # centroids instead of gambling on a uniform draw -- recall at low
    # nprobe depends directly on bucket balance
    cent = np.empty((k, train.shape[1]))
    cent[0] = train[rng.integers(len(train))]
    d2 = np.maximum(0.0, 1.0 - train @ cent[0]) ** 2
    for c in range(1, k):
        tot = d2.sum()
        if tot <= 1e-12:
            # degenerate sample (all residual directions ~identical):
            # fall back to uniform draws for the remaining seeds
            cent[c:] = train[rng.choice(len(train), k - c)]
            break
        cent[c] = train[rng.choice(len(train), p=d2 / tot)]
        d2 = np.minimum(d2, np.maximum(0.0, 1.0 - train @ cent[c]) ** 2)
    for _ in range(8):  # lloyd iterations, driver-side, tiny
        assign = np.argmax(train @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = _unit(train[m].mean(axis=0, keepdims=True))[0]
    return cent


def build_ivf_index(ds, vec_col: str, id_col: str, index_dir: str,
                    n_centroids: int = 16, train_sample: int = 2048,
                    seed: int = 11) -> IvfIndex:
    """Build + persist the IVF index: assign every vector to its nearest
    centroid (broadcast centroids, one matmul per batch), shuffle once on
    the bucket id, write each bucket atomically (tmp + rename) as its own
    parquet file.  Resumable like the filter-table checkpoint: re-running
    skips buckets whose files already exist.

    Centroids + META are committed atomically BEFORE the bucket pass, and
    a resumed build loads the persisted centroids instead of retraining
    (random_sample is block-layout/Ray-version sensitive) -- otherwise a
    crash between the two passes could silently mix bucket files from two
    centroid generations, losing recall.  META param mismatch fails loudly."""
    import json
    import os

    import pyarrow.parquet as pq
    import ray

    os.makedirs(index_dir, exist_ok=True)
    cent_path = os.path.join(index_dir, "centroids.npy")
    meta_path = os.path.join(index_dir, "META.json")
    params = {"n_centroids": n_centroids, "train_sample": train_sample,
              "seed": seed}
    if os.path.exists(meta_path):
        # META is the commit marker (written after centroids.npy): its
        # presence means centroids.npy is complete and authoritative
        with open(meta_path) as fh:
            meta = json.load(fh)
        if meta.get("params") != params:
            raise RuntimeError(
                f"IVF index at {index_dir} was built with params "
                f"{meta.get('params')}, resume requested {params}; "
                "use a fresh index_dir or matching params")
        cent = np.load(cent_path)
    else:
        leftover = [f for f in os.listdir(index_dir)
                    if f.startswith("bucket_") and f.endswith(".parquet")]
        if leftover:
            raise RuntimeError(
                f"IVF index at {index_dir} has {len(leftover)} bucket "
                "files but no committed centroids (interrupted build from "
                "an unknown centroid generation); delete the directory "
                "and rebuild")
        cent = train_centroids(ds, vec_col, n_centroids, train_sample,
                               seed)
        tmp = cent_path + f".tmp-{os.getpid()}.npy"
        np.save(tmp, cent)
        os.replace(tmp, cent_path)
        tmp = meta_path + f".tmp-{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump({"n_centroids_actual": len(cent),
                       "dim": int(cent.shape[1]), "params": params}, fh)
        os.replace(tmp, meta_path)
    cref = ray.put(cent)
    done = {int(f[len("bucket_"):-len(".parquet")])
            for f in os.listdir(index_dir)
            if f.startswith("bucket_") and f.endswith(".parquet")}

    def assign(batch: pa.Table) -> pa.Table:
        vecs = _unit(np.stack(
            batch[vec_col].to_pandas().values).astype(np.float64))
        b = np.argmax(vecs @ ray.get(cref).T, axis=1).astype(np.int32)
        keep = ~np.isin(b, np.array(sorted(done), dtype=np.int32)) \
            if done else np.ones(len(b), dtype=bool)
        return pa.table({
            "__bucket": pa.array(b),
            "id": batch[id_col],
            "unit": pa.array(list(vecs), pa.list_(pa.float64())),
        }).filter(pa.array(keep))

    def write_bucket(group: pa.Table) -> pa.Table:
        b = int(group["__bucket"][0].as_py())
        body = group.drop_columns(["__bucket"])
        final = os.path.join(index_dir, f"bucket_{b}.parquet")
        tmp = final + f".tmp-{os.getpid()}"
        pq.write_table(body, tmp)
        os.replace(tmp, final)
        return pa.table({"bucket": pa.array([b], pa.int32()),
                         "n_rows": pa.array([len(body)], pa.int64())})

    (ds.map_batches(assign, batch_format="pyarrow")
       .groupby("__bucket")
       .map_groups(write_bucket, batch_format="pyarrow")
       .materialize())
    return IvfIndex(index_dir, cent)


def load_ivf_index(index_dir: str) -> IvfIndex:
    import os
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    return IvfIndex(index_dir, cent)


def ivf_search(index: IvfIndex, queries: np.ndarray, k: int = 10,
               nprobe: int = 4, concurrency: int = 4,
               return_buckets: bool = False):
    """Approximate top-k against a persisted IVF index: reads ONLY the
    union of the queries' nprobe bucket files (read_parquet over that file
    list -- never a corpus rescan), computes per-batch local top-k for the
    queries probing each bucket, merges <= blocks*k rows on the driver."""
    import os

    import ray
    import ray.data as rd

    q_unit = _unit(np.asarray(queries, dtype=np.float64))
    q_buckets = index.probe_buckets(queries, nprobe)
    needed = sorted({int(b) for row in q_buckets for b in row
                     if os.path.exists(index.bucket_path(b))})
    empty = pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                          "rank": pd.Series([], dtype="int64"),
                          "vec_id": pd.Series([], dtype="int64"),
                          "cosine": pd.Series([], dtype="float64")})
    if not needed:
        return (empty, needed) if return_buckets else empty
    wanted = {b: np.array(sorted({qi for qi in range(len(q_buckets))
                                  if b in q_buckets[qi]}), dtype=np.int64)
              for b in needed}
    qref = ray.put((q_unit, wanted))

    def bucket_topk(batch: pa.Table) -> pa.Table:
        q, want = ray.get(qref)
        vecs = np.stack(batch["unit"].to_pandas().values)
        ids = np.asarray(batch["id"])
        buckets = np.asarray(batch["__bucket_id"])
        out_q, out_v, out_c = [], [], []
        # a rebatched block can interleave buckets after the union --
        # handle each bucket's segment separately
        for b in np.unique(buckets):
            m = buckets == b
            qids = want[int(b)]
            sim = vecs[m] @ q[qids].T
            kk = min(k, sim.shape[0])
            top = np.argpartition(-sim, kk - 1, axis=0)[:kk]
            nq = len(qids)
            out_q.append(np.repeat(qids, kk))
            out_v.append(ids[m][top.T.reshape(-1)])
            out_c.append(sim[top.T.reshape(-1),
                             np.repeat(np.arange(nq), kk)])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "cosine": pa.array(np.concatenate(out_c)),
        })

    # one dataset per bucket file, tagged with its bucket id, unioned --
    # only the nprobe'd files are ever opened
    parts = []
    for b in needed:
        parts.append(rd.read_parquet(index.bucket_path(b)).map_batches(
            lambda t, _b=b: t.append_column(
                "__bucket_id", pa.array(np.full(len(t), _b, np.int32))),
            batch_format="pyarrow"))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    cand = ds.map_batches(bucket_topk, batch_format="pyarrow").to_pandas()
    if not len(cand):
        return (empty, needed) if return_buckets else empty
    cand = cand.sort_values(["query_id", "cosine", "vec_id"],
                            ascending=[True, False, True])
    out = cand.groupby("query_id", as_index=False).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount()
    out = out[["query_id", "rank", "vec_id",
               "cosine"]].reset_index(drop=True)
    return (out, needed) if return_buckets else out


def ivf_topk(ds, vec_col: str, id_col: str, queries: np.ndarray,
             k: int = 10, n_centroids: int = 16, nprobe: int = 4,
             train_sample: int = 2048, seed: int = 11,
             concurrency: int = 4) -> pd.DataFrame:
    """One-shot IVF: build a throwaway persisted index then search it.
    Pipelines that issue many query sets should call build_ivf_index once
    and ivf_search per query set instead."""
    import shutil
    import tempfile

    index_dir = tempfile.mkdtemp(prefix="raysketch-ivf-")
    try:
        index = build_ivf_index(ds, vec_col, id_col, index_dir,
                                n_centroids, train_sample, seed)
        return ivf_search(index, queries, k, nprobe, concurrency)
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
