"""Deduplication operators for training-data pipelines.

Beyond the reference's exact sort+dedup contract (src/bench.zig:258-297),
these are the large-scale operators a 100TB text pipeline needs:

  exact_dedup        hash-partitioned exact dedup, first-writer-wins
  minhash_lsh_pairs  MinHash + banded LSH near-duplicate candidate pairs,
                     verified by signature similarity (n-gram Jaccard est.)
  simhash_pairs      64-bit SimHash, pigeonhole banding, Hamming verify
  embedding_neardup_pairs  cosine near-duplicates over embedding vectors

Shapes: per-batch vectorized signature computation (stateless map_batches)
-> explode to (bucket_key, doc_id) rows (the ONLY shuffled payload)
-> groupby(bucket).map_groups emitting candidate pairs
-> verify with broadcast signatures of the (small) candidate set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import U64, hash_bytes_u64, hash_strings, murmur64a_u64
from .util import pool

_MERSENNE61 = (1 << 61) - 1


def exact_dedup(ds, col: str, id_col: str):
    """Rows whose `id_col` is the minimum within each exact-`col` group.

    Scale shape: shuffle only (content_hash: u64, id: i64); winners are
    broadcast back as a filter over the full dataset, so wide columns never
    cross the exchange."""
    import ray
    from ray.data.aggregate import Min

    def project(batch: pa.Table) -> pa.Table:
        # int64 view of the u64 hash: Ray's aggregate re-emits group keys as
        # Python ints, and values above 2^63 overflow Arrow int64 inference
        # (falls back to pickled object blocks) -- the signed view is a
        # bijection so dedup semantics are unchanged
        return pa.table({
            "h": pa.array(hash_strings(batch[col]).view(np.int64), pa.int64()),
            "id": batch[id_col],
        })

    winners = (ds.map_batches(project, batch_format="pyarrow")
                 .groupby("h").aggregate(Min("id", alias_name="min_id")))
    winner_ids = np.sort(np.concatenate(
        [np.asarray(b["min_id"]) for b in
         winners.iter_batches(batch_format="pyarrow")] or
        [np.zeros(0, dtype=np.int64)]))
    ref = ray.put(winner_ids)

    def keep(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col])
        w = ray.get(ref)
        idx = np.searchsorted(w, ids)
        idx = np.clip(idx, 0, max(0, len(w) - 1))
        mask = (len(w) > 0) & (w[idx] == ids)
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _char_shingle_hashes(texts: list[bytes], k: int):
    """Concatenated deduped k-byte-shingle hashes per doc + start offsets.

    Fully vectorized across the whole batch: one concatenated byte buffer,
    one sliding-window FNV pass, windows crossing document boundaries
    masked out, per-doc dedup via a single lexsort + adjacent-unique scan
    (same output as per-doc np.unique: hashes sorted ascending per doc).
    Documents shorter than k get the zero-padded single shingle, matching
    the previous per-doc path."""
    n_docs = len(texts)
    if n_docs == 0:
        return np.zeros(0, dtype=U64), np.zeros(1, dtype=np.int64)
    padded = [t if len(t) >= k else t.ljust(k, b"\0") for t in texts]
    lens = np.array([len(t) for t in padded], dtype=np.int64)
    buf = np.frombuffer(b"".join(padded), dtype=np.uint8)
    doc_start = np.concatenate([[0], np.cumsum(lens)[:-1]])
    if len(buf) < k:
        buf = np.concatenate([buf, np.zeros(k - len(buf), np.uint8)])
    windows = np.lib.stride_tricks.sliding_window_view(buf, k)
    with np.errstate(over="ignore"):
        acc = np.full(windows.shape[0], U64(0xCBF29CE484222325))
        for j in range(k):
            acc = (acc ^ windows[:, j].astype(U64)) * U64(0x100000001B3)
    # windows per doc = len - k + 1, all starting at doc_start
    n_win = lens - k + 1
    doc_idx = np.repeat(np.arange(n_docs), n_win)
    pos = np.concatenate([np.arange(w) for w in n_win]) + \
        np.repeat(doc_start, n_win)
    h = acc[pos]
    # per-doc dedup: sort by (doc, hash), drop adjacent equals
    order = np.lexsort((h, doc_idx))
    d_s, h_s = doc_idx[order], h[order]
    keep = np.ones(len(h_s), dtype=bool)
    if len(h_s) > 1:
        keep[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
    d_u, h_u = d_s[keep], h_s[keep]
    counts = np.bincount(d_u, minlength=n_docs)
    starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return h_u, starts


class MinHasher:
    """Stateful stage: permutation coefficients generated once per actor
    (__init__), signatures computed per batch (__call__)."""

    def __init__(self, text_col: str, id_col: str, num_perm: int = 128,
                 shingle_k: int = 5, perm_seed: int = 1):
        rng = np.random.default_rng(perm_seed)
        self.a = rng.integers(1, _MERSENNE61, num_perm, dtype=np.int64).astype(U64)
        self.b = rng.integers(0, _MERSENNE61, num_perm, dtype=np.int64).astype(U64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def signatures(self, texts: list[bytes]) -> np.ndarray:
        sh, starts = _char_shingle_hashes(texts, self.k)
        n_docs = len(texts)
        sig = np.empty((n_docs, self.num_perm), dtype=U64)
        if len(sh) == 0:
            sig[:] = U64(0)
            return sig
        seg_starts = starts[:-1]
        # one contiguous 1D pass per permutation: reduceat over axis 0 of a
        # 2D block is ~17x slower (strided segment access), measured
        with np.errstate(over="ignore"):
            for p in range(self.num_perm):
                v = sh * self.a[p] + self.b[p]  # u64 wrap: universal-ish mix
                sig[:, p] = np.minimum.reduceat(v, seg_starts)
        empty = (starts[1:] - starts[:-1]) == 0
        sig[empty] = U64(0)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t.as_py().encode() if isinstance(t.as_py(), str)
                 else bytes(t.as_py()) for t in batch[self.text_col]]
        sig = self.signatures(texts)
        return pa.table({
            "doc_id": batch[self.id_col],
            "sig": pa.array([s.tobytes() for s in sig], pa.large_binary()),
        })


def minhash_signatures(ds, text_col: str, id_col: str, num_perm: int = 128,
                       shingle_k: int = 5, concurrency: int = 4):
    return ds.map_batches(
        MinHasher, batch_format="pyarrow",
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col,
                                   num_perm=num_perm, shingle_k=shingle_k),
        concurrency=pool(concurrency))


def minhash_lsh_pairs(ds, text_col: str, id_col: str, num_perm: int = 128,
                      bands: int = 32, shingle_k: int = 5,
                      threshold: float = 0.5, concurrency: int = 4):
    """Near-duplicate pairs (doc_a < doc_b, est_jaccard >= threshold).

    banded LSH: rows/band r = num_perm//bands; a pair collides in some band
    with prob 1-(1-j^r)^bands.  Candidate pairs are verified against the
    full signatures (est_jaccard = fraction of equal minhashes), which
    estimates n-gram (shingle) Jaccard within ~1/sqrt(num_perm)."""
    import pandas as pd

    r = num_perm // bands
    sigs = minhash_signatures(ds, text_col, id_col, num_perm, shingle_k,
                              concurrency).materialize()

    def banded(batch: pa.Table) -> pa.Table:
        n = len(batch)
        sig = np.frombuffer(b"".join(s.as_py() for s in batch["sig"]),
                            dtype=U64).reshape(n, num_perm)
        ids = np.asarray(batch["doc_id"]).repeat(bands)
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        bh = np.empty((n, bands), dtype=U64)
        for b in range(bands):
            chunk = sig[:, b * r:(b + 1) * r]
            acc = np.full(n, U64(0x9E3779B97F4A7C15))
            with np.errstate(over="ignore"):
                for j in range(r):
                    acc = murmur64a_u64(acc ^ chunk[:, j], b)
            bh[:, b] = acc
        return pa.table({
            "band": pa.array(band_ids),
            "bh": pa.array(bh.reshape(-1).view(np.int64), pa.int64()),
            "doc_id": pa.array(ids),
        })

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].values)
        if len(ids) < 2 or len(ids) > 1000:  # hot-bucket guard (log + skip)
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    cand = (sigs.map_batches(banded, batch_format="pyarrow")
                .groupby(["band", "bh"])
                .map_groups(pairs_of_group, batch_format="pandas"))
    cand_pdf = cand.to_pandas().drop_duplicates()
    if not len(cand_pdf):
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "est_jaccard": pd.Series([], dtype="float64")})

    # verify against full signatures of the (small) candidate set
    need = np.unique(np.concatenate([cand_pdf["doc_a"], cand_pdf["doc_b"]]))
    sig_map: dict[int, np.ndarray] = {}
    for b in sigs.iter_batches(batch_format="pyarrow"):
        ids = np.asarray(b["doc_id"])
        mask = np.isin(ids, need)
        for i in np.flatnonzero(mask):
            sig_map[int(ids[i])] = np.frombuffer(b["sig"][i].as_py(), dtype=U64)
    sa = np.stack([sig_map[i] for i in cand_pdf["doc_a"]])
    sb = np.stack([sig_map[i] for i in cand_pdf["doc_b"]])
    est = (sa == sb).mean(axis=1)
    out = cand_pdf.assign(est_jaccard=est)
    out = out[out["est_jaccard"] >= threshold]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def ngram_jaccard_pairs(ds, text_col: str, id_col: str, shingle_k: int = 5,
                        threshold: float = 0.5, num_perm: int = 128,
                        bands: int = 32, concurrency: int = 4):
    """Near-duplicate pairs by EXACT character-n-gram Jaccard similarity
    (doc_a < doc_b, jaccard >= threshold).

    MinHash banding supplies the candidate pairs (same LSH shape as
    minhash_lsh_pairs), but verification computes the true shingle-set
    Jaccard |A∩B| / |A∪B| -- not the signature estimate -- over a second
    distributed pass restricted to candidate docs.  Only candidate docs'
    deduped shingle hashes reach the driver."""
    import pandas as pd
    import ray

    cand = minhash_lsh_pairs(ds, text_col, id_col, num_perm=num_perm,
                             bands=bands, shingle_k=shingle_k,
                             threshold=0.0, concurrency=concurrency)
    if not len(cand):
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    need = np.unique(np.concatenate([cand["doc_a"], cand["doc_b"]]))
    need_ref = ray.put(need)

    def shingle_sets(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col])
        mask = np.isin(ids, ray.get(need_ref))
        if not mask.any():
            return pa.table({id_col: pa.array([], pa.int64()),
                             "shingles": pa.array([], pa.large_binary())})
        sub = batch.filter(pa.array(mask))
        texts = [t.encode() if isinstance(t, str) else bytes(t)
                 for t in sub[text_col].to_pylist()]
        sh, starts = _char_shingle_hashes(texts, shingle_k)
        blobs = [sh[starts[i]:starts[i + 1]].tobytes()
                 for i in range(len(texts))]
        return pa.table({id_col: sub[id_col],
                         "shingles": pa.array(blobs, pa.large_binary())})

    sets: dict[int, np.ndarray] = {}
    for b in ds.map_batches(shingle_sets, batch_format="pyarrow"
                            ).iter_batches(batch_format="pyarrow"):
        for i, blob in zip(np.asarray(b[id_col]), b["shingles"]):
            sets[int(i)] = np.frombuffer(blob.as_py(), dtype=U64)
    jac = np.zeros(len(cand))
    for row, (a, b_) in enumerate(zip(cand["doc_a"], cand["doc_b"])):
        sa, sb = sets[int(a)], sets[int(b_)]
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        jac[row] = inter / union if union else 1.0
    out = pd.DataFrame({"doc_a": cand["doc_a"].values,
                        "doc_b": cand["doc_b"].values, "jaccard": jac})
    out = out[out["jaccard"] >= threshold]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_batch(texts_col: pa.Array) -> np.ndarray:
    """64-bit SimHash over whitespace-token hashes, vectorized per batch.
    Null texts count as empty (trailing nulls otherwise crash reduceat)."""
    import pyarrow.compute as pc
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(texts_col, "")), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = np.asarray(toks.offsets)
    flat = toks.values
    th = hash_strings(flat)
    n = len(texts_col)
    out = np.zeros(n, dtype=U64)
    bits = ((th[:, None] >> (np.arange(64, dtype=U64))) & U64(1)).astype(np.int64)
    contrib = bits * 2 - 1  # +1 / -1 per bit
    sums = np.add.reduceat(contrib, offsets[:-1], axis=0) \
        if len(th) else np.zeros((n, 64), dtype=np.int64)
    # reduceat quirk: empty segments copy the next row -> zero them
    seg_len = offsets[1:] - offsets[:-1]
    sums[seg_len == 0] = 0
    out = np.bitwise_or.reduce(
        (sums > 0).astype(U64) << np.arange(64, dtype=U64), axis=1)
    return out


def simhash_pairs(ds, text_col: str, id_col: str, max_hamming: int = 3):
    """Near-dup pairs by SimHash: pigeonhole over 4 x 16-bit bands (any pair
    with hamming <= 3 must agree exactly on >= 1 band), verified by exact
    Hamming distance on the candidate set."""
    import pandas as pd

    def compute(batch: pa.Table) -> pa.Table:
        sh = simhash_batch(batch[text_col])
        return pa.table({"doc_id": batch[id_col],
                         "simhash": pa.array(sh, pa.uint64())})

    sigs = ds.map_batches(compute, batch_format="pyarrow").materialize()

    def banded(batch: pa.Table) -> pa.Table:
        sh = np.asarray(batch["simhash"], dtype=U64)
        ids = np.asarray(batch["doc_id"])
        rows_band, rows_key, rows_id = [], [], []
        for b in range(4):
            key = (sh >> U64(16 * b)) & U64(0xFFFF)
            rows_band.append(np.full(len(sh), b, dtype=np.int32))
            rows_key.append(key)
            rows_id.append(ids)
        return pa.table({"band": pa.array(np.concatenate(rows_band)),
                         "key": pa.array(
                             np.concatenate(rows_key).view(np.int64),
                             pa.int64()),
                         "doc_id": pa.array(np.concatenate(rows_id))})

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].values)
        if len(ids) < 2 or len(ids) > 1000:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    cand = (sigs.map_batches(banded, batch_format="pyarrow")
                .groupby(["band", "key"])
                .map_groups(pairs_of_group, batch_format="pandas")
                .to_pandas().drop_duplicates())
    if not len(cand):
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    sh_map = {}
    for b in sigs.iter_batches(batch_format="pyarrow"):
        for i, s in zip(np.asarray(b["doc_id"]),
                        np.asarray(b["simhash"], dtype=U64)):
            sh_map[int(i)] = int(s)
    x = np.array([sh_map[i] for i in cand["doc_a"]], dtype=np.uint64)
    y = np.array([sh_map[i] for i in cand["doc_b"]], dtype=np.uint64)
    ham = np.array([bin(v).count("1") for v in (x ^ y).tolist()])
    out = cand.assign(hamming=ham)
    out = out[out["hamming"] <= max_hamming]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Embedding near-duplicates
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(ds, vec_col: str, id_col: str,
                            threshold: float = 0.98, bits: int = 16,
                            lsh_seed: int = 7):
    """Cosine near-dup via random-hyperplane LSH bucketing + exact verify.

    Stage 1: project each vector on `bits` fixed random hyperplanes ->
    bucket key; only (key, id, vec) rows of same-bucket docs meet.  Pairs
    verified by exact cosine.  At 10^12 scale the same shape holds with
    multiple independent hash tables to recover recall."""
    import pandas as pd

    def stage(batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch[vec_col].to_pandas().values).astype(np.float64)
        rng = np.random.default_rng(lsh_seed)
        planes = rng.standard_normal((vecs.shape[1], bits))
        proj = vecs @ planes > 0
        key = np.bitwise_or.reduce(
            proj.astype(np.uint64) << np.arange(bits, dtype=np.uint64), axis=1)
        norm = np.linalg.norm(vecs, axis=1, keepdims=True)
        norm[norm == 0] = 1
        unit = vecs / norm
        return pa.table({
            "key": pa.array(key.view(np.int64), pa.int64()),
            "doc_id": batch[id_col],
            "unit": pa.array(list(unit), pa.list_(pa.float64())),
        })

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2 or len(g) > 2000:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "cosine": []})
        order = np.argsort(g["doc_id"].values)
        ids = g["doc_id"].values[order]
        units = np.stack(g["unit"].values[order])
        sim = units @ units.T
        a, b = np.triu_indices(len(ids), k=1)
        mask = sim[a, b] >= threshold
        return pd.DataFrame({"doc_a": ids[a[mask]], "doc_b": ids[b[mask]],
                             "cosine": sim[a[mask], b[mask]]})

    out = (ds.map_batches(stage, batch_format="pyarrow")
             .groupby("key")
             .map_groups(pairs_of_group, batch_format="pandas")
             .to_pandas())
    if not len(out):
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    return (out.drop_duplicates(["doc_a", "doc_b"])
               .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
