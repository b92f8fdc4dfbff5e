"""Deduplication operators for training-data pipelines.

Beyond the reference's exact sort+dedup contract (src/bench.zig:258-297),
these are the large-scale operators a 100TB text pipeline needs:

  exact_dedup        hash-partitioned exact dedup, first-writer-wins
  minhash_lsh_pairs  MinHash + banded LSH near-duplicate candidate pairs,
                     verified by signature similarity (n-gram Jaccard est.)
  ngram_jaccard_pairs  same candidates, verified by EXACT shingle Jaccard
  simhash_pairs      64-bit SimHash, pigeonhole banding, Hamming verify
  embedding_neardup_pairs  cosine near-duplicates over embedding vectors

Distributed shape (no driver-side state anywhere on the pair path):
  per-batch vectorized signatures (stateless/actor map_batches)
  -> explode to (bucket_key, doc_id) rows (the only pre-join shuffle payload)
  -> groupby(bucket).map_groups emitting candidate pairs (hot buckets are
     chunked deterministically, never silently dropped)
  -> distributed distinct on (doc_a, doc_b)
  -> signatures hash-joined onto the pairs (Dataset.join, partitioned)
  -> per-batch vectorized verify + threshold filter.
Only the FINAL verified pairs are collected to pandas for the caller.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .hashing import U64, hash_strings, murmur64a_u64, popcount64
from .pipeline import pack_rows_by_part, unpack_part_rows
from .util import pool

_MERSENNE61 = (1 << 61) - 1
_M64 = 0xFFFFFFFFFFFFFFFF

#: buckets larger than this emit pairs per deterministic chunk instead of
#: all-pairs (O(n*cap) instead of O(n^2)); the chunk permutation is salted
#: by the bucket key so each band re-chunks independently and recall is
#: recovered across bands.  Oversized buckets are LOGGED, never dropped.
HOT_BUCKET_CAP = 1000


def exact_dedup(ds, col: str, id_col: str, num_partitions: int = 16):
    """Rows whose `id_col` is the minimum within each exact-`col` group.

    Scale shape: only (h1:i64, h2:i64, id:i64) rows cross the aggregation
    exchange; the winning ids are then joined back against the dataset with
    a hash-partitioned left-semi join (Dataset.join) -- no driver
    materialization and no broadcast, so 10^10+ distinct winners never
    become driver state.  The group key is TWO independently-seeded 64-bit
    content hashes, so merging distinct texts needs a ~2^-128 collision
    (a single u64 key is expected to collide at ~10^10 docs)."""
    parts = _shuffle_parts()

    def _min_id_runs(h, h2, i):
        """First id of each lexsorted (h, h2) run == min id per group."""
        if h.size == 0:
            return h, h2, i
        order = np.lexsort((i, h2, h))
        h, h2, i = h[order], h2[order], i[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], (h[1:] != h[:-1]) | (h2[1:] != h2[:-1])]))
        return h[starts], h2[starts], i[starts]

    def project(batch: pa.Table) -> pa.Table:
        # int64 views of the u64 hashes (uint64 columns would fall back to
        # pickled object blocks in the shuffle; the signed view is a
        # bijection), combined with a per-batch partial min so only one
        # (h, h2, id) row per batch-local group crosses the exchange --
        # packed into one blob row per partition (pack_rows_by_part), so
        # the sort shuffle's per-row costs scale with blocks x parts,
        # not with distinct-document count
        h = hash_strings(batch[col]).view(np.int64)
        h2 = hash_strings(batch[col],
                          seed=0x9E3779B97F4A7C15).view(np.int64)
        i = np.asarray(batch[id_col], dtype=np.int64)
        h, h2, i = _min_id_runs(h, h2, i)
        part = (murmur64a_u64(h.view(U64), 29)
                % U64(parts)).astype(np.int64)
        return pack_rows_by_part(part, (h, h2, i))

    def min_final(g: pa.Table) -> pa.Table:
        h, h2, i = unpack_part_rows(g, 3)
        _, _, i = _min_id_runs(h, h2, i)
        return pa.table({"min_id": pa.array(i)})

    # hash-partitioned min-per-(h,h2): Ray's multi-column sort aggregate
    # (groupby(["h","h2"]).aggregate(Min)) degrades with group count --
    # one group per distinct document here
    winners = (ds.map_batches(project, batch_format="pyarrow")
                 .groupby("_part").map_groups(min_final,
                                              batch_format="pyarrow"))
    return _join(ds, _compact(winners, num_partitions), "left_semi",
                 num_partitions, (id_col,), ("min_id",))


# ---------------------------------------------------------------------------
# shared LSH machinery
# ---------------------------------------------------------------------------

def _compact(ds, num_blocks: int):
    """Repartition a groupby/aggregate output before feeding Dataset.join.

    Ray's aggregators emit ZERO-COLUMN empty blocks for empty hash
    partitions; map ops forward empty blocks without calling the UDF, and
    the join partition builder then assembles a left/right table without
    the key column ("No match for FieldRef" ArrowInvalid).  repartition()
    concatenates blocks and drops the schemaless empties; it also sets a
    sane block count for the join that follows."""
    return ds.repartition(num_blocks)


def _join(left, right, join_type: str, num_partitions: int, on, right_on,
          **kw):
    """Dataset.join with aggregator CPUs sized to the cluster.

    Ray's hash-join aggregator actors default to 1 CPU each; a pipeline
    with several concurrent joins then demands num_joins x num_partitions
    CPUs and DEADLOCKS on small clusters (observed: 3 join pools x 8
    aggregators on a 4-cpu pytest session; with a 0.125-cpu floor the 32
    aggregators still summed to the whole cluster and starved the map
    tasks).  Cap each pool at ~1/8 of the cluster so several pools plus
    the upstream map tasks always fit; aggregator work is bursty, so
    fractional CPUs merely timeshare."""
    import ray
    ncpu = float(ray.cluster_resources().get("CPU", 8.0))
    agg_cpus = float(min(1.0, max(1.0 / 64, (ncpu / 8.0) / num_partitions)))
    return left.join(right, join_type, num_partitions=num_partitions,
                     on=on, right_on=right_on,
                     aggregator_ray_remote_args={"num_cpus": agg_cpus},
                     **kw)


def _pairs_from_ids(ids: np.ndarray, bucket_salt: int,
                    cap: int = HOT_BUCKET_CAP):
    """All unordered pairs (a < b) of `ids`; buckets above `cap` members
    are split into deterministic salted chunks of `cap` and pairs are
    emitted within chunks only (logged, not dropped): a hot bucket of
    boilerplate text is exactly where the most-duplicated content lives."""
    ids = np.unique(np.asarray(ids, dtype=np.int64))
    n = len(ids)
    if n < 2:
        z = np.zeros(0, np.int64)
        return z, z
    if n <= cap:
        a, b = np.triu_indices(n, k=1)
        return ids[a], ids[b]
    print(f"[raysketch.dedup] hot bucket: {n} members > cap {cap}; "
          f"emitting within-chunk pairs only ({(n + cap - 1) // cap} chunks)")
    perm = np.argsort(murmur64a_u64(ids.view(U64), bucket_salt & _M64))
    out_a, out_b = [], []
    for s in range(0, n, cap):
        chunk = np.sort(ids[perm[s:s + cap]])
        if len(chunk) < 2:
            continue
        a, b = np.triu_indices(len(chunk), k=1)
        out_a.append(chunk[a])
        out_b.append(chunk[b])
    return np.concatenate(out_a), np.concatenate(out_b)


#: floor on shuffle partitions for bucketed pair emission.  Buckets are
#: grouped by bkey % parts and one map_groups call processes ALL buckets
#: of a partition (vectorized run detection) -- grouping by the raw bucket
#: key would make one Python group-call per bucket (~1ms each; measured
#: 25s+ just in group dispatch at 32k buckets).
SHUFFLE_PARTS = 64


def _shuffle_parts(requested: int | None = None) -> int:
    """Coarse-shuffle partition count sized to the CLUSTER (4 group tasks
    per CPU for latency hiding), not a fixed constant: on a 256-node
    cluster 64 partitions would cap pair-emission parallelism at a
    fraction of the machine.  Evaluated once on the driver at pipeline
    construction; the value is closed over by the worker fns."""
    if requested is not None:
        return int(requested)
    import ray
    ncpu = float(ray.cluster_resources().get("CPU", 16.0)) \
        if ray.is_initialized() else 16.0
    return int(max(SHUFFLE_PARTS, 4 * ncpu))


def _pairs_partition_fn(cap: int = HOT_BUCKET_CAP):
    """map_groups fn over ONE shuffle partition holding many buckets:
    packed (bkey:int64, doc_id:int64) blobs -> candidate pairs of every
    bucket.  Bucket runs are found with one lexsort; only multi-member
    runs cost anything beyond the sort."""
    def fn(g: pa.Table) -> pa.Table:
        k, ids = unpack_part_rows(g, 2)
        order = np.lexsort((ids, k))
        k_s, id_s = k[order], ids[order]
        bounds = np.flatnonzero(np.concatenate(
            [[True], k_s[1:] != k_s[:-1], [True]]))
        out_a, out_b = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            a, b = _pairs_from_ids(id_s[s:e], int(k_s[s]), cap)
            out_a.append(a)
            out_b.append(b)
        if not out_a:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        return pa.table({"doc_a": pa.array(np.concatenate(out_a)),
                         "doc_b": pa.array(np.concatenate(out_b))})
    return fn


def _distinct_pairs(cand):
    """Distributed distinct on (doc_a, doc_b): the same pair surfaces from
    up to `bands` buckets and must reach the verify join exactly once.
    Shuffles an int32 hash-partition of the pair instead of using Ray's
    multi-column sort aggregate (groupby(2 cols).count() measured 34.5 s
    vs 0.9 s for this shape on 33k candidate rows); per-batch partial
    dedup runs before the shuffle, vectorized lexsort+adjacent-unique
    inside each partition after."""
    parts = _shuffle_parts()

    def _uniq(a: np.ndarray, b: np.ndarray):
        if a.size == 0:
            return a, b
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.concatenate(
            [[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        return a[keep], b[keep]

    def partial(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["doc_a"], dtype=np.int64)
        b = np.asarray(batch["doc_b"], dtype=np.int64)
        a, b = _uniq(a, b)
        h = murmur64a_u64(a.view(U64) ^ murmur64a_u64(b.view(U64), 17), 23)
        # packed (a, b) blob per partition: candidate-pair volume is the
        # largest row count in the LSH path (bands x docs upper bound)
        return pack_rows_by_part((h % U64(parts)).astype(np.int64), (a, b))

    def uniq_group(g: pa.Table) -> pa.Table:
        a, b = unpack_part_rows(g, 2)
        a, b = _uniq(a, b)
        return pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b)})

    return (cand.map_batches(partial, batch_format="pyarrow")
                .groupby("_part").map_groups(uniq_group,
                                             batch_format="pyarrow"))


def _min_labels_by_node(ds, parts: int | None = None):
    """(node, label, prev) -> one row per node with m=min(label),
    p=min(prev): per-batch vectorized combine, int32 hash-partition
    shuffle, per-partition reduceat -- the label-propagation loop runs
    this every iteration, and Ray's sort-aggregate groupby(node)
    degrades with node count."""
    P = _shuffle_parts(parts)

    def _minmin(node, lab, prev):
        if node.size == 0:
            return node, lab, prev
        order = np.argsort(node, kind="stable")
        node, lab, prev = node[order], lab[order], prev[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], node[1:] != node[:-1]]))
        return (node[starts], np.minimum.reduceat(lab, starts),
                np.minimum.reduceat(prev, starts))

    def partial(batch: pa.Table) -> pa.Table:
        n, l, p = _minmin(np.asarray(batch["node"], dtype=np.int64),
                          np.asarray(batch["label"], dtype=np.int64),
                          np.asarray(batch["prev"], dtype=np.int64))
        # packed blob rows (pack_rows_by_part): this exchange runs once
        # per propagation iteration over every live node
        part = (murmur64a_u64(n.view(U64), 29) % U64(P)).astype(np.int64)
        return pack_rows_by_part(part, (n, l, p))

    def final(g: pa.Table) -> pa.Table:
        n, l, p = unpack_part_rows(g, 3)
        n, l, p = _minmin(n, l, p)
        return pa.table({"node": pa.array(n), "m": pa.array(l),
                         "p": pa.array(p)})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("_part").map_groups(final, batch_format="pyarrow"))


def _distinct_ints(ds, col: str, parts: int | None = None):
    """Distributed distinct of ONE int64 column: per-batch partial
    np.unique, int32 hash-partition shuffle, vectorized per-partition
    unique.  Replaces groupby(col).count() whose sort-aggregate degrades
    with the number of groups (measured 34.5 s vs <1 s at ~20k groups)."""
    P = _shuffle_parts(parts)

    def partial(batch: pa.Table) -> pa.Table:
        v = np.unique(np.asarray(batch[col], dtype=np.int64))
        h = murmur64a_u64(v.view(U64), 29)
        return pack_rows_by_part((h % U64(P)).astype(np.int64), (v,))

    def uniq(g: pa.Table) -> pa.Table:
        (v,) = unpack_part_rows(g, 1)
        return pa.table({col: pa.array(np.unique(v))})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("_part").map_groups(uniq, batch_format="pyarrow"))


def _attach(pairs, attrs, num_partitions: int):
    """Hash-join the per-doc attribute table onto both pair sides.

    attrs must be (doc_id, <one value column>); output carries the value
    column twice, suffixed _a/_b.  Two partitioned inner joins -- the
    cluster-scale replacement for the former driver-side dict lookup."""
    j = _join(pairs, attrs, "inner", num_partitions, ("doc_a",),
              ("doc_id",))
    # a join's own empty partitions come out as zero-column blocks, which
    # break the NEXT join's partition builder -- compact between joins
    j = _compact(j, num_partitions)
    return _join(j, attrs, "inner", num_partitions, ("doc_b",),
                 ("doc_id",), left_suffix="_a", right_suffix="_b")


def _collect_pairs(out_ds, extra: dict[str, str]) -> pd.DataFrame:
    """Driver collection of the FINAL verified pairs only (the result the
    caller asked for; all candidate/verify stages stayed distributed)."""
    df = out_ds.to_pandas()
    cols = ["doc_a", "doc_b", *extra]
    if not len(df):
        return pd.DataFrame({c: pd.Series([], dtype=extra.get(c, "int64"))
                             for c in cols})
    return (df[cols].sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True))


_ARROW_DTYPE = {"int64": pa.int64(), "float64": pa.float64()}


def _empty_pairs_ds(extra: dict[str, str]):
    """Empty pair Dataset with the operator's full output schema (the
    collect=False twin of _collect_pairs' empty DataFrame)."""
    import ray.data as rd
    return rd.from_arrow(pa.table(
        {"doc_a": pa.array([], pa.int64()),
         "doc_b": pa.array([], pa.int64()),
         **{c: pa.array([], _ARROW_DTYPE[t]) for c, t in extra.items()}}))


def _pairs_result(out_ds, extra: dict[str, str], collect: bool):
    """Final pair result under the two API contracts:

    collect=True  -- small-result contract: driver DataFrame sorted by
                     (doc_a, doc_b) (unchanged historical behavior).
    collect=False -- scale contract: the distributed, UNSORTED pair
                     Dataset itself; at 100 TB verified near-dup pairs
                     can exceed driver RAM, so the caller streams them to
                     a sink (e.g. resumable_write) instead of collecting.
    """
    if out_ds is None:
        out_ds = _empty_pairs_ds(extra)
    if not collect:
        return out_ds
    return _collect_pairs(out_ds, extra)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes_from_column(col, k: int):
    """Shingle hashes straight from an Arrow string/binary column: the
    column's (offsets, data) buffers ARE the concatenated byte layout the
    kernel wants, so no per-row .as_py()/encode loop and no b"".join.
    Documents shorter than k are zero-padded to one shingle by a
    VECTORIZED buffer rebuild (one scatter over the batch's bytes) -- one
    short doc never demotes the whole batch to a per-row path."""
    from .hashing import _string_buffers
    offsets, data = _string_buffers(col)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    starts = offsets[:-1].astype(np.int64)
    if (lens >= k).all():
        return _char_shingle_hashes_buf(np.asarray(data), starts, lens, k)
    new_lens = np.maximum(lens, k)
    new_starts = np.concatenate(
        [[0], np.cumsum(new_lens)[:-1]]).astype(np.int64)
    buf = np.zeros(int(new_lens.sum()), dtype=np.uint8)
    total_src = int(lens.sum())
    if total_src:
        src_cum = np.concatenate([[0], np.cumsum(lens)[:-1]])
        within = np.arange(total_src) - np.repeat(src_cum, lens)
        buf[np.repeat(new_starts, lens) + within] = \
            np.asarray(data)[np.repeat(starts, lens) + within]
    return _char_shingle_hashes_buf(buf, new_starts, new_lens, k)


def _char_shingle_hashes(texts: list[bytes], k: int):
    """List-of-bytes entry point (tests + short-doc fallback)."""
    n_docs = len(texts)
    if n_docs == 0:
        return np.zeros(0, dtype=U64), np.zeros(1, dtype=np.int64)
    padded = [t if len(t) >= k else t.ljust(k, b"\0") for t in texts]
    lens = np.array([len(t) for t in padded], dtype=np.int64)
    buf = np.frombuffer(b"".join(padded), dtype=np.uint8)
    doc_start = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return _char_shingle_hashes_buf(buf, doc_start, lens, k)


def _char_shingle_hashes_buf(buf: np.ndarray, doc_start: np.ndarray,
                             lens: np.ndarray, k: int):
    """Concatenated deduped k-byte-shingle hashes per doc + start offsets.

    Fully vectorized across the whole batch: one byte buffer, one
    sliding-window FNV pass, windows crossing document boundaries masked
    out, per-doc dedup via a single lexsort + adjacent-unique scan (same
    output as per-doc np.unique: hashes sorted ascending per doc).  All
    lens must be >= k (callers pad shorter docs)."""
    n_docs = len(lens)
    if n_docs == 0:
        return np.zeros(0, dtype=U64), np.zeros(1, dtype=np.int64)
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
        # one contiguous 1D reduceat pass per permutation: reduceat over
        # axis 0 of a 2D block is ~17x slower (strided segments), measured
        sh, starts = _char_shingle_hashes(texts, self.k)
        return self._sigs_from_shingles(sh, starts, len(texts))

    def signatures_from_column(self, col) -> np.ndarray:
        sh, starts = _shingle_hashes_from_column(col, self.k)
        return self._sigs_from_shingles(sh, starts, len(col))

    def _sigs_from_shingles(self, sh, starts, n_docs) -> np.ndarray:
        sig = np.empty((n_docs, self.num_perm), dtype=U64)
        if len(sh) == 0:
            sig[:] = U64(0)
            return sig
        seg_starts = starts[:-1]
        with np.errstate(over="ignore"):
            for p in range(self.num_perm):
                v = sh * self.a[p] + self.b[p]
                sig[:, p] = np.minimum.reduceat(v, seg_starts)
        empty = (starts[1:] - starts[:-1]) == 0
        sig[empty] = U64(0)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = self.signatures_from_column(batch[self.text_col])
        # one contiguous buffer -> fixed-size-binary column (no per-row
        # tobytes loop); fixed_size_binary round-trips to bytes on read
        width = self.num_perm * 8
        sig_arr = pa.Array.from_buffers(
            pa.binary(width), len(sig),
            [None, pa.py_buffer(np.ascontiguousarray(sig).tobytes())])
        return pa.table({
            "doc_id": batch[self.id_col],
            "sig": sig_arr,
        })


def _sig_matrix(col, num_perm: int) -> np.ndarray:
    """(n, num_perm) u64 view of a signature column -- zero-copy for the
    fixed_size_binary layout MinHasher emits."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_binary(col.type):
        buf = col.buffers()[1]
        arr = np.frombuffer(buf, dtype=U64,
                            count=(col.offset + len(col)) * num_perm)
        return arr[col.offset * num_perm:].reshape(len(col), num_perm)
    return np.frombuffer(b"".join(col.to_pylist()),
                         dtype=U64).reshape(len(col), num_perm)


def minhash_signatures(ds, text_col: str, id_col: str, num_perm: int = 128,
                       shingle_k: int = 5, concurrency: int = 4):
    return ds.map_batches(
        MinHasher, batch_format="pyarrow",
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col,
                                   num_perm=num_perm, shingle_k=shingle_k),
        concurrency=pool(concurrency))


def _lsh_candidates(sigs, num_perm: int, bands: int,
                    hot_cap: int = HOT_BUCKET_CAP):
    """Banded-LSH candidate pairs (distinct, distributed).

    A pair colliding in some band (prob 1-(1-j^r)^bands, r=num_perm//bands)
    surfaces from that band's groupby; distinct-ing on (doc_a, doc_b)
    happens in a second groupby, never on the driver."""
    r = num_perm // bands
    parts = _shuffle_parts()

    def banded(batch: pa.Table) -> pa.Table:
        n = len(batch)
        sig = _sig_matrix(batch["sig"], num_perm)
        ids = np.asarray(batch["doc_id"]).repeat(bands)
        bh = np.empty((n, bands), dtype=U64)
        for b in range(bands):
            chunk = sig[:, b * r:(b + 1) * r]
            acc = np.full(n, U64(0x9E3779B97F4A7C15))
            with np.errstate(over="ignore"):
                for j in range(r):
                    acc = murmur64a_u64(acc ^ chunk[:, j], b)
            # fold the band index into the bucket key: one int64 key per
            # (band, bucket) so a single coarse shuffle partitions ALL
            # bands' buckets at once
            bh[:, b] = murmur64a_u64(acc, 1000 + b)
        bkey = bh.reshape(-1)
        return pack_rows_by_part((bkey % U64(parts)).astype(np.int64),
                                 (bkey.view(np.int64), ids))

    cand = (sigs.map_batches(banded, batch_format="pyarrow")
                .groupby("_part")
                .map_groups(_pairs_partition_fn(hot_cap),
                            batch_format="pyarrow"))
    return _distinct_pairs(cand)


def _minhash_verified_pairs_ds(ds, text_col: str, id_col: str,
                               num_perm: int, bands: int, shingle_k: int,
                               threshold: float, concurrency: int,
                               num_partitions: int, hot_cap: int,
                               sigs=None, cand=None):
    """Verified near-dup pair Dataset (doc_a, doc_b, est_jaccard), fully
    distributed, or None when there are no candidates.

    `sigs`/`cand` accept precomputed (materialized) signature / candidate
    Datasets from the SAME corpus and parameters -- the caller's
    responsibility -- so several dedup operators over one corpus share
    one signature+LSH pass instead of recomputing it."""
    if sigs is None:
        sigs = minhash_signatures(ds, text_col, id_col, num_perm, shingle_k,
                                  concurrency).materialize()
    if cand is None:
        cand = _lsh_candidates(sigs, num_perm, bands, hot_cap).materialize()
    if cand.count() == 0:
        return None
    joined = _attach(_compact(cand, num_partitions), sigs, num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        sa = _sig_matrix(batch["sig_a"], num_perm)
        sb = _sig_matrix(batch["sig_b"], num_perm)
        est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        return pa.table({
            "doc_a": batch["doc_a"], "doc_b": batch["doc_b"],
            "est_jaccard": pa.array(est),
        }).filter(pa.array(keep))

    return joined.map_batches(verify, batch_format="pyarrow")


def minhash_lsh_pairs(ds, text_col: str, id_col: str, num_perm: int = 128,
                      bands: int = 32, shingle_k: int = 5,
                      threshold: float = 0.5, concurrency: int = 4,
                      num_partitions: int = 8,
                      hot_cap: int = HOT_BUCKET_CAP,
                      sigs=None, cand=None, pairs=None,
                      collect: bool = True):
    """Near-duplicate pairs (doc_a < doc_b, est_jaccard >= threshold).

    Candidates come from banded LSH; verification hash-joins the full
    signatures onto the pair rows (two partitioned inner joins) and
    compares them vectorized per batch -- no signature dict, no candidate
    materialization on the driver.  est_jaccard = fraction of equal
    minhashes, which estimates shingle Jaccard within ~1/sqrt(num_perm).

    `sigs`/`cand`/`pairs` accept precomputed intermediates from the same
    corpus+parameters (see _minhash_verified_pairs_ds); `pairs` short-
    circuits straight to collection.  collect=False returns the
    distributed pair Dataset instead of a driver DataFrame (see
    _pairs_result)."""
    out = pairs if pairs is not None else _minhash_verified_pairs_ds(
        ds, text_col, id_col, num_perm, bands,
        shingle_k, threshold, concurrency,
        num_partitions, hot_cap, sigs=sigs, cand=cand)
    return _pairs_result(out, {"est_jaccard": "float64"}, collect)


def neardup_dedup(ds, text_col: str, id_col: str, num_perm: int = 128,
                  bands: int = 32, shingle_k: int = 5,
                  threshold: float = 0.5, concurrency: int = 4,
                  num_partitions: int = 8, hot_cap: int = HOT_BUCKET_CAP,
                  max_iters: int = 8, sigs=None, cand=None, pairs=None):
    """NEAR-duplicate dedup: keep one representative (the min id) per
    connected component of the verified near-dup pair graph.

    Cluster shape: components are found by distributed min-label
    propagation over the pair Dataset -- per iteration, each node's label
    becomes the min of its own and its neighbors' labels (two partitioned
    joins + a groupby-min; only (node:i64, label:i64) rows move) -- which
    converges in O(component diameter) iterations (near-dup clusters are
    clique-ish, so a handful).  Convergence = the COUNT of labels that
    changed this iteration reaching zero: each label row carries its
    previous value through the groupby (Min over a prev column that
    neighbor messages set to +inf), so the probe is overflow-free for
    arbitrary sparse 64-bit ids -- unlike a label-sum probe, which can
    alias at >=1e9 sparse ids.  Survivors are selected with a left-anti
    join of the loser ids -- no driver-side cluster state at any point.

    `sigs`/`cand`/`pairs` accept precomputed intermediates from the same
    corpus+parameters (see _minhash_verified_pairs_ds); `pairs` is the
    verified pair Dataset itself (or None for no-candidates)."""
    import warnings

    _I64_MAX = np.iinfo(np.int64).max

    edges = pairs if pairs is not None else _minhash_verified_pairs_ds(
        ds, text_col, id_col, num_perm, bands, shingle_k, threshold,
        concurrency, num_partitions, hot_cap, sigs=sigs, cand=cand)
    if edges is None:
        return ds
    edges = _compact(edges.map_batches(
        lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow"),
        num_partitions).materialize()

    labels = _compact(
        _distinct_ints(edges.map_batches(
            lambda t: pa.table({"node": pa.concat_arrays(
                [t["doc_a"].combine_chunks(), t["doc_b"].combine_chunks()])}),
            batch_format="pyarrow"), "node")
        .map_batches(lambda t: t.append_column("label", t["node"]),
                     batch_format="pyarrow"),
        num_partitions).materialize()

    changed = None
    for _ in range(max_iters):
        msgs_b = _join(edges, labels, "inner", num_partitions,
                       ("doc_a",), ("node",)).map_batches(
            lambda t: pa.table({"node": t["doc_b"], "label": t["label"]}),
            batch_format="pyarrow")
        msgs_a = _join(edges, labels, "inner", num_partitions,
                       ("doc_b",), ("node",)).map_batches(
            lambda t: pa.table({"node": t["doc_a"], "label": t["label"]}),
            batch_format="pyarrow")
        # each node's OWN row carries prev=its current label; neighbor
        # messages carry prev=+inf, so after the groupby Min(prev) is the
        # node's previous label and Min(label) its new one
        tagged_own = labels.map_batches(
            lambda t: t.append_column("prev", t["label"]),
            batch_format="pyarrow")
        tagged_msgs = msgs_a.union(msgs_b).map_batches(
            lambda t: t.append_column("prev", pa.array(
                np.full(len(t), _I64_MAX, np.int64))),
            batch_format="pyarrow")
        merged = _min_labels_by_node(
            tagged_own.union(tagged_msgs)).materialize()
        changed = merged.map_batches(
            lambda t: pa.table({"c": pa.array(
                [int((np.asarray(t["m"]) < np.asarray(t["p"])).sum())],
                pa.int64())}),
            batch_format="pyarrow").sum("c") or 0
        labels = _compact(
            merged.map_batches(lambda t: pa.table(
                {"node": t["node"], "label": t["m"]}),
                batch_format="pyarrow"),
            num_partitions).materialize()
        if changed == 0:
            break
    if changed:
        warnings.warn(
            f"neardup_dedup label propagation hit max_iters={max_iters} "
            f"with {changed} labels still changing: components wider than "
            "that many hops keep one representative PER unconverged "
            "sub-label (extra survivors, never lost rows); raise "
            "max_iters for long-chain duplicate graphs",
            RuntimeWarning, stacklevel=2)

    def _losers(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.not_equal(t["node"], t["label"])).select(["node"])

    losers = labels.map_batches(_losers, batch_format="pyarrow")
    return _join(ds, _compact(losers, num_partitions), "left_anti",
                 num_partitions, (id_col,), ("node",))


def ngram_jaccard_pairs(ds, text_col: str, id_col: str, shingle_k: int = 5,
                        threshold: float = 0.5, num_perm: int = 128,
                        bands: int = 32, concurrency: int = 4,
                        num_partitions: int = 8,
                        hot_cap: int = HOT_BUCKET_CAP,
                        sigs=None, cand=None, collect: bool = True):
    """Near-duplicate pairs by EXACT character-n-gram Jaccard similarity
    (doc_a < doc_b, jaccard >= threshold).

    MinHash banding supplies the candidates; verification re-shingles ONLY
    candidate docs (left-semi join restricts the corpus -- no broadcast id
    set), hash-joins the deduped shingle-hash blobs onto the pairs, and
    computes |A∩B|/|A∪B| per batch with one vectorized pandas merge over
    all pairs in the batch (no per-pair python loop).

    `sigs`/`cand` accept precomputed intermediates from the same
    corpus+parameters (see _minhash_verified_pairs_ds); collect=False
    returns the distributed pair Dataset (see _pairs_result)."""
    if sigs is None:
        sigs = minhash_signatures(ds, text_col, id_col, num_perm, shingle_k,
                                  concurrency).materialize()
    if cand is None:
        cand = _lsh_candidates(sigs, num_perm, bands, hot_cap).materialize()
    if cand.count() == 0:
        return _pairs_result(None, {"jaccard": "float64"}, collect)
    cand = _compact(cand, num_partitions).materialize()

    need = _distinct_ints(cand.map_batches(
        lambda t: pa.table({"doc_id": pa.concat_arrays(
            [t["doc_a"].combine_chunks(), t["doc_b"].combine_chunks()])}),
        batch_format="pyarrow"), "doc_id")
    docs_sub = _join(ds, _compact(need, num_partitions), "left_semi",
                     num_partitions, (id_col,), ("doc_id",))

    docs_sub = _compact(docs_sub, num_partitions)

    def shingle_blobs(batch: pa.Table) -> pa.Table:
        sh, starts = _shingle_hashes_from_column(batch[text_col], shingle_k)
        # build the large_binary column straight from the concatenated
        # hash buffer + byte offsets (no per-row slicing loop)
        blobs = pa.Array.from_buffers(
            pa.large_binary(), len(batch),
            [None, pa.py_buffer((starts * 8).astype(np.int64).tobytes()),
             pa.py_buffer(sh.tobytes())])
        return pa.table({"doc_id": batch[id_col], "sh": blobs})

    blobs = docs_sub.map_batches(shingle_blobs, batch_format="pyarrow")
    joined = _attach(cand, blobs, num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        a_blobs = batch["sh_a"].to_pylist()
        b_blobs = batch["sh_b"].to_pylist()
        la = np.array([len(b) // 8 for b in a_blobs], dtype=np.int64)
        lb = np.array([len(b) // 8 for b in b_blobs], dtype=np.int64)
        n = len(batch)
        # one merge over ALL pairs in the batch: explode both sides to
        # (pair_idx, shingle_hash) and count matching rows per pair
        fa = pd.DataFrame({"i": np.repeat(np.arange(n), la),
                           "h": np.frombuffer(b"".join(a_blobs), dtype=U64)
                           .view(np.int64)})
        fb = pd.DataFrame({"i": np.repeat(np.arange(n), lb),
                           "h": np.frombuffer(b"".join(b_blobs), dtype=U64)
                           .view(np.int64)})
        inter = np.zeros(n, dtype=np.int64)
        if len(fa) and len(fb):
            m = fa.merge(fb, on=["i", "h"]).groupby("i").size()
            inter[m.index.values] = m.values
        union = la + lb - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        keep = jac >= threshold
        return pa.table({
            "doc_a": batch["doc_a"], "doc_b": batch["doc_b"],
            "jaccard": pa.array(jac),
        }).filter(pa.array(keep))

    out = joined.map_batches(verify, batch_format="pyarrow")
    return _pairs_result(out, {"jaccard": "float64"}, collect)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_batch(texts_col: pa.Array, kernel: str = "default") -> np.ndarray:
    """64-bit SimHash over whitespace-token hashes, vectorized per batch.
    Null texts count as empty (trailing nulls otherwise crash reduceat).

    kernel="md5": per-token hash is the md5-u64 cross-engine kernel, so
    the signature (and therefore the exact-Hamming pair set) is
    reproducible in any SQL engine; default stays the engine hash."""
    import pyarrow.compute as pc
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(texts_col, "")), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = np.asarray(toks.offsets)
    flat = toks.values
    if kernel == "md5":
        from .pipeline import _md5_u64
        th = _md5_u64(flat)
    else:
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


def simhash_pairs(ds, text_col: str, id_col: str, max_hamming: int = 3,
                  num_partitions: int = 8, hot_cap: int = HOT_BUCKET_CAP,
                  collect: bool = True, kernel: str = "default"):
    """Near-dup pairs by SimHash: pigeonhole over 4 x 16-bit bands (any pair
    with hamming <= 3 must agree exactly on >= 1 band); candidates are
    verified by exact Hamming distance after hash-joining the simhashes
    onto the pair rows (vectorized SWAR popcount, no driver dict).
    collect=False returns the distributed pair Dataset (_pairs_result).
    kernel="md5" makes the signatures (hence the exact pair set)
    SQL-reproducible -- see simhash_batch."""

    def compute(batch: pa.Table) -> pa.Table:
        sh = simhash_batch(batch[text_col], kernel=kernel)
        return pa.table({"doc_id": batch[id_col],
                         "simhash": pa.array(sh.view(np.int64), pa.int64())})

    sigs = ds.map_batches(compute, batch_format="pyarrow").materialize()
    parts = _shuffle_parts()

    def banded(batch: pa.Table) -> pa.Table:
        sh = np.asarray(batch["simhash"]).view(U64)
        ids = np.asarray(batch["doc_id"])
        rows_key, rows_id = [], []
        for b in range(4):
            key = (sh >> U64(16 * b)) & U64(0xFFFF)
            rows_key.append(murmur64a_u64(key, 2000 + b))  # band folded in
            rows_id.append(ids)
        bkey = np.concatenate(rows_key)
        return pack_rows_by_part(
            (bkey % U64(parts)).astype(np.int64),
            (bkey.view(np.int64), np.concatenate(rows_id)))

    cand = (sigs.map_batches(banded, batch_format="pyarrow")
                .groupby("_part")
                .map_groups(_pairs_partition_fn(hot_cap),
                            batch_format="pyarrow"))
    cand = _distinct_pairs(cand).materialize()
    if cand.count() == 0:
        return _pairs_result(None, {"hamming": "int64"}, collect)
    joined = _attach(_compact(cand, num_partitions), sigs, num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch["simhash_a"]).view(U64)
        y = np.asarray(batch["simhash_b"]).view(U64)
        ham = popcount64(x ^ y).astype(np.int64)
        keep = ham <= max_hamming
        return pa.table({
            "doc_a": batch["doc_a"], "doc_b": batch["doc_b"],
            "hamming": pa.array(ham),
        }).filter(pa.array(keep))

    out = joined.map_batches(verify, batch_format="pyarrow")
    return _pairs_result(out, {"hamming": "int64"}, collect)


# ---------------------------------------------------------------------------
# Embedding near-duplicates
# ---------------------------------------------------------------------------

class _HyperplaneLSH:
    """Stateful bucketing stage: the random hyperplanes for ALL hash
    tables are generated ONCE per actor in __init__ (seeded, so every
    actor derives the identical planes), not per batch.  Emits one SLIM
    (part, bkey, doc_id) row per (vector, table) -- 20 bytes/row through
    the bucket shuffle; the unit vectors do NOT ride this exchange (at
    1024-dim float64 that would be 8 KiB x num_tables per vector), they
    are hash-joined onto the verified candidate pairs later.  A pair
    missed by one table's cut still collides in another (recall
    recovery), and the table index is folded into the bucket key so
    tables never mix."""

    def __init__(self, vec_col: str, id_col: str, bits: int, lsh_seed: int,
                 num_tables: int, parts: int):
        self.vec_col = vec_col
        self.id_col = id_col
        self.bits = bits
        self.seed = lsh_seed
        self.num_tables = num_tables
        self.parts = parts
        self.planes = None  # lazily sized from the first batch's dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch[self.vec_col].to_pandas().values
                        ).astype(np.float64)
        if self.planes is None:
            rng = np.random.default_rng(self.seed)
            self.planes = rng.standard_normal(
                (self.num_tables, vecs.shape[1], self.bits))
        ids = np.asarray(batch[self.id_col])
        keys, out_ids = [], []
        for t in range(self.num_tables):
            proj = vecs @ self.planes[t] > 0
            key = np.bitwise_or.reduce(
                proj.astype(np.uint64)
                << np.arange(self.bits, dtype=np.uint64), axis=1)
            keys.append(murmur64a_u64(key, 3000 + t))  # table folded in
            out_ids.append(ids)
        bkey = np.concatenate(keys)
        return pack_rows_by_part(
            (bkey % U64(self.parts)).astype(np.int64),
            (bkey.view(np.int64), np.concatenate(out_ids)))


def embedding_neardup_pairs(ds, vec_col: str, id_col: str,
                            threshold: float = 0.98, bits: int = 16,
                            lsh_seed: int = 7, concurrency: int = 4,
                            cap: int = 2000, num_tables: int = 2,
                            num_partitions: int = 8,
                            shuffle_parts: int | None = None,
                            collect: bool = True):
    """Cosine near-dup via random-hyperplane LSH bucketing + exact verify.

    Stage 1 (actor pool, planes built once per actor): project each vector
    on `bits` fixed hyperplanes per hash table -> num_tables bucket keys;
    only same-bucket docs meet.  The bucket shuffle moves SLIM
    (part, bkey, doc_id) rows only -- unit vectors never ride the
    exchange duplicated per table (at 1024-dim that is 8 KiB x tables per
    vector).  Candidate pairs are emitted per bucket run (buckets above
    `cap` members chunked deterministically -- logged, not dropped),
    dedup'd DISTRIBUTED across tables (groupby(doc_a, doc_b)), and only
    then are the float64 unit vectors hash-joined onto each distinct
    pair's two sides for the exact-cosine verify -- each unit ships once
    per surviving candidate side instead of once per (vector, table).
    Shuffle partitioning is sized from the cluster (_shuffle_parts).
    collect=False returns the distributed pair Dataset (_pairs_result)."""
    bucketed = ds.map_batches(
        _HyperplaneLSH, batch_format="pyarrow",
        fn_constructor_kwargs=dict(vec_col=vec_col, id_col=id_col,
                                   bits=bits, lsh_seed=lsh_seed,
                                   num_tables=num_tables,
                                   parts=_shuffle_parts(shuffle_parts)),
        concurrency=pool(concurrency))
    cand = (bucketed.groupby("_part")
                    .map_groups(_pairs_partition_fn(cap),
                                batch_format="pyarrow"))
    # distributed distinct (a pair can surface from every table) BEFORE
    # the verify join: each pair is cosine-verified exactly once
    cand = _distinct_pairs(cand).materialize()
    if cand.count() == 0:
        return _pairs_result(None, {"cosine": "float64"}, collect)

    def to_unit(batch: pa.Table) -> pa.Table:
        # float64 unit vectors as fixed-width binary blobs: Acero joins
        # (inside Dataset.join) reject list<double> payload columns, and
        # blobs round-trip zero-copy via frombuffer at verify time
        vecs = np.stack(batch[vec_col].to_pandas().values
                        ).astype(np.float64)
        norm = np.linalg.norm(vecs, axis=1, keepdims=True)
        norm[norm == 0] = 1
        unit = np.ascontiguousarray(vecs / norm)
        n, d = unit.shape
        blobs = pa.Array.from_buffers(
            pa.large_binary(), n,
            [None,
             pa.py_buffer((np.arange(n + 1, dtype=np.int64) * d * 8)
                          .tobytes()),
             pa.py_buffer(unit.tobytes())])
        return pa.table({"doc_id": batch[id_col], "unit": blobs})

    units = ds.map_batches(to_unit, batch_format="pyarrow").materialize()
    joined = _attach(_compact(cand, num_partitions), units, num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:  # reshape(0, -1) is ill-defined
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        ua = np.frombuffer(b"".join(batch["unit_a"].to_pylist()),
                           np.float64).reshape(n, -1)
        ub = np.frombuffer(b"".join(batch["unit_b"].to_pylist()),
                           np.float64).reshape(n, -1)
        cos = np.einsum("ij,ij->i", ua, ub)
        keep = cos >= threshold
        return pa.table({
            "doc_a": batch["doc_a"], "doc_b": batch["doc_b"],
            "cosine": pa.array(cos),
        }).filter(pa.array(keep))

    out = joined.map_batches(verify, batch_format="pyarrow")
    return _pairs_result(out, {"cosine": "float64"}, collect)
