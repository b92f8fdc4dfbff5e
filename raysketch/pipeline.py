"""Build / probe / checkpoint pipelines -- the Ray-Data shape of the
reference's bench job (/root/reference/src/bench.zig:195-249), re-expressed:

    read_parquet -> map_batches(hash keys, assign partition_id)   [stateless]
      -> project to (pid:u32, h:u64) ONLY (wide columns never shuffle)
      -> groupby(pid).map_groups(build)        [holistic: xorf/ribbon/sbbf]
         or per-batch partial + tree merge     [mergeable: sbbf "merge" path]
      -> filter-table Dataset {partition_id, kind, params, payload, metrics}
      -> write_parquet checkpoint (resume = build only missing partitions)

    probe: ray.put(filter blobs) once -> map_batches(Prober actor pool):
    each actor deserializes the filter table once in __init__ and checks
    batches vectorized (the reference's query loop, src/bench.zig:221-235).

Partitions play the reference's "sections" role (one filter per section,
src/bench.zig:36-50); partition_id = multiply-shift on the key hash's high
32 bits, uniform by construction, so url-keyed builds need no skew handling
(SURVEY.md §4).
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import pyarrow as pa

from .hashing import U64, hash_column, murmur64a_u64, partition_ids
from .sketches import FILTER_KINDS, SbbfFilter, num_blocks_for, sketch_from_bytes
from .util import pool

FILTER_TABLE_SCHEMA = pa.schema([
    ("partition_id", pa.int32()),
    ("kind", pa.string()),
    ("params", pa.string()),        # json
    ("num_partitions", pa.int32()),
    ("payload", pa.large_binary()),
    ("n_keys", pa.int64()),         # distinct keys in partition
    ("n_rows", pa.int64()),         # raw rows seen (pre-dedup)
    ("build_s", pa.float64()),
    ("mem_bytes", pa.int64()),
    ("ideal_bytes", pa.int64()),
])


#: per-kind partition sizing targets.  xorf slack shrinks with n (measured
#: xorf3_16 overhead: 39% at 2.4k keys/partition, 23% at 20k, 13% at 1M --
#: reference gets 14.78% at its 1M-key sections), so xorf wants big
#: partitions.  ribbon (u64 band) is the opposite: the multiplier sweep
#: needs MORE space as n grows (measured 5.1% at 50k, 7% at 200k, 9% at
#: 1M) and the band solve is the slowest kernel, so ~200k keys/partition
#: is both smaller and faster.  sbbf overhead is flat in n.
PARTITION_TARGET_KEYS = {"xorf": 1_000_000, "ribbon": 200_000,
                         "sbbf": 1_000_000}


def _as_u8(payload) -> np.ndarray:
    """Wrap an envelope's bytes as a uint8 array (no copy) for ray.put.

    Ray serializes numpy arrays as out-of-band plasma buffers, so every
    `ray.get` on a node returns a READ-ONLY view into one shared mapping
    instead of a private bytes copy per worker.  unpack() decodes such
    views zero-copy for raw RSK1 envelopes (the common case for built
    filters since the incompressible-payload deflate skip), so N probing
    workers share one decoded filter image per node."""
    return np.frombuffer(bytes(payload), dtype=np.uint8)


def choose_num_partitions(n_keys: int, target_keys: int | None = None,
                          kind: str = "xorf") -> int:
    """Partition count from corpus size, NOT cluster size: one filter per
    ~target_keys keys (the reference's 1M-key section, src/bench.zig:36-50,
    bench-data/bench_data.py:8), with a per-kind default target
    (PARTITION_TARGET_KEYS).

    At 10^12 keys this yields ~10^6-10^7 partitions, far above any
    cluster's core count, so parallelism is never the binding constraint
    at scale; undersized corpora simply get fewer build tasks (builds are
    cheap there anyway -- probe/sketch stages parallelize by block
    regardless of P)."""
    if target_keys is None:
        target_keys = PARTITION_TARGET_KEYS.get(kind, 1_000_000)
    return max(1, -(-int(n_keys) // int(target_keys)))


def hashed_keys(ds, key_col: str, num_partitions: int, seed: int = 0):
    """Dataset of (pid:uint32, h:uint64): hash + partition assignment, with
    everything else projected away BEFORE any shuffle (SURVEY.md §7.4.6)."""
    def _hash(batch: pa.Table) -> pa.Table:
        h = hash_column(batch[key_col], seed)
        pid = partition_ids(h, num_partitions)
        return pa.table({"pid": pa.array(pid, pa.uint32()),
                         "h": pa.array(h, pa.uint64())})
    return ds.map_batches(_hash, batch_format="pyarrow")


def _pack_by_pid(batch: pa.Table, coarse: int = 0) -> pa.Table:
    """Pack a (pid, h) block into ONE large_binary blob of raw u64 hash
    bytes per pid: the build exchange then shuffles ~(map_blocks x
    partitions) fat rows instead of one row per key.  Ray's sort-based
    groupby pays per ROW (sampling, per-block argsort, range split)
    -- measured as a ~19 s wall FLOOR for a 93.6M-row (pid,h) exchange
    that is IDENTICAL at 4 and 16 cpus, i.e. a serial resource that
    caps scaling once builds are fast.  Packing moves the same bytes
    through ~7k rows, so the sort's per-row costs vanish.

    coarse > 0 additionally emits `_c` = pid % coarse, the reduce key
    for the coarse exchange (_coarse_group_count): the shuffle's
    intermediate-OBJECT count is map_blocks x reduce_groups, and
    per-object store overhead is the next floor after per-row costs.

    Scale note: emitted rows per map block = min(partitions,
    block_rows); for jobs where num_partitions approaches block row
    counts, bucket pids coarser first (two-level exchange) -- at ~1M
    keys/filter and multi-million-row blocks this stays far from that
    regime."""
    pid = np.asarray(batch["pid"], dtype=np.int64)
    h = np.asarray(batch["h"], dtype=U64)
    if pid.size == 0:
        cols = {"pid": pa.array([], pa.uint32()),
                "blob": pa.array([], pa.large_binary())}
        if coarse:
            cols["_c"] = pa.array([], pa.int32())
        return pa.table(cols)
    order = np.argsort(pid, kind="stable")
    pid_s = pid[order]
    h_s = np.ascontiguousarray(h[order])
    starts = np.flatnonzero(
        np.concatenate([[True], pid_s[1:] != pid_s[:-1]]))
    bounds = np.append(starts, pid_s.size)
    offsets = (bounds * 8).astype(np.int64)
    blob = pa.Array.from_buffers(
        pa.large_binary(), len(starts),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(h_s.tobytes())])
    uniq = pid_s[starts]
    cols = {"pid": pa.array(uniq.astype(np.uint32), pa.uint32()),
            "blob": blob}
    if coarse:
        cols["_c"] = pa.array((uniq % coarse).astype(np.int32))
    return pa.table(cols)


def _unpack_group_hashes(group: pa.Table) -> np.ndarray:
    """Concatenated u64 hashes of one pid's packed blobs.  All rows in
    the group share one pid, so each chunk's payload is one contiguous
    byte range (offsets are ascending within a chunk)."""
    col = group["blob"]
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    parts = []
    for ch in chunks:
        if len(ch) == 0:
            continue
        # a shuffle hop may rewrite large_binary (i64 offsets) as plain
        # binary (i32 offsets); read whichever arrived
        odt = np.int64 if pa.types.is_large_binary(ch.type) else np.int32
        off = np.frombuffer(ch.buffers()[1], dtype=odt)
        off = off[ch.offset:ch.offset + len(ch) + 1]
        data = np.frombuffer(ch.buffers()[2], dtype=np.uint8)
        parts.append(data[int(off[0]):int(off[-1])].view(U64))
    if not parts:
        return np.zeros(0, dtype=U64)
    return np.concatenate(parts) if len(parts) > 1 else parts[0]


def pack_rows_by_part(part: np.ndarray, cols: tuple) -> pa.Table:
    """Generalized _pack_by_pid for (key, value...) exchanges: pack a
    batch's int64 column tuple into ONE large_binary blob per partition
    id (row-major int64 matrix bytes), emitting (_part:int32, blob) --
    ~(map_blocks x parts) fat rows instead of one row per record.
    Ray's sort shuffle pays per ROW (sampling, per-block argsort, range
    split), measured as a cpu-count-independent wall floor on the
    per-key build exchange; the same economics apply to any
    high-row-count exchange (distinct pairs, dedup winners)."""
    k = len(cols)
    if part.size == 0:
        return pa.table({"_part": pa.array([], pa.int32()),
                         "blob": pa.array([], pa.large_binary())})
    order = np.argsort(part, kind="stable")
    ps = part[order]
    mat = np.empty((part.size, k), dtype=np.int64)
    for j, c in enumerate(cols):
        mat[:, j] = c[order]
    starts = np.flatnonzero(
        np.concatenate([[True], ps[1:] != ps[:-1]]))
    bounds = np.append(starts, ps.size)
    offsets = (bounds * (8 * k)).astype(np.int64)
    blob = pa.Array.from_buffers(
        pa.large_binary(), len(starts),
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(mat.tobytes())])
    return pa.table({"_part": pa.array(ps[starts].astype(np.int32)),
                     "blob": blob})


def unpack_part_rows(group: pa.Table, k: int) -> tuple:
    """Inverse of pack_rows_by_part for one _part group: the k int64
    column arrays, concatenated across the group's blobs."""
    col = group["blob"]
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    parts = []
    for ch in chunks:
        if len(ch) == 0:
            continue
        # a shuffle hop may rewrite large_binary (i64 offsets) as plain
        # binary (i32 offsets); read whichever arrived
        odt = np.int64 if pa.types.is_large_binary(ch.type) else np.int32
        off = np.frombuffer(ch.buffers()[1], dtype=odt)
        off = off[ch.offset:ch.offset + len(ch) + 1]
        data = np.frombuffer(ch.buffers()[2], dtype=np.uint8)
        parts.append(data[int(off[0]):int(off[-1])].view(np.int64))
    flat = (np.concatenate(parts) if len(parts) > 1
            else (parts[0] if parts else np.zeros(0, dtype=np.int64)))
    mat = flat.reshape(-1, k)
    return tuple(np.ascontiguousarray(mat[:, j]) for j in range(k))


def pack_strings_by_part(part: np.ndarray, arr) -> pa.Table:
    """String companion to pack_rows_by_part: pack_kv_by_part with zero
    value columns (one codec, see its layout)."""
    return pack_kv_by_part(part, arr, [])


def unpack_part_strings(group: pa.Table):
    """Inverse of pack_strings_by_part for one _part group: one string
    array (type-faithful to the packed source) concatenated across the
    group's blobs."""
    key, _ = unpack_kv_part(group, 0)
    return key


def pack_kv_by_part(part: np.ndarray, keys, vals: list) -> pa.Table:
    """(key, value...) companion to pack_rows_by_part with a string OR
    int64 key and dtype-tagged numpy value columns.  Blob layout:
    [n:int64][kkind:u8][key section][per value: dlen:u8 + dtype.str +
    raw bytes].  kkind 0 = pa.string key / 2 = pa.large_string key
    (both encoded as lens i32[n] + utf8 bytes; the flag restores the
    source type on unpack), 1 = int64.

    Contract: keys must be null-free (a null would decode as "" --
    the validity bitmap does not ride the blob).  Every caller
    guarantees this upstream: grouped_reduce/distinct_keys np.unique
    their keys first, which raises loudly on None in an object array,
    and the dedup/window/LSH exchanges pack engine-generated ids."""
    if part.size == 0:
        return pa.table({"_part": pa.array([], pa.int32()),
                         "blob": pa.array([], pa.large_binary())})
    order = np.argsort(part, kind="stable")
    ps = part[order]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    is_str = isinstance(keys, pa.Array) and (
        pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type))
    if is_str:
        sarr = keys.take(pa.array(order))
        large = pa.types.is_large_string(sarr.type)
        kkind = b"\x02" if large else b"\x00"
        odt = np.int64 if large else np.int32
        offs = np.frombuffer(sarr.buffers()[1], dtype=odt)
        offs = offs[sarr.offset:sarr.offset + len(sarr) + 1].astype(np.int64)
        kdata = np.frombuffer(sarr.buffers()[2], dtype=np.uint8)
        klens = np.diff(offs).astype(np.int32)
    else:
        karr = (np.asarray(keys) if not isinstance(keys, np.ndarray)
                else keys).astype(np.int64)[order]
    svals = [np.ascontiguousarray(np.asarray(v)[order]) for v in vals]
    starts = np.flatnonzero(np.concatenate([[True], ps[1:] != ps[:-1]]))
    bounds = np.append(starts, ps.size)
    blobs = []
    for i, s in enumerate(starts):
        e = bounds[i + 1]
        parts_ = [np.int64(e - s).tobytes()]
        if is_str:
            parts_.append(kkind)
            parts_.append(klens[s:e].tobytes())
            parts_.append(kdata[offs[s]:offs[e]].tobytes())
        else:
            parts_.append(b"\x01")
            parts_.append(karr[s:e].tobytes())
        for v in svals:
            dt = v.dtype.str.encode()
            parts_.append(bytes([len(dt)]))
            parts_.append(dt)
            parts_.append(v[s:e].tobytes())
        blobs.append(b"".join(parts_))
    return pa.table({"_part": pa.array(ps[starts].astype(np.int32)),
                     "blob": pa.array(blobs, pa.large_binary())})


def unpack_kv_part(group: pa.Table, nvals: int):
    """Inverse of pack_kv_by_part for one _part group: (key array --
    pa.string/pa.large_string faithful to the packed source, or
    np.int64 --, [value np arrays])."""
    col = group["blob"]
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    klens_all, kdata_all, kints_all = [], [], []
    vals_all: list[list] = [[] for _ in range(nvals)]
    kind_seen = None
    for ch in chunks:
        if len(ch) == 0:
            continue
        # decode blobs as views into the arrow buffers (sibling pattern
        # of unpack_part_rows) -- no per-blob bytes copy; the section
        # views die when np.concatenate materializes the outputs.  A
        # shuffle hop may rewrite large_binary offsets as binary i32.
        odt = np.int64 if pa.types.is_large_binary(ch.type) else np.int32
        off = np.frombuffer(ch.buffers()[1], dtype=odt)
        off = off[ch.offset:ch.offset + len(ch) + 1]
        cdata = np.frombuffer(ch.buffers()[2], dtype=np.uint8)
        for bi in range(len(ch)):
            b = cdata[int(off[bi]):int(off[bi + 1])]
            pos = 0
            n = int(np.frombuffer(b, np.int64, 1, pos)[0]); pos += 8
            kkind = int(b[pos]); pos += 1
            if kind_seen is None:
                kind_seen = kkind
            if kkind != 1:
                lens = np.frombuffer(b, np.int32, n, pos); pos += 4 * n
                nb = int(lens.sum())
                kdata_all.append(np.frombuffer(b, np.uint8, nb, pos))
                klens_all.append(lens); pos += nb
            else:
                kints_all.append(np.frombuffer(b, np.int64, n, pos))
                pos += 8 * n
            for j in range(nvals):
                dlen = int(b[pos]); pos += 1
                dt = np.dtype(bytes(b[pos:pos + dlen]).decode()); pos += dlen
                vals_all[j].append(np.frombuffer(b, dt, n, pos))
                pos += dt.itemsize * n
    vals = [np.concatenate(v) if v else np.zeros(0) for v in vals_all]
    if kind_seen is None:
        return np.zeros(0, dtype=np.int64), vals
    if kind_seen == 1:
        return (np.concatenate(kints_all) if kints_all
                else np.zeros(0, np.int64)), vals
    lens = np.concatenate(klens_all)
    data = np.concatenate(kdata_all)
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    key = pa.Array.from_buffers(
        pa.large_string(), len(lens),
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(data.tobytes())])
    if kind_seen == 0:
        # source was pa.string: restore it (a single partition's strings
        # fit int32 offsets iff the source column's did)
        key = key.cast(pa.string())
    return key, vals


def _coarse_group_count(num_partitions: int) -> int:
    """Reduce-task count for the build exchange: ~2 groups per cluster
    cpu, capped at num_partitions.  Ray's sort shuffle creates
    (map_blocks x reduce_groups) intermediate objects, and per-object
    store overhead -- NOT bytes -- measured as the exchange's wall
    floor (~20 s for 29x234 objects, identical at 4 and 16 cpus).
    Grouping on pid % C and building the several pids of a coarse
    group inside one reduce task keeps every build single-partition
    (byte-identical outputs) while cutting intermediates to
    map_blocks x C.  On a multi-node cluster C scales with total cpus,
    exactly like the reduce side of a real exchange.

    CAVEAT: cluster_resources() is sampled at graph-construction time,
    so on an autoscaling cluster C is pinned to the pre-scale-up cpu
    count for the whole run.  Pass coarse_groups=... explicitly to
    build_filter_table(s) on clusters expected to scale during the
    build."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:                      # noqa: BLE001 -- planning only
        cpus = 0
    return max(1, min(num_partitions, 2 * (cpus or 8)))


def _packed_groups(group: pa.Table):
    """Yield (pid, hashes) for every pid in a coarse packed group.

    One stable argsort + run-boundary split, linear in group rows.  (A
    per-pid group.filter() scan is O(pids_in_group x group_rows), and
    pids per coarse group grow with num_partitions/C.)"""
    pids = np.asarray(group["pid"], dtype=np.int64)
    if pids.size == 0:
        return
    order = np.argsort(pids, kind="stable")
    spids = pids[order]
    starts = np.flatnonzero(
        np.concatenate([[True], spids[1:] != spids[:-1]]))
    bounds = np.append(starts, len(spids))
    for i, s in enumerate(starts):
        sub = group.take(pa.array(order[s:bounds[i + 1]]))
        yield int(spids[s]), _unpack_group_hashes(sub)


def _build_one(kind: str, params: dict, hashes: np.ndarray,
               pid: int, num_partitions: int,
               self_check: bool = False,
               assume_unique: bool = False,
               n_rows: int | None = None) -> dict:
    t0 = time.perf_counter()
    if assume_unique:   # multi-spec builds dedup once per pid upstream
        uniq = np.asarray(hashes, dtype=U64)
    else:
        uniq = np.unique(np.asarray(hashes, dtype=U64))  # sort+dedup
        # contract, reference src/bench.zig:258-280 (xorf/ribbon
        # hard-require it)
    cls = FILTER_KINDS[kind]
    if kind == "sbbf":
        nb = params.get("num_blocks") or num_blocks_for(
            len(uniq), params.get("bits_per_key", 10))
        # scratch-backed words: a fresh np.zeros per build pays the
        # host's SERIAL first-touch page provisioning (BASELINE.md);
        # safe because to_bytes() copies into the envelope and `f` does
        # not outlive this call
        from .util import scratch
        words = scratch("sbbf.words", nb * 8, U64)
        words[:] = 0
        f = SbbfFilter(words, params.get("bits_per_key", 10))
        f.insert(uniq)
        f.num_keys = len(uniq)
    else:
        f = cls.build(uniq, assume_unique=True,
                      **{k: v for k, v in params.items()
                         if k != "num_blocks"})
    build_s = time.perf_counter() - t0
    if self_check and len(uniq):
        # in-task zero-false-negative verification: runs where the
        # filter was built, touching no driver state and shipping no
        # payload anywhere (the fully-distributed verify used by the
        # scaling bench; mirrors the reference's construct-then-query
        # loop, src/bench.zig:228-233)
        if not f.check(uniq).all():
            raise AssertionError(
                f"false negatives in freshly built {kind} partition {pid}")
    return {
        "partition_id": int(pid), "kind": kind,
        "params": json.dumps(params, sort_keys=True),
        "num_partitions": int(num_partitions),
        "payload": f.to_bytes(), "n_keys": int(f.num_keys),
        # raw pre-dedup rows: with assume_unique the caller deduped,
        # so it must supply the raw count itself
        "n_rows": int(n_rows if n_rows is not None else len(hashes)),
        "build_s": build_s,
        "mem_bytes": int(f.mem_usage()), "ideal_bytes": int(f.ideal_mem_usage()),
    }


def _rows_to_table(rows: list[dict]) -> pa.Table:
    cols = {name: [r[name] for r in rows] for name in FILTER_TABLE_SCHEMA.names}
    return pa.table(cols).cast(FILTER_TABLE_SCHEMA)


def build_filter_table(ds, key_col: str, kind: str = "sbbf",
                       params: dict | None = None,
                       num_partitions: int = 16,
                       checkpoint_dir: str | None = None,
                       seed: int = 0, self_check: bool = False,
                       coarse_groups: int | None = None):
    """Filter-table Dataset: one row per partition.

    self_check=True re-probes each partition's own keys inside the build
    task (zero-false-negative assert, fully distributed; does not alter
    the built payload or the checkpoint identity).

    The groupby(pid) is the single all-to-all exchange; hashes cross it
    packed as one raw-u64 large_binary blob per (map block, pid)
    (_pack_by_pid), so the exchange moves ~8 bytes/key in ~(blocks x
    partitions) rows -- Ray's sort shuffle pays per row, and per-key
    rows made it a cpu-count-independent wall floor.  With a
    checkpoint_dir, already-built partitions are skipped (anti-join on
    partition_id) and only missing ones are rebuilt -- the filter table
    IS the checkpoint (SURVEY.md §4).
    """
    import ray.data as rd

    from .hashing import HASH_VERSION

    params = dict(params or {})
    parts_dir = os.path.join(checkpoint_dir, "parts") if checkpoint_dir else None
    done: set[int] = set()
    manifest = {"key_col": key_col, "kind": kind, "params": params,
                "num_partitions": num_partitions, "seed": seed,
                "hash_version": HASH_VERSION}
    if checkpoint_dir:
        # resume only against a checkpoint built with IDENTICAL build
        # parameters: mixing partitions routed/built under different
        # num_partitions/kind/params/seed silently produces false negatives
        mpath = os.path.join(checkpoint_dir, "MANIFEST.json")
        if os.path.exists(mpath):
            with open(mpath) as fh:
                existing_manifest = json.load(fh)
            if existing_manifest != manifest:
                raise ValueError(
                    f"checkpoint at {checkpoint_dir} was built with "
                    f"{existing_manifest}, but this run requests "
                    f"{manifest}; use a fresh checkpoint_dir (resuming "
                    "across changed build parameters would mix "
                    "incompatible filters)")
        # write the manifest BEFORE building: it is fully determined here,
        # and a crash mid-build must not leave resumable parts/*.parquet
        # with no manifest (that would let a later resume with different
        # parameters bypass the equality check above)
        os.makedirs(checkpoint_dir, exist_ok=True)
        with open(mpath, "w") as fh:
            json.dump(manifest, fh)
    if parts_dir and os.path.isdir(parts_dir) and any(
            f.endswith(".parquet") for f in os.listdir(parts_dir)):
        done = {int(r) for r in
                rd.read_parquet(parts_dir).to_pandas()["partition_id"]}

    C = coarse_groups or _coarse_group_count(num_partitions)
    keys = hashed_keys(ds, key_col, num_partitions, seed).map_batches(
        lambda t, _C=C: _pack_by_pid(t, _C), batch_format="pyarrow")
    if done:
        done_arr = np.array(sorted(done), dtype=np.int64)
        keys = keys.map_batches(
            lambda t: t.filter(pa.array(~np.isin(
                np.asarray(t["pid"]).astype(np.int64), done_arr))),
            batch_format="pyarrow")

    def build_group(group: pa.Table) -> pa.Table:
        return _rows_to_table([
            _build_one(kind, params, h, pid, num_partitions,
                       self_check=self_check)
            for pid, h in _packed_groups(group)])

    built = keys.groupby("_c").map_groups(build_group, batch_format="pyarrow")
    if checkpoint_dir:
        os.makedirs(parts_dir, exist_ok=True)
        built = built.materialize()
        if built.count() > 0:
            built.write_parquet(parts_dir)
        from raysketch.util import read_parquet_sized
        return read_parquet_sized(parts_dir)
    return built


def build_filter_tables(ds, key_col: str, specs, num_partitions: int = 16,
                        seed: int = 0, self_check: bool = False,
                        coarse_groups: int | None = None):
    """Several filter kinds for ONE hash+shuffle.

    The reference bench builds four configs over the same corpus
    (src/bench.zig:195-249); at cluster scale the (pid,h) exchange is
    the expensive step, so sharing it builds every spec for one
    shuffle's price.  Returns one filter-table Dataset with len(specs)
    rows per partition; each row is byte-identical to what a separate
    build_filter_table(kind, params) call produces (builds are
    deterministic over the sorted unique hashes -- pytest-pinned).
    Filter rows by 'kind'/'params' to split per spec."""
    specs = [(kind, dict(params or {})) for kind, params in specs]
    C = coarse_groups or _coarse_group_count(num_partitions)
    keys = hashed_keys(ds, key_col, num_partitions, seed).map_batches(
        lambda t, _C=C: _pack_by_pid(t, _C), batch_format="pyarrow")

    def build_group(group: pa.Table) -> pa.Table:
        # dedup ONCE per pid (np.unique of 1M u64 ~ one xorf build's
        # wall), then every spec builds over the same sorted uniques --
        # byte-identical to per-spec dedup since np.unique is idempotent
        return _rows_to_table([
            _build_one(kind, params, uniq, pid, num_partitions,
                       self_check=self_check, assume_unique=True,
                       n_rows=len(h))
            for pid, h in _packed_groups(group)
            for uniq in (np.unique(np.asarray(h, dtype=U64)),)
            for kind, params in specs])

    return keys.groupby("_c").map_groups(build_group,
                                         batch_format="pyarrow")


def load_filters(filter_table) -> dict[int, object]:
    """Materialize a (small) filter table into {pid: filter}."""
    if hasattr(filter_table, "to_arrow_refs"):
        rows = filter_table.to_pandas()
    else:
        rows = filter_table
    out = {}
    for _, r in rows.iterrows():
        out[int(r["partition_id"])] = sketch_from_bytes(bytes(r["payload"]))
    return out


# Per-worker deserialized-filter cache: probe state is IMMUTABLE broadcast
# data, so plain tasks + a worker-global cache give the "deserialize once
# per worker" property of an actor pool without paying actor-process
# startup on every map_batches call (measured 3-8x faster at small scale;
# identical shape at cluster scale -- the ray.put blob ships to each node
# once and every task on that node reuses the decoded filters).
#
# MAX is 2, not a deep LRU: holding several decoded broadcast sets
# (~40 MB each of small numpy arrays) in a long-lived worker heap
# measurably degrades ALL subsequent compute in that worker -- a fixed
# numpy busy-loop went 6 ms -> 117 ms and probe wall time 1.7 s -> 15 s
# by the 4th consecutive probe (host page-provisioning throttle, see
# BASELINE.md; reproduced only with >= 3 retained sets, flat at <= 2).
# Depth 2 additionally protects a fused pipeline that alternates two
# tables per batch (e.g. chained probes) from evict-thrash; switching
# past 2 tables costs one ~0.3 s decode each.
_FILTER_CACHE: dict[str, dict[int, object]] = {}
_FILTER_CACHE_MAX = 2

# Same idea for SINGLE partition payloads on the colocated probe path.
# Within one colocated probe a worker's shards cover DISJOINT pid sets,
# so depth only helps repeated probes of the same table; the cap is by
# TOTAL DECODED BYTES (~2 broadcast-set equivalents), not entry count --
# at ~1M keys/partition one decoded filter is MBs, and a 16-entry count
# cap could retain the same >= 3x ~40 MB heap footprint that measurably
# degraded all compute in a long-lived worker (see above).
_SINGLE_FILTER_CACHE: dict[str, object] = {}
_SINGLE_FILTER_CACHE_MAX_BYTES = 80 << 20


def _cached_single_filter(ref):
    import ray
    key = ref.hex()
    f = _SINGLE_FILTER_CACHE.get(key)
    if f is None:
        f = sketch_from_bytes(ray.get(ref))
        new_bytes = int(f.mem_usage())
        held = sum(int(v.mem_usage())
                   for v in _SINGLE_FILTER_CACHE.values())
        while _SINGLE_FILTER_CACHE and \
                held + new_bytes > _SINGLE_FILTER_CACHE_MAX_BYTES:
            old = _SINGLE_FILTER_CACHE.pop(next(iter(_SINGLE_FILTER_CACHE)))
            held -= int(old.mem_usage())
        _SINGLE_FILTER_CACHE[key] = f
    return f


def _cached_filters(blobs_ref) -> dict[int, object]:
    import ray
    key = blobs_ref.hex()
    filters = _FILTER_CACHE.get(key)
    if filters is None:
        filters = {pid: sketch_from_bytes(b)
                   for pid, b in ray.get(blobs_ref).items()}
        while len(_FILTER_CACHE) >= _FILTER_CACHE_MAX:
            _FILTER_CACHE.pop(next(iter(_FILTER_CACHE)))
        _FILTER_CACHE[key] = filters
    return filters


def _probe_batch(filters: dict[int, object], h: np.ndarray,
                 num_partitions: int) -> np.ndarray:
    pid = partition_ids(h, num_partitions)
    hit = np.zeros(len(h), dtype=bool)
    order = np.argsort(pid, kind="stable")
    sorted_pid = pid[order]
    bounds = np.searchsorted(
        sorted_pid, np.arange(num_partitions + 1), side="left")
    for p in np.unique(sorted_pid):
        f = filters.get(int(p))
        if f is None:
            continue
        sel = order[bounds[p]:bounds[p + 1]]
        hit[sel] = f.check(h[sel])
    return hit


class Prober:
    """Actor-pool probe stage (kept for pipelines that want an explicit
    long-lived pool, e.g. a resident probe service): deserialize the
    broadcast filter table ONCE per actor (__init__), check batches
    vectorized (__call__) -- the stateful-stage pattern of SURVEY.md §2.3."""

    def __init__(self, blobs_ref, key_col: str, num_partitions: int,
                 seed: int = 0, out_col: str = "hit"):
        import ray
        blobs = ray.get(blobs_ref) if not isinstance(blobs_ref, dict) else blobs_ref
        self.filters = {pid: sketch_from_bytes(b) for pid, b in blobs.items()}
        self.key_col = key_col
        self.num_partitions = num_partitions
        self.seed = seed
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = hash_column(batch[self.key_col], self.seed)
        hit = _probe_batch(self.filters, h, self.num_partitions)
        return batch.append_column(self.out_col, pa.array(hit))


def _payload_refs(filter_table):
    """{partition_id: ObjectRef(payload bytes)} + num_partitions.  Filter
    table blocks stream to the DRIVER one at a time and each payload is
    ray.put there: the driver holds at most one block of payload bytes at
    any moment, and -- critically -- it OWNS every ref.  Refs created
    inside short-lived worker tasks die with their owner (OwnerDiedError
    mid-probe once Ray culls the idle worker), exactly on the long
    large-filter-table jobs this path exists for; the driver is the one
    process guaranteed to outlive the probe."""
    import ray

    if hasattr(filter_table, "to_arrow_refs"):
        memo = getattr(filter_table, "_raysketch_payload_refs", None)
        if memo is not None:
            return memo
        out, num_partitions = {}, None
        for block_ref in filter_table.to_arrow_refs():
            tbl = ray.get(block_ref)
            if tbl.num_rows == 0:   # aggregator empty blocks are schemaless
                continue
            for pid, p in zip(tbl["partition_id"].to_pylist(),
                              tbl["payload"].to_pylist()):
                out[int(pid)] = ray.put(_as_u8(p))
            num_partitions = num_partitions or int(
                tbl["num_partitions"][0].as_py())
            del tbl
        filter_table._raysketch_payload_refs = (out, num_partitions or 1)
        return out, (num_partitions or 1)
    # pandas path (already driver-resident, i.e. small)
    pdf = filter_table
    refs = {int(r["partition_id"]): ray.put(_as_u8(r["payload"]))
            for _, r in pdf.iterrows()}
    npart = int(pdf["num_partitions"].iloc[0]) if len(pdf) else 1
    return refs, npart


def probe_colocated(filter_table, ds, key_col: str, out_col: str = "hit",
                    seed: int = 0, shuffle_parts: int | None = None):
    """Partition-colocated probe for filter tables too large to broadcast.

    Each payload goes to the object store INDIVIDUALLY (driver-owned
    refs; the driver only ever holds the id->ObjectRef dict plus one
    in-flight block); probe rows shuffle once by a COARSE shard key
    (pid % nshards, nshards sized from the cluster) and each group task
    probes every pid-run in its shard, fetching + decoding only those
    partitions' filters (cached per worker).  Grouping by the raw pid
    would cost one Python group-call per partition -- ~1ms each, i.e.
    ~20 minutes of pure dispatch at the 10^6-partition scale this path
    targets.  Per-task state is a handful of filters instead of the whole
    table, so a multi-TB filter table never assembles anywhere.  Output
    rows are identical to probe() but arrive groupby-ordered."""
    from .dedup import _shuffle_parts

    refs, num_partitions = _payload_refs(filter_table)
    nshards = min(_shuffle_parts(shuffle_parts), max(1, num_partitions))

    def assign(batch: pa.Table) -> pa.Table:
        h = hash_column(batch[key_col], seed)
        pid = partition_ids(h, num_partitions).astype(np.int32)
        return (batch.append_column("__pid", pa.array(pid))
                     .append_column("__shard",
                                    pa.array(pid % np.int32(nshards))))

    def probe_group(group: pa.Table) -> pa.Table:
        pid = np.asarray(group["__pid"])
        body = group.drop_columns(["__pid", "__shard"])
        h = hash_column(body[key_col], seed)
        hit = np.zeros(len(body), dtype=bool)
        order = np.argsort(pid, kind="stable")
        sp = pid[order]
        bounds = np.flatnonzero(np.concatenate(
            [[True], sp[1:] != sp[:-1], [True]]))
        for s, e in zip(bounds[:-1], bounds[1:]):
            ref = refs.get(int(sp[s]))
            if ref is None:
                continue
            f = _cached_single_filter(ref)
            sel = order[s:e]
            hit[sel] = f.check(h[sel])
        return body.append_column(out_col, pa.array(hit))

    return (ds.map_batches(assign, batch_format="pyarrow")
              .groupby("__shard")
              .map_groups(probe_group, batch_format="pyarrow"))


#: filter tables above this total payload size are probed colocated
#: instead of broadcast (a broadcast ships the WHOLE table to every node;
#: at the 1M-keys/partition target a 10^12-key corpus is ~2TB of state)
PROBE_BROADCAST_LIMIT = 128 << 20


def probe(filter_table, ds, key_col: str, out_col: str = "hit",
          concurrency: int | None = None, seed: int = 0,
          use_actors: bool = False,
          max_broadcast_bytes: int = PROBE_BROADCAST_LIMIT):
    """ds + boolean membership column.

    Small filter tables (total payload <= max_broadcast_bytes): broadcast
    (ray.put once; workers deserialize once), no shuffle.  Larger tables
    dispatch to probe_colocated() -- one shuffle of the probe rows by
    partition id, one filter per task.  Both paths produce identical hit
    columns (pytest-verified); only row order differs.

    Default broadcast path is stateless tasks with a per-worker
    decoded-filter cache; pass use_actors=True for a dedicated actor pool
    (same semantics).  `concurrency` sizes the actor pool; on the task
    path it is honored as a max-concurrent-tasks cap when explicitly given
    (None = let the streaming executor schedule freely)."""
    import ray

    if hasattr(filter_table, "map_batches"):
        # Repeat probes of the same table (present keys, then absent keys;
        # a verify pass) must share ONE ray.put ref: besides skipping the
        # driver-side collection, a shared ref is what lets the per-worker
        # decode cache hit instead of re-decoding -- and re-decoding under
        # clear-on-miss is what the _FILTER_CACHE comment above prices.
        memo = getattr(filter_table, "_raysketch_broadcast", None)
        if memo is not None:
            ref, num_partitions, memo_bytes = memo
            if memo_bytes <= max_broadcast_bytes:   # honor a tighter cap
                return _probe_broadcast(ds, ref, key_col, num_partitions,
                                        seed, out_col, concurrency,
                                        use_actors)
            return probe_colocated(filter_table, ds, key_col, out_col, seed)
        # single streaming pass sizes the dispatch AND collects the blobs:
        # the driver accumulates payloads only up to max_broadcast_bytes
        # (+1 payload) and bails to the colocated path the moment the
        # budget is exceeded -- one Dataset execution instead of a
        # separate sizing pipeline + to_pandas
        blobs, num_partitions, total_bytes = {}, None, 0
        for t in filter_table.iter_batches(batch_format="pyarrow"):
            if t.num_rows == 0:     # aggregator empty blocks are schemaless
                continue
            num_partitions = num_partitions or int(
                t["num_partitions"][0].as_py())
            for pid, p in zip(t["partition_id"].to_pylist(),
                              t["payload"].to_pylist()):
                b = _as_u8(p)   # uint8 view: plasma-zero-copy on ray.get
                total_bytes += b.nbytes
                blobs[int(pid)] = b
            if total_bytes > max_broadcast_bytes:
                break
        if total_bytes > max_broadcast_bytes:
            del blobs
            return probe_colocated(filter_table, ds, key_col, out_col, seed)
        num_partitions = num_partitions or 1
    else:
        pdf = filter_table
        total_bytes = int(sum(len(p) for p in pdf["payload"])) \
            if len(pdf) else 0
        if total_bytes > max_broadcast_bytes:
            return probe_colocated(pdf, ds, key_col, out_col, seed)
        blobs = {int(r["partition_id"]): _as_u8(r["payload"])
                 for _, r in pdf.iterrows()}
        num_partitions = int(pdf["num_partitions"].iloc[0]) if len(pdf) \
            else 1
    ref = ray.put(blobs)
    if hasattr(filter_table, "map_batches"):
        # remember the broadcast for repeat probes of this table (plain
        # attribute: lives and dies with the Dataset object; pandas
        # tables warn on attribute assignment, so Datasets only)
        filter_table._raysketch_broadcast = (ref, num_partitions,
                                             total_bytes)
    return _probe_broadcast(ds, ref, key_col, num_partitions, seed,
                            out_col, concurrency, use_actors)


def _probe_broadcast(ds, ref, key_col, num_partitions, seed, out_col,
                     concurrency, use_actors):
    def probe_task(batch: pa.Table) -> pa.Table:
        filters = _cached_filters(ref)
        h = hash_column(batch[key_col], seed)
        hit = _probe_batch(filters, h, num_partitions)
        return batch.append_column(out_col, pa.array(hit))

    if use_actors:
        return ds.map_batches(
            Prober, batch_format="pyarrow",
            fn_constructor_args=(ref, key_col, num_partitions, seed, out_col),
            concurrency=pool(concurrency or 4))
    kwargs = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(probe_task, batch_format="pyarrow", **kwargs)


def build_filter_table_sbbf_merge(ds, key_col: str, bits_per_key: int = 10,
                                  num_partitions: int = 16,
                                  expected_keys: int | None = None,
                                  seed: int = 0):
    """SBBF as a mergeable UDAF: per-(batch, partition) partial filters,
    OR tree-merge in groupby(pid) -- raw key hashes never shuffle, only
    compact partial states do (the north-rule UDAF shape; OR is
    associative+commutative so the result is bit-identical to a
    single-shot build at the same num_blocks, property-tested).

    Sizing: partial states must share num_blocks across batches, so blocks
    are sized up-front from the (estimated) per-partition key count with a
    1.2x margin -- oversizing only lowers FPR.  Each partial carries a
    small HLL so the merged row still reports a distinct-key estimate."""
    from .sketches import HllSketch

    if expected_keys is None:
        expected_keys = ds.count()
    per_part = max(64, int(expected_keys / num_partitions * 1.2))
    nb = num_blocks_for(per_part, bits_per_key)

    def partial(batch: pa.Table) -> pa.Table:
        h = hash_column(batch[key_col], seed)
        pid = partition_ids(h, num_partitions)
        order = np.argsort(pid, kind="stable")
        sp, sh = pid[order], h[order]
        bounds = np.searchsorted(sp, np.arange(num_partitions + 1))
        rows_pid, rows_state, rows_hll, rows_n = [], [], [], []
        for p in np.unique(sp):
            seg = sh[bounds[p]:bounds[p + 1]]
            f = SbbfFilter.create(nb, bits_per_key)
            f.insert(seg)
            hll = HllSketch.create(p=12)
            # remix before HLL: partition assignment consumed the hash's
            # high bits, so within a partition they are confined to a 1/P
            # slice -- HLL indexes by exactly those bits and would
            # underestimate badly without an independent remix
            hll.update(murmur64a_u64(seg, 0xD1B54A32D192ED03))
            rows_pid.append(int(p))
            rows_state.append(f.to_bytes())
            rows_hll.append(hll.to_bytes())
            rows_n.append(len(seg))
        return pa.table({
            "pid": pa.array(rows_pid, pa.int32()),
            "state": pa.array(rows_state, pa.large_binary()),
            "hll": pa.array(rows_hll, pa.large_binary()),
            "n_rows": pa.array(rows_n, pa.int64()),
        })

    def merge_group(group: pa.Table) -> pa.Table:
        import time as _t
        t0 = _t.perf_counter()
        pid = int(group["pid"][0].as_py())
        acc = None
        hacc = None
        for st, hl in zip(group["state"], group["hll"]):
            f = SbbfFilter.from_bytes(st.as_py())
            acc = f if acc is None else acc.merge(f)
            h = HllSketch.from_bytes(hl.as_py())
            hacc = h if hacc is None else hacc.merge(h)
        n_keys = int(round(hacc.estimate()))
        acc.num_keys = n_keys
        return _rows_to_table([{
            "partition_id": pid, "kind": "sbbf",
            "params": json.dumps({"bits_per_key": bits_per_key,
                                  "num_blocks": nb, "merge_path": True},
                                 sort_keys=True),
            "num_partitions": num_partitions,
            "payload": acc.to_bytes(),
            "n_keys": n_keys,
            "n_rows": int(np.asarray(group["n_rows"]).sum()),
            "build_s": _t.perf_counter() - t0,
            "mem_bytes": acc.mem_usage(),
            "ideal_bytes": n_keys * bits_per_key // 8,
        }])

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("pid")
              .map_groups(merge_group, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Global mergeable-sketch aggregation: per-batch partial states -> tree merge
# (the "pre-aggregate inside map_batches, shuffle only tiny states" pattern;
# no raw data crosses the exchange at all).
# ---------------------------------------------------------------------------

def sketch_aggregate(ds, col: str, make_sketch, update,
                     merge_shards: int = 16, seed: int = 0):
    """Aggregate a whole Dataset column into ONE mergeable sketch.

    make_sketch() -> fresh state; update(sketch, pa.Array chunk) mutates.
    Stage 1 map_batches (batch_size=None -> one partial PER BLOCK, not per
    1024-row micro-batch: sketch states can be MBs, so partial count -- and
    hence shuffle bytes = count x state_size -- must track block count, not
    row count).  Stage 2 groupby(shard).map_groups: merge within shard
    (tree level 1).  Stage 3 driver: merge <= merge_shards states (root).
    """
    def partial(batch: pa.Table) -> pa.Table:
        s = make_sketch()
        update(s, batch[col])
        blob = s.to_bytes()
        # zlib.crc32 (not builtin hash): deterministic across processes so
        # shard assignment -- hence merge grouping -- is reproducible
        shard = (zlib.crc32(blob) & 0x7FFFFFFF) % merge_shards
        return pa.table({"shard": pa.array([shard], pa.int32()),
                         "state": pa.array([blob], pa.large_binary())})

    def merge_group(group: pa.Table) -> pa.Table:
        acc = None
        for blob in group["state"]:
            s = sketch_from_bytes(blob.as_py())
            acc = s if acc is None else acc.merge(s)
        return pa.table({"shard": [group["shard"][0].as_py()],
                         "state": pa.array([acc.to_bytes()],
                                           pa.large_binary())})

    states = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
                .groupby("shard")
                .map_groups(merge_group, batch_format="pyarrow"))
    acc = None
    for b in states.iter_batches(batch_format="pyarrow"):
        for blob in b["state"]:
            s = sketch_from_bytes(blob.as_py())
            acc = s if acc is None else acc.merge(s)
    if acc is None:
        acc = make_sketch()
    return acc


def grouped_sketch_aggregate(ds, key_fn, value_fn, make_sketch,
                             key_name: str = "key", num_salts: int = 1):
    """Per-key mergeable sketches (e.g. HLL of distinct urls per host) with
    salted pre-aggregation for skewed keys (SURVEY.md §4): stage 1 emits one
    partial state per (batch, key, salt) -- the salt splits a hot key's
    partials across `num_salts` reducers -- stage 2 merges per (key, salt),
    stage 3 merges the <=num_salts states per key.  For num_salts=1 stages
    2/3 collapse into one groupby.

    key_fn(batch) -> pa.Array of keys; value_fn(batch) -> np.ndarray[u64]
    hashed values to feed the sketch.  Returns Dataset (key, state:binary).
    """
    def partial(batch: pa.Table) -> pa.Table:
        keys = key_fn(batch)
        vals = value_fn(batch)
        karr = np.asarray(keys)
        order = np.argsort(karr, kind="stable")
        karr, vals = karr[order], vals[order]
        uniq, starts = np.unique(karr, return_index=True)
        bounds = np.append(starts, len(karr))
        out_k, out_salt, out_state = [], [], []
        for i, k in enumerate(uniq):
            seg = vals[bounds[i]:bounds[i + 1]]
            s = make_sketch()
            s.update(seg)
            out_k.append(str(k))
            out_salt.append(int(seg[0] % np.uint64(num_salts))
                            if num_salts > 1 else 0)
            out_state.append(s.to_bytes())
        return pa.table({key_name: pa.array(out_k),
                         "salt": pa.array(out_salt, pa.int32()),
                         "state": pa.array(out_state, pa.large_binary())})

    # int32 hash-partition shuffle instead of Ray's sort groupby on the
    # (string key, salt) pair: key cardinality is unbounded at scale and
    # the sort aggregate degrades with group count.  One merge task per
    # partition handles ALL its (key, salt) runs.
    from .hashing import hash_strings
    _P = 64

    def _with_part(t: pa.Table, use_salt: bool) -> pa.Table:
        h = hash_strings(t[key_name])
        if use_salt:
            h = h ^ (np.asarray(t["salt"]).astype(np.uint64)
                     * np.uint64(0x9E3779B97F4A7C15))
        return t.append_column(
            "_part", pa.array((h % np.uint64(_P)).astype(np.int32)))

    def merge_runs(g: pa.Table) -> pa.Table:
        keys = np.asarray(g[key_name])
        salts = np.asarray(g["salt"])
        order = np.lexsort((salts, keys))
        keys_s, salts_s = keys[order], salts[order]
        states = g["state"].combine_chunks().take(pa.array(order))
        starts = np.flatnonzero(np.concatenate(
            [[True], (keys_s[1:] != keys_s[:-1])
             | (salts_s[1:] != salts_s[:-1])]))
        bounds = np.append(starts, len(keys_s))
        out_k, out_state = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            acc = sketch_from_bytes(states[s].as_py())
            for j in range(s + 1, e):
                acc = acc.merge(sketch_from_bytes(states[j].as_py()))
            out_k.append(keys_s[s])
            out_state.append(acc.to_bytes())
        return pa.table({key_name: pa.array(out_k, g[key_name].type),
                         "salt": pa.array(np.zeros(len(out_k), np.int32)),
                         "state": pa.array(out_state, pa.large_binary())})

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .map_batches(lambda t: _with_part(t, True),
                          batch_format="pyarrow")
             .groupby("_part")
             .map_groups(merge_runs, batch_format="pyarrow"))
    if num_salts > 1:
        out = (out.map_batches(lambda t: _with_part(t, False),
                               batch_format="pyarrow")
                  .groupby("_part")
                  .map_groups(merge_runs, batch_format="pyarrow"))
    return out.map_batches(lambda t: t.select([key_name, "state"]),
                           batch_format="pyarrow")


def grouped_count(ds, key_fn, key_name: str = "key", count_name: str = "n"):
    """Exact per-key counts with per-batch partial aggregation (combiner)
    before the shuffle -- only (key, partial_count) rows cross the exchange,
    which is the salted/pre-aggregated path for skewed keys (SURVEY.md §4).

    key_fn(batch: pa.Table) -> pa.Array of group keys.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        keys = key_fn(batch)
        vc = pd.Series(keys.to_pandas()).value_counts()
        return pa.table({key_name: pa.array(vc.index.astype(str)),
                         "partial": pa.array(vc.values.astype(np.int64))})

    # hash-partitioned sum of the partials (grouped_reduce): Ray's
    # sort-based groupby aggregate degrades with group count, and key
    # cardinality here (hosts, tokens) is unbounded at scale
    return grouped_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        key_name, [("partial", "sum", count_name)])


def topk_by_count(ds, key_fn, k: int, key_name: str = "key",
                  count_name: str = "n"):
    """Exact top-k keys by count: per-batch combiner counts -> one shuffle
    on the key -> per-block local top-k -> tiny driver merge.  Only
    (key, count) rows move; the driver sees at most k rows per block.

    Tie rule (pinned for the SQL oracle): order by count DESC, key ASC."""
    import pandas as pd

    counts = grouped_count(ds, key_fn, key_name=key_name,
                           count_name=count_name)

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            [count_name, key_name], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = counts.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = parts.sort_values([count_name, key_name],
                            ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


def tokens_of(batch: pa.Table, text_col: str = "text") -> pa.Array:
    """Flattened non-empty whitespace tokens of a batch (vectorized)."""
    import pyarrow.compute as pc
    toks = pc.split_pattern_regex(batch[text_col], r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values
    return flat.filter(pc.not_equal(flat, ""))


def resumable_write(ds, out_dir: str, key_col: str, num_shards: int = 16,
                    seed: int = 0):
    """Atomically-resumable partitioned Parquet sink: rows are hash-sharded
    on key_col; each shard is written by its own task to shard_{i}.parquet
    via tmp-file + os.rename (atomic on POSIX), so a re-run skips exactly
    the shards whose files exist and rewrites the rest -- no torn output,
    never one giant file.  Returns a manifest DataFrame (one row/shard)."""
    import pandas as pd
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    done = {int(f[len("shard_"):-len(".parquet")])
            for f in os.listdir(out_dir)
            if f.startswith("shard_") and f.endswith(".parquet")}

    def assign(batch: pa.Table) -> pa.Table:
        h = hash_column(batch[key_col], seed)
        shard = partition_ids(h, num_shards).astype(np.int32)
        keep = ~np.isin(shard, np.array(sorted(done), dtype=np.int32)) \
            if done else np.ones(len(shard), dtype=bool)
        return batch.append_column("__shard", pa.array(shard)).filter(
            pa.array(keep))

    def write_shard(group: pa.Table) -> pa.Table:
        shard = int(group["__shard"][0].as_py())
        body = group.drop_columns(["__shard"])
        final = os.path.join(out_dir, f"shard_{shard}.parquet")
        tmp = final + f".tmp-{os.getpid()}"
        pq.write_table(body, tmp)
        os.replace(tmp, final)
        return pa.table({"shard": pa.array([shard], pa.int32()),
                         "n_rows": pa.array([len(body)], pa.int64()),
                         "skipped": pa.array([False])})

    written = (ds.map_batches(assign, batch_format="pyarrow")
                 .groupby("__shard")
                 .map_groups(write_shard, batch_format="pyarrow")
                 .to_pandas())
    skipped = pd.DataFrame({"shard": sorted(done),
                            "n_rows": -1, "skipped": True})
    out = pd.concat([written, skipped], ignore_index=True)
    return out.sort_values("shard").reset_index(drop=True)


def grouped_reduce(ds, key_col: str, specs, num_partitions: int = 64):
    """Per-key min/max/sum reductions: per-batch vectorized combine, int32
    hash-partition shuffle, per-partition run reduce.

    specs: [(value_col, 'min'|'max'|'sum', alias), ...]; output columns
    are key_col + aliases.  Replaces Ray's sort-based groupby aggregate,
    which degrades with group count (measured 34.5 s vs <1 s at ~20k
    groups); only one combined row per batch-local key crosses the
    exchange.  Key and value dtypes are preserved (string keys, int and
    timestamp values all reduce as numpy arrays)."""
    from .hashing import hash_column
    ops = {"min": np.minimum, "max": np.maximum, "sum": np.add}

    def _reduce_runs(keys: np.ndarray, varrs):
        if keys.size == 0:
            return keys, [v[:0] for v in varrs]
        uk, inv = np.unique(keys, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        inv_s = inv[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], inv_s[1:] != inv_s[:-1]]))
        return uk, [ops[op].reduceat(v[order], starts)
                    for (_, op, _), v in zip(specs, varrs)]

    def _runs(tbl: pa.Table, val_names):
        return _reduce_runs(np.asarray(tbl[key_col]),
                            [np.asarray(tbl[n]) for n in val_names])

    def partial(batch: pa.Table) -> pa.Table:
        uk, red = _runs(batch, [vc for vc, _, _ in specs])
        karr = pa.array(uk, batch[key_col].type)
        h = hash_column(karr)
        part = (h % np.uint64(num_partitions)).astype(np.int64)
        kt = karr.type
        # utf8 and int64 keys ride the exchange packed (one blob row per
        # partition id, pack_kv_by_part); other key dtypes -- and any
        # object-dtype VALUE column (e.g. a string value), whose raw
        # bytes are pointers and cannot ride a blob -- keep the per-row
        # column flow (dtype is constant across batches, so the output
        # schema stays consistent either way)
        vecs = [np.asarray(r) for r in red]
        if ((pa.types.is_string(kt) or pa.types.is_large_string(kt)
                or uk.dtype == np.int64)
                and all(v.dtype != object for v in vecs)):
            keys = karr if uk.dtype == object else uk
            return pack_kv_by_part(part, keys, vecs)
        cols = {key_col: karr, "_part": pa.array(part.astype(np.int32))}
        for (vc, _, alias), r in zip(specs, red):
            cols[alias] = pa.array(r, batch[vc].type)
        return pa.table(cols)

    def final(g: pa.Table) -> pa.Table:
        if "blob" in g.column_names:
            key, vals = unpack_kv_part(g, len(specs))
            uk, red = _reduce_runs(np.asarray(key), vals)
            ktype = key.type if uk.dtype == object else None
            cols = {key_col: pa.array(uk, ktype)}
            for (_, _, alias), r in zip(specs, red):
                cols[alias] = pa.array(r)
            return pa.table(cols)
        uk, red = _runs(g, [alias for _, _, alias in specs])
        cols = {key_col: pa.array(uk, g[key_col].type)}
        for (_, _, alias), r in zip(specs, red):
            cols[alias] = pa.array(r, g[alias].type)
        return pa.table(cols)

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("_part").map_groups(final, batch_format="pyarrow"))


grouped_minmax = grouped_reduce  # alias: min/max-only call sites


def key_set_op(left_ds, left_col: str, right_ds, right_col: str,
               op: str = "intersect", key_name: str = "key"):
    """Exact distributed set operation over two key columns (DISTINCT
    semantics): 'intersect', 'except' (left - right), or 'union'.

    Shape: per-batch np.unique + side tag -> ONE shuffle on the key ->
    per-group presence test.  Only deduped (key, side) pairs cross the
    exchange; both sides may be large (no broadcast)."""
    if op not in ("intersect", "except", "union"):
        raise ValueError(f"unknown set op {op!r}")

    def tag(col: str, side: int):
        def fn(t: pa.Table) -> pa.Table:
            u = np.unique(np.asarray(t[col]))
            return pa.table({key_name: pa.array(u),
                             "side": pa.array(
                                 np.full(len(u), side, dtype=np.int8))})
        return fn

    both = (left_ds.map_batches(tag(left_col, 0), batch_format="pyarrow")
            .union(right_ds.map_batches(tag(right_col, 1),
                                        batch_format="pyarrow")))
    agg = grouped_reduce(both, key_name, [("side", "min", "min_side"),
                                          ("side", "max", "max_side")])

    def keep(t: pa.Table) -> pa.Table:
        lo = np.asarray(t["min_side"])
        hi = np.asarray(t["max_side"])
        if op == "intersect":
            mask = (lo == 0) & (hi == 1)
        elif op == "except":
            mask = (lo == 0) & (hi == 0)
        else:
            mask = np.ones(len(lo), dtype=bool)
        return pa.table({key_name: t[key_name].filter(pa.array(mask))})

    return agg.map_batches(keep, batch_format="pyarrow")


def distinct_keys(ds, key_col: str, num_partitions: int = 64):
    """Exact distributed dedup of one column: per-batch np.unique partial,
    then an int64-HASH-partitioned shuffle with a vectorized per-partition
    unique (sort+adjacent-unique contract of reference src/bench.zig:258-280,
    lifted to the cluster).  Grouping by a small int32 partition key instead
    of the string itself avoids Ray's string-boundary sort shuffle --
    measured 3.9 s -> 0.45 s over 155k urls at 32 cpus.  Each partition's
    distinct keys are uniqued in one task; size num_partitions for ~1M
    distinct keys/partition at scale (same assumption as the filter
    builds, choose_num_partitions)."""
    from .hashing import hash_column

    def partial(batch: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(batch[key_col]))
        arr = pa.array(u, batch[key_col].type)
        h = hash_column(arr)
        part = (h % np.uint64(num_partitions)).astype(np.int64)
        if pa.types.is_string(arr.type) or pa.types.is_large_string(
                arr.type):
            # strings ride the exchange packed: one blob row per
            # partition id instead of one row per distinct key
            # (pack_rows_by_part economics; output type faithful to the
            # input via the codec's kind flag)
            return pack_strings_by_part(part, arr)
        return pa.table({
            key_col: arr,
            "_part": pa.array(part.astype(np.int32)),
        })

    def uniq(g: pa.Table) -> pa.Table:
        if "blob" in g.column_names:
            key = unpack_part_strings(g)
            u = np.unique(np.asarray(key))
            return pa.table({key_col: pa.array(u, key.type)})
        return pa.table({key_col: pa.array(
            np.unique(np.asarray(g[key_col])), g[key_col].type)})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("_part").map_groups(uniq, batch_format="pyarrow"))


def hash_sample(ds, key_col: str, rate: float, kernel: str = "gxh64"):
    """Deterministic hash-threshold row sample: keep a row iff the key's
    16-bit hash slice < floor(rate * 2^16).  Reproducible across engines,
    runs, partitionings and cluster sizes (unlike seeded random_sample,
    whose draws depend on block boundaries), and keeps all rows sharing a
    key together -- the property a resumable 100-TB pipeline needs.

    kernel='gxh64' (default): vectorized native/NumPy string hash, top 16
    bits.  kernel='md5': first two digest bytes big-endian -- md5 is
    inherently per-string/sequential, but the batch C kernel
    (_native.c:md5_u16_bytes) removes the Python loop + hashlib object
    overhead (the hashlib fallback remains bit-identical); chosen because
    any other engine can reproduce the selection; DuckDB:
    ``('0x' || substr(md5(key), 1, 4))::INT < floor(rate * 65536)``."""
    thresh = int(rate * 65536)

    def pick(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        col = pc.fill_null(batch[key_col], "")
        if kernel == "md5":
            h16 = _md5_u16(col).astype(np.int64)
        else:
            from .hashing import hash_strings
            h16 = (hash_strings(col) >> np.uint64(48)).astype(np.int64)
        return batch.filter(pa.array(h16 < thresh))

    return ds.map_batches(pick, batch_format="pyarrow")


def _md5_u16(col) -> np.ndarray:
    """Big-endian u16 of each string's first two md5 digest bytes
    (the DuckDB ``('0x' || substr(md5(k), 1, 4))::INT`` value), via the
    batch C kernel when available, bit-identical hashlib loop otherwise
    (parity pinned by tests/test_native.py)."""
    from .hashing import _string_buffers
    from .native import get_lib

    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 0:
            return np.zeros(0, dtype=np.uint16)
        return np.concatenate([_md5_u16(c) for c in col.chunks])
    lib = get_lib()
    if lib is not None:
        offsets, data = _string_buffers(col)
        out = np.empty(len(col), dtype=np.uint16)
        lib.md5_u16_bytes(np.ascontiguousarray(offsets, dtype=np.int64),
                          np.ascontiguousarray(data, dtype=np.uint8),
                          len(col), out)
        return out
    import hashlib
    buf = b"".join(hashlib.md5(v.encode()).digest()[:2]
                   for v in col.to_pylist())
    return np.frombuffer(buf, dtype=">u2").astype(np.uint16)


def _md5_u64(col) -> np.ndarray:
    """Big-endian u64 of each string's first eight md5 digest bytes
    (the DuckDB ``('0x' || substr(md5(k), 1, 16))::UBIGINT`` value) --
    the cross-engine content-fingerprint kernel.  Batch C kernel when
    available, bit-identical hashlib loop otherwise (parity pinned by
    tests/test_native.py)."""
    from .hashing import _string_buffers
    from .native import get_lib

    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 0:
            return np.zeros(0, dtype=np.uint64)
        return np.concatenate([_md5_u64(c) for c in col.chunks])
    lib = get_lib()
    if lib is not None:
        offsets, data = _string_buffers(col)
        out = np.empty(len(col), dtype=np.uint64)
        lib.md5_u64_bytes(np.ascontiguousarray(offsets, dtype=np.int64),
                          np.ascontiguousarray(data, dtype=np.uint8),
                          len(col), out)
        return out
    import hashlib
    buf = b"".join(hashlib.md5(v.encode()).digest()[:8]
                   for v in col.to_pylist())
    return np.frombuffer(buf, dtype=">u8").astype(np.uint64)


def exact_quantiles_via_counts(ds, value_fn, qs: list[float],
                               value_name: str = "v"):
    """EXACT distributed quantiles through a value-counts histogram:
    per-batch partial counts -> groupby(value).sum (the only shuffle; rows
    = distinct values, not input rows) -> tiny driver-side rank walk.

    Quantile rule (pinned so the SQL oracle can reproduce it exactly):
    q-quantile = min{ v : cumulative_count(v) >= ceil(q * total) }.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        vals = np.asarray(value_fn(batch))
        uniq, cnt = np.unique(vals, return_counts=True)
        return pa.table({value_name: pa.array(uniq.astype(np.int64)),
                         "partial": pa.array(cnt.astype(np.int64))})

    counts = grouped_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        value_name, [("partial", "sum", "cnt")]).to_pandas()
    counts = counts.sort_values(value_name).reset_index(drop=True)
    cum = counts["cnt"].cumsum().values
    total = int(cum[-1]) if len(cum) else 0
    vals = counts[value_name].values
    out_q, out_v = [], []
    for q in qs:
        target = int(np.ceil(q * total))
        i = int(np.searchsorted(cum, target, side="left"))
        out_q.append(float(q))
        out_v.append(int(vals[min(i, len(vals) - 1)]))
    return pd.DataFrame({"q": out_q, value_name: out_v})


def value_rank_intervals_via_counts(ds, value_fn, values):
    """For each x in `values`, the exact rank interval
    [count(v < x), count(v <= x)] / total of x in the dataset's value
    distribution -- same distributed value-counts shuffle as
    exact_quantiles_via_counts, used to verify quantile-sketch estimates
    by RANK (the bound quantile sketches actually promise; a value
    bracket mis-flags interpolating sketches like t-digest)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vals = np.asarray(value_fn(batch))
        uniq, cnt = np.unique(vals, return_counts=True)
        return pa.table({"v": pa.array(uniq.astype(np.float64)),
                         "partial": pa.array(cnt.astype(np.int64))})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("v")
                .aggregate(Sum("partial", alias_name="cnt"))
                .to_pandas().sort_values("v"))
    vals = counts["v"].values
    cum = counts["cnt"].cumsum().values
    total = int(cum[-1]) if len(cum) else 0
    x = np.asarray(values, dtype=np.float64)
    lo_i = np.searchsorted(vals, x, side="left") - 1
    hi_i = np.searchsorted(vals, x, side="right") - 1
    lo = np.where(lo_i >= 0, cum[np.maximum(lo_i, 0)], 0) / max(total, 1)
    hi = np.where(hi_i >= 0, cum[np.maximum(hi_i, 0)], 0) / max(total, 1)
    return lo, hi


def exact_grouped_quantiles(ds, key_fn, value_fn, qs: list[float],
                            key_name: str = "key", value_name: str = "v",
                            q_name: str = "q"):
    """EXACT per-group quantiles, fully distributed: per-batch
    (key, value) combiner counts -> one groupby(key, value).sum shuffle
    (rows = distinct pairs, not input rows) -> per-KEY rank walk inside
    map_groups, so no group's histogram ever lands on the driver (a
    high-cardinality value function stays safe at scale).

    Same pinned rule as exact_quantiles_via_counts:
    q-quantile = min{ v : cumulative_count(v) >= ceil(q * total) }."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({key_name: np.asarray(key_fn(batch)),
                           value_name: np.asarray(value_fn(batch))
                           .astype(np.int64)})
        g = (df.groupby([key_name, value_name]).size()
               .reset_index(name="partial"))
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby([key_name, value_name])
                .aggregate(Sum("partial", alias_name="cnt")))
    qs_arr = np.asarray(qs, dtype=np.float64)

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value_name)
        cum = g["cnt"].cumsum().values
        total = int(cum[-1])
        vals = g[value_name].values
        idx = np.searchsorted(cum, np.ceil(qs_arr * total), side="left")
        idx = np.minimum(idx, len(vals) - 1)
        return pd.DataFrame({key_name: g[key_name].iloc[0],
                             q_name: qs_arr,
                             value_name: vals[idx].astype(np.int64)})

    return counts.groupby(key_name).map_groups(walk, batch_format="pandas")


def semijoin_filter_verify(ds, key_col: str, build_ds, build_key_col: str,
                           num_partitions: int = 2,
                           kind: str = "xorf", params: dict | None = None,
                           join_partitions: int = 8,
                           max_broadcast_bytes: int = 128 << 20):
    """Filter-and-verify semi-join: the reference's production use-case
    (a compact build-side summary prunes the probe side; false positives
    are resolved by an exact check -- README.md:54 cost model).

    Stage 1 (no shuffle): the filter table is broadcast and each probe
    batch drops every key the filter rejects -- at the reference's FPR
    targets this removes ~all non-members, so only true members plus a
    ~2^-16 sliver of false positives continue.  Stage 2 (exact), sized
    like probe()'s broadcast-vs-colocated dispatch: a build side whose
    materialized bytes fit `max_broadcast_bytes` broadcasts its distinct
    keys once (`ray.put`; per-batch vectorized `is_in`, no shuffle, no
    join actor pools); a larger one is verified with a hash-partitioned
    left-semi join, so a build side of 10^10 keys costs one partitioned
    join over the (tiny) candidate set instead of driver memory.  Result
    is EXACT either way."""
    import ray

    from .dedup import _compact, _join

    params = params or {"fp_bits": 16, "arity": 3}
    build_ds = build_ds.materialize()
    ft = build_filter_table(build_ds, build_key_col, kind, params,
                            num_partitions=num_partitions).materialize()
    pdf = ft.to_pandas()
    blobs = {int(r["partition_id"]): _as_u8(r["payload"])
             for _, r in pdf.iterrows()}
    blobs_ref = ray.put(blobs)

    def prune(batch: pa.Table) -> pa.Table:
        filters = _cached_filters(blobs_ref)
        h = hash_column(batch[key_col])
        maybe = _probe_batch(filters, h, num_partitions)
        if not maybe.any():
            return batch.slice(0, 0)
        return batch.filter(pa.array(maybe))

    cand = ds.map_batches(prune, batch_format="pyarrow")

    if build_ds.size_bytes() <= max_broadcast_bytes:
        import pyarrow.compute as pc

        chunks = []
        for b in build_ds.iter_batches(batch_format="pyarrow"):
            col = b[build_key_col]
            chunks.extend(col.chunks if isinstance(col, pa.ChunkedArray)
                          else [col])
        if not chunks:       # empty build side: nothing can match
            return cand.map_batches(lambda t: t.slice(0, 0),
                                    batch_format="pyarrow")
        keys = pc.unique(pa.chunked_array(chunks))
        keys_ref = ray.put(keys)

        def verify(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            vs = ray.get(keys_ref)   # plasma shared-memory read, zero-copy
            mask = pc.fill_null(pc.is_in(batch[key_col], value_set=vs),
                                False)
            return batch.filter(mask)

        return cand.map_batches(verify, batch_format="pyarrow")

    build_keys = _compact(distinct_keys(build_ds, build_key_col),
                          join_partitions)
    return _join(cand, build_keys, "left_semi", join_partitions,
                 (key_col,), (build_key_col,))
