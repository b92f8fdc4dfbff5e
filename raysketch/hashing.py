"""Vectorized u64 hash kernels (NumPy, wrapping uint64 arithmetic).

These are the determinism anchors of the whole engine (reference:
/root/reference/src/bench.zig:10-14 hashes keys with one fixed hash+seed and
every downstream structure consumes only the u64 hashes).  Everything here is
pure NumPy over uint64 with explicit modulo-2**64 wrapping so results are
identical across processes, partitionings and Ray task retries.

Kernels:
  - splitmix64 / SplitMix64: the seed-sequence PRNG used by filter
    constructions for retry seeds (reference: src/xorf.zig:134, src/ribbon.zig:61).
  - murmur64a_u64: MurmurHash64A of a u64 value with a seed -- the re-seed
    step of the xor filter (reference: src/xorf.zig:7-9 `apply_seed`).
  - hash_bytes_u64 / hash_strings: the string hash.  Default kernel is
    byte-compatible XXH3-64 (the reference's own key hash,
    src/bench.zig:10-14; native C scalar kernel with a bit-identical
    NumPy fallback, both checked against the published sanity vectors).
    The legacy "gxh64" chunked kernel remains selectable
    (RAYSKETCH_HASH_KERNEL=gxh64) for payloads built under it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

U64 = np.uint64
MASK64 = U64(0xFFFFFFFFFFFFFFFF)

_SM64_GAMMA = 0x9E3779B97F4A7C15
_SM64_M1 = 0xBF58476D1CE4E5B9
_SM64_M2 = 0x94D049BB133111EB

_MUR_M = U64(0xC6A4A7935BD1E995)

# gxh64 constants (odd 64-bit multipliers; avalanche is murmur-style).
_GX_P1 = U64(0x9E3779B185EBCA87)
_GX_P2 = U64(0xC2B2AE3D27D4EB4F)
_GX_P3 = U64(0x165667B19E3779F9)
_GX_P4 = U64(0x27D4EB2F165667C5)

DEFAULT_SEED = 0  # reference uses XxHash3 seed 0: src/bench.zig:12

#: Active string-hash kernel.
#:   "xxh3"  -- byte-compatible XXH3-64 (DEFAULT since round 4): filters
#:              built under this kernel are key-compatible with the
#:              reference engine's XxHash3-seeded filters
#:              (src/bench.zig:10-14, the reference's cross-engine
#:              determinism anchor).  Runs the compiled scalar kernel
#:              (_native.c:xxh3_64_bytes) when available, otherwise the
#:              bit-identical NumPy implementation (raysketch/xxh3.py);
#:              both are validated against the 11 published sanity
#:              vectors, so mixed native/NumPy workers stay consistent.
#:   "gxh64" -- the in-house kernel (slightly faster native path, NOT
#:              reference-compatible); RAYSKETCH_HASH_KERNEL=gxh64.
#: Select at process start via RAYSKETCH_HASH_KERNEL (inherited by
#: local Ray workers) or set_kernel() BEFORE any Ray stage runs.  The
#: HASH_VERSION envelope stamp (sketches/base.py) makes cross-kernel
#: build/probe mixing fail loudly rather than false-negate.
import os as _os

KERNEL = _os.environ.get("RAYSKETCH_HASH_KERNEL", "xxh3")

#: version of the string-hash kernel; stamped into every sketch envelope
#: (sketches/base.py pack) and build-checkpoint MANIFEST so payloads built
#: under a different kernel fail loudly instead of false-negating silently
HASH_VERSION = {"gxh64": "gxh64-v2", "xxh3": "xxh3-v1"}[KERNEL]


def set_kernel(name: str) -> None:
    """Switch the string-hash kernel ("gxh64" | "xxh3").

    Must happen before any hashing/building -- on a cluster, set the
    RAYSKETCH_HASH_KERNEL environment variable instead so every worker
    process makes the same choice."""
    global KERNEL, HASH_VERSION
    HASH_VERSION = {"gxh64": "gxh64-v2", "xxh3": "xxh3-v1"}[name]
    KERNEL = name


def splitmix64(seed: int):
    """Scalar SplitMix64 generator -> callable returning the next u64.

    Mirrors std.Random.SplitMix64 (used for construction retry seeds at
    reference src/xorf.zig:134-149 and src/ribbon.zig:61-73).  Python-int
    implementation: seed schedules are tiny and driver-side.
    """
    state = seed & 0xFFFFFFFFFFFFFFFF

    def next_u64() -> int:
        nonlocal state
        state = (state + _SM64_GAMMA) & 0xFFFFFFFFFFFFFFFF
        z = state
        z = ((z ^ (z >> 30)) * _SM64_M1) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * _SM64_M2) & 0xFFFFFFFFFFFFFFFF
        return z ^ (z >> 31)

    return next_u64


def murmur64a_u64(h: np.ndarray, seed: int) -> np.ndarray:
    """MurmurHash64A of each u64 in `h` (as 8 LE bytes) with `seed`.

    Semantics of the reference's xorf re-seed step `apply_seed`
    (src/xorf.zig:7-9 -> std.hash.Murmur2_64.hashUint64WithSeed).
    """
    h = np.asarray(h, dtype=U64)
    with np.errstate(over="ignore"):
        acc = U64(seed & 0xFFFFFFFFFFFFFFFF) ^ (U64(8) * _MUR_M)
        k = h * _MUR_M
        k ^= k >> U64(47)
        k *= _MUR_M
        acc = acc ^ k
        acc *= _MUR_M
        acc ^= acc >> U64(47)
        acc *= _MUR_M
        acc ^= acc >> U64(47)
    return acc


def _avalanche(h: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        h ^= h >> U64(33)
        h *= _GX_P2
        h ^= h >> U64(29)
        h *= _GX_P3
        h ^= h >> U64(32)
    return h


def _string_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets[int64, n+1], data[uint8]) for a string/binary Arrow array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_binary(t):
        arr = arr.cast(pa.large_binary())
    elif pa.types.is_large_string(t):
        arr = arr.cast(pa.large_binary())
    elif not pa.types.is_large_binary(t):
        raise TypeError(f"expected string/binary column, got {t}")
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64,
                            count=arr.offset + len(arr) + 1)[arr.offset:]
    data = (np.frombuffer(buffers[2], dtype=np.uint8)
            if buffers[2] is not None else np.zeros(0, dtype=np.uint8))
    return offsets, data


_BYTE_SHIFTS = (U64(8) * np.arange(8, dtype=U64))
_ARANGE8 = np.arange(8, dtype=np.int64)


def hash_bytes_u64(offsets: np.ndarray, data: np.ndarray,
                   seed: int = DEFAULT_SEED) -> np.ndarray:
    """Hash n variable-length byte strings described by (offsets, data)
    with the ACTIVE kernel (see KERNEL above)."""
    if KERNEL == "xxh3":
        return _xxh3_bytes(offsets, data, seed)
    return _gxh64_bytes(offsets, data, seed)


def _xxh3_bytes(offsets: np.ndarray, data: np.ndarray,
                seed: int = DEFAULT_SEED) -> np.ndarray:
    """XXH3-64: compiled scalar kernel when available, bit-identical
    NumPy implementation otherwise (parity pinned by tests/test_native.py
    AND both validated against the published sanity vectors, so a mixed
    native/NumPy worker fleet produces identical hashes)."""
    from .native import get_lib
    lib = get_lib()
    if lib is not None:
        n = len(offsets) - 1
        out = np.empty(n, dtype=U64)
        lib.xxh3_64_bytes(np.ascontiguousarray(offsets, dtype=np.int64),
                          np.ascontiguousarray(data, dtype=np.uint8),
                          n, seed & 0xFFFFFFFFFFFFFFFF, out)
        return out
    from .xxh3 import xxh3_64
    return xxh3_64(offsets, data, seed)


def _gxh64_bytes(offsets: np.ndarray, data: np.ndarray,
                 seed: int = DEFAULT_SEED) -> np.ndarray:
    """gxh64: chunked kernel processing 8 input bytes per round, each
    round fully vectorized over all still-active rows; rounds =
    ceil(max_len/8).  Dispatches to the bit-identical C loop
    (_native.c:gxh64_bytes, parity pinned by tests/test_native.py) when
    the compiled kernels are available."""
    from .native import get_lib
    lib = get_lib()
    if lib is not None:
        n = len(offsets) - 1
        out = np.empty(n, dtype=U64)
        lib.gxh64_bytes(np.ascontiguousarray(offsets, dtype=np.int64),
                        np.ascontiguousarray(data, dtype=np.uint8),
                        n, seed & 0xFFFFFFFFFFFFFFFF, out)
        return out
    starts = offsets[:-1]
    lens = (offsets[1:] - starts).astype(np.int64)
    n = len(starts)
    with np.errstate(over="ignore"):
        acc = (U64(seed & 0xFFFFFFFFFFFFFFFF) ^ (lens.astype(U64) * _GX_P1)) + _GX_P4
        if n == 0:
            return acc
        max_len = int(lens.max()) if n else 0
        if max_len > 0:
            padded = np.concatenate([data, np.zeros(8, dtype=np.uint8)])
            active_idx = np.arange(n)
            astarts, alens, aacc = starts, lens, acc
            for j in range(0, max_len, 8):
                # filter at EVERY round including j=0: a zero-length row
                # must get zero mixing rounds regardless of what else is in
                # the batch, or the same key hashes differently in an
                # all-empty batch vs a mixed batch (cross-partition
                # determinism violation)
                keep = alens > j
                if not keep.all():
                    active_idx = active_idx[keep]
                    astarts = astarts[keep]
                    alens = alens[keep]
                    aacc = aacc[keep]
                gather = padded[(astarts + j)[:, None] + _ARANGE8]
                # zero the bytes past each string's end -- only tail rows
                # (remaining < 8) need it, and only in their last round
                rem = alens - j
                tail = rem < 8
                if tail.any():
                    gather[tail] = np.where(
                        _ARANGE8 < rem[tail, None], gather[tail], 0)
                # little-endian u64 view == OR of byte k << 8k, without the
                # (n,8) u64 temp + shift + reduce (2-3x faster)
                word = gather.view("<u8").ravel()
                aacc = aacc ^ (word * _GX_P2)
                aacc = ((aacc << U64(31)) | (aacc >> U64(33))) * _GX_P3 + _GX_P4
                acc[active_idx] = aacc
        return _avalanche(acc)


def hash_strings(col, seed: int = DEFAULT_SEED) -> np.ndarray:
    """u64 hash of an Arrow string/binary column (vectorized)."""
    offsets, data = _string_buffers(col)
    return hash_bytes_u64(offsets, data, seed)


def hash_ints(col, seed: int = DEFAULT_SEED) -> np.ndarray:
    """u64 hash of an integer column/array (murmur64a of the value)."""
    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        vals = np.asarray(col.combine_chunks()
                          if isinstance(col, pa.ChunkedArray) else col)
    else:
        vals = np.asarray(col)
    if vals.dtype.kind not in "iu":
        # float keys would be silently int-truncated (1.2 and 1.9 -> same
        # hash), collapsing distinct keys -- fail loudly instead
        raise TypeError(
            f"hash_ints requires an integer column, got {vals.dtype}; "
            "hash float keys explicitly (e.g. via their bit pattern)")
    return murmur64a_u64(vals.astype(np.int64).view(U64), seed)


def hash_column(col, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Dispatch: string/binary -> gxh64, integer -> murmur64a."""
    if isinstance(col, pa.ChunkedArray):
        # hash per chunk instead of combine_chunks: combining copies the
        # full string buffers (~50 B/row) to produce the same per-element
        # hashes (8 B/row) -- on a multi-GB corpus pass that copy
        # dominated the hash stage
        if col.num_chunks == 1:
            col = col.chunk(0)
        elif col.num_chunks == 0:
            return np.zeros(0, dtype=np.uint64)
        else:
            return np.concatenate([hash_column(c, seed)
                                   for c in col.chunks])
    if isinstance(col, pa.Array):
        t = col.type
        if (pa.types.is_string(t) or pa.types.is_large_string(t)
                or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
            return hash_strings(col, seed)
        return hash_ints(col, seed)
    arr = np.asarray(col)
    if arr.dtype.kind in "iu":
        return hash_ints(arr, seed)
    return hash_strings(pa.array(arr.astype(object)), seed)


def partition_ids(hashes: np.ndarray, num_partitions: int) -> np.ndarray:
    """Multiply-shift range reduction of the HIGH 32 bits -> [0, P).

    Uses the high half so it stays independent of SBBF's block routing,
    which consumes the low 32 bits (reference src/sbbf.zig:54-58).
    Same fixed-point reduce idiom as src/sbbf.zig:28-30.
    """
    h_hi = (np.asarray(hashes, dtype=U64) >> U64(32))
    with np.errstate(over="ignore"):
        return ((U64(num_partitions) * h_hi) >> U64(32)).astype(np.uint32)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Set-bit count per u64 (vectorized SWAR; numpy<2 has no bitwise_count)."""
    x = np.asarray(x, dtype=U64).copy()
    with np.errstate(over="ignore"):
        x -= (x >> U64(1)) & U64(0x5555555555555555)
        x = (x & U64(0x3333333333333333)) + \
            ((x >> U64(2)) & U64(0x3333333333333333))
        x = (x + (x >> U64(4))) & U64(0x0F0F0F0F0F0F0F0F)
        x = (x * U64(0x0101010101010101)) >> U64(56)
    return x.astype(np.int64)


def clz64(x: np.ndarray) -> np.ndarray:
    """Count of leading zero bits for each u64 (vectorized, integer-exact)."""
    x = np.asarray(x, dtype=U64)
    shift = np.zeros(x.shape, dtype=U64)
    v = x.copy()
    for bits in (32, 16, 8, 4, 2, 1):
        b = U64(bits)
        has_high = (v >> b) != 0
        v = np.where(has_high, v >> b, v)
        shift = np.where(has_high, shift + b, shift)
    return np.where(x == 0, 64, 63 - shift.astype(np.int64))
