"""Xor / binary-fuse filter -- holistic per-partition construction.

Semantics re-derived from /root/reference/src/xorf.zig (sizing formulas at
src/xorf.zig:58-109 are the binary-fuse paper's constants, arXiv:2201.01174;
probe positions at src/xorf.zig:29-40; membership test at src/xorf.zig:42-50;
peeling construction with <=100 SplitMix64 seed retries at
src/xorf.zig:111-220, seed sequence root 0x726b2b9d438b9d4d at
src/xorf.zig:134).

Two construction paths, same accepted seeds (success is a property of the
3/4-uniform hypergraph having an empty 2-core, independent of peel order):

- native (_native.c:xorf_build, default when a C compiler exists): the
  whole seed-retry loop in C -- seeded hashes counting-sorted by probe-
  window segment so cell counting walks ascending segments, then a
  branchless chunked two-phase peel (derive+prefetch a 512-entry FIFO
  frontier chunk, then apply) and the same chunked back-substitution;
  split xormask u64 / count u8 cell arrays; probe positions recomputed
  from h instead of materialized.
- NumPy fallback: peeling in vectorized *rounds* (all currently-singleton
  cells peel together, NumPy kernels over the whole frontier);
  back-substitution in reverse round order is valid because a key's
  non-assignment cells are only ever assigned by later-peeled keys or
  never assigned (see construct() body).

Construction REQUIRES deduplicated hashes (duplicate keys make the hypergraph
unpeelable; the reference panics on duplicates, src/bench.zig:251-256).
build() dedups internally, honoring the sort+dedup contract of
src/bench.zig:258-280.

Fingerprint widths supported: u8/u16/u32 (byte-aligned).  The reference
declares non-byte-aligned widths (u7/u9/u10) broken pending bit-packing
(README.md:19-20); we implement only the aligned ones and document the
exclusion.  Arity 3 or 4 (src/xorf.zig:69,78).
"""

from __future__ import annotations

import math

import numpy as np

from ..hashing import U64, murmur64a_u64, splitmix64
from .base import Sketch, pack, unpack, register

_SEED_ROOT = 0x726B2B9D438B9D4D  # src/xorf.zig:134
_MAX_ATTEMPTS = 100              # src/xorf.zig:137-139

_FP_DTYPES = {8: np.uint8, 16: np.uint16, 32: np.uint32}


def _reduce32(length: int, x: np.ndarray) -> np.ndarray:
    """Multiply-shift range reduction (src/xorf.zig:15-17)."""
    with np.errstate(over="ignore"):
        return ((U64(length) * (x & U64(0xFFFFFFFF))) >> U64(32))


def calculate_header(arity: int, num_keys: int) -> dict:
    """Sizing -- straight transcription of src/xorf.zig:58-109 formulas."""
    if arity not in (3, 4):
        raise ValueError("arity must be 3 or 4")
    size = num_keys
    if size == 0:
        segment_length = 4
    else:
        sz = float(size)
        if arity == 3:
            base = int(math.floor(math.log(sz) / math.log(3.33) + 2.25))
        else:
            base = int(math.floor(math.log(sz) / math.log(2.91) - 0.5))
        segment_length = 1 << (base & 31)
    segment_length = min(segment_length, 262144)
    if size <= 1:
        size_factor = 0.0
    elif arity == 3:
        size_factor = max(1.125, 0.875 + 0.25 * math.log(1000000.0) / math.log(size))
    else:
        size_factor = max(1.075, 0.77 + 0.305 * math.log(600000.0) / math.log(size))
    capacity = 0 if size <= 1 else int(round(size * size_factor))
    init_segment_count = (capacity + segment_length - 1) // segment_length
    array_length_calc = init_segment_count * segment_length
    segment_count_calc = (array_length_calc + segment_length - 1) // segment_length
    if segment_count_calc <= arity - 1:
        segment_count = 1
    else:
        segment_count = segment_count_calc - (arity - 1)
    array_length = (segment_count + arity - 1) * segment_length
    segment_count_length = segment_count * segment_length
    return {
        "seed": 0,
        "size": size,
        "segment_length": segment_length,
        "segment_count": segment_count,
        "segment_count_length": segment_count_length,
        "array_length": array_length,
    }


_HL_MIX = U64(0xBF58476D1CE4E5B9)


def _make_subhashes(arity: int, header: dict, h: np.ndarray) -> np.ndarray:
    """(n, arity) u32 probe positions -- src/xorf.zig:29-40, vectorized.

    DELIBERATE DEVIATION from src/xorf.zig:30: the reference derives the
    window base `hl = reduce(segment_count_length, low32(h))`.  When
    segment_count_length is a power of two, reduce() degenerates to a plain
    right shift and hl's low bits coincide EXACTLY with the xor-offset of
    position 2 (both are h bits [22..28] for arity 3), so the offset cancels
    and position 2 collapses onto segment-aligned cells -- the hypergraph
    keeps a giant 2-core and construction fails for EVERY seed (observed at
    n=899: segment_count=8, scl=1024).  The reference never hits this
    because its test sizes (10k, 1M keys) happen to produce non-power-of-two
    segment counts.  We mix h multiplicatively before deriving hl so the
    window base is independent of every offset bit window; FPR / sizing /
    no-false-negative semantics are unchanged.
    """
    seg_len = np.uint32(header["segment_length"])
    seg_mask = np.uint32(header["segment_length"] - 1)
    with np.errstate(over="ignore"):
        hmix = (h * _HL_MIX) >> U64(32)
    hl = _reduce32(header["segment_count_length"], hmix).astype(np.uint32)
    n = h.shape[0]
    out = np.empty((n, arity), dtype=np.uint32)
    with np.errstate(over="ignore"):
        for i in range(arity):
            rot = (i * (64 // arity)) % 64
            if rot:
                rotated = ((h << U64(rot)) | (h >> U64(64 - rot)))
            else:
                rotated = h
            r32 = (rotated & U64(0xFFFFFFFF)).astype(np.uint32)
            out[:, i] = (hl + np.uint32(i) * seg_len) ^ (r32 & seg_mask)
    return out


def _fingerprint(h: np.ndarray, fp_bits: int) -> np.ndarray:
    """truncate(h ^ (h >> 32)) -- src/xorf.zig:11-13."""
    v = h ^ (h >> U64(32))
    return v.astype(_FP_DTYPES[fp_bits])


def _scratch(name: str, size: int, dtype) -> np.ndarray:
    """Reused native-build work buffers via the shared capped
    per-process scratch (util.scratch: first-touch-provisioning
    rationale and the retention-cliff cap)."""
    from ..util import scratch
    return scratch(f"xorf.{name}", size, dtype)


def construct(hashes: np.ndarray, arity: int, fp_bits: int):
    """Seed-retry peeling build. Returns (header, fingerprints).

    `hashes` must already be deduplicated u64s.
    """
    from ..native import get_lib

    import ctypes

    dtype = _FP_DTYPES[fp_bits]
    header = calculate_header(arity, len(hashes))
    array_len = header["array_length"]
    n = len(hashes)
    next_seed = splitmix64(_SEED_ROOT)
    lib = get_lib()

    if lib is not None:
        # entire retry loop in C (_native.c:xorf_build): apply_seed,
        # subhash derivation (same _HL_MIX deviation), segment-sorted
        # counting, branchless chunked two-phase peel + reverse solve
        # that RECOMPUTE probe positions from h instead of materializing
        # an (n, arity) matrix -- the reference's storage discipline
        # (src/xorf.zig:111-220).  Same SplitMix64 seed schedule; peel
        # success is a 2-core property of (seed, keys) alone, so native
        # and NumPy accept the SAME seed (pinned by tests/test_native.py).
        cells = _scratch("cells", 2 * array_len, U64)  # {xormask, count}
        # +1 slack: the branchless FIFO push in C writes queue[qtail]
        # unconditionally before advancing; if EVERY cell becomes a
        # singleton the final dead-write lands one slot past array_len
        queue = _scratch("queue", array_len + 1, np.uint32)
        stack_h = _scratch("stack_h", max(n, 1), U64)
        stack_hi = _scratch("stack_hi", max(n, 1), np.uint8)
        fp32 = _scratch("fp32", array_len, np.uint32)  # C memsets on entry
        seed_out = ctypes.c_uint64(0)
        attempts = lib.xorf_build(
            np.ascontiguousarray(hashes, U64), n, arity, fp_bits,
            np.uint32(header["segment_length"]),
            np.uint64(header["segment_count_length"]), array_len,
            np.uint64(_SEED_ROOT), _MAX_ATTEMPTS,
            cells, queue, stack_h, stack_hi, fp32,
            ctypes.byref(seed_out))
        if attempts:
            header["seed"] = int(seed_out.value)
            return header, fp32.astype(dtype)
        raise RuntimeError(
            f"xorf construction failed after {_MAX_ATTEMPTS} seeds "
            f"(n={n}, arity={arity}); keys not deduplicated?")

    for _ in range(_MAX_ATTEMPTS):
        seed = next_seed()
        header["seed"] = seed
        h = murmur64a_u64(hashes, seed)        # src/xorf.zig:7-9 apply_seed
        sub = _make_subhashes(arity, header, h)
        flat = sub.ravel().astype(np.int64)
        count = np.bincount(flat, minlength=array_len).astype(np.int64)
        xormask = np.zeros(array_len, dtype=U64)
        np.bitwise_xor.at(xormask, flat, np.repeat(h, arity))

        # Round-parallel peel with a FRONTIER: after the initial full scan,
        # only cells decremented last round can have become singletons, so
        # each round costs O(keys peeled * arity), not O(array_length) --
        # binary-fuse peeling runs hundreds of small waves (the segmented
        # layout makes the peel sweep across segments), and rescanning the
        # whole count array every wave dominated the build.
        # Per-round invariants:
        #  - cells with count==1 hold exactly one unpeeled key (its h is the
        #    cell's xormask);
        #  - those keys' assignment cells are mutually exclusive (each has
        #    count 1 => no other unpeeled key touches it), so all can peel
        #    in one vectorized step.
        rounds: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        peeled = 0
        candidates = np.flatnonzero(count == 1)
        while candidates.size:
            singly = candidates[count[candidates] == 1]
            if singly.size == 0:
                break
            keys = xormask[singly]
            ukeys, first_idx = np.unique(keys, return_index=True)
            assign_cells = singly[first_idx].astype(np.uint32)
            usub = _make_subhashes(arity, header, ukeys)
            uflat = usub.ravel().astype(np.int64)
            np.subtract.at(count, uflat, 1)
            np.bitwise_xor.at(xormask, uflat, np.repeat(ukeys, arity))
            rounds.append((ukeys, assign_cells, usub))
            peeled += len(ukeys)
            candidates = np.unique(uflat[count[uflat] == 1])

        if peeled < n:
            continue  # 2-core non-empty under this seed -> retry

        # Back-substitution in reverse round order: when round r is
        # processed, every non-assignment cell of its keys is either an
        # assignment cell of a LATER round (already solved) or never
        # assigned (stays 0) -- mirrors the reverse-stack solve of
        # src/xorf.zig:199-216.
        fps = np.zeros(array_len, dtype=dtype)
        for ukeys, assign_cells, usub in reversed(rounds):
            f = _fingerprint(ukeys, fp_bits)
            for i in range(arity):
                cell_i = usub[:, i]
                not_assign = cell_i != assign_cells
                f = f ^ np.where(not_assign, fps[cell_i.astype(np.int64)],
                                 dtype(0))
            fps[assign_cells.astype(np.int64)] = f
        return header, fps

    raise RuntimeError(
        f"xorf construction failed after {_MAX_ATTEMPTS} seeds "
        f"(n={n}, arity={arity})")


@register
class XorFilter(Sketch):
    kind = "xorf"
    mergeable = False

    def __init__(self, header: dict, fingerprints: np.ndarray,
                 arity: int, fp_bits: int, num_keys: int = 0):
        self.header = header
        self.fingerprints = fingerprints
        self.arity = int(arity)
        self.fp_bits = int(fp_bits)
        self.num_keys = int(num_keys)

    @classmethod
    def build(cls, hashes: np.ndarray, fp_bits: int = 16,
              arity: int = 3, assume_unique: bool = False) -> "XorFilter":
        """assume_unique=True skips the internal sort+dedup; the caller
        must already have honored the contract (construction REQUIRES
        deduplicated hashes -- see module docstring)."""
        if assume_unique:
            hashes = np.asarray(hashes, dtype=U64)
        else:
            hashes = np.unique(np.asarray(hashes, dtype=U64))  # dedup contract
        header, fps = construct(hashes, arity, fp_bits)
        return cls(header, fps, arity, fp_bits, num_keys=len(hashes))

    def check(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized src/xorf.zig:42-50.

        Native path (bit-identical, pinned by tests/test_native.py):
        probe batches split per filter partition, so per-call key counts
        are small and NumPy's fixed kernel-launch overhead dominates --
        one C call removes it."""
        hashes = np.asarray(hashes, dtype=U64)
        if hashes.size == 0:
            return np.zeros(0, dtype=bool)
        from ..native import get_lib
        lib = get_lib()
        if lib is not None:
            h64 = np.ascontiguousarray(hashes)
            fps = np.ascontiguousarray(self.fingerprints)
            out = np.empty(len(h64), dtype=np.uint8)
            lib.xorf_check(h64, len(h64), int(self.header["seed"]),
                           int(self.header["segment_length"]),
                           int(self.header["segment_count_length"]),
                           self.arity, self.fp_bits,
                           fps.ctypes.data, out)
            return out.view(bool)
        h = murmur64a_u64(hashes, self.header["seed"])
        sub = _make_subhashes(self.arity, self.header, h)
        f = _fingerprint(h, self.fp_bits)
        for i in range(self.arity):
            f = f ^ self.fingerprints[sub[:, i].astype(np.int64)]
        return f == 0

    def to_bytes(self) -> bytes:
        return pack(self.kind,
                    {"arity": self.arity, "fp_bits": self.fp_bits,
                     "num_keys": self.num_keys, "header": self.header},
                    {"fingerprints": self.fingerprints})

    @classmethod
    def from_bytes(cls, blob: bytes) -> "XorFilter":
        kind, meta, arrays = unpack(blob)
        assert kind == cls.kind
        return cls._from_parts(meta, arrays)

    @classmethod
    def _from_parts(cls, meta, arrays) -> "XorFilter":
        # no copy: fingerprints are never mutated after construction, so a
        # decoded filter keeps the (possibly read-only, plasma-backed)
        # envelope view -- one shared mapping per node instead of a
        # private multi-MB copy per probing worker
        return cls(meta["header"], arrays["fingerprints"],
                   meta["arity"], meta["fp_bits"], meta["num_keys"])

    def mem_usage(self) -> int:
        return self.fingerprints.size * self.fp_bits // 8  # src/xorf.zig:255-257

    def ideal_mem_usage(self) -> int:
        return self.num_keys * self.fp_bits // 8  # src/xorf.zig:259-261
