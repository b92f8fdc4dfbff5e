"""Split-block Bloom filter (Parquet-spec blocks), vectorized + mergeable.

Semantics re-derived from /root/reference/src/sbbf.zig (NOT a port of the Zig
SIMD code): 64-byte blocks of 8 u64 words; per key one block chosen by
multiply-shift on the hash's low 32 bits (src/sbbf.zig:28-30,54-58) and an
8-bit mask derived with the 8 Parquet SALT constants
(src/sbbf.zig:72-80).  Because insertion is bitwise-OR, partial filters over
disjoint (or overlapping) key subsets merge by OR -- associative and
commutative -- which is what makes SBBF the mergeable-UDAF filter in the Ray
pipeline (per-batch partial state, tree merge in groupby-aggregate).
"""

from __future__ import annotations

import numpy as np

from ..hashing import U64, MASK64
from .base import Sketch, pack, unpack, register

BLOCK_SIZE = 64  # bytes per block (8 x u64), src/sbbf.zig:7

# Parquet split-block Bloom salt constants, src/sbbf.zig:80
SALT = np.array([0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
                 0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31], dtype=U64)


def num_blocks_for(n_keys: int, bits_per_key: int) -> int:
    """ceil(bits_per_key*n/8) bytes rounded up to a whole 64B block.

    Matches the sizing in src/sbbf.zig:95 (next_multiple_of(..., 64)).
    """
    nbytes = (bits_per_key * n_keys + 7) // 8
    nblocks = (nbytes + BLOCK_SIZE - 1) // BLOCK_SIZE
    return max(1, nblocks)


def _block_index(num_blocks: int, hashes: np.ndarray) -> np.ndarray:
    """(num_blocks * low32(h)) >> 32 -- src/sbbf.zig:28-30,55."""
    lo = hashes & U64(0xFFFFFFFF)
    with np.errstate(over="ignore"):
        return (U64(num_blocks) * lo) >> U64(32)


def _make_mask(hashes: np.ndarray) -> np.ndarray:
    """(n, 8) u64: one bit set per word, per src/sbbf.zig:72-80."""
    with np.errstate(over="ignore"):
        x = (hashes[:, None] * SALT[None, :]) >> U64(27)
    return U64(1) << (x & U64(63))


@register
class SbbfFilter(Sketch):
    kind = "sbbf"
    mergeable = True

    def __init__(self, words: np.ndarray, bits_per_key: int,
                 num_keys: int = 0):
        # words: flat (num_blocks * 8,) u64.  Read-only views (zero-copy
        # envelope decodes over plasma-backed broadcast payloads) are kept
        # as-is for probing; mutating ops promote to a private copy
        # lazily via _writable() so probe-only workers share one mapping.
        self.words = np.ascontiguousarray(words, dtype=U64)
        self.num_blocks = len(self.words) // 8
        self.bits_per_key = int(bits_per_key)
        self.num_keys = int(num_keys)

    # --- construction ----------------------------------------------------
    @classmethod
    def create(cls, num_blocks: int, bits_per_key: int) -> "SbbfFilter":
        return cls(np.zeros(num_blocks * 8, dtype=U64), bits_per_key)

    @classmethod
    def build(cls, hashes: np.ndarray, bits_per_key: int = 10,
              num_blocks: int | None = None) -> "SbbfFilter":
        """Build-once over a hash array (dedup not required: OR is idempotent)."""
        hashes = np.asarray(hashes, dtype=U64)
        n = int(np.unique(hashes).size)
        if num_blocks is None:
            num_blocks = num_blocks_for(n, bits_per_key)
        f = cls.create(num_blocks, bits_per_key)
        f.insert(hashes)
        f.num_keys = n
        return f

    def _writable(self) -> None:
        """Promote a zero-copy (read-only) words view to a private copy
        before the first mutation; no-op on already-owned arrays."""
        if not self.words.flags.writeable:
            self.words = self.words.copy()

    def insert(self, hashes: np.ndarray) -> None:
        hashes = np.asarray(hashes, dtype=U64)
        if hashes.size == 0:
            return
        self._writable()
        from ..native import get_lib
        lib = get_lib()
        if lib is not None:     # bit-compatible C loop (pytest-verified)
            lib.sbbf_insert(self.words, self.num_blocks,
                            np.ascontiguousarray(hashes), len(hashes))
            return
        idx = _block_index(self.num_blocks, hashes).astype(np.int64)
        mask = _make_mask(hashes)
        # sort by block, OR-combine each block's masks with one reduceat,
        # then a single duplicate-free scatter per touched block --
        # np.bitwise_or.at's unbuffered per-element scatter is ~8x slower
        order = np.argsort(idx, kind="stable")
        si = idx[order]
        sm = mask[order]
        starts = np.flatnonzero(np.concatenate([[True], si[1:] != si[:-1]]))
        ored = np.bitwise_or.reduceat(sm, starts, axis=0)     # (u, 8)
        blocks = self.words.reshape(-1, 8)
        blocks[si[starts]] |= ored

    def insert_check(self, hashes: np.ndarray) -> np.ndarray:
        """Insert each key and return whether it was ALREADY (possibly)
        present before its own insertion -- the reference's incremental
        `filter_insert_check` (src/sbbf.zig:39-52), vectorized.

        Exact sequential semantics: a key duplicated WITHIN the batch must
        see the earlier occurrence, so prior membership is computed
        against the pre-batch words and then corrected for intra-batch
        duplicates (same block+mask pair seen earlier in the batch)."""
        hashes = np.asarray(hashes, dtype=U64)
        if hashes.size == 0:
            return np.zeros(0, dtype=bool)
        self._writable()
        n = len(hashes)
        idx = _block_index(self.num_blocks, hashes).astype(np.int64)
        mask = _make_mask(hashes)
        words2d = self.words.reshape(-1, 8)
        # a key is a hit when its mask is covered by the UNION of the
        # pre-batch block word and all EARLIER in-batch masks of the same
        # block (either source alone under-reports: a mask can be
        # half-covered by each).  Sort by block, then build each key's
        # same-block exclusive prefix OR with Hillis-Steele log-doubling
        # -- fully vectorized (the old per-collision Python loop was
        # effectively per-row at bulk-build densities: ~50 same-block
        # keys per 155k-key batch at 10 bits/key)
        order = np.argsort(idx, kind="stable")
        srt_idx = idx[order]
        srt_mask = mask[order]
        run_start = np.concatenate([[True], srt_idx[1:] != srt_idx[:-1]])
        run_first = np.flatnonzero(run_start)
        run_id = np.cumsum(run_start) - 1
        pos = np.arange(n) - run_first[run_id]   # position within run
        incl = srt_mask.copy()                   # inclusive prefix OR
        shift = 1
        max_pos = int(pos.max())
        while shift <= max_pos:
            src = incl.copy()
            tgt = np.flatnonzero(pos >= shift)
            incl[tgt] |= src[tgt - shift]
            shift *= 2
        cover = words2d[srt_idx]                 # pre-batch word
        later = np.flatnonzero(pos >= 1)
        cover = cover.copy()
        cover[later] |= incl[later - 1]          # exclusive = incl[i-1]
        hit_sorted = ((cover & srt_mask) == srt_mask).all(axis=1)
        out = np.empty(n, dtype=bool)
        out[order] = hit_sorted
        # final insert: one duplicate-free scatter of each run's total OR
        # (same reduced-write shape as insert())
        run_end = np.concatenate([run_start[1:], [True]])
        words2d[srt_idx[run_end]] |= incl[run_end]
        return out

    def merge(self, other: "SbbfFilter") -> "SbbfFilter":
        if other.num_blocks != self.num_blocks:
            raise ValueError("SBBF merge requires identical num_blocks")
        self._writable()
        self.words |= other.words
        self.num_keys += other.num_keys  # upper bound (dups across partials)
        return self

    # --- probe ------------------------------------------------------------
    def check(self, hashes: np.ndarray) -> np.ndarray:
        hashes = np.asarray(hashes, dtype=U64)
        if hashes.size == 0:
            return np.zeros(0, dtype=bool)
        from ..native import get_lib
        lib = get_lib()
        if lib is not None:
            out = np.zeros(len(hashes), dtype=np.uint8)
            lib.sbbf_check(self.words, self.num_blocks,
                           np.ascontiguousarray(hashes), len(hashes), out)
            return out.astype(bool)
        idx = _block_index(self.num_blocks, hashes).astype(np.int64)
        mask = _make_mask(hashes)
        blocks = self.words[(idx[:, None] * 8 + np.arange(8))]
        return ((blocks & mask) == mask).all(axis=1)

    # --- serialization / metrics -----------------------------------------
    def to_bytes(self) -> bytes:
        return pack(self.kind,
                    {"bits_per_key": self.bits_per_key,
                     "num_keys": self.num_keys},
                    {"words": self.words})

    @classmethod
    def from_bytes(cls, blob: bytes) -> "SbbfFilter":
        kind, meta, arrays = unpack(blob)
        assert kind == cls.kind
        return cls._from_parts(meta, arrays)

    @classmethod
    def _from_parts(cls, meta, arrays) -> "SbbfFilter":
        # no copy: probe-only decodes keep the envelope view (shared,
        # possibly read-only); insert/merge promote lazily via _writable()
        return cls(arrays["words"], meta["bits_per_key"],
                   meta["num_keys"])

    def mem_usage(self) -> int:
        return self.num_blocks * BLOCK_SIZE  # src/sbbf.zig:117-119

    def ideal_mem_usage(self) -> int:
        return self.num_keys * self.bits_per_key // 8  # src/sbbf.zig:121-123
