"""Count-min sketch -- mergeable frequency sketch.

Not in the reference; required by the north rule (host / token frequencies
over the pages table).  Cormode-Muthukrishnan 2005.  d rows x w counters
(w a power of two); row i indexes with murmur64a(h, row_seed_i) & (w-1).
Merge = element-wise add (associative + commutative => bit-identical under
any merge tree).  Point-query overcount <= e/w * N with prob 1 - e^-d.
"""

from __future__ import annotations

import numpy as np

from ..hashing import U64, murmur64a_u64
from .base import Sketch, pack, unpack, register

_ROW_SEED_BASE = 0x5EED5EED5EED5EED


@register
class CmsSketch(Sketch):
    kind = "cms"
    mergeable = True

    def __init__(self, table: np.ndarray, depth: int, width: int):
        self.table = np.ascontiguousarray(table, dtype=np.int64)
        self.depth = int(depth)
        self.width = int(width)
        assert self.table.shape == (self.depth, self.width)
        assert self.width & (self.width - 1) == 0, "width must be a power of 2"

    @classmethod
    def create(cls, depth: int = 4, width: int = 1 << 16) -> "CmsSketch":
        return cls(np.zeros((depth, width), dtype=np.int64), depth, width)

    def _row_idx(self, hashes: np.ndarray, row: int) -> np.ndarray:
        hh = murmur64a_u64(hashes, (_ROW_SEED_BASE + row) & 0xFFFFFFFFFFFFFFFF)
        return (hh & U64(self.width - 1)).astype(np.int64)

    def update(self, hashes: np.ndarray,
               counts: np.ndarray | None = None) -> None:
        h = np.asarray(hashes, dtype=U64)
        if h.size == 0:
            return
        c = (np.ones(len(h), dtype=np.int64) if counts is None
             else np.asarray(counts, dtype=np.int64))
        for row in range(self.depth):
            np.add.at(self.table[row], self._row_idx(h, row), c)

    def merge(self, other: "CmsSketch") -> "CmsSketch":
        if (other.depth, other.width) != (self.depth, self.width):
            raise ValueError("CMS merge requires identical shape")
        self.table += other.table
        return self

    def query(self, hashes: np.ndarray) -> np.ndarray:
        """Point-frequency estimates (min over rows), vectorized."""
        h = np.asarray(hashes, dtype=U64)
        if h.size == 0:
            return np.zeros(0, dtype=np.int64)
        est = self.table[0][self._row_idx(h, 0)]
        for row in range(1, self.depth):
            est = np.minimum(est, self.table[row][self._row_idx(h, row)])
        return est

    def total(self) -> int:
        return int(self.table[0].sum())

    def to_bytes(self) -> bytes:
        return pack(self.kind, {"depth": self.depth, "width": self.width},
                    {"table": self.table})

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CmsSketch":
        kind, meta, arrays = unpack(blob)
        assert kind == cls.kind
        return cls._from_parts(meta, arrays)

    @classmethod
    def _from_parts(cls, meta, arrays) -> "CmsSketch":
        return cls(arrays["table"].copy(), meta["depth"], meta["width"])

    def mem_usage(self) -> int:
        return self.table.nbytes
