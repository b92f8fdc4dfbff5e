"""HyperLogLog (dense) -- mergeable distinct-count sketch.

Not in the reference (filterz has no cardinality sketch); required by the
north rule.  Flajolet-Fuss-Gandouet-Meunier 2007, with linear counting for
the small range.  State = 2**p 6-bit registers stored as uint8; merge =
element-wise max (associative + commutative => any merge tree over any
partitioning yields bit-identical registers).  Relative standard error
~= 1.04/sqrt(2**p).
"""

from __future__ import annotations

import math

import numpy as np

from ..hashing import U64, clz64
from .base import Sketch, pack, unpack, register


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


@register
class HllSketch(Sketch):
    kind = "hll"
    mergeable = True

    def __init__(self, registers: np.ndarray, p: int):
        self.p = int(p)
        self.m = 1 << self.p
        self.registers = np.ascontiguousarray(registers, dtype=np.uint8)
        assert len(self.registers) == self.m

    @classmethod
    def create(cls, p: int = 14) -> "HllSketch":
        return cls(np.zeros(1 << p, dtype=np.uint8), p)

    def update(self, hashes: np.ndarray) -> None:
        h = np.asarray(hashes, dtype=U64)
        if h.size == 0:
            return
        idx = (h >> U64(64 - self.p)).astype(np.int64)
        w = h << U64(self.p)  # remaining 64-p bits in the high positions
        rank = np.minimum(clz64(w) + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HllSketch") -> "HllSketch":
        if other.p != self.p:
            raise ValueError("HLL merge requires identical precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        regs = self.registers.astype(np.float64)
        m = float(self.m)
        raw = _alpha(self.m) * m * m / np.sum(np.exp2(-regs))
        if raw <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * math.log(m / zeros)  # linear counting
        return float(raw)

    def rel_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def to_bytes(self) -> bytes:
        return pack(self.kind, {"p": self.p}, {"registers": self.registers})

    @classmethod
    def from_bytes(cls, blob: bytes) -> "HllSketch":
        kind, meta, arrays = unpack(blob)
        assert kind == cls.kind
        return cls._from_parts(meta, arrays)

    @classmethod
    def _from_parts(cls, meta, arrays) -> "HllSketch":
        return cls(arrays["registers"].copy(), meta["p"])

    def mem_usage(self) -> int:
        return self.m
