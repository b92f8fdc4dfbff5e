"""KLL quantile sketch -- mergeable rank/quantile estimation.

Not in the reference; required by the north rule (page-size / text-length
quantiles).  Karnin-Lang-Liberty 2016 (see PAPERS.md: "Relative Error
Streaming Quantiles" PODS 2021, "KLL+/-" VLDB 2021 for follow-ups).

State = a ladder of compactors; items at level l carry weight 2**l.
Compaction sorts a full level and promotes every other item (seeded,
reproducible coin) to the next level.  merge() concatenates ladders
level-wise then compacts -- estimates stay within the epsilon bound for any
partitioning / merge order (property-tested), though states are not
bit-identical across orders (unlike SBBF/HLL/CMS).
"""

from __future__ import annotations

import numpy as np

from .base import Sketch, pack, unpack, register

_C = 2.0 / 3.0  # level-capacity decay


def _capacity(k: int, depth: int, level: int) -> int:
    # levels below the top get geometrically smaller capacities
    return max(2, int(np.ceil(k * (_C ** (depth - 1 - level)))))


@register
class KllSketch(Sketch):
    kind = "kll"
    mergeable = True

    def __init__(self, k: int = 200,
                 compactors: list[np.ndarray] | None = None,
                 n: int = 0, coin_state: int = 0,
                 minimum: float = np.inf, maximum: float = -np.inf):
        self.k = int(k)
        self.compactors = (compactors if compactors is not None
                           else [np.zeros(0, dtype=np.float64)])
        self.n = int(n)
        self._coin_state = int(coin_state)
        self.min = float(minimum)
        self.max = float(maximum)

    @classmethod
    def create(cls, k: int = 200) -> "KllSketch":
        return cls(k=k)

    # -- internals ---------------------------------------------------------
    def _coin(self) -> int:
        # deterministic splitmix-style coin: reproducible for a given
        # insertion order (merge-order invariance is bounded, not bitwise)
        self._coin_state = (self._coin_state + 0x9E3779B97F4A7C15) & (2**64 - 1)
        z = self._coin_state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (2**64 - 1)
        return (z >> 32) & 1

    def _size(self) -> int:
        return sum(len(c) for c in self.compactors)

    def _max_size(self) -> int:
        d = len(self.compactors)
        return sum(_capacity(self.k, d, l) for l in range(d))

    def _compress(self) -> None:
        while self._size() > self._max_size():
            d = len(self.compactors)
            for level in range(d):
                if len(self.compactors[level]) > _capacity(self.k, d, level):
                    buf = np.sort(self.compactors[level])
                    start = self._coin()
                    promoted = buf[start::2]
                    kept = np.zeros(0, dtype=np.float64)
                    self.compactors[level] = kept
                    if level + 1 == len(self.compactors):
                        self.compactors.append(np.zeros(0, dtype=np.float64))
                    self.compactors[level + 1] = np.concatenate(
                        [self.compactors[level + 1], promoted])
                    break
            else:
                break

    # -- public ------------------------------------------------------------
    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.n += len(v)
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.compactors[0] = np.concatenate([self.compactors[0], v])
        self._compress()

    def merge(self, other: "KllSketch") -> "KllSketch":
        if other.k != self.k:
            raise ValueError("KLL merge requires identical k")
        while len(self.compactors) < len(other.compactors):
            self.compactors.append(np.zeros(0, dtype=np.float64))
        for level, buf in enumerate(other.compactors):
            if len(buf):
                self.compactors[level] = np.concatenate(
                    [self.compactors[level], buf])
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._coin_state ^= other._coin_state
        self._compress()
        return self

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, weights = [], []
        for level, buf in enumerate(self.compactors):
            if len(buf):
                vals.append(buf)
                weights.append(np.full(len(buf), 1 << level, dtype=np.int64))
        if not vals:
            return np.zeros(0), np.zeros(0, dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q) -> np.ndarray | float:
        """Value(s) at normalized rank(s) q in [0,1]."""
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        v, w = self._weighted()
        if len(v) == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        cum = np.cumsum(w)
        targets = np.clip(qs, 0, 1) * cum[-1]
        idx = np.searchsorted(cum, targets, side="left")
        idx = np.clip(idx, 0, len(v) - 1)
        out = v[idx]
        out = np.where(qs <= 0, self.min, out)
        out = np.where(qs >= 1, self.max, out)
        return float(out[0]) if scalar else out

    def rank(self, values) -> np.ndarray:
        """Estimated normalized rank of each value."""
        v, w = self._weighted()
        xs = np.atleast_1d(np.asarray(values, dtype=np.float64))
        if len(v) == 0:
            return np.full(len(xs), np.nan)
        cum = np.concatenate([[0], np.cumsum(w)])
        idx = np.searchsorted(v, xs, side="right")
        return cum[idx] / cum[-1]

    def eps(self) -> float:
        """Approximate additive rank-error bound for this k."""
        return 1.33 / self.k  # empirical constant from the KLL paper family

    def to_bytes(self) -> bytes:
        meta = {"k": self.k, "n": self.n, "coin": self._coin_state,
                "min": self.min, "max": self.max,
                "levels": len(self.compactors)}
        arrays = {f"c{l}": buf for l, buf in enumerate(self.compactors)}
        return pack(self.kind, meta, arrays)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KllSketch":
        kind, meta, arrays = unpack(blob)
        assert kind == cls.kind
        return cls._from_parts(meta, arrays)

    @classmethod
    def _from_parts(cls, meta, arrays) -> "KllSketch":
        comps = [arrays[f"c{l}"].copy() for l in range(meta["levels"])]
        return cls(meta["k"], comps, meta["n"], meta["coin"],
                   meta["min"], meta["max"])

    def mem_usage(self) -> int:
        return sum(c.nbytes for c in self.compactors)
