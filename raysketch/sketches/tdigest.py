"""t-digest -- mergeable quantile sketch (merging variant).

Not in the reference; required by the north rule.  Dunning's merging
t-digest with the k1 (arcsine) scale function: centroid sizes are bounded so
that each centroid spans <= 1 unit of k-space, giving high resolution at the
tails.  merge() concatenates centroid lists and re-compresses; estimates are
stable (within the digest's accuracy) under any merge order, though states
are not bit-identical (like KLL, unlike SBBF/HLL/CMS).
"""

from __future__ import annotations

import numpy as np

from .base import Sketch, pack, unpack, register


def _k_scale(q: np.ndarray, delta: float) -> np.ndarray:
    return delta / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)


@register
class TDigest(Sketch):
    kind = "tdigest"
    mergeable = True

    def __init__(self, delta: float = 200.0,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None,
                 minimum: float = np.inf, maximum: float = -np.inf):
        self.delta = float(delta)
        self.means = (means if means is not None
                      else np.zeros(0, dtype=np.float64))
        self.weights = (weights if weights is not None
                        else np.zeros(0, dtype=np.float64))
        self.min = float(minimum)
        self.max = float(maximum)

    @classmethod
    def create(cls, delta: float = 200.0) -> "TDigest":
        return cls(delta=delta)

    @property
    def n(self) -> float:
        return float(self.weights.sum())

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        if len(means) == 0:
            self.means = means
            self.weights = weights
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        out_m: list[float] = []
        out_w: list[float] = []
        acc = 0.0  # weight fully emitted so far
        cur_m, cur_w = float(means[0]), float(weights[0])
        k_limit = _k_scale(np.array([acc / total]), self.delta)[0] + 1.0
        for m, w in zip(means[1:], weights[1:]):
            q_new = (acc + cur_w + w) / total
            if _k_scale(np.array([q_new]), self.delta)[0] <= k_limit:
                # merge into current centroid (weighted mean)
                cur_m = (cur_m * cur_w + float(m) * float(w)) / (cur_w + float(w))
                cur_w += float(w)
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                acc += cur_w
                k_limit = _k_scale(np.array([acc / total]), self.delta)[0] + 1.0
                cur_m, cur_w = float(m), float(w)
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m, dtype=np.float64)
        self.weights = np.array(out_w, dtype=np.float64)

    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self._compress(np.concatenate([self.means, v]),
                       np.concatenate([self.weights,
                                       np.ones(len(v), dtype=np.float64)]))

    def merge(self, other: "TDigest") -> "TDigest":
        if other.delta != self.delta:
            raise ValueError("t-digest merge requires identical delta")
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compress(np.concatenate([self.means, other.means]),
                       np.concatenate([self.weights, other.weights]))
        return self

    def quantile(self, q) -> np.ndarray | float:
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if len(self.means) == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        total = self.weights.sum()
        # centroid midpoints in cumulative-weight space
        cum = np.cumsum(self.weights) - self.weights / 2.0
        targets = np.clip(qs, 0, 1) * total
        out = np.interp(targets, cum, self.means,
                        left=self.min, right=self.max)
        out = np.where(qs <= 0, self.min, out)
        out = np.where(qs >= 1, self.max, out)
        return float(out[0]) if scalar else out

    def to_bytes(self) -> bytes:
        return pack(self.kind,
                    {"delta": self.delta, "min": self.min, "max": self.max},
                    {"means": self.means, "weights": self.weights})

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        kind, meta, arrays = unpack(blob)
        assert kind == cls.kind
        return cls._from_parts(meta, arrays)

    @classmethod
    def _from_parts(cls, meta, arrays) -> "TDigest":
        return cls(meta["delta"], arrays["means"].copy(),
                   arrays["weights"].copy(), meta["min"], meta["max"])

    def mem_usage(self) -> int:
        return self.means.nbytes + self.weights.nbytes
