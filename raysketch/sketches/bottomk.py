"""Bottom-k sketch -- mergeable uniform sample over DISTINCT keys.

Not in the reference; standard mergeable summary (Cohen & Kaplan,
"Summarizing data using bottom-k sketches", PODC 2007).  Keep the k
smallest key hashes (plus their payloads): because the hash is a fixed
deterministic function of the key, the k smallest hashes of a union are a
pure function of the input SET -- merge = concat + unique + take-k-smallest
is associative, commutative and idempotent (bit-identical state under any
merge tree, stronger than HLL's estimate-stability).

Gives (a) a uniform sample of distinct keys, (b) a distinct-count
estimator: n_hat = (k-1) * 2^64 / h_k (k-th smallest hash), rel. std.
error ~ 1/sqrt(k-2).
"""

from __future__ import annotations

import numpy as np

from ..hashing import U64
from .base import Sketch, pack, unpack, register


@register
class BottomKSketch(Sketch):
    kind = "bottomk"
    mergeable = True

    def __init__(self, k: int, hashes: np.ndarray, payload: bytes,
                 offsets: np.ndarray):
        self.k = int(k)
        self.hashes = np.asarray(hashes, dtype=U64)     # sorted ascending
        self.payload = payload                          # concatenated utf-8
        self.offsets = np.asarray(offsets, dtype=np.int64)  # len+1 offsets

    @classmethod
    def create(cls, k: int = 256) -> "BottomKSketch":
        return cls(k, np.zeros(0, dtype=U64), b"",
                   np.zeros(1, dtype=np.int64))

    def _values(self) -> list[bytes]:
        return [self.payload[self.offsets[i]:self.offsets[i + 1]]
                for i in range(len(self.hashes))]

    def update(self, hashes: np.ndarray, values: list[bytes]) -> None:
        """Add (hash, value) pairs; hashes MUST be the deterministic key
        hash of the values (same key -> same hash on every worker)."""
        vals = [bytes(v) for v in values]
        data = np.frombuffer(b"".join(vals), dtype=np.uint8)
        offsets = np.concatenate(
            [[0], np.cumsum([len(v) for v in vals])]).astype(np.int64)
        self.update_packed(hashes, data, offsets)

    def update_packed(self, hashes: np.ndarray, data: np.ndarray,
                      offsets: np.ndarray) -> None:
        """Buffer-layout update: values arrive as one (data, offsets[n+1])
        byte layout -- an Arrow string column's own buffers feed this
        directly, so the hot per-block partial never runs a per-row
        encode/tobytes loop.  Offsets may have any base (sliced arrays)."""
        h = np.asarray(hashes, dtype=U64)
        if h.size == 0:
            return
        data = np.asarray(data, dtype=np.uint8)
        offsets = np.asarray(offsets, dtype=np.int64)
        own = np.frombuffer(self.payload, dtype=np.uint8)
        all_data = np.concatenate([own, data])
        starts = np.concatenate([self.offsets[:-1],
                                 offsets[:-1] + len(own)])
        lens = np.concatenate([np.diff(self.offsets), np.diff(offsets)])
        all_h = np.concatenate([self.hashes, h])
        uniq, idx = np.unique(all_h, return_index=True)
        take = min(self.k, len(uniq))
        sel = idx[:take]                     # uniq is sorted ascending
        sl, ss = lens[sel], starts[sel]
        new_off = np.concatenate([[0], np.cumsum(sl)]).astype(np.int64)
        total = int(new_off[-1])
        if total:
            # vectorized gather: dest byte j of row i reads
            # all_data[ss[i] + (j - new_off[i])]
            src = np.repeat(ss - new_off[:-1], sl) + np.arange(total)
            self.payload = all_data[src].tobytes()
        else:
            self.payload = b""
        self.hashes = uniq[:take]
        self.offsets = new_off

    def merge(self, other: "BottomKSketch") -> "BottomKSketch":
        if other.k != self.k:
            raise ValueError("bottom-k merge requires identical k")
        self.update_packed(other.hashes,
                           np.frombuffer(other.payload, dtype=np.uint8),
                           other.offsets)
        return self

    def sample(self) -> list[str]:
        return [v.decode("utf-8", "replace") for v in self._values()]

    def estimate(self) -> float:
        """Distinct-count estimate; exact (=len) while undersaturated."""
        n = len(self.hashes)
        if n < self.k:
            return float(n)
        hk = float(self.hashes[-1]) + 1.0
        return (self.k - 1) * (2.0 ** 64) / hk

    def rel_error(self) -> float:
        return 1.0 / np.sqrt(max(1, self.k - 2))

    def to_bytes(self) -> bytes:
        return pack(self.kind, {"k": self.k},
                    {"hashes": self.hashes,
                     "payload": np.frombuffer(self.payload, dtype=np.uint8),
                     "offsets": self.offsets})

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BottomKSketch":
        kind, meta, arrays = unpack(blob)
        assert kind == cls.kind
        return cls._from_parts(meta, arrays)

    @classmethod
    def _from_parts(cls, meta, arrays) -> "BottomKSketch":
        return cls(meta["k"], arrays["hashes"].copy(),
                   arrays["payload"].tobytes(), arrays["offsets"].copy())

    def mem_usage(self) -> int:
        return self.hashes.nbytes + len(self.payload) + self.offsets.nbytes
