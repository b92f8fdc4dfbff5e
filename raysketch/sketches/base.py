"""Sketch ABC, binary envelope and registry.

Mirrors the reference's uniform duck-typed filter interface
(`init/check/mem_usage/ideal_mem_usage`, consumed generically by the test
matrix at /root/reference/src/tests.zig:97-126) as a Python ABC with explicit
serialization, because in the new engine sketch state crosses process/node
boundaries through the Ray object store and Parquet checkpoints.

Envelope format (stable, self-describing, no pickle):
  MAGIC 'RSK1' | u32 header_len | header json (kind, meta, array specs) |
  raw little-endian array payloads concatenated.
Large envelopes (> _COMPRESS_MIN) are wrapped as MAGIC 'RSKZ' | zlib(RSK1
blob): partial sketch states (CMS tables, SBBF bit arrays) are sparse at
per-block granularity, so compression cuts shuffle/object-store bytes by
10-100x for the cost of a level-1 deflate.  Deterministic (fixed level).

FULLY-BUILT filter payloads, by contrast, are near-random bits by design
(uniform fingerprints / target-load Bloom words) and measured 0.4-11.5%
deflation for 25-85 ms of level-1 zlib per 1M-key partition -- at 10^6
partitions that is CPU-hours spent on the build's hot path for almost no
byte savings, plus a zlib.decompress on every cold probe decode.  pack()
therefore probes two strided slices first (~0.4 ms) and only deflates the
whole payload when the sample compresses below _SAMPLE_RATIO; sparse
partial states sail through the guard, incompressible finals skip it.
Still deterministic: the decision is a pure function of the raw bytes.
"""

from __future__ import annotations

import json
import struct
import zlib
from abc import ABC, abstractmethod

import numpy as np

_MAGIC = b"RSK1"
_MAGIC_Z = b"RSKZ"
_COMPRESS_MIN = 4096
_SAMPLE = 8192          # bytes per probe slice (two slices)
_SAMPLE_RATIO = 0.85    # sample must beat this to justify a full deflate


def _worth_compressing(raw: bytes) -> bool:
    """Cheap compressibility probe for large envelopes.

    Two strided 8 KiB slices (at 1/3 and 2/3 of the blob, skipping the
    json header region) stand in for the whole payload: sparse partial
    sketch states compress ~10-100x everywhere, while fully-loaded filter
    payloads are uniformly near-random, so a couple of samples classify
    reliably.  The 0.85 bar deliberately rejects marginal cases like a
    loaded sbbf24's 0.885 -- an 11% byte saving is not worth 85 ms per
    build task plus a decompress on every cold probe decode."""
    third = len(raw) // 3
    sample = raw[third:third + _SAMPLE] + raw[2 * third:2 * third + _SAMPLE]
    return len(zlib.compress(sample, 1)) < _SAMPLE_RATIO * len(sample)


def pack(kind: str, meta: dict, arrays: dict[str, np.ndarray]) -> bytes:
    from ..hashing import HASH_VERSION
    specs = []
    payloads = []
    for name, arr in arrays.items():
        arr = np.ascontiguousarray(arr)
        if arr.dtype.byteorder == ">":
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        specs.append({"name": name, "dtype": arr.dtype.str, "shape": list(arr.shape)})
        payloads.append(arr.tobytes())
    # hash-kernel version stamp: a payload probed by a process whose string
    # hash kernel differs from the builder's would silently false-negative,
    # so every envelope carries the kernel version and unpack() hard-fails
    # on mismatch (generalizes RibbonFilter.DERIVATION to all sketch kinds)
    header = json.dumps({"kind": kind, "meta": meta, "arrays": specs,
                         "hashv": HASH_VERSION},
                        separators=(",", ":")).encode()
    raw = b"".join([_MAGIC, struct.pack("<I", len(header)), header, *payloads])
    if len(raw) > _COMPRESS_MIN and (len(raw) <= 6 * _SAMPLE
                                     or _worth_compressing(raw)):
        z = zlib.compress(raw, 1)
        if len(z) + 4 < len(raw):
            return _MAGIC_Z + z
    return raw


def unpack(blob) -> tuple[str, dict, dict[str, np.ndarray]]:
    """Decode an envelope from bytes OR any buffer (memoryview, uint8
    ndarray).  Raw RSK1 envelopes decode ZERO-COPY: the returned arrays
    are read-only views into the caller's buffer -- when that buffer is a
    Ray plasma-backed object, every worker on a node shares one mapping
    instead of each holding a private multi-MB copy.  Mutating consumers
    must copy (the filter classes promote lazily on first write)."""
    if isinstance(blob, np.ndarray):
        blob = memoryview(blob)
    if bytes(blob[:4]) == _MAGIC_Z:
        blob = zlib.decompress(blob[4:])
    if bytes(blob[:4]) != _MAGIC:
        raise ValueError("bad sketch envelope magic")
    (hlen,) = struct.unpack_from("<I", blob, 4)
    header = json.loads(bytes(blob[8:8 + hlen]).decode())
    from ..hashing import HASH_VERSION
    got = header.get("hashv")
    if got is not None and got != HASH_VERSION:
        raise ValueError(
            f"sketch payload was built with hash kernel {got!r} but this "
            f"process hashes with {HASH_VERSION!r}; rebuild the sketch "
            "(probing across kernel versions silently false-negatives)")
    arrays = {}
    off = 8 + hlen
    for spec in header["arrays"]:
        dt = np.dtype(spec["dtype"])
        count = int(np.prod(spec["shape"])) if spec["shape"] else 1
        nbytes = dt.itemsize * count
        arrays[spec["name"]] = np.frombuffer(
            blob, dtype=dt, count=count, offset=off).reshape(spec["shape"])
        off += nbytes
    return header["kind"], header["meta"], arrays


class Sketch(ABC):
    """Common surface: build/update/check/estimate + envelope round-trip."""

    kind: str = "?"
    #: mergeable sketches support `merge` with associative+commutative
    #: semantics (SBBF or, HLL max, CMS add, KLL/t-digest compactor merge);
    #: holistic ones (xorf, ribbon) are built per-partition in one shot
    #: (reference: global solves at src/xorf.zig:111-220, src/ribbon.zig:51-139).
    mergeable: bool = False

    @abstractmethod
    def to_bytes(self) -> bytes: ...

    @classmethod
    @abstractmethod
    def from_bytes(cls, blob: bytes) -> "Sketch": ...

    def mem_usage(self) -> int:
        raise NotImplementedError

    def ideal_mem_usage(self) -> int:
        raise NotImplementedError


REGISTRY: dict[str, type] = {}


def register(cls):
    REGISTRY[cls.kind] = cls
    return cls


def sketch_from_bytes(blob: bytes) -> Sketch:
    """Deserialize any registered sketch -- ONE unpack (decompression +
    header parse), then dispatch to the class's _from_parts."""
    kind, meta, arrays = unpack(blob)
    try:
        cls = REGISTRY[kind]
    except KeyError:
        raise ValueError(f"unknown sketch kind {kind!r}") from None
    return cls._from_parts(meta, arrays)
