"""Mergeable-sketch bound + merge-associativity property tests (north rule:
estimates within published error bounds regardless of partition count or
merge order; FIXTURES.md F5 partitionings k in {1,2,7,32})."""

from __future__ import annotations

import numpy as np
import pytest

from raysketch.hashing import hash_ints
from raysketch.sketches import CmsSketch, HllSketch, KllSketch, TDigest

PARTITIONINGS = [1, 2, 7, 32]


def _merged(cls_create, update_args_parts, seed):
    rng = np.random.default_rng(seed)
    acc = cls_create()
    order = rng.permutation(len(update_args_parts))
    for i in order:
        s = cls_create()
        s.update(update_args_parts[i])
        acc.merge(s)
    return acc


def test_hll_bound_and_bitwise_merge():
    n = 200000
    h = hash_ints(np.arange(n), seed=21)
    whole = HllSketch.create(p=14)
    whole.update(h)
    est = whole.estimate()
    assert abs(est - n) / n < 3 * whole.rel_error()
    rng = np.random.default_rng(3)
    for k in PARTITIONINGS:
        for trial in range(3):
            parts = np.array_split(rng.permutation(h), k)
            m = _merged(lambda: HllSketch.create(p=14), parts, seed=trial)
            assert (m.registers == whole.registers).all(), (k, trial)


def test_hll_small_range_linear_counting():
    for n in (5, 50, 500):
        s = HllSketch.create(p=12)
        s.update(hash_ints(np.arange(n), seed=2))
        assert abs(s.estimate() - n) <= max(2, 0.03 * n)


def test_cms_never_undercounts_and_bitwise_merge():
    rng = np.random.default_rng(5)
    keys = rng.zipf(1.5, 100000).astype(np.int64)
    h = hash_ints(keys)
    whole = CmsSketch.create(depth=4, width=1 << 14)
    whole.update(h)
    uniq, counts = np.unique(keys, return_counts=True)
    est = whole.query(hash_ints(uniq))
    over = est - counts
    assert (over >= 0).all()
    assert over.max() <= np.e / (1 << 14) * len(keys) * 3  # cN bound, slack 3x
    for k in PARTITIONINGS:
        parts = np.array_split(h, k)
        m = _merged(lambda: CmsSketch.create(depth=4, width=1 << 14),
                    parts, seed=k)
        assert (m.table == whole.table).all()


def test_cms_weighted_updates():
    s = CmsSketch.create(depth=4, width=1 << 12)
    h = hash_ints(np.array([1, 2, 3]))
    s.update(h, counts=np.array([10, 20, 30]))
    assert (s.query(h) >= np.array([10, 20, 30])).all()
    assert s.total() == 60


@pytest.mark.parametrize("k", PARTITIONINGS)
def test_kll_rank_error_bound_any_partitioning(k):
    rng = np.random.default_rng(77)
    vals = rng.lognormal(6, 1.5, 150000)
    parts = np.array_split(rng.permutation(vals), k)
    m = _merged(lambda: KllSketch.create(k=200), parts, seed=k)
    qs = np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
    est = m.quantile(qs)
    svals = np.sort(vals)
    ranks = np.searchsorted(svals, est) / len(vals)
    assert np.abs(ranks - qs).max() < 0.025, ranks - qs


@pytest.mark.parametrize("k", [1, 2, 7])
def test_tdigest_rank_error_bound_any_partitioning(k):
    rng = np.random.default_rng(99)
    vals = rng.normal(100, 15, 60000)
    parts = np.array_split(rng.permutation(vals), k)
    m = _merged(lambda: TDigest.create(delta=200), parts, seed=k)
    qs = np.array([0.01, 0.25, 0.5, 0.75, 0.99])
    est = m.quantile(qs)
    ranks = np.searchsorted(np.sort(vals), est) / len(vals)
    assert np.abs(ranks - qs).max() < 0.02


def test_kll_min_max_and_extremes():
    s = KllSketch.create(k=128)
    v = np.arange(10000, dtype=np.float64)
    s.update(v)
    assert s.quantile(0.0) == 0.0
    assert s.quantile(1.0) == 9999.0


def test_serialization_roundtrip_all():
    h = hash_ints(np.arange(1000))
    vals = np.linspace(0, 1, 1000)
    sketches = []
    s = HllSketch.create(p=10); s.update(h); sketches.append(s)
    s = CmsSketch.create(4, 1 << 10); s.update(h); sketches.append(s)
    s = KllSketch.create(k=64); s.update(vals); sketches.append(s)
    s = TDigest.create(delta=100); s.update(vals); sketches.append(s)
    from raysketch.sketches import sketch_from_bytes
    for s in sketches:
        blob = s.to_bytes()
        s2 = sketch_from_bytes(blob)
        assert type(s2) is type(s)
        if hasattr(s, "estimate"):
            assert s2.estimate() == s.estimate()
        if hasattr(s, "quantile"):
            assert s2.quantile(0.5) == s.quantile(0.5)


def test_bottomk_merge_bit_identical_and_bound():
    import pyarrow as pa
    from raysketch.hashing import hash_strings
    from raysketch.sketches import BottomKSketch, sketch_from_bytes

    keys = [f"url-{i}" for i in range(10000)]
    h = hash_strings(pa.array(keys))
    import random
    order = list(range(10000))
    random.Random(5).shuffle(order)
    chunks = [order[i::7] for i in range(7)]

    def make(chunk):
        s = BottomKSketch.create(k=256)
        s.update(h[chunk], [keys[i].encode() for i in chunk])
        return s

    parts = [make(c) for c in chunks]
    a = parts[0]
    for p in parts[1:]:
        a = a.merge(p)
    b = parts[6]
    for p in reversed(parts[:6]):
        b = b.merge(p)
    # merge is order-INVARIANT at the bit level (stronger than estimate-
    # stable): the k smallest hashes of a set are a pure set function
    assert (a.hashes == b.hashes).all()
    assert a.payload == b.payload
    est = a.estimate()
    assert abs(est - 10000) / 10000 <= 3 * a.rel_error()
    rt = sketch_from_bytes(a.to_bytes())
    assert (rt.hashes == a.hashes).all()
    # duplicates do not inflate the distinct estimate
    s = BottomKSketch.create(k=64)
    s.update(np.repeat(h[:10], 100),
             [keys[i // 100].encode() for i in range(1000)])
    assert s.estimate() == 10.0
    # undersaturated -> exact, and the sample is exactly the distinct set
    assert sorted(s.sample()) == sorted(keys[:10])


def test_envelope_compression_guard():
    """pack() deflates sparse payloads but skips near-random ones.

    Fully-built filter payloads are near-random bits (measured 0.4-11.5%
    deflation for 25-85 ms/1M-key partition); partial sketch states are
    sparse and compress 10-100x.  The sampled guard must keep the latter
    compressed, skip the former, and round-trip both."""
    from raysketch.sketches.base import pack, unpack

    rng = np.random.default_rng(3)
    rand = rng.integers(0, 2**64, size=300_000, dtype=np.uint64)
    blob = pack("sbbf", {"m": 1}, {"words": rand})
    assert blob[:4] == b"RSK1"          # incompressible: raw envelope
    kind, meta, arrays = unpack(blob)
    assert kind == "sbbf" and meta == {"m": 1}
    assert np.array_equal(arrays["words"], rand)

    sparse = np.zeros(300_000, dtype=np.uint64)
    sparse[rng.integers(0, 300_000, size=2_000)] = 0xFFFF
    blob = pack("sbbf", {"m": 2}, {"words": sparse})
    assert blob[:4] == b"RSKZ"          # sparse partial: compressed
    assert len(blob) < sparse.nbytes // 10
    _, _, arrays = unpack(blob)
    assert np.array_equal(arrays["words"], sparse)

    # small envelopes keep the old always-try behavior (<= 6 * _SAMPLE)
    small = np.zeros(1_500, dtype=np.uint64)
    blob = pack("hll", {}, {"regs": small})
    assert blob[:4] == b"RSKZ"
    _, _, arrays = unpack(blob)
    assert np.array_equal(arrays["regs"], small)


def test_zero_copy_envelope_decode():
    """Raw RSK1 envelopes decode as VIEWS into the caller's buffer.

    The broadcast probe path ships envelopes as uint8 arrays so ray.get
    maps them plasma-zero-copy; unpack() must then return array views
    (no private copy per worker) and the filter classes must tolerate
    the resulting READ-ONLY arrays -- probing works as-is, mutating ops
    promote to a private copy lazily instead of failing."""
    from raysketch.sketches import SbbfFilter, XorFilter, RibbonFilter
    from raysketch.sketches.base import unpack

    rng = np.random.default_rng(11)
    h = rng.integers(0, 2**64, size=20_000, dtype=np.uint64)

    for make in (lambda: SbbfFilter.build(h, bits_per_key=24),
                 lambda: XorFilter.build(h, arity=3, fp_bits=16),
                 lambda: RibbonFilter.build(h, coeff_bits=64,
                                            result_bits=16)):
        f = make()
        blob = f.to_bytes()
        if blob[:4] != b"RSK1":
            continue    # compressed envelope: decode necessarily copies
        # simulate the plasma shape: a read-only uint8 ndarray
        buf = np.frombuffer(blob, dtype=np.uint8)
        assert not buf.flags.writeable
        kind, meta, arrays = unpack(buf)
        for arr in arrays.values():
            assert np.shares_memory(arr, buf)   # zero-copy
            assert not arr.flags.writeable
        g = type(f)._from_parts(meta, arrays)
        assert np.array_equal(g.check(h), f.check(h))
        assert g.check(h).all()     # zero false negatives on a view

    # sbbf mutating ops promote a read-only view lazily (no crash, same
    # bits as a writable filter)
    f = SbbfFilter.build(h[:10_000], bits_per_key=24)
    buf = np.frombuffer(f.to_bytes(), dtype=np.uint8)
    _, meta, arrays = unpack(buf)
    g = SbbfFilter._from_parts(meta, arrays)
    assert not g.words.flags.writeable
    g.insert(h[10_000:])            # promotes via _writable()
    assert g.words.flags.writeable
    ref = SbbfFilter.build(h[:10_000], bits_per_key=24)
    ref.insert(h[10_000:])
    assert np.array_equal(g.words, ref.words)
    # merge promotes too
    g2 = SbbfFilter._from_parts(*unpack(buf)[1:])
    g2.merge(ref)
    assert g2.words.flags.writeable
