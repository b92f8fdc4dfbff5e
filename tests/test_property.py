"""Hypothesis property tests (SURVEY.md §5): merge associativity under
randomized partitionings of the same key multiset, zero-false-negative
filter invariants on arbitrary inputs, envelope roundtrips.

Pure-kernel tests -- no Ray session needed."""

from __future__ import annotations

import numpy as np
import pytest
from fuzz_budget import fuzz_settings
from hypothesis import given, strategies as st

from raysketch.hashing import hash_strings
from raysketch.sketches import (BottomKSketch, CmsSketch, HllSketch,
                                KllSketch, RibbonFilter, SbbfFilter,
                                XorFilter, num_blocks_for,
                                sketch_from_bytes)

u64s = st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=0, max_size=400)


def _partition(arr: np.ndarray, cuts: list[int]) -> list[np.ndarray]:
    idx = sorted(set(min(c, len(arr)) for c in cuts))
    return np.split(arr, idx)


@fuzz_settings(25)
@given(keys=u64s, cuts=st.lists(st.integers(0, 400), max_size=5),
       reverse=st.booleans())
def test_hll_merge_partition_invariant(keys, cuts, reverse):
    """HLL state is bit-identical no matter how the multiset is split or
    in which order partials merge."""
    h = np.array(keys, dtype=np.uint64)
    single = HllSketch.create(p=8)
    single.update(h)
    parts = _partition(h, cuts)
    if reverse:
        parts = parts[::-1]
    acc = HllSketch.create(p=8)
    for p in parts:
        s = HllSketch.create(p=8)
        s.update(p)
        acc = acc.merge(s)
    assert (acc.registers == single.registers).all()


@fuzz_settings(25)
@given(keys=u64s, cuts=st.lists(st.integers(0, 400), max_size=5),
       reverse=st.booleans())
def test_cms_merge_partition_invariant(keys, cuts, reverse):
    h = np.array(keys, dtype=np.uint64)
    single = CmsSketch.create(depth=3, width=64)
    single.update(h)
    parts = _partition(h, cuts)
    if reverse:
        parts = parts[::-1]
    acc = CmsSketch.create(depth=3, width=64)
    for p in parts:
        s = CmsSketch.create(depth=3, width=64)
        s.update(p)
        acc = acc.merge(s)
    assert (acc.table == single.table).all()


@fuzz_settings(25)
@given(keys=u64s, cuts=st.lists(st.integers(0, 400), max_size=5))
def test_sbbf_or_merge_equals_single_build(keys, cuts):
    """SBBF partial OR-merge == single-shot build at the same num_blocks
    (the mergeable-UDAF contract)."""
    h = np.unique(np.array(keys, dtype=np.uint64))
    nb = num_blocks_for(max(1, len(h)), 10)
    single = SbbfFilter.create(nb, 10)
    single.insert(h)
    acc = SbbfFilter.create(nb, 10)
    for p in _partition(h, cuts):
        f = SbbfFilter.create(nb, 10)
        f.insert(p)
        acc = acc.merge(f)
    assert (acc.words == single.words).all()


@fuzz_settings(25)
@given(keys=u64s, cuts=st.lists(st.integers(0, 400), max_size=5))
def test_bottomk_is_pure_set_function(keys, cuts):
    h = np.array(keys, dtype=np.uint64)
    vals = [str(k).encode() for k in h]
    single = BottomKSketch.create(k=32)
    single.update(h, vals)
    acc = BottomKSketch.create(k=32)
    start = 0
    for p in _partition(h, cuts):
        s = BottomKSketch.create(k=32)
        s.update(p, vals[start:start + len(p)])
        start += len(p)
        acc = acc.merge(s)
    assert (acc.hashes == single.hashes).all()
    assert acc.payload == single.payload


@fuzz_settings(15)
@given(keys=u64s)
def test_filters_zero_false_negatives_any_input(keys):
    """The reference's core invariant (src/tests.zig:60-67) on arbitrary
    inputs: every inserted key checks true, for every family."""
    h = np.unique(np.array(keys, dtype=np.uint64))
    nb = num_blocks_for(max(1, len(h)), 10)
    sb = SbbfFilter.create(nb, 10)
    sb.insert(h)
    assert sb.check(h).all()
    xf = XorFilter.build(h, fp_bits=16, arity=3)
    assert xf.check(h).all()
    rb = RibbonFilter.build(h, coeff_bits=64, result_bits=16)
    assert rb.check(h).all()


@fuzz_settings(15)
@given(vals=st.lists(st.floats(min_value=-1e9, max_value=1e9,
                               allow_nan=False), min_size=0, max_size=300),
       cuts=st.lists(st.integers(0, 300), max_size=3))
def test_kll_merge_estimate_stable(vals, cuts):
    """KLL is estimate-stable (not bit-identical) under partitioning:
    merged quantiles stay within the sketch's rank error of the exact."""
    v = np.array(vals, dtype=np.float64)
    acc = KllSketch.create(k=200)
    for p in _partition(v, cuts):
        s = KllSketch.create(k=200)
        s.update(p)
        acc = acc.merge(s)
    if len(v) == 0:
        return
    exact = np.sort(v)
    n = len(exact)
    for q in (0.25, 0.5, 0.75):
        est = float(acc.quantile(np.array([q]))[0])
        # est must lie within the value window of ranks q +/- 0.15
        # (rank-error form; robust to duplicates and n=1)
        lo = exact[max(0, int(np.floor((q - 0.15) * n)))]
        hi = exact[min(n - 1, int(np.ceil((q + 0.15) * n)))]
        assert lo <= est <= hi, (q, est, lo, hi)


@fuzz_settings(20)
@given(keys=u64s)
def test_envelope_roundtrip_every_kind(keys):
    h = np.unique(np.array(keys, dtype=np.uint64))
    sketches = []
    s = HllSketch.create(p=8); s.update(h); sketches.append(s)
    c = CmsSketch.create(depth=3, width=64); c.update(h); sketches.append(c)
    b = BottomKSketch.create(k=16)
    b.update(h, [str(k).encode() for k in h]); sketches.append(b)
    x = XorFilter.build(h, fp_bits=16, arity=3); sketches.append(x)
    for sk in sketches:
        rt = sketch_from_bytes(sk.to_bytes())
        assert rt.to_bytes() == sk.to_bytes()
