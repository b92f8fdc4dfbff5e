"""Adversarial byte-framing fuzz over the string-hash -> build -> probe
path, mirroring the reference's coverage-guided fuzz harness
(/root/reference/src/fuzz.zig:8-109: raw byte buffer -> framed keys ->
prepare_keys sort+dedup -> xorf build -> assert every key checks true).

The hypothesis strategies here reproduce the adversarial shapes that
harness explores pointwise -- zero-length keys, keys up to 8 KiB, NUL
bytes, shared prefixes/extensions, XXH3 length-path boundaries (0/1-3/
4-8/9-16/17-128/129-240/long-striped) -- and additionally fuzz the Arrow
framing the Zig harness has no equivalent of: chunk boundaries and
sliced (non-zero offset) arrays must hash bit-identically to contiguous
construction.

Pure-kernel tests -- no Ray session needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from fuzz_budget import fuzz_settings
from hypothesis import given, strategies as st

from raysketch.hashing import hash_strings
from raysketch.sketches import RibbonFilter, SbbfFilter, XorFilter

# XXH3 length-path boundaries (0, 1-3, 4-8, 9-16, 17-128, 129-240,
# striped long with per-block scramble at 1024) plus the reference fuzz
# cap of one-byte length framing (255) and multi-KiB keys.
_BOUNDARY_LENS = [0, 1, 2, 3, 4, 7, 8, 9, 15, 16, 17, 31, 32, 63, 64,
                  127, 128, 129, 239, 240, 241, 255, 256, 511, 512,
                  1023, 1024, 1025, 4096, 8192]

_fill = st.integers(0, 255)

# a key drawn at an exact length-path boundary, filled with a repeating
# (possibly NUL) byte pattern plus a distinguishing suffix
_boundary_key = st.builds(
    lambda n, b, tag: (bytes([b]) * n + tag)[: max(n, len(tag))],
    st.sampled_from(_BOUNDARY_LENS), _fill, st.binary(max_size=4))

_arbitrary_key = st.binary(max_size=64)

# shared-prefix family: one base, several extensions (prefix pairs must
# hash apart; src/fuzz.zig frames keys back-to-back so adjacent keys
# share buffer bytes -- the Arrow analogue is common prefixes)
_prefixed_family = st.builds(
    lambda base, exts: [base] + [base + e for e in exts],
    st.binary(max_size=300),
    st.lists(st.binary(min_size=1, max_size=16), min_size=1, max_size=5))

_keyset = st.builds(
    lambda singles, fams: list(dict.fromkeys(
        singles + [k for fam in fams for k in fam])),
    st.lists(st.one_of(_arbitrary_key, _boundary_key), max_size=40),
    st.lists(_prefixed_family, max_size=4))

# every byte-aligned config of the reference FILTERS matrix
# (src/tests.zig:97-126; sub-byte widths excluded per reference
# README.md:19-20) -- same registry as tests/test_filters.py.
_CONFIGS = [
    ("sbbf8", lambda h: SbbfFilter.build(h, bits_per_key=8)),
    ("sbbf10", lambda h: SbbfFilter.build(h, bits_per_key=10)),
    ("sbbf16", lambda h: SbbfFilter.build(h, bits_per_key=16)),
    ("sbbf24", lambda h: SbbfFilter.build(h, bits_per_key=24)),
    ("xorf3_8", lambda h: XorFilter.build(h, fp_bits=8, arity=3)),
    ("xorf4_8", lambda h: XorFilter.build(h, fp_bits=8, arity=4)),
    ("xorf3_16", lambda h: XorFilter.build(h, fp_bits=16, arity=3)),
    ("xorf4_16", lambda h: XorFilter.build(h, fp_bits=16, arity=4)),
    ("xorf3_32", lambda h: XorFilter.build(h, fp_bits=32, arity=3)),
    ("xorf4_32", lambda h: XorFilter.build(h, fp_bits=32, arity=4)),
    ("ribbon32_8", lambda h: RibbonFilter.build(h, 32, 8)),
    ("ribbon64_8", lambda h: RibbonFilter.build(h, 64, 8)),
    ("ribbon64_16", lambda h: RibbonFilter.build(h, 64, 16)),
    ("ribbon64_32", lambda h: RibbonFilter.build(h, 64, 32)),
    ("ribbon128_8", lambda h: RibbonFilter.build(h, 128, 8)),
    ("ribbon128_16", lambda h: RibbonFilter.build(h, 128, 16)),
    ("ribbon128_32", lambda h: RibbonFilter.build(h, 128, 32)),
]


def _hashes(keys: list[bytes]) -> np.ndarray:
    """hash -> sort -> dedup, the reference's prepare_keys
    (src/fuzz.zig:61-90)."""
    if not keys:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(hash_strings(pa.array(keys, type=pa.binary())))


@fuzz_settings(30)
@given(keys=_keyset)
def test_fuzz_hash_build_probe_zero_fn(keys):
    """Every framed key set builds every registry config and every
    present key checks true (the src/fuzz.zig assertion, widened from
    xorf3_16 to the full byte-aligned matrix)."""
    h = _hashes(keys)
    # distinct byte keys must produce distinct u64 hashes at these set
    # sizes (a collision here would break prepare_keys' dedup contract)
    assert len(h) == len(set(keys))
    for name, build in _CONFIGS:
        f = build(h)
        assert f.check(h).all(), f"false negative in {name}"


@fuzz_settings(30)
@given(keys=_keyset,
       cuts=st.lists(st.integers(0, 256), max_size=4),
       lo=st.integers(0, 32), hi=st.integers(0, 32))
def test_fuzz_arrow_framing_invariance(keys, cuts, lo, hi):
    """Hashes are bit-identical no matter how the same keys are framed
    in Arrow: contiguous, chunked at arbitrary boundaries, sliced with a
    non-zero offset, or cast to large_binary.  (The Zig fuzz feeds keys
    back-to-back from one buffer; Arrow's equivalent adversarial framing
    is buffer offsets/chunking.)"""
    if not keys:
        return
    contiguous = pa.array(keys, type=pa.binary())
    base = hash_strings(contiguous)

    idx = sorted({min(c, len(keys)) for c in cuts} | {0, len(keys)})
    chunks = [pa.array(keys[a:b], type=pa.binary())
              for a, b in zip(idx, idx[1:]) if b > a]
    chunked = pa.chunked_array(chunks or [contiguous])
    assert (hash_strings(chunked) == base).all()

    a = min(lo, len(keys))
    b = max(0, len(keys) - min(hi, len(keys) - a))
    sliced = contiguous.slice(a, b - a)
    assert (hash_strings(sliced) == base[a:b]).all()

    assert (hash_strings(contiguous.cast(pa.large_binary())) == base).all()
