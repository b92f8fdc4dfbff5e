"""Hash kernel tests: determinism, distribution, edge framing (FIXTURES.md F4)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raysketch.hashing import (clz64, hash_column, hash_ints, hash_strings,
                               murmur64a_u64, partition_ids, splitmix64)


def test_string_hash_deterministic_and_collision_free():
    urls = pa.array([f"https://h{i % 97}.example.org/p/{i}" for i in range(50000)])
    h1 = hash_strings(urls)
    h2 = hash_strings(urls)
    assert (h1 == h2).all()
    assert len(np.unique(h1)) == 50000


def test_adversarial_framing():
    # reference fuzz framing src/fuzz.zig:24-58: empty, 1-byte, long,
    # non-UTF8-safe binary-ish keys; also prefix/extension pairs must differ
    keys = [b"", b"a", b"ab", b"a" * 4097, bytes(range(256)) * 3,
            b"abc\x00", b"abc\x00\x00", b"abc"]
    h = hash_strings(pa.array(keys, type=pa.binary()))
    assert len(np.unique(h)) == len(keys)


def test_seed_changes_hash():
    a = hash_strings(pa.array(["x", "y"]), seed=0)
    b = hash_strings(pa.array(["x", "y"]), seed=1)
    assert (a != b).all()


def test_int_hash_matches_column_dispatch():
    vals = np.arange(100, dtype=np.int64)
    assert (hash_ints(vals) == hash_column(pa.array(vals))).all()


def test_uniformity_of_partition_ids():
    h = hash_strings(pa.array([f"k{i}" for i in range(64000)]))
    for p in (8, 50, 64):
        pid = partition_ids(h, p)
        counts = np.bincount(pid, minlength=p)
        assert counts.min() > 0
        # balanced within ~25% of the mean
        assert counts.max() / (64000 / p) < 1.25
        assert pid.max() < p


def test_murmur64a_known_shape():
    # avalanche sanity: flipping one input bit flips ~half the output bits
    x = np.array([0x0123456789ABCDEF], dtype=np.uint64)
    a = murmur64a_u64(x, 0)[0]
    b = murmur64a_u64(x ^ np.uint64(1), 0)[0]
    popcount = bin(int(a) ^ int(b)).count("1")
    assert 16 <= popcount <= 48


def test_splitmix64_sequence_deterministic():
    n1 = splitmix64(42)
    n2 = splitmix64(42)
    seq1 = [n1() for _ in range(5)]
    seq2 = [n2() for _ in range(5)]
    assert seq1 == seq2
    assert len(set(seq1)) == 5


def test_clz64():
    x = np.array([0, 1, 2, 3, 255, 1 << 32, (1 << 63) | 1, 2**64 - 1],
                 dtype=np.uint64)
    assert clz64(x).tolist() == [64, 63, 62, 62, 56, 31, 0, 0]


def test_popcount64():
    from raysketch.hashing import popcount64
    x = np.array([0, 1, 3, 0xFF, 1 << 63, 2**64 - 1, 0x5555555555555555],
                 dtype=np.uint64)
    assert popcount64(x).tolist() == [0, 1, 2, 8, 1, 64, 32]


def _xxh3_sanity_buffer(n: int) -> bytes:
    """The xxHash sanity-check buffer: gen=PRIME32; byte=gen>>56;
    gen*=PRIME64 (public test harness convention)."""
    buf = bytearray(n)
    g = 2654435761
    p64 = 11400714785074694797
    for i in range(n):
        buf[i] = (g >> 56) & 0xFF
        g = (g * p64) & 0xFFFFFFFFFFFFFFFF
    return bytes(buf)


# published XXH3_64bits sanity vectors (seed=0), one per code path:
# empty / 1-3 / 4-8 / 9-16 / 17-128 (x2) / 129-240 / long single-stripe
# tail / long partial block / long exact block / long multi-block
_XXH3_VECTORS = {
    0: 0x2D06800538D394C2,
    1: 0xC44BDFF4074EECDB,
    6: 0x27B56A84CD2D7325,
    12: 0xA713DAF0DFBB77E7,
    24: 0xA3FE70BF9D3510EB,
    48: 0x397DA259ECBA1F11,
    80: 0xBCDEFBBB2C47C90A,
    195: 0xCD94217EE362EC3A,
    403: 0xCDEB804D65C6DEA4,
    512: 0x617E49599013CB6B,
    2048: 0xDD59E2C3A5F038E0,
}


def test_xxh3_published_vectors():
    """Byte-compatibility with XXH3-64: every length-class path must
    reproduce the published sanity digests."""
    from raysketch.xxh3 import xxh3_64
    buf = _xxh3_sanity_buffer(2048)
    lens = list(_XXH3_VECTORS)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    data = np.frombuffer(b"".join(buf[:k] for k in lens), np.uint8)
    got = xxh3_64(offs, data)
    for ln, g, exp in zip(lens, got, _XXH3_VECTORS.values()):
        assert int(g) == exp, f"len={ln}: {int(g):016X} != {exp:016X}"


def test_xxh3_batch_equals_single():
    """Batch layout (shared buffer, arbitrary neighbors) must not change
    any row's hash."""
    from raysketch.xxh3 import xxh3_64
    rng = np.random.default_rng(3)
    strs = [rng.integers(0, 256, int(n), dtype=np.uint8).tobytes()
            for n in rng.integers(0, 600, 50)]
    lens = [len(s) for s in strs]
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    data = np.frombuffer(b"".join(strs), np.uint8)
    batch = xxh3_64(offs, data)
    for i, s in enumerate(strs):
        one = xxh3_64(np.array([0, len(s)], np.int64),
                      np.frombuffer(s, np.uint8))
        assert int(one[0]) == int(batch[i])


def test_xxh3_seeded_differs_and_deterministic():
    from raysketch.xxh3 import xxh3_64
    data = np.frombuffer(b"some key material exceeding two-forty bytes " * 8,
                         np.uint8)
    offs = np.array([0, 20, 150, len(data)], np.int64)
    h0 = xxh3_64(offs, data, seed=0)
    h1 = xxh3_64(offs, data, seed=12345)
    h1b = xxh3_64(offs, data, seed=12345)
    assert (h0 != h1).all()
    assert (h1 == h1b).all()


def test_xxh3_cross_check_wheel():
    """Full cross-validation against the reference C implementation --
    runs only where the xxhash wheel is installed (absent here)."""
    import pytest
    xxhash = pytest.importorskip("xxhash")
    from raysketch.xxh3 import xxh3_64
    rng = np.random.default_rng(5)
    strs = [rng.integers(0, 256, int(n), dtype=np.uint8).tobytes()
            for n in rng.integers(0, 5000, 200)]
    lens = [len(s) for s in strs]
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    data = np.frombuffer(b"".join(strs), np.uint8)
    for seed in (0, 987654321):
        got = xxh3_64(offs, data, seed=seed)
        for s, g in zip(strs, got):
            assert int(g) == xxhash.xxh3_64_intdigest(s, seed=seed)


def test_kernel_switch_and_envelope_guard():
    """gxh64-built payloads must refuse to deserialize under the xxh3
    kernel (and vice versa) instead of silently false-negating."""
    import pytest
    from raysketch import hashing
    from raysketch.sketches import SbbfFilter, sketch_from_bytes
    default = hashing.KERNEL
    other = "gxh64" if default == "xxh3" else "xxh3"
    f = SbbfFilter.create(4, 10)
    f.insert(np.arange(100, dtype=np.uint64))
    blob_default = f.to_bytes()
    hashing.set_kernel(other)
    try:
        assert hashing.hash_strings(pa.array(["abc"]))[0] != \
            hash_strings(pa.array(["abc"]), seed=1)[0]
        with pytest.raises(ValueError, match="hash kernel"):
            sketch_from_bytes(blob_default)
        blob_other = f.to_bytes()
    finally:
        hashing.set_kernel(default)
    with pytest.raises(ValueError, match="hash kernel"):
        sketch_from_bytes(blob_other)
    assert sketch_from_bytes(blob_default).check(
        np.array([5], np.uint64))[0]


def test_hash_column_chunked_matches_combined():
    """The per-chunk fast path (no combine_chunks copy) must produce the
    same hashes as hashing the combined array, for strings and ints,
    including empty/degenerate chunkings."""
    from raysketch.hashing import hash_column

    strs = [f"https://h{i}.example.com/p/{i}" for i in range(1000)]
    for pieces in ([strs], [strs[:1], strs[1:]],
                   [strs[:300], [], strs[300:]], [[], []]):
        ch = pa.chunked_array([pa.array(p, pa.string()) for p in pieces])
        combined = ch.combine_chunks()
        assert np.array_equal(hash_column(ch), hash_column(combined))

    ints = list(range(999))
    ch = pa.chunked_array([pa.array(ints[:100], pa.int64()),
                           pa.array(ints[100:], pa.int64())])
    assert np.array_equal(hash_column(ch), hash_column(ch.combine_chunks()))
