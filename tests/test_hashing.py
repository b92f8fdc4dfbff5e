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
