"""Native (C, ctypes) kernel parity vs the pure-NumPy fallbacks.

The compiled cascades in raysketch/_native.c must be either bit-identical
to the NumPy kernels (sbbf insert/check, ribbon back-substitution) or
solution-equivalent under the documented order-independence arguments
(ribbon elimination: success is a rank property; xorf peel: the 2-core is
unique, so native and NumPy accept the same seeds, though the peeled
assignment -- and hence the fingerprint array -- may differ while both
satisfy every key's membership equation).  Skipped wholesale when no C
compiler is available (get_lib() is None); every production path then
runs the NumPy fallback that the rest of the suite exercises.
"""

from __future__ import annotations

import numpy as np
import pytest

from raysketch import native
from raysketch.sketches import sbbf, ribbon, xorf

lib = native.get_lib()
pytestmark = pytest.mark.skipif(lib is None, reason="no C compiler")


@pytest.fixture
def numpy_only(monkeypatch):
    """Force the NumPy fallback paths within a test."""
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)


def _keys(n, seed=0):
    rng = np.random.default_rng(seed)
    return np.unique(rng.integers(0, 2**64, size=n, dtype=np.uint64))


# ---------------------------------------------------------------- sbbf
@pytest.mark.parametrize("bits_per_key", [8, 10, 24])
def test_sbbf_insert_check_bit_identical(bits_per_key, monkeypatch):
    keys = _keys(50_000, seed=bits_per_key)
    f_native = sbbf.SbbfFilter.build(keys, bits_per_key=bits_per_key)

    monkeypatch.setattr(native, "_LIB", None)
    f_np = sbbf.SbbfFilter.build(keys, bits_per_key=bits_per_key)
    assert np.array_equal(f_native.words, f_np.words)

    probe = np.concatenate([keys[:1000], _keys(4096, seed=99)])
    r_np = f_np.check(probe)
    monkeypatch.setattr(native, "_LIB", lib)
    r_native = f_native.check(probe)
    assert np.array_equal(r_native, r_np)


# --------------------------------------------------------------- gxh64
def test_gxh64_native_bit_identical(monkeypatch):
    """Native gxh64 must reproduce the NumPy kernel exactly (the
    envelope hash-version stamp 'gxh64-v2' covers both paths)."""
    import pyarrow as pa
    from raysketch import hashing

    rng = np.random.default_rng(42)
    strings = [""]
    for ln in [1, 2, 3, 7, 8, 9, 15, 16, 17, 63, 64, 65, 200, 1000]:
        for _ in range(20):
            strings.append(bytes(rng.integers(0, 256, ln, dtype=np.uint8)))
    rng.shuffle(strings := np.array(strings, dtype=object))
    col = pa.array([s if isinstance(s, bytes) else b"" for s in strings],
                   type=pa.binary())
    offsets, data = hashing._string_buffers(col)

    h_native = hashing._gxh64_bytes(offsets, data, seed=0)
    h_native7 = hashing._gxh64_bytes(offsets, data, seed=7)
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    h_np = hashing._gxh64_bytes(offsets, data, seed=0)
    h_np7 = hashing._gxh64_bytes(offsets, data, seed=7)
    assert np.array_equal(h_native, h_np)
    assert np.array_equal(h_native7, h_np7)

    # empty column / all-empty strings
    for c in (pa.array([], type=pa.binary()),
              pa.array([b"", b"", b""], type=pa.binary())):
        off_e, dat_e = hashing._string_buffers(c)
        monkeypatch.setattr(native, "_LIB", lib)
        a = hashing._gxh64_bytes(off_e, dat_e, seed=0)
        monkeypatch.setattr(native, "_LIB", None)
        b = hashing._gxh64_bytes(off_e, dat_e, seed=0)
        assert np.array_equal(a, b)


# --------------------------------------------------------------- xxh3
def test_xxh3_native_bit_identical(monkeypatch):
    """Native XXH3-64 must reproduce the NumPy implementation exactly at
    every length-class boundary and under nonzero seeds (the envelope
    stamp 'xxh3-v1' covers both paths; the NumPy side is itself pinned to
    the published sanity vectors in tests/test_hashing.py)."""
    import pyarrow as pa
    from raysketch import hashing

    rng = np.random.default_rng(43)
    strings = [b""]
    for ln in [1, 2, 3, 4, 8, 9, 16, 17, 32, 96, 97, 128, 129, 240, 241,
               512, 1024, 1025, 2048, 5000]:
        for _ in range(10):
            strings.append(bytes(rng.integers(0, 256, ln, dtype=np.uint8)))
    col = pa.array(strings, type=pa.binary())
    offsets, data = hashing._string_buffers(col)

    for seed in (0, 7, 2**63 + 11):
        h_native = hashing._xxh3_bytes(offsets, data, seed=seed)
        monkeypatch.setattr(native, "_LIB", None)
        monkeypatch.setattr(native, "_TRIED", True)
        h_np = hashing._xxh3_bytes(offsets, data, seed=seed)
        monkeypatch.setattr(native, "_LIB", lib)
        assert np.array_equal(h_native, h_np), seed

    # empty column / all-empty strings
    for c in (pa.array([], type=pa.binary()),
              pa.array([b"", b"", b""], type=pa.binary())):
        off_e, dat_e = hashing._string_buffers(c)
        a = hashing._xxh3_bytes(off_e, dat_e, seed=0)
        monkeypatch.setattr(native, "_LIB", None)
        b = hashing._xxh3_bytes(off_e, dat_e, seed=0)
        monkeypatch.setattr(native, "_LIB", lib)
        assert np.array_equal(a, b)


def test_xxh3_native_published_vectors():
    """The native kernel reproduces the published XXH3_64bits digests."""
    import sys
    sys.path.insert(0, "tests")
    from test_hashing import _XXH3_VECTORS, _xxh3_sanity_buffer
    buf = _xxh3_sanity_buffer(2048)
    lens = list(_XXH3_VECTORS)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    data = np.frombuffer(b"".join(buf[:k] for k in lens), np.uint8).copy()
    out = np.empty(len(lens), dtype=np.uint64)
    lib.xxh3_64_bytes(offs, data, len(lens), 0, out)
    for ln, g, exp in zip(lens, out, _XXH3_VECTORS.values()):
        assert int(g) == exp, f"len={ln}: {int(g):016X} != {exp:016X}"


# -------------------------------------------------------------- ribbon
@pytest.mark.parametrize("coeff_bits,result_bits",
                         [(32, 8), (32, 16), (64, 8), (64, 16),
                          (128, 16), (128, 32)])
def test_ribbon_native_same_seed_zero_fn(coeff_bits, result_bits,
                                         monkeypatch, numpy_only):
    keys = _keys(20_000, seed=coeff_bits + result_bits)
    seed_np, sol_np = ribbon.construct(keys, coeff_bits, result_bits)

    monkeypatch.setattr(native, "_LIB", lib)
    seed_c, sol_c = ribbon.construct(keys, coeff_bits, result_bits)
    # success is a rank property -> the deterministic seed schedule stops
    # at the same (multiplier, seed) regardless of elimination order
    assert seed_c == seed_np
    assert sol_c.dtype == sol_np.dtype and len(sol_c) == len(sol_np)
    f = ribbon.RibbonFilter(seed_c, sol_c, coeff_bits, result_bits,
                            num_keys=len(keys))
    assert f.check(keys).all()          # zero false negatives
    fpr = f.check(_keys(4096, seed=7)[:4096]).mean()
    assert fpr <= 3 * max(2.0 ** -result_bits, 1e-6) + 0.002


@pytest.mark.parametrize("coeff_bits,result_bits",
                         [(64, 16), (128, 16), (128, 32)])
def test_ribbon_backsub_bit_identical(coeff_bits, result_bits, numpy_only):
    """Same elimination output -> native backsub == packed-NumPy backsub."""
    keys = _keys(5_000, seed=3)
    n = len(keys)
    next_seed = ribbon.splitmix64(ribbon._INIT_SEED)
    size = ribbon._calc_size(n, 110, coeff_bits)   # roomy -> first seed works
    start_range = size + 1 - coeff_bits
    seed = next_seed()
    mixed = ribbon._remix(keys, seed)
    pos_arr = ribbon._start_pos_np(seed, start_range, mixed, coeff_bits)
    lo, hi = ribbon._coeff_rows_np(seed, mixed, coeff_bits)
    rr = ribbon._result_rows_np(seed, mixed, result_bits)
    elim = ribbon._eliminate_np(pos_arr, lo, hi, rr, size, coeff_bits)
    assert elim is not None
    c_lo, c_hi, res = elim
    sol_np = ribbon._backsub_packed(c_lo, c_hi, res, size, coeff_bits,
                                    result_bits)
    sol_c = ribbon._backsub_native(lib, c_lo, c_hi, res, size, coeff_bits,
                                   result_bits)
    assert np.array_equal(sol_c, sol_np)


def test_ribbon_native_elimination_solves_numpy_equations(numpy_only,
                                                          monkeypatch):
    """The native cascade's (c_lo, c_hi, res) may store different pivot
    rows than the NumPy elimination, but back-substituting them must
    satisfy every original key equation."""
    keys = _keys(30_000, seed=11)
    monkeypatch.setattr(native, "_LIB", lib)
    seed, sol = ribbon.construct(keys, 64, 16)
    monkeypatch.setattr(native, "_LIB", None)
    f = ribbon.RibbonFilter(seed, sol, 64, 16, num_keys=len(keys))
    assert f.check(keys).all()


@pytest.mark.parametrize("coeff_bits,result_bits",
                         [(32, 8), (64, 16), (128, 16), (128, 32)])
def test_ribbon_check_bit_identical(coeff_bits, result_bits, monkeypatch,
                                    numpy_only):
    """Native probe must match the NumPy probe on every key — members
    (zero FN) AND absent keys (identical false-positive pattern)."""
    keys = _keys(20_000, seed=coeff_bits * 5 + result_bits)
    seed, sol = ribbon.construct(keys, coeff_bits, result_bits)
    f = ribbon.RibbonFilter(seed, sol, coeff_bits, result_bits,
                            num_keys=len(keys))
    probe = np.concatenate([keys[:2000], _keys(8192, seed=13)])
    r_np = f.check(probe)
    monkeypatch.setattr(native, "_LIB", lib)
    r_c = f.check(probe)
    assert np.array_equal(r_c, r_np)
    assert r_c[:2000].all()


# ---------------------------------------------------------------- xorf
@pytest.mark.parametrize("arity,fp_bits", [(3, 8), (3, 16), (4, 16), (3, 32)])
def test_xorf_native_same_seed_zero_fn(arity, fp_bits, monkeypatch,
                                       numpy_only):
    keys = _keys(30_000, seed=arity * fp_bits)
    hdr_np, fp_np = xorf.construct(keys, arity, fp_bits)

    monkeypatch.setattr(native, "_LIB", lib)
    hdr_c, fp_c = xorf.construct(keys, arity, fp_bits)
    # the 2-core of the hypergraph is unique -> peelability (and hence
    # the accepted seed) is peel-order-independent
    assert hdr_c["seed"] == hdr_np["seed"]
    assert fp_c.dtype == fp_np.dtype and len(fp_c) == len(fp_np)

    for hdr, fp, tag in ((hdr_c, fp_c, "native"), (hdr_np, fp_np, "numpy")):
        f = xorf.XorFilter(hdr, fp, arity, fp_bits, num_keys=len(keys))
        assert f.check(keys).all(), tag   # zero false negatives
        fpr = f.check(_keys(4096, seed=5)).mean()
        assert fpr <= arity * max(2.0 ** -fp_bits, 1e-6) + 0.002, tag


@pytest.mark.parametrize("arity,fp_bits", [(3, 8), (3, 16), (4, 16), (3, 32)])
def test_xorf_check_bit_identical(arity, fp_bits, monkeypatch, numpy_only):
    """Native probe must match the NumPy probe on every key — members
    (zero FN) AND absent keys (identical false-positive pattern)."""
    keys = _keys(20_000, seed=arity * 31 + fp_bits)
    hdr, fp = xorf.construct(keys, arity, fp_bits)
    f = xorf.XorFilter(hdr, fp, arity, fp_bits, num_keys=len(keys))
    probe = np.concatenate([keys[:2000], _keys(8192, seed=17)])
    r_np = f.check(probe)
    monkeypatch.setattr(native, "_LIB", lib)
    r_c = f.check(probe)
    assert np.array_equal(r_c, r_np)
    assert r_c[:2000].all()


# ----------------------------------------------------------------- md5
def test_md5_u16_native_bit_identical(monkeypatch, numpy_only):
    """Batch C md5 kernel (first two digest bytes, big-endian u16) must
    match the hashlib loop byte-for-byte — empty strings, NULs, multi-
    byte UTF-8, and >64-byte (multi-block) inputs included."""
    import hashlib
    import pyarrow as pa
    from raysketch import pipeline

    strs = ["", "a", "abc", "hello world", "x" * 55, "y" * 56, "z" * 64,
            "w" * 65, "long" * 500, "\x00nul\x00", "日本語テキスト",
            "https://example.com/path?q=1"] * 7
    col = pa.array(strs, type=pa.string())
    exp = np.frombuffer(
        b"".join(hashlib.md5(v.encode()).digest()[:2] for v in strs),
        dtype=">u2").astype(np.uint16)
    got_np = pipeline._md5_u16(col)          # hashlib fallback (numpy_only)
    assert np.array_equal(got_np, exp)
    monkeypatch.setattr(native, "_LIB", lib)
    got_c = pipeline._md5_u16(col)
    assert np.array_equal(got_c, exp)


def test_md5_u64_native_bit_identical(monkeypatch, numpy_only):
    """Batch C md5 u64 kernel (first eight digest bytes, big-endian --
    the fingerprint kernel / DuckDB ('0x'||substr(md5(k),1,16))::UBIGINT
    value) must match the hashlib loop byte-for-byte, sliced arrays
    included."""
    import hashlib
    import pyarrow as pa
    from raysketch import pipeline

    strs = ["", "a", "abc", "hello world", "x" * 55, "y" * 56, "z" * 64,
            "w" * 65, "long" * 500, "\x00nul\x00", "日本語テキスト",
            "https://example.com/path?q=1"] * 7
    col = pa.array(strs, type=pa.string())
    exp = np.frombuffer(
        b"".join(hashlib.md5(v.encode()).digest()[:8] for v in strs),
        dtype=">u8").astype(np.uint64)
    got_np = pipeline._md5_u64(col)          # hashlib fallback (numpy_only)
    assert np.array_equal(got_np, exp)
    monkeypatch.setattr(native, "_LIB", lib)
    got_c = pipeline._md5_u64(col)
    assert np.array_equal(got_c, exp)
    assert np.array_equal(pipeline._md5_u64(col.slice(3, 9)), exp[3:12])


def test_fingerprints_md5_kernel_matches_sql_definition():
    """fingerprints(kernel='md5') must equal the DuckDB expression it is
    defined as, normalization included (whitespace collapse THEN lower);
    the default kernel must differ only in the hash, not the key set."""
    import duckdb
    import pyarrow as pa
    from raysketch.text import fingerprints

    t = pa.table({
        "doc_id": pa.array(np.arange(6, dtype=np.int64)),
        "text": pa.array(["Hello  World", "hello world", "A\tB\nC",
                          "a b c", "", "  LEADING and trailing  "]),
    })
    got = fingerprints(t, kernel="md5")
    want = duckdb.sql(
        "SELECT ('0x' || substr(md5("
        r"lower(regexp_replace(text, '\s+', ' ', 'g'))"
        "), 1, 16))::UBIGINT AS fp FROM t").fetchnumpy()["fp"]
    assert np.array_equal(
        np.asarray(got["fingerprint"], dtype=np.uint64),
        want.astype(np.uint64))
    # same normalization => formatting variants of one text collide on
    # BOTH kernels
    d = fingerprints(t)["fingerprint"].to_pylist()
    m = got["fingerprint"].to_pylist()
    assert d[0] == d[1] and m[0] == m[1]
    assert d[2] == d[3] and m[2] == m[3]


def test_simhash_md5_kernel_matches_sql_definition():
    """simhash_batch(kernel='md5') must equal the signature the driver
    oracle recomputes in DuckDB (HUGEINT bit ops -- a mixed-type >> in
    DuckDB resolves through DOUBLE and zeroes low bits), on adversarial
    texts: nulls, empties, edge/consecutive whitespace, unicode, case."""
    import duckdb
    import pyarrow as pa
    from raysketch.dedup import simhash_batch

    texts = ["Hello  World", "hello world", "  leading", "trailing  ",
             "", None, "one", "a b c d e f", "日本語 テキスト",
             "tab\tsep\nline", "repeat repeat repeat x", " ", "\t\t"]
    col = pa.array(texts, pa.string())
    eng = simhash_batch(col, kernel="md5")
    t = pa.table({"doc_id": pa.array(np.arange(len(texts),
                                               dtype=np.int64)),
                  "text": col})
    got = duckdb.sql(r"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(
              lower(coalesce(text, '')), '\s+')) AS tk FROM t
        ),
        th AS (SELECT doc_id,
                      CAST(('0x' || substr(md5(tk), 1, 16))::UBIGINT
                           AS HUGEINT) AS h FROM tok),
        bits AS (SELECT unnest(generate_series(0, 63)) AS b),
        bitsum AS (
          SELECT doc_id, b AS bit,
                 SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
          FROM th CROSS JOIN bits GROUP BY 1, 2
        )
        SELECT CAST(bit_or(CASE WHEN s > 0
                                THEN (CAST(1 AS HUGEINT) << bit)
                                ELSE CAST(0 AS HUGEINT) END)
                    AS UBIGINT) AS sh
        FROM bitsum GROUP BY doc_id ORDER BY doc_id
    """).fetchnumpy()["sh"].astype(np.uint64)
    assert np.array_equal(eng, got)
