"""Round-trip property tests for the packed-exchange blob codecs
(pack_rows_by_part / pack_kv_by_part / pack_strings_by_part): these now
carry every high-row-count shuffle in the repo, so pin them directly —
including the binary-vs-large_binary rewrite a shuffle hop can apply
and the string source-type flag."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from fuzz_budget import fuzz_settings
from hypothesis import given, strategies as st

from raysketch.pipeline import (pack_kv_by_part, pack_rows_by_part,
                                pack_strings_by_part, unpack_kv_part,
                                unpack_part_rows, unpack_part_strings)


def _one_part(table: pa.Table, part: int) -> pa.Table:
    mask = np.asarray(table["_part"]) == part
    return table.filter(pa.array(mask))


def _as_binary(table: pa.Table) -> pa.Table:
    """Simulate the shuffle hop that rewrites large_binary as binary."""
    cols = {}
    for name in table.column_names:
        col = table[name]
        if pa.types.is_large_binary(col.type):
            col = col.cast(pa.binary())
        cols[name] = col
    return pa.table(cols)


@fuzz_settings(50)
@given(st.integers(0, 500), st.integers(1, 4), st.integers(1, 8),
       st.booleans())
def test_rows_roundtrip(n, k, parts, as_binary):
    rng = np.random.default_rng(n * 31 + k)
    part = rng.integers(0, parts, size=n).astype(np.int64)
    cols = tuple(rng.integers(-2**62, 2**62, size=n, dtype=np.int64)
                 for _ in range(k))
    packed = pack_rows_by_part(part, cols)
    assert len(packed) == len(np.unique(part))
    got = {j: [] for j in range(k)}
    gpart = []
    for p in np.unique(part):
        sub = _one_part(packed, p)
        if as_binary:
            sub = _as_binary(sub)
        out = unpack_part_rows(sub, k)
        for j in range(k):
            got[j].append(out[j])
        gpart.append(np.full(len(out[0]), p, dtype=np.int64))
    if n == 0:
        assert len(packed) == 0
        return
    gp = np.concatenate(gpart)
    order_in = np.lexsort((np.arange(n), part))
    order_out = np.lexsort((np.arange(len(gp)), gp))
    for j in range(k):
        assert (np.concatenate(got[j])[order_out]
                == cols[j][order_in]).all()


@fuzz_settings(40)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=0,
                max_size=200),
       st.integers(1, 8), st.booleans(), st.booleans())
def test_strings_roundtrip(strings, parts, large, as_binary):
    n = len(strings)
    rng = np.random.default_rng(n * 7 + parts)
    part = rng.integers(0, parts, size=n).astype(np.int64)
    arr = pa.array(strings, pa.large_string() if large else pa.string())
    packed = pack_strings_by_part(part, arr)
    outs, gpart = [], []
    for p in np.unique(part):
        sub = _one_part(packed, p)
        if as_binary:
            sub = _as_binary(sub)
        key = unpack_part_strings(sub)
        # source type restored by the kind flag
        assert key.type == arr.type
        outs.append(np.asarray(key))
        gpart.append(np.full(len(key), p, dtype=np.int64))
    if n == 0:
        assert len(packed) == 0
        return
    got = np.concatenate(outs)
    gp = np.concatenate(gpart)
    order_in = np.lexsort((np.arange(n), part))
    order_out = np.lexsort((np.arange(len(gp)), gp))
    want = np.array(strings, dtype=object)[order_in]
    assert (got[order_out] == want).all()


@fuzz_settings(40)
@given(st.integers(0, 300), st.integers(1, 6), st.booleans(),
       st.booleans())
def test_kv_roundtrip_mixed_dtypes(n, parts, str_key, as_binary):
    rng = np.random.default_rng(n * 13 + parts)
    part = rng.integers(0, parts, size=n).astype(np.int64)
    if str_key:
        keys = pa.array([f"k{v}" for v in
                         rng.integers(0, 50, size=n)], pa.string())
    else:
        keys = rng.integers(-2**62, 2**62, size=n, dtype=np.int64)
    vals = [
        rng.integers(-2**62, 2**62, size=n, dtype=np.int64),
        rng.random(n),                                   # float64
        rng.integers(0, 2, size=n).astype(np.int8),      # int8
        rng.integers(0, 10**15, size=n)
           .astype("datetime64[us]"),                    # timestamps
    ]
    packed = pack_kv_by_part(part, keys, vals)
    kouts, vouts, gpart = [], [[] for _ in vals], []
    for p in np.unique(part):
        sub = _one_part(packed, p)
        if as_binary:
            sub = _as_binary(sub)
        key, out = unpack_kv_part(sub, len(vals))
        kouts.append(np.asarray(key))
        for j, v in enumerate(out):
            assert v.dtype == vals[j].dtype, (j, v.dtype)
            vouts[j].append(v)
        gpart.append(np.full(len(out[0]), p, dtype=np.int64))
    if n == 0:
        assert len(packed) == 0
        return
    gp = np.concatenate(gpart)
    order_in = np.lexsort((np.arange(n), part))
    order_out = np.lexsort((np.arange(len(gp)), gp))
    kin = np.asarray(keys) if str_key else keys
    assert (np.concatenate(kouts)[order_out] == kin[order_in]).all()
    for j, v in enumerate(vals):
        assert (np.concatenate(vouts[j])[order_out]
                == v[order_in]).all()
