"""Unit tests for the per-process scratch-buffer helper (no Ray).

The scratch() contract matters at build time: multi-MB work buffers must
be RETAINED across seed attempts (fresh allocations pay this host's
serial first-touch page provisioning — BASELINE.md), retention must stay
under _SCRATCH_CAP (the measured >=3-retained-sets compute cliff), and a
cap overflow must evict the least-recently-used OTHER entry rather than
permanently disabling retention for the requesting name (the multi-spec
build regression ADVICE r4 flagged: xorf retained first and ribbon then
paid first-touch on every attempt).
"""

from __future__ import annotations

import numpy as np
import pytest

from raysketch import util


@pytest.fixture(autouse=True)
def _isolated_scratch(monkeypatch):
    """Run each test against an empty store and a tiny 1 KB cap."""
    monkeypatch.setattr(util, "_SCRATCH", {})
    monkeypatch.setattr(util, "_SCRATCH_CAP", 1024)
    yield


def test_reuse_same_base_buffer():
    a = util.scratch("a", 64, np.uint8)
    a[:] = 7  # contents are uninitialized; write before relying on them
    b = util.scratch("a", 32, np.uint8)
    assert b.base is util._SCRATCH["a"] or b is util._SCRATCH["a"]
    assert b.size == 32 and (b == 7).all()  # a view of the retained buffer


def test_growth_reallocates():
    util.scratch("a", 64, np.uint8)
    big = util.scratch("a", 128, np.uint8)
    assert big.size == 128
    assert util._SCRATCH["a"].size == 128


def test_dtype_change_reallocates():
    util.scratch("a", 64, np.uint8)
    w = util.scratch("a", 64, np.uint64)
    assert w.dtype == np.uint64
    assert util._SCRATCH["a"].dtype == np.uint64


def test_over_cap_not_retained_and_others_survive():
    util.scratch("small", 64, np.uint8)
    huge = util.scratch("huge", 4096, np.uint8)  # 4 KB > 1 KB cap
    assert huge.size == 4096
    assert "huge" not in util._SCRATCH          # never retained
    assert "small" in util._SCRATCH            # bail happens BEFORE evicting


def test_cap_overflow_evicts_lru_not_requester():
    util.scratch("first", 512, np.uint8)
    util.scratch("second", 256, np.uint8)
    # touch "first" so "second" becomes the LRU entry
    util.scratch("first", 512, np.uint8)
    # 512-byte newcomer: 512+256+512 > 1024 forces eviction of the LRU
    util.scratch("third", 512, np.uint8)
    assert set(util._SCRATCH) == {"first", "third"}
    assert sum(b.nbytes for b in util._SCRATCH.values()) <= 1024


def test_requester_retained_after_repeated_overflow():
    """The ADVICE r4 regression: the requesting name must keep being
    retained across alternating over-budget requests, not be permanently
    evicted in favor of whoever allocated first."""
    util.scratch("xorf", 768, np.uint8)
    for _ in range(3):
        r = util.scratch("ribbon.cells", 768, np.uint8)
        assert "ribbon.cells" in util._SCRATCH
        # reuse on the very next call — no fresh allocation per attempt
        again = util.scratch("ribbon.cells", 768, np.uint8)
        assert again.base is r or again is r
        util.scratch("xorf", 768, np.uint8)


def test_mru_order_tracks_access():
    util.scratch("a", 128, np.uint8)
    util.scratch("b", 128, np.uint8)
    util.scratch("a", 64, np.uint8)  # re-access marks MRU
    assert list(util._SCRATCH) == ["b", "a"]


# --- pool() / partition-sizing helpers (also Ray-free) ---------------------


def test_pool_int_becomes_autoscaling_range():
    # fixed N-actor pools deadlock an N-cpu cluster (docstring rationale)
    assert util.pool(8) == (1, 8)
    assert util.pool(2) == (1, 2)


def test_pool_one_and_passthrough():
    assert util.pool(1) == 1
    assert util.pool((2, 6)) == (2, 6)
    assert util.pool(None) is None


def test_choose_num_partitions_per_kind_targets():
    from raysketch.pipeline import PARTITION_TARGET_KEYS, choose_num_partitions

    # one filter per ~target keys, ceil division, never zero
    assert choose_num_partitions(0) == 1
    assert choose_num_partitions(1) == 1
    assert choose_num_partitions(1_000_000, kind="xorf") == 1
    assert choose_num_partitions(1_000_001, kind="xorf") == 2
    assert choose_num_partitions(1_000_000, kind="ribbon") == 5
    assert choose_num_partitions(500, target_keys=100) == 5
    # corpus-driven, not cluster-driven: 10^12 keys >> any core count
    assert choose_num_partitions(10**12, kind="xorf") == 10**6
    assert set(PARTITION_TARGET_KEYS) == {"xorf", "ribbon", "sbbf"}


def test_coarse_group_count_clamps_to_partitions():
    import ray

    from raysketch.pipeline import _coarse_group_count

    # ~2 reduce groups per cluster cpu (8-cpu planning floor when no Ray
    # session exists — this may run before OR after the Ray-using suites)
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 0)) or 8
    else:
        cpus = 8
    assert _coarse_group_count(10_000) == 2 * cpus
    assert _coarse_group_count(5) == 5   # never more groups than partitions
    assert _coarse_group_count(1) == 1
