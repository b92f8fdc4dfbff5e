"""The mergeable-UDAF SBBF path must be bit-identical to the holistic
per-partition build at the same num_blocks, for any batch layout."""

from __future__ import annotations

import json

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_sbbf_merge_path_bit_identical(ray_session):
    from raysketch.pages import pages_dataset
    from raysketch.pipeline import (build_filter_table,
                                    build_filter_table_sbbf_merge, probe)
    pages = pages_dataset(SF).materialize()

    merged = build_filter_table_sbbf_merge(
        pages, "url", bits_per_key=10, num_partitions=4).to_pandas()
    nb = json.loads(merged["params"].iloc[0])["num_blocks"]

    holistic = build_filter_table(
        pages, "url", "sbbf", {"bits_per_key": 10, "num_blocks": nb},
        num_partitions=4).to_pandas()

    from raysketch.sketches import SbbfFilter
    m = {int(r["partition_id"]): SbbfFilter.from_bytes(bytes(r["payload"]))
         for _, r in merged.iterrows()}
    h = {int(r["partition_id"]): SbbfFilter.from_bytes(bytes(r["payload"]))
         for _, r in holistic.iterrows()}
    assert set(m) == set(h)
    for pid in m:
        assert (m[pid].words == h[pid].words).all(), pid

    # repartitioned input (different batch layout) -> still bit-identical
    merged2 = build_filter_table_sbbf_merge(
        pages.repartition(7), "url", bits_per_key=10,
        num_partitions=4).to_pandas()
    m2 = {int(r["partition_id"]): SbbfFilter.from_bytes(bytes(r["payload"]))
          for _, r in merged2.iterrows()}
    for pid in m:
        assert (m2[pid].words == m[pid].words).all(), pid

    # HLL-estimated distinct counts within bound of exact
    exact = holistic.set_index("partition_id")["n_keys"]
    est = merged.set_index("partition_id")["n_keys"]
    for pid in exact.index:
        assert abs(est[pid] - exact[pid]) / exact[pid] < 0.1

    # and the merged table probes with zero false negatives
    probed = probe(merged, pages, "url", concurrency=2)
    assert probed.sum("hit") == pages.count()
