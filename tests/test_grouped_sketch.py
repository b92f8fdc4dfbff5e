"""Per-key (salted) sketch aggregation correctness."""

from __future__ import annotations

import numpy as np

SF = "/root/testdata/sf0.001"


def test_hll_per_host_within_bound(ray_session):
    from raysketch.hashing import hash_strings
    from raysketch.pages import host_of, pages_dataset
    from raysketch.pipeline import grouped_sketch_aggregate
    from raysketch.sketches import HllSketch, sketch_from_bytes

    pages = pages_dataset(SF).materialize()
    for num_salts in (1, 4):
        states = grouped_sketch_aggregate(
            pages, lambda t: host_of(t["url"]),
            lambda t: hash_strings(t["url"]),
            lambda: HllSketch.create(p=12),
            key_name="host", num_salts=num_salts).to_pandas()
        est = {r["host"]: sketch_from_bytes(bytes(r["state"])).estimate()
               for _, r in states.iterrows()}
        pdf = pages.to_pandas()
        pdf["host"] = pdf["url"].str.split("/").str[2]
        exact = pdf.groupby("host")["url"].nunique()
        assert set(est) == set(exact.index)
        for host, e in exact.items():
            # linear-counting regime: absolute error ~ register collisions,
            # a few expected even at small n (birthday over m=4096)
            bound = max(6.0, 3 * 1.04 / np.sqrt(2 ** 12) * e + 3)
            assert abs(est[host] - e) <= bound, (host, est[host], e)


def test_grouped_kll_within_rank_error(ray_session):
    """Per-lang KLL medians must land within a small rank window of the
    exact per-lang quantiles (k=200 -> rank error well under 5%)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    exact = e.queries()["text_len_quantiles_per_lang"](sf)
    est = e.queries()["kll_text_len_per_lang"](sf)
    import pandas as pd
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["lang", "text"]).to_pandas()
    docs["v"] = docs["text"].str.len()
    for (lang, q), g in est.groupby(["lang", "q"]):
        vals = np.sort(docs[docs["lang"] == lang]["v"].values)
        v_est = g["est_v"].iloc[0]
        # rank of the estimate within the exact distribution
        rank = np.searchsorted(vals, v_est, side="right") / len(vals)
        assert abs(rank - q) <= 0.08, (lang, q, v_est, rank)
