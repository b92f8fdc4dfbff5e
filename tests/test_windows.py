"""Windowed-operator and as-of-join tests (exact semantics vs pandas)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_tumbling_window_matches_pandas(ray_session):
    import ray.data as rd
    from raysketch.windows import tumbling_window_agg
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type", "value"])
    out = tumbling_window_agg(rd.from_pandas(ev), "ts", 3600,
                              ["event_type"], "value").to_pandas()
    ref = ev.assign(window_start=ev["ts"].dt.floor("h")).groupby(
        ["window_start", "event_type"], as_index=False).agg(
        n=("value", "size"), sum_value=("value", "sum"))
    m = out.merge(ref, on=["window_start", "event_type"],
                  suffixes=("_g", "_w"))
    assert len(m) == len(out) == len(ref)
    assert (m["n_g"] == m["n_w"]).all()
    assert np.allclose(m["sum_value_g"], m["sum_value_w"])


def test_session_windows_gap_splits(ray_session):
    import ray.data as rd
    from raysketch.windows import session_windows
    ts = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:10",
                         "2024-01-01 01:00", "2024-01-01 03:00",
                         "2024-01-01 03:20"])
    df = pd.DataFrame({"user_id": [1] * 5, "ts": ts,
                       "value": [1.0, 2.0, 3.0, 4.0, 5.0]})
    out = (session_windows(rd.from_pandas(df), "user_id", "ts", "value",
                           gap_s=1800).to_pandas()
           .sort_values("session_id").reset_index(drop=True))
    # gaps: 10m, 50m (> 30m -> split), 2h (split), 20m
    assert out["session_id"].tolist() == [1, 2, 3]
    assert out["n_events"].tolist() == [2, 1, 2]
    assert np.allclose(out["sum_value"], [3.0, 3.0, 9.0])


def test_asof_join_null_and_tie_semantics(ray_session):
    import ray.data as rd
    from raysketch.windows import asof_join
    L = pd.DataFrame({"k": [1, 1, 2, 3],
                      "ts": pd.to_datetime(["2024-01-01", "2024-03-01",
                                            "2024-02-01", "2024-01-15"]),
                      "lid": [10, 11, 12, 13]})
    R = pd.DataFrame({"k": [1, 1, 2],
                      "ts": pd.to_datetime(["2024-02-01", "2024-02-01",
                                            "2024-02-15"]),
                      "rid": [100, 101, 200]})
    out = asof_join(rd.from_pandas(L), "k", "ts", "lid",
                    rd.from_pandas(R), "k", "ts", "rid"
                    ).to_pandas().sort_values("lid").reset_index(drop=True)
    assert pd.isna(out["rid"][0])         # before all right rows
    assert out["rid"][1] == 101           # tie on ts -> max rid
    assert pd.isna(out["rid"][2])         # right exists but later
    assert pd.isna(out["rid"][3])         # key with no right rows
    # integer ids survive as int64-with-nulls, NOT NaN-in-float64
    assert pd.api.types.is_integer_dtype(out["rid"].dtype)


def test_asof_join_ids_above_2_53_exact(ray_session):
    """64-bit id spaces are the normal case at scale: ids above 2^53 must
    come back exact (a float64 round-trip would silently corrupt them)."""
    import ray.data as rd
    from raysketch.windows import asof_join
    big = (1 << 62) + 12345678901       # not representable in float64
    assert int(float(big)) != big
    L = pd.DataFrame({"k": [1, 2],
                      "ts": pd.to_datetime(["2024-03-01", "2024-03-01"]),
                      "lid": [1, 2]})
    R = pd.DataFrame({"k": [1],
                      "ts": pd.to_datetime(["2024-02-01"]),
                      "rid": np.array([big], dtype=np.int64)})
    out = asof_join(rd.from_pandas(L), "k", "ts", "lid",
                    rd.from_pandas(R), "k", "ts", "rid"
                    ).to_pandas().sort_values("lid").reset_index(drop=True)
    assert int(out["rid"][0]) == big
    assert pd.isna(out["rid"][1])


def test_hopping_window_covers_each_event_twice(ray_session):
    import ray.data as rd
    from raysketch.windows import hopping_window_agg, tumbling_window_agg
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["ts", "event_type", "value"])
    hop = hopping_window_agg(rd.from_pandas(ev), "ts", 3600, 1800,
                             ["event_type"], "value").to_pandas()
    # size/hop = 2 -> every event counted in exactly 2 windows
    assert hop["n"].sum() == 2 * len(ev)
    # each hop window's count equals the events in [start, start+1h)
    s = hop.sort_values(["window_start", "event_type"]).iloc[7]
    w0 = s["window_start"]
    m = (ev["ts"] >= w0) & (ev["ts"] < w0 + pd.Timedelta(hours=1)) \
        & (ev["event_type"] == s["event_type"])
    assert int(m.sum()) == int(s["n"])
