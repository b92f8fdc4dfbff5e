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


def test_session_windows_hot_key_splits_buckets(ray_session):
    """One pathological key whose event history far exceeds any single
    batch: the two-stage sessionizer must (a) split its history across
    many (key, bucket) stage-1 groups instead of one monolithic per-key
    group, and (b) still produce the exact global sessions, including
    sessions that span bucket boundaries."""
    import ray.data as rd
    from raysketch.windows import session_windows

    rng = np.random.default_rng(42)
    gap_s = 1800
    bucket_s = 10 * gap_s  # the default stage-1 bucket width
    # hot key 7: 60k events in bursts over ~60 days -- hundreds of
    # bucket_s buckets; plus a few normal keys
    n_hot = 60_000
    # bursts of ~30 events every ~2-5h so real session breaks occur, with
    # jitter fine enough that many sessions cross bucket boundaries
    burst_starts = np.cumsum(rng.integers(7200, 18000, size=n_hot // 30))
    offs = np.arange(30) * 60  # 1-minute strides inside a burst
    hot_ts = (burst_starts[:, None] + offs[None, :]).ravel()[:n_hot]
    cold_ts = np.sort(rng.integers(0, hot_ts.max(), size=500))
    ts = np.concatenate([hot_ts, cold_ts])
    key = np.concatenate([np.full(n_hot, 7), rng.integers(100, 105, 500)])
    df = pd.DataFrame({
        "user_id": key,
        "ts": pd.Timestamp("2024-01-01")
              + pd.to_timedelta(ts, unit="s"),
        "value": rng.random(len(ts)),
    })
    # hot key really does span many stage-1 buckets
    n_buckets = df[df.user_id == 7].ts.astype("int64").floordiv(
        int(bucket_s * 1e9)).nunique()
    assert n_buckets > 50

    # shuffle row order and feed as many small blocks
    df = df.sample(frac=1.0, random_state=0).reset_index(drop=True)
    ds = rd.from_pandas([df.iloc[i:i + 2048]
                         for i in range(0, len(df), 2048)])
    out = (session_windows(ds, "user_id", "ts", "value", gap_s=gap_s)
           .to_pandas().sort_values(["user_id", "session_id"])
           .reset_index(drop=True))

    # pandas reference: per-key sort, gap cumsum
    ref_rows = []
    for k, sub in df.sort_values("ts").groupby("user_id"):
        t = sub["ts"].values
        brk = np.concatenate(
            [[True], np.diff(t).astype("timedelta64[s]").astype(int)
             > gap_s])
        sid = np.cumsum(brk)
        for s in np.unique(sid):
            m = sid == s
            ref_rows.append({
                "user_id": k, "session_id": int(s),
                "session_start": t[m].min(), "session_end": t[m].max(),
                "n_events": int(m.sum()),
                "sum_value": float(sub["value"].values[m].sum())})
    ref = pd.DataFrame(ref_rows).sort_values(
        ["user_id", "session_id"]).reset_index(drop=True)

    assert len(out) == len(ref)
    assert (out["user_id"].values == ref["user_id"].values).all()
    assert (out["session_id"].values == ref["session_id"].values).all()
    assert (out["session_start"].values.astype("datetime64[us]")
            == ref["session_start"].values.astype("datetime64[us]")).all()
    assert (out["session_end"].values.astype("datetime64[us]")
            == ref["session_end"].values.astype("datetime64[us]")).all()
    assert (out["n_events"].values == ref["n_events"].values).all()
    assert np.allclose(out["sum_value"], ref["sum_value"])
    # some sessions must actually have crossed a bucket boundary (the
    # stitch path is exercised, not vacuously green)
    hot = ref[ref.user_id == 7]
    crosses = (hot["session_start"].values.astype("datetime64[s]")
               .astype(np.int64) // bucket_s
               != hot["session_end"].values.astype("datetime64[s]")
               .astype(np.int64) // bucket_s)
    assert crosses.any()
