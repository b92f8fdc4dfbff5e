"""Event-time windowed operators -- the streaming-flavored custom operators
the reference lacks (SURVEY.md §2.3 "Streaming operators: none"), expressed
Ray-Data-first:

  tumbling_window_agg  fixed-size event-time windows: per-batch combiner
                       (window_start derived vectorized, partial counts/sums)
                       -> one groupby on (window_start, dims) -- classic
                       pre-aggregated exact window aggregate
  session_windows      gap-based sessions per key: groupby(key).map_groups,
                       sort-by-ts inside the group, split at gaps > gap --
                       the partitioning assumption is one key's events fit
                       in one group (same contract as the holistic filter
                       builds; salt/sub-window if a single key is huge)

Both are EXACT and deterministic, with DuckDB window-function oracles in
__ray_entry__.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def tumbling_window_agg(ds, ts_col: str, window_s: int,
                        dim_cols: list[str], value_col: str):
    """count + sum(value) per (window_start, *dims); window_start = ts
    floored to window_s seconds.  Shuffle moves only partial aggregates."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ts = np.asarray(t[ts_col]).astype("datetime64[us]").astype(np.int64)
        win = (ts // (window_s * 1_000_000)) * (window_s * 1_000_000)
        df = pd.DataFrame({c: np.asarray(t[c]) for c in dim_cols})
        df["window_start"] = win.astype("datetime64[us]")
        df["pc"] = 1
        df["pv"] = np.asarray(t[value_col])
        g = (df.groupby(["window_start", *dim_cols], as_index=False)
               .agg(pc=("pc", "sum"), pv=("pv", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["window_start", *dim_cols])
              .aggregate(Sum("pc", alias_name="n"),
                         Sum("pv", alias_name="sum_value")))


def hopping_window_agg(ds, ts_col: str, window_s: int, hop_s: int,
                       dim_cols: list[str], value_col: str):
    """Overlapping (hopping) windows: every event belongs to
    window_s/hop_s windows; per-batch the rows are replicated once per
    covering window (vectorized np.repeat) and pre-aggregated, so the
    shuffle still moves only partial (window_start, dims) rows."""
    from ray.data.aggregate import Sum

    assert window_s % hop_s == 0, "window_s must be a multiple of hop_s"
    n_covers = window_s // hop_s

    def partial(t: pa.Table) -> pa.Table:
        ts = np.asarray(t[ts_col]).astype("datetime64[us]").astype(np.int64)
        hop_us = hop_s * 1_000_000
        win_us = window_s * 1_000_000
        # latest hop-aligned start <= ts, then walk back n_covers starts;
        # every generated start covers ts by construction (smallest start
        # = last - win + hop > ts - win), so each event lands in exactly
        # n_covers windows
        last = (ts // hop_us) * hop_us
        starts = last[:, None] - np.arange(n_covers)[None, :] * hop_us
        rows = np.repeat(np.arange(len(ts)), n_covers)
        win = starts.ravel()
        df = pd.DataFrame({c: np.asarray(t[c])[rows] for c in dim_cols})
        df["window_start"] = win.astype("datetime64[us]")
        df["pc"] = 1
        df["pv"] = np.asarray(t[value_col])[rows]
        g = (df.groupby(["window_start", *dim_cols], as_index=False)
               .agg(pc=("pc", "sum"), pv=("pv", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["window_start", *dim_cols])
              .aggregate(Sum("pc", alias_name="n"),
                         Sum("pv", alias_name="sum_value")))


def session_windows(ds, key_col: str, ts_col: str, value_col: str,
                    gap_s: int):
    """Per-key sessions: consecutive events of a key belong to one session
    while inter-event gap <= gap_s; sessions numbered 1..k per key in time
    order (pinned so the SQL oracle's lag()+cumsum reproduces it)."""
    gap_us = gap_s * 1_000_000

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        ts = g[ts_col].values.astype("datetime64[us]").astype(np.int64)
        new_session = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            new_session[1:] = (ts[1:] - ts[:-1] > gap_us).astype(np.int64)
        sid = np.cumsum(new_session)
        out = pd.DataFrame({
            key_col: g[key_col].values, "session_id": sid,
            "ts": g[ts_col].values, "value": g[value_col].values})
        agg = (out.groupby([key_col, "session_id"], as_index=False)
                  .agg(session_start=("ts", "min"),
                       session_end=("ts", "max"),
                       n_events=("ts", "count"),
                       sum_value=("value", "sum")))
        return agg

    return (ds.groupby(key_col)
              .map_groups(sessionize, batch_format="pandas"))


def asof_join(left_ds, left_key: str, left_ts: str, left_id: str,
              right_ds, right_key: str, right_ts: str, right_id: str):
    """Distributed as-of join: for each left row, the right row of the same
    key with the greatest right_ts <= left_ts (ties on right_ts broken by
    greatest right_id, pinned for the oracle).  Rows with no match get
    right_id NULL.

    Shape: project both sides to (key, ts, id, side), union, ONE shuffle on
    key via groupby(key).map_groups, sorted searchsorted merge per group.
    No broadcast -- both sides may be large; the partitioning assumption is
    per-key data fits in a group (salt by time range if a key is huge)."""
    def project(side: int, key, ts, idc):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "key": t[key], "ts": t[ts], "id": t[idc],
                "side": pa.array(np.full(len(t), side, dtype=np.int8)),
            })
        return fn

    left = left_ds.map_batches(project(0, left_key, left_ts, left_id),
                               batch_format="pyarrow")
    right = right_ds.map_batches(project(1, right_key, right_ts, right_id),
                                 batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0]
        r = g[g["side"] == 1].sort_values(["ts", "id"], kind="stable")
        int_ids = np.issubdtype(g["id"].values.dtype, np.integer)

        def null_ids(vals: np.ndarray, matched: np.ndarray):
            # unmatched rows are NULL.  Integer ids stay int64 with a null
            # mask (NaN-in-float64 silently corrupts ids above 2^53 -- the
            # normal case for 64-bit id spaces at scale); non-integer ids
            # keep the float/NaN path.
            if int_ids:
                out = np.zeros(len(matched), dtype=np.int64)
                out[matched] = vals
                return pd.arrays.IntegerArray(out, mask=~matched)
            out = np.full(len(matched), np.nan)
            out[matched] = vals.astype(np.float64)
            return out

        if not len(l):
            # dtypes must follow the actual key/id columns (a right-only
            # string-keyed group with hardcoded int64 would make block
            # schemas heterogeneous)
            empty = np.zeros(0, dtype=bool)
            return pd.DataFrame({left_id: l["id"],
                                 "key": l["key"],
                                 right_id: null_ids(
                                     g["id"].values[:0], empty)})
        lts = l["ts"].values.astype("datetime64[us]").astype(np.int64)
        rts = r["ts"].values.astype("datetime64[us]").astype(np.int64)
        idx = np.searchsorted(rts, lts, side="right") - 1
        matched = idx >= 0 if len(r) else np.zeros(len(l), dtype=bool)
        return pd.DataFrame({left_id: l["id"].values,
                             "key": l["key"].values,
                             right_id: null_ids(
                                 r["id"].values[idx[matched]], matched)})

    return left.union(right).groupby("key").map_groups(
        merge, batch_format="pandas")
