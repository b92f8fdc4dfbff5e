"""Event-time windowed operators -- the streaming-flavored custom operators
the reference lacks (SURVEY.md §2.3 "Streaming operators: none"), expressed
Ray-Data-first:

  tumbling_window_agg  fixed-size event-time windows: per-batch combiner
                       (window_start derived vectorized, partial counts/sums)
                       -> one groupby on (window_start, dims) -- classic
                       pre-aggregated exact window aggregate
  session_windows      gap-based sessions per key: hot-key-safe two-stage
                       shape -- stage 1 sessionizes per (key, time bucket)
                       so group volume is bounded by event-rate * bucket
                       width even for one pathological key; stage 2
                       interval-merges the per-session FRAGMENT rows
                       (output-sized, not event-sized) across bucket
                       boundaries and numbers sessions

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
                    gap_s: int, num_partitions: int = 64,
                    bucket_s: int | None = None):
    """Per-key sessions: consecutive events of a key belong to one session
    while inter-event gap <= gap_s; sessions numbered 1..k per key in time
    order (pinned so the SQL oracle's lag()+cumsum reproduces it).

    HOT-KEY-SAFE two-stage shape (the single-stage version hash-
    partitioned by key alone, so one pathological key -- a bot with 1e9
    events -- made one unbounded group):

      stage 1  hash-partition by (key, time bucket) where bucket width
               bucket_s defaults to 10*gap_s; sessionize each
               (key, bucket) run vectorized.  Group volume is bounded by
               event-rate * bucket_s even for a single hot key.
      stage 2  hash-partition the PARTIAL SESSIONS (already reduced to
               one row per session fragment) by key alone; merge
               fragments whose inter-fragment gap <= gap_s with the
               same lexsort + run-boundary scan, then number sessions.

    Exact for any bucket width: within a bucket fragments are maximal
    (split only at real gaps), and a session crosses a bucket boundary
    iff the boundary gap <= gap_s -- precisely the stage-2 merge
    condition (fragments of one key never overlap in time, so sorted-by-
    start implies sorted-by-end and the scan is a plain interval merge).
    Stage-2 skew is bounded by the key's SESSION count (output-sized),
    not its event count.

    The output key column is always int64 (keys are cast for hashing
    and ride the packed exchange as int64; narrower int inputs widen)."""
    from .hashing import murmur64a_u64
    gap_us = gap_s * 1_000_000
    bucket_us = (bucket_s if bucket_s is not None else 10 * gap_s) * 1_000_000

    def part(t: pa.Table) -> pa.Table:
        from .pipeline import pack_kv_by_part
        k = np.asarray(t[key_col], dtype=np.int64)
        ts_orig = np.asarray(t[ts_col]).astype("datetime64[us]")
        ts = ts_orig.astype(np.int64)
        bucket = ts // bucket_us
        h = murmur64a_u64(k.view(np.uint64), 31) \
            ^ murmur64a_u64(bucket.view(np.uint64), 77)
        # the stage-1 exchange carries EVERY raw event row -- pack it
        # (one blob row per block x partition, pack_kv_by_part)
        part_ids = (h % np.uint64(num_partitions)).astype(np.int64)
        return pack_kv_by_part(
            part_ids, k,
            [ts_orig, np.asarray(t[value_col]), bucket])

    def fragment(g: pa.Table) -> pa.Table:
        """Stage 1: maximal sessions within each (key, bucket) run."""
        from .pipeline import unpack_kv_part
        key, (ts_any, val, bkt) = unpack_kv_part(g, 3)
        key = np.asarray(key, dtype=np.int64)
        ts_orig = ts_any.astype("datetime64[us]")
        ts = ts_orig.astype(np.int64)
        bkt = bkt.astype(np.int64)
        if key.size == 0:
            return pa.table({
                key_col: pa.array([], pa.int64()),
                "session_start": pa.array(ts_orig[:0]),
                "session_end": pa.array(ts_orig[:0]),
                "n_events": pa.array([], pa.int64()),
                "sum_value": pa.array(val[:0]),
            })
        order = np.lexsort((ts, bkt, key))
        key, ts, val, bkt = key[order], ts[order], val[order], bkt[order]
        n = len(key)
        newrun = (key[1:] != key[:-1]) | (bkt[1:] != bkt[:-1])
        breaks = np.concatenate(
            [[True], newrun | (ts[1:] - ts[:-1] > gap_us)])
        s_starts = np.flatnonzero(breaks)
        bounds = np.append(s_starts, n)
        ts_sorted = ts_orig[order]
        return pa.table({
            key_col: pa.array(key[s_starts], pa.int64()),
            "session_start": pa.array(ts_sorted[s_starts]),
            "session_end": pa.array(ts_sorted[bounds[1:] - 1]),
            "n_events": pa.array(np.diff(bounds).astype(np.int64)),
            "sum_value": pa.array(np.add.reduceat(val, s_starts)),
        })

    def part2(t: pa.Table) -> pa.Table:
        k = np.asarray(t[key_col], dtype=np.int64)
        h = murmur64a_u64(k.view(np.uint64), 31)
        return t.append_column(
            "_part2", pa.array((h % np.uint64(num_partitions))
                               .astype(np.int32)))

    def stitch(g: pa.Table) -> pa.Table:
        """Stage 2: merge bucket-boundary fragments, number sessions."""
        key = np.asarray(g[key_col], dtype=np.int64)
        start_orig = np.asarray(g["session_start"]).astype("datetime64[us]")
        end_orig = np.asarray(g["session_end"]).astype("datetime64[us]")
        start = start_orig.astype(np.int64)
        end = end_orig.astype(np.int64)
        nev = np.asarray(g["n_events"], dtype=np.int64)
        val = np.asarray(g["sum_value"])
        if key.size == 0:
            return pa.table({
                key_col: pa.array([], g[key_col].type),
                "session_id": pa.array([], pa.int64()),
                "session_start": pa.array(start_orig[:0]),
                "session_end": pa.array(end_orig[:0]),
                "n_events": pa.array([], pa.int64()),
                "sum_value": pa.array(val[:0]),
            })
        order = np.lexsort((start, key))
        key, start, end = key[order], start[order], end[order]
        nev, val = nev[order], val[order]
        n = len(key)
        newkey = key[1:] != key[:-1]
        breaks = np.concatenate(
            [[True], newkey | (start[1:] - end[:-1] > gap_us)])
        s_starts = np.flatnonzero(breaks)
        bounds = np.append(s_starts, n)
        sid_glob = np.cumsum(breaks)
        key_starts = np.flatnonzero(np.concatenate([[True], newkey]))
        key_bounds = np.append(key_starts, n)
        base = np.repeat(sid_glob[key_starts], np.diff(key_bounds))
        sid = (sid_glob - base + 1)[s_starts]
        start_sorted = start_orig[order]
        end_sorted = end_orig[order]
        return pa.table({
            key_col: pa.array(key[s_starts], g[key_col].type),
            "session_id": pa.array(sid.astype(np.int64)),
            "session_start": pa.array(start_sorted[s_starts]),
            "session_end": pa.array(end_sorted[bounds[1:] - 1]),
            "n_events": pa.array(np.add.reduceat(nev, s_starts)),
            "sum_value": pa.array(np.add.reduceat(val, s_starts)),
        })

    frags = (ds.map_batches(part, batch_format="pyarrow")
               .groupby("_part")
               .map_groups(fragment, batch_format="pyarrow"))
    return (frags.map_batches(part2, batch_format="pyarrow")
                 .groupby("_part2")
                 .map_groups(stitch, batch_format="pyarrow"))


def asof_join(left_ds, left_key: str, left_ts: str, left_id: str,
              right_ds, right_key: str, right_ts: str, right_id: str):
    """Distributed as-of join: for each left row, the right row of the same
    key with the greatest right_ts <= left_ts (ties on right_ts broken by
    greatest right_id, pinned for the oracle).  Rows with no match get
    right_id NULL.

    Shape: project both sides to (key, ts, id, side), union, ONE int32
    hash-partition shuffle on the key (one partition holds MANY complete
    keys; Ray's per-key sort groupby degrades with key cardinality), then
    a per-partition pandas groupby applying the sorted searchsorted merge
    per key.  No broadcast -- both sides may be large; the partitioning
    assumption is per-key data fits in a partition (salt by time range if
    a key is huge)."""
    from .hashing import murmur64a_u64

    num_partitions = 64

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

    def part(t: pa.Table) -> pa.Table:
        from .pipeline import pack_kv_by_part
        k = np.asarray(t["key"])
        int_key = np.issubdtype(k.dtype, np.integer)
        if int_key:
            h = murmur64a_u64(k.astype(np.int64).view(np.uint64), 31)
        else:
            from .hashing import hash_strings
            h = hash_strings(t["key"])
        part_ids = (h % np.uint64(num_partitions)).astype(np.int64)
        # both sides' full row sets cross this exchange -- pack them
        keys = k.astype(np.int64) if int_key else t["key"]
        return pack_kv_by_part(
            part_ids, keys,
            [np.asarray(t["ts"]).astype("datetime64[us]"),
             np.asarray(t["id"]),
             np.asarray(t["side"], dtype=np.int8)])

    def merge_part(g: pa.Table) -> pd.DataFrame:
        from .pipeline import unpack_kv_part
        key, (ts, ids, side) = unpack_kv_part(g, 3)
        df = pd.DataFrame({"key": np.asarray(key), "ts": ts, "id": ids,
                           "side": side})
        outs = [merge(sub) for _, sub in
                df.groupby("key", sort=False)]
        return pd.concat(outs, ignore_index=True)

    return (left.union(right)
            .map_batches(part, batch_format="pyarrow")
            .groupby("_part").map_groups(merge_part,
                                         batch_format="pyarrow"))
