"""End-to-end Ray pipeline tests on sf0.001 (driver testdata)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.compute as pc
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages(ray_session):
    from raysketch.pages import pages_dataset
    return pages_dataset(SF).materialize()


@pytest.mark.parametrize("kind,params", [
    ("sbbf", {"bits_per_key": 10}),
    ("xorf", {"fp_bits": 16, "arity": 3}),
    ("ribbon", {"coeff_bits": 64, "result_bits": 16}),
])
def test_build_probe_no_false_negatives(ray_session, pages, kind, params):
    from raysketch.pipeline import build_filter_table, probe
    ft = build_filter_table(pages, "url", kind, params,
                            num_partitions=4).materialize()
    pdf = ft.to_pandas()
    assert len(pdf) == 4
    assert (pdf["kind"] == kind).all()
    probed = probe(ft, pages, "url", concurrency=2)
    missing = probed.map_batches(
        lambda t: t.filter(pc.invert(t["hit"])),
        batch_format="pyarrow").count()
    assert missing == 0


def test_probe_fpr_on_absent_keys(ray_session, pages):
    import ray.data as rd
    from raysketch.pipeline import build_filter_table, probe
    ft = build_filter_table(pages, "url", "xorf",
                            {"fp_bits": 16, "arity": 3},
                            num_partitions=4).materialize()
    # known-absent probe urls (FIXTURES.md F2): seeded-random, disjoint by
    # construction from the derived url namespace
    absent = rd.from_items(
        [{"url": f"https://absent-{i}.nowhere.example.net/x/{i}"}
         for i in range(4096)])
    probed = probe(ft, absent, "url", concurrency=2)
    hits = probed.sum("hit") or 0
    assert hits / 4096 <= 3 / 65536 * 4 + 0.001  # fp_bits=16 target, slack


def test_checkpoint_resume(ray_session, pages, tmp_path):
    from raysketch.pipeline import build_filter_table
    ck = str(tmp_path / "ft")
    ft1 = build_filter_table(pages, "url", "sbbf", {"bits_per_key": 10},
                             num_partitions=4, checkpoint_dir=ck)
    pdf1 = ft1.to_pandas().sort_values("partition_id").reset_index(drop=True)
    assert len(pdf1) == 4
    # resume: nothing missing -> payloads must be byte-identical (no rebuild)
    ft2 = build_filter_table(pages, "url", "sbbf", {"bits_per_key": 10},
                             num_partitions=4, checkpoint_dir=ck)
    pdf2 = ft2.to_pandas().sort_values("partition_id").reset_index(drop=True)
    assert len(pdf2) == 4
    assert all(bytes(a) == bytes(b)
               for a, b in zip(pdf1["payload"], pdf2["payload"]))


def test_partial_checkpoint_resume(ray_session, pages, tmp_path):
    """Simulate a failed run: drop one partition's row, resume rebuilds
    exactly the missing one."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from raysketch.pipeline import build_filter_table
    ck = str(tmp_path / "ft2")
    build_filter_table(pages, "url", "sbbf", {"bits_per_key": 10},
                       num_partitions=4, checkpoint_dir=ck).materialize()
    # corrupt: keep only partitions != 2
    parts = os.path.join(ck, "parts")
    files = [f for f in os.listdir(parts) if f.endswith(".parquet")]
    tbl = pa.concat_tables(
        [pq.read_table(os.path.join(parts, f)) for f in files])
    kept = tbl.filter(pc.not_equal(tbl["partition_id"], 2))
    for f in files:
        os.remove(os.path.join(parts, f))
    pq.write_table(kept, os.path.join(parts, "kept.parquet"))
    ft = build_filter_table(pages, "url", "sbbf", {"bits_per_key": 10},
                            num_partitions=4, checkpoint_dir=ck)
    pdf = ft.to_pandas()
    assert sorted(pdf["partition_id"]) == [0, 1, 2, 3]


def test_hll_aggregate_matches_exact(ray_session, pages):
    import duckdb
    from raysketch.hashing import hash_strings
    from raysketch.pages import PAGES_SQL
    from raysketch.pipeline import sketch_aggregate
    from raysketch.sketches import HllSketch
    hll = sketch_aggregate(pages, "url", lambda: HllSketch.create(p=14),
                           lambda s, col: s.update(hash_strings(col)))
    con = duckdb.connect()
    for name in ["documents", "orders"]:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{SF}/{name}.parquet')")
    exact = con.execute(
        f"SELECT COUNT(DISTINCT url) FROM {PAGES_SQL}").fetchone()[0]
    assert abs(hll.estimate() - exact) / exact < 3 * hll.rel_error()


def test_grouped_count_matches_exact(ray_session, pages):
    import duckdb
    from raysketch.pages import HOST_SQL, PAGES_SQL, host_of
    from raysketch.pipeline import grouped_count
    gc = grouped_count(pages, lambda t: host_of(t["url"]),
                       key_name="host", count_name="n").to_pandas()
    con = duckdb.connect()
    for name in ["documents", "orders"]:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{SF}/{name}.parquet')")
    exact = con.execute(
        f"SELECT {HOST_SQL} AS host, COUNT(*) AS n FROM {PAGES_SQL} "
        f"GROUP BY 1").fetch_df()
    merged = gc.merge(exact, on="host", suffixes=("_ray", "_sql"))
    assert len(merged) == len(exact) == len(gc)
    assert (merged["n_ray"] == merged["n_sql"]).all()


def test_text_passthrough_byte_identical(ray_session, pages):
    """input_hint invariant: byte-identical text per url through the
    pipeline (SURVEY.md §7.4.7 -- pass-through integrity on the map path)."""
    import duckdb
    from raysketch.pages import PAGES_SQL
    out = pages.map_batches(lambda t: t.select(["url", "text"]),
                            batch_format="pyarrow").to_pandas()
    con = duckdb.connect()
    for name in ["documents", "orders"]:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{SF}/{name}.parquet')")
    ref = con.execute(
        f"SELECT url, text FROM {PAGES_SQL}").fetch_df()
    a = out.sort_values(["url", "text"]).reset_index(drop=True)
    b = ref.sort_values(["url", "text"]).reset_index(drop=True)
    assert a.equals(b)


def test_topk_by_count_matches_pandas(ray_session):
    import ray.data as rd
    from raysketch.pipeline import topk_by_count
    df = pd.DataFrame({"k": ["a"] * 5 + ["b"] * 3 + ["c"] * 3 + ["d"]})
    out = topk_by_count(rd.from_pandas(df), lambda t: t["k"], k=2,
                        key_name="k", count_name="n")
    # tie between b and c at count 3 -> key ASC picks b
    assert out["k"].tolist() == ["a", "b"]
    assert out["n"].tolist() == [5, 3]


def test_resumable_write_skips_done_shards(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd
    from raysketch.pipeline import resumable_write

    df = pd.DataFrame({"url": [f"u{i}" for i in range(1000)],
                       "v": np.arange(1000)})
    out_dir = str(tmp_path / "sink")
    m1 = resumable_write(rd.from_pandas(df), out_dir, "url", num_shards=8)
    assert not m1["skipped"].any()
    assert m1["n_rows"].sum() == 1000
    files = sorted(os.listdir(out_dir))
    assert files == [f"shard_{i}.parquet" for i in range(8)]
    total1 = sum(pq.read_table(os.path.join(out_dir, f)).num_rows
                 for f in files)
    assert total1 == 1000

    # delete two shards -> re-run rewrites exactly those, skips the rest
    os.remove(os.path.join(out_dir, "shard_2.parquet"))
    os.remove(os.path.join(out_dir, "shard_5.parquet"))
    m2 = resumable_write(rd.from_pandas(df), out_dir, "url", num_shards=8)
    rewritten = set(m2[~m2["skipped"]]["shard"])
    assert rewritten == {2, 5}
    assert set(m2[m2["skipped"]]["shard"]) == {0, 1, 3, 4, 6, 7}
    total2 = sum(pq.read_table(os.path.join(out_dir, f)).num_rows
                 for f in sorted(os.listdir(out_dir)))
    assert total2 == 1000
    # no tmp droppings
    assert not [f for f in os.listdir(out_dir) if ".tmp-" in f]


def test_probe_colocated_matches_broadcast(ray_session, pages):
    """The partition-colocated probe (large-filter-table path) must produce
    identical hit columns to the broadcast probe, on present AND absent
    keys, and the size-based dispatch must route through it."""
    import ray.data as rd
    from raysketch.pipeline import build_filter_table, probe, probe_colocated

    ft = build_filter_table(pages, "url", "xorf",
                           {"fp_bits": 16, "arity": 3},
                           num_partitions=4).materialize()
    absent = rd.from_items(
        [{"url": f"https://nope-{i}.example.net/{i}"} for i in range(512)])
    mixed = pages.map_batches(lambda t: t.select(["url"]),
                              batch_format="pyarrow").union(absent)

    bc = (probe(ft, mixed, "url").to_pandas()
          .sort_values("url").reset_index(drop=True))
    co = (probe_colocated(ft, mixed, "url").to_pandas()
          .sort_values("url").reset_index(drop=True))
    assert (bc["url"] == co["url"]).all()
    assert (bc["hit"] == co["hit"]).all()

    # dispatch: a 1-byte broadcast budget must route through the colocated
    # path and still give the same answer
    small = (probe(ft, mixed, "url", max_broadcast_bytes=1).to_pandas()
             .sort_values("url").reset_index(drop=True))
    assert (bc["hit"] == small["hit"]).all()


def test_probe_memoizes_broadcast_ref(ray_session, pages):
    """Repeat probes of one filter table must share one ray.put ref (the
    per-worker decode cache is clear-on-miss, so a fresh ref per probe
    would re-decode every time -- and retained decoded sets measurably
    degrade worker compute).  An explicitly tighter broadcast budget must
    still be honored on a memo hit."""
    import ray.data as rd
    from raysketch.pipeline import build_filter_table, probe

    ft = build_filter_table(pages, "url", "xorf",
                           {"fp_bits": 16, "arity": 3},
                           num_partitions=4).materialize()
    absent = rd.from_items(
        [{"url": f"https://nope-{i}.example.net/{i}"} for i in range(64)])

    first = probe(ft, pages, "url")
    memo = ft._raysketch_broadcast
    assert memo is not None
    second = probe(ft, absent, "url")
    assert ft._raysketch_broadcast is memo    # no fresh collection/put
    assert first.sum("hit") == pages.count()
    assert (second.sum("hit") or 0) <= 2      # absent: at most FP noise

    # memo hit + tighter cap: must fall through to the colocated path
    # and still answer identically
    small = (probe(ft, pages, "url", max_broadcast_bytes=1).to_pandas()
             .sort_values("url").reset_index(drop=True))
    assert small["hit"].all()


def test_build_filter_tables_shared_shuffle_parity(ray_session, pages):
    """build_filter_tables (several kinds, ONE hash+shuffle) must emit
    rows byte-identical to separate build_filter_table calls -- builds
    are deterministic over the sorted unique hashes."""
    from raysketch.pipeline import build_filter_table, build_filter_tables

    specs = [("ribbon", {"coeff_bits": 128, "result_bits": 16}),
             ("xorf", {"fp_bits": 16, "arity": 4}),
             ("sbbf", {"bits_per_key": 10})]
    multi = (build_filter_tables(pages, "url", specs, num_partitions=4,
                                 self_check=True)
             .to_pandas().set_index(["kind", "partition_id"]))
    assert len(multi) == 3 * 4
    for kind, params in specs:
        single = (build_filter_table(pages, "url", kind, params,
                                     num_partitions=4)
                  .to_pandas().set_index(["kind", "partition_id"]))
        for pid in range(4):
            assert bytes(multi.loc[(kind, pid)]["payload"]) == \
                bytes(single.loc[(kind, pid)]["payload"]), (kind, pid)


def test_semijoin_filter_verify_distributed_large_build(ray_session):
    """The exact-verify stage is a partitioned left-semi join, never a
    driver-side key broadcast: a multi-block 50k-key build side against a
    probe side with members, non-members, and filter-FP bait must return
    exactly the true members."""
    import numpy as np
    import ray.data as rd

    from raysketch.pipeline import semijoin_filter_verify

    build = rd.range(50_000).map_batches(
        lambda b: {"bkey": b["id"] * 3},  # members: multiples of 3
        batch_format="numpy").repartition(16)
    probe_keys = np.arange(0, 60_000, dtype=np.int64)
    probe = rd.from_items([{"pkey": int(k)} for k in probe_keys])
    out = semijoin_filter_verify(probe, "pkey", build, "bkey",
                                 num_partitions=4,
                                 max_broadcast_bytes=0).to_pandas()
    want = {k for k in probe_keys if k % 3 == 0 and k < 150_000}
    assert set(out["pkey"]) == want


def test_semijoin_filter_verify_broadcast_matches_join(ray_session):
    """Size-based dispatch: the small-build-side broadcast `is_in` verify
    and the partitioned left-semi join return identical key sets."""
    import numpy as np
    import ray.data as rd

    from raysketch.pipeline import semijoin_filter_verify

    build = rd.range(5_000).map_batches(
        lambda b: {"bkey": b["id"] * 7}, batch_format="numpy")
    probe_keys = np.arange(0, 40_000, dtype=np.int64)
    probe = rd.from_items([{"pkey": int(k)} for k in probe_keys])
    want = {k for k in probe_keys if k % 7 == 0 and k < 35_000}
    via_bc = semijoin_filter_verify(probe, "pkey", build, "bkey",
                                    num_partitions=2).to_pandas()
    via_join = semijoin_filter_verify(probe, "pkey", build, "bkey",
                                      num_partitions=2,
                                      max_broadcast_bytes=0).to_pandas()
    assert set(via_bc["pkey"]) == want
    assert set(via_join["pkey"]) == want


def test_grouped_reduce_matches_pandas(ray_session):
    """grouped_reduce (hash-partition + run reduce) must equal pandas
    groupby min/max/sum for string AND int keys, across many blocks,
    including singleton and hot keys."""
    import pyarrow as pa
    import ray.data as rd

    from raysketch.pipeline import grouped_reduce

    rng = np.random.default_rng(7)
    n = 20_000
    skews = rng.choice([1, 1, 1, 400], size=n)  # a few hot keys
    keys_i = (rng.integers(0, 3_000, size=n) * skews).astype(np.int64)
    vals = rng.integers(-10**12, 10**12, size=n).astype(np.int64)
    df = pd.DataFrame({"k": keys_i, "v": vals})

    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(13)
    got = grouped_reduce(ds, "k", [("v", "min", "lo"), ("v", "max", "hi"),
                                   ("v", "sum", "tot")]).to_pandas()
    want = (df.groupby("k", as_index=False)
              .agg(lo=("v", "min"), hi=("v", "max"), tot=("v", "sum")))
    got = got.sort_values("k").reset_index(drop=True)
    want = want.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "lo", "hi", "tot"]], want)

    # string keys + timestamp values (the latest_page_per_url shape)
    df2 = pd.DataFrame({
        "k": [f"host{i % 97}" for i in range(5_000)],
        "t": pd.to_datetime(
            rng.integers(0, 10**15, size=5_000), unit="us"),
    })
    ds2 = rd.from_arrow(pa.Table.from_pandas(df2)).repartition(7)
    got2 = (grouped_reduce(ds2, "k", [("t", "max", "latest")])
            .to_pandas().sort_values("k").reset_index(drop=True))
    want2 = (df2.groupby("k", as_index=False).agg(latest=("t", "max"))
             .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got2, want2)

    # object-dtype (string) VALUE column: must skip the packed-blob
    # exchange (pointer bytes can't ride a blob) and still reduce right
    df3 = pd.DataFrame({
        "k": (rng.integers(0, 500, size=4_000)).astype(np.int64),
        "s": [f"v{i % 777:04d}" for i in range(4_000)],
    })
    ds3 = rd.from_arrow(pa.Table.from_pandas(df3)).repartition(5)
    got3 = (grouped_reduce(ds3, "k", [("s", "min", "first_s"),
                                      ("s", "max", "last_s")])
            .to_pandas().sort_values("k").reset_index(drop=True))
    want3 = (df3.groupby("k", as_index=False)
             .agg(first_s=("s", "min"), last_s=("s", "max"))
             .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got3, want3)


def test_pack_by_pid_roundtrip_no_ray():
    """The packed build exchange (_pack_by_pid -> _unpack_group_hashes)
    must carry every (pid, h) pair losslessly: per-pid blobs of raw u64
    bytes, sliced / multi-chunk group tables included."""
    import pyarrow as pa
    from raysketch.pipeline import _pack_by_pid, _unpack_group_hashes

    rng = np.random.default_rng(5)
    n, P = 50_000, 37
    pid = rng.integers(0, P, n).astype(np.uint32)
    h = rng.integers(0, 2**64, n, dtype=np.uint64)
    batch = pa.table({"pid": pa.array(pid), "h": pa.array(h)})
    packed = _pack_by_pid(batch)
    assert packed.num_rows == len(np.unique(pid))
    # emulate the post-shuffle group for each pid, including a sliced
    # and a rechunked view of the packed rows
    for p in (0, 7, P - 1):
        mask = np.asarray(packed["pid"]) == p
        grp = packed.filter(pa.array(mask))
        grp2 = pa.Table.from_batches(
            grp.to_batches(max_chunksize=1))         # many tiny chunks
        want = np.sort(h[pid == p])
        for g in (grp, grp2, grp.slice(0, grp.num_rows)):
            got = np.sort(_unpack_group_hashes(g))
            assert np.array_equal(got, want)
    # empty batch keeps the schema
    empty = _pack_by_pid(batch.slice(0, 0))
    assert empty.num_rows == 0
    assert empty.schema.field("blob").type == pa.large_binary()

    # coarse mode: _c = pid % C, and _packed_groups recovers every
    # (pid, hashes) of a coarse group losslessly
    from raysketch.pipeline import _packed_groups
    C = 5
    packed_c = _pack_by_pid(batch, C)
    assert np.array_equal(np.asarray(packed_c["_c"]),
                          np.asarray(packed_c["pid"]).astype(np.int64) % C)
    cvals = np.asarray(packed_c["_c"])
    for c in (0, C - 1):
        grp = packed_c.filter(pa.array(cvals == c))
        got = dict(_packed_groups(grp))
        want_pids = sorted(p for p in np.unique(pid) if p % C == c)
        assert sorted(got) == want_pids
        for p in want_pids:
            assert np.array_equal(np.sort(got[p]), np.sort(h[pid == p]))
