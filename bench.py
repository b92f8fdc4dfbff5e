"""Benchmark harness -- prints ONE JSON line with per-query seconds.

    python bench.py             # $GRAFT_SF_DIR (default sf0.1), $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling   # same job at 8 and 32 CPUs in fresh processes,
                                # reports throughputs + scaling efficiency

Headline pipelines (the Ray shape of the reference bench,
/root/reference/src/bench.zig:195-249, plus the north-rule sketch sweep):
build each filter family over the pages url corpus (distributed per-partition
builds, P=2*num_cpus), probe present + absent keys; a 600k-key lineitem
build; the HLL/CMS/KLL sketch sweep; exact dedup; filter-verify semi-join.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _calibrate() -> float:
    """Single-thread fixed busy loop -- measures co-tenant CPU steal on
    this shared VM.  Quiet reference ~0.35 s; readings of 1-2 s mean the
    wall-clock numbers in the same window are 3-5x inflated
    (BASELINE.md noise methodology)."""
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i
    return round(time.perf_counter() - t0, 3)


def _run_benchmarks(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from raysketch.hashing import hash_strings
    from raysketch.pages import host_of, pages_dataset
    from raysketch.pipeline import (build_filter_table, choose_num_partitions,
                                    distinct_keys, grouped_count, probe,
                                    semijoin_filter_verify, sketch_aggregate)
    from raysketch.sketches import CmsSketch, HllSketch, KllSketch
    from raysketch.util import read_parquet_sized
    timings: dict[str, float] = {}
    stats: dict[str, float] = {}
    calib_before = _calibrate()

    # warm the OS page cache + materialize the derived corpus once (untimed):
    # we measure compute+shuffle, not first disk read
    pages = pages_dataset(sf_dir).materialize()
    n_pages = pages.count()
    # partitions sized by keys (~50k/filter at bench scale; 1M default at
    # cluster scale) -- per-partition key count drives filter space
    # overhead, see choose_num_partitions
    P = choose_num_partitions(n_pages, target_keys=50_000)
    # one block: from_items defaults to ~200 tiny blocks, which turns
    # every 4096-row probe into 200 task dispatches
    absent = rd.from_items(
        [{"url": f"https://absent-{i}.nowhere.example.net/x/{i}"}
         for i in range(4096)]).repartition(1).materialize()

    # untimed warmup: spin up the worker pool / actor pools once so the
    # first timed query doesn't pay python-process cold start for
    # num_cpus workers
    _warm_ft = build_filter_table(absent, "url", "sbbf",
                                  {"bits_per_key": 10},
                                  num_partitions=P).materialize()
    probe(_warm_ft, absent, "url", concurrency=num_cpus // 2).sum("hit")
    probe(_warm_ft, absent, "url", concurrency=4).sum("hit")

    # min-of-N per query (default 2, RAYSKETCH_BENCH_REPEATS to change):
    # this VM shows 2-3x co-tenant CPU-steal windows (BASELINE.md), and the
    # min estimator is the same methodology the scaling bench already uses
    repeats = int(os.environ.get("RAYSKETCH_BENCH_REPEATS", "2"))

    def timed(name, fn):
        best, out = None, None
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)
        return out

    for cfg, kind, params in [
        ("sbbf24", "sbbf", {"bits_per_key": 24}),
        ("xorf3_16", "xorf", {"fp_bits": 16, "arity": 3}),
        ("ribbon64_16", "ribbon", {"coeff_bits": 64, "result_bits": 16}),
    ]:
        def job(kind=kind, params=params):
            ft = build_filter_table(pages, "url", kind, params,
                                    num_partitions=P).materialize()
            present_hits = probe(ft, pages, "url",
                                 concurrency=num_cpus // 2).sum("hit")
            fp = probe(ft, absent, "url", concurrency=4).sum("hit") or 0
            return ft, present_hits, fp
        ft, hits, fp = timed(f"build_probe_{cfg}", job)
        pdf = ft.to_pandas()
        stats[f"{cfg}_n_keys"] = int(pdf["n_keys"].sum())
        stats[f"{cfg}_fpr_absent"] = fp / 4096
        stats[f"{cfg}_space_overhead"] = round(
            float(pdf["mem_bytes"].sum() / max(1, pdf["ideal_bytes"].sum())
                  - 1), 4)
        assert hits == n_pages, f"false negatives in {cfg}"

    # 600k-key corpus from lineitem (keys = orderkey-linenumber strings)
    def li_keys(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t["l_orderkey"], pa.string()), "-",
            pc.cast(t["l_linenumber"], pa.string()), "")
        return pa.table({"key": k})

    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber"]
                         ).map_batches(li_keys, batch_format="pyarrow"
                                       ).materialize()
    n_li = li.count()

    def li_job():
        ft = build_filter_table(li, "key", "sbbf", {"bits_per_key": 10},
                                num_partitions=P).materialize()
        hits = probe(ft, li, "key", concurrency=num_cpus // 2).sum("hit")
        assert hits == n_li
        return ft
    timed("lineitem_sbbf10_600k", li_job)

    timed("hll_distinct_url", lambda: sketch_aggregate(
        pages, "url", lambda: HllSketch.create(p=14),
        lambda s, col: s.update(hash_strings(col))))
    timed("cms_host_freq", lambda: sketch_aggregate(
        pages, "url", lambda: CmsSketch.create(depth=4, width=1 << 16),
        lambda s, col: s.update(hash_strings(host_of(col)))))
    timed("kll_text_len", lambda: sketch_aggregate(
        pages, "text", lambda: KllSketch.create(k=200),
        lambda s, col: s.update(
            np.asarray(pc.utf8_length(col), dtype=np.float64))))
    timed("dedup_urls_exact",
          lambda: distinct_keys(pages, "url").count())
    timed("host_freq_exact",
          lambda: grouped_count(pages, lambda t: host_of(t["url"]),
                                key_name="host", count_name="n").count())

    def semi_job():
        events = read_parquet_sized(f"{sf_dir}/events.parquet",
                                 columns=["event_id", "user_id"])
        cust = read_parquet_sized(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment"]).map_batches(
            lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
                       .select(["c_custkey"]), batch_format="pyarrow")
        return semijoin_filter_verify(events, "user_id", cust,
                                      "c_custkey").count()
    timed("events_semijoin", semi_job)

    total = round(sum(timings.values()), 4)
    build_probe_s = timings["build_probe_sbbf24"]
    result = {
        "metric": "filterz-ray headline pipelines wall seconds (sum)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_pages": n_pages,
        "n_lineitem_keys": n_li,
        "docs_per_sec_sbbf24": round(n_pages / build_probe_s, 1),
        "stats": stats,
        # co-tenant CPU-steal annotation: quiet ~0.35 s (see _calibrate)
        "calibration_sec": {"before": calib_before, "after": _calibrate(),
                            "quiet_ref": 0.35},
    }
    ray.shutdown()
    return result


def _run_scaling_job(sf_dir: str, num_cpus: int,
                     replicas: int | None = None) -> dict:
    """The headline build+probe pipeline on a corpus big enough that
    compute dominates Ray's fixed per-stage overhead (sf0.1 alone is 155k
    keys -- seconds of overhead vs milliseconds of compute, which is why
    whole-bench wall time anti-scales there).  The sf0.1 url corpus is
    replicated `replicas`x with a distinct prefix per replica, then:
    hash -> partition -> per-partition ribbon + xorf builds (the
    CPU-heavy holistic constructions) with in-task zero-false-negative
    verification (build_filter_table self_check).

    The default 576 replicas (~93M keys) was re-sized for the
    round-3 native kernels: at the old 96x the whole job was ~71
    core-seconds of compute against ~10 s of fixed per-level overhead
    (pipeline barriers, driver blob collection, worker decode), which
    caps measurable 4->16 efficiency at ~0.5 no matter how well the
    work scales.  Override with RAYSKETCH_SCALING_REPLICAS."""
    import ray

    if replicas is None:
        replicas = int(os.environ.get("RAYSKETCH_SCALING_REPLICAS", "576"))

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging

    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from raysketch.pages import pages_dataset
    from raysketch.pipeline import (build_filter_table,
                                    build_filter_tables,
                                    choose_num_partitions, hashed_keys)

    def replicate(t: pa.Table) -> pa.Table:
        urls = t["url"]
        out = [pc.binary_join_element_wise(f"r{i}.", urls, "")
               for i in range(replicas)]
        return pa.table({"url": pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in out])})

    # batch_size bounds the replicate fan-out: 4096 rows x 576 replicas
    # x ~35 B url ~= 80 MB per output array, safely under pa.string()'s
    # 2 GB int32 offset limit (a whole 150k-row input block x 576
    # overflows it)
    urls = (pages_dataset(sf_dir)
            .map_batches(lambda t: t.select(["url"]), batch_format="pyarrow")
            .map_batches(replicate, batch_format="pyarrow", batch_size=4096)
            .materialize())
    n_keys = urls.count()
    # 400k keys/partition: the r4 sweep (BASELINE.md) measured the flat
    # ~6 s exchange floor shrinking and the best 16-cpu wall at P=234
    # (200k/400k/800k -> 19.4/16.8/20.6 s at 16 cpus); 800k regresses
    # the low-parallelism level (80 s at 4 cpus), so 400k is the
    # compute-vs-exchange balance point for this job
    P = choose_num_partitions(n_keys, target_keys=400_000)

    # untimed warmup: spin up the worker pool AND take one full read pass
    # over the materialized corpus -- the first full consumption of
    # fresh multi-GB plasma blocks measured up to 10x the core-seconds
    # of the second pass (page-fault + allocator warm-up), which would
    # otherwise land entirely inside the first timed build
    build_filter_table(urls.limit(4096), "url", "sbbf",
                       {"bits_per_key": 10}, num_partitions=4,
                       self_check=True).materialize()
    hashed_keys(urls, "url", P).count()

    # PARALLEL window probe, stamped into the result: co-tenant pressure
    # on this VM can strangle 16-way memory bandwidth while a
    # single-core calibration still reads quiet (measured: two adjacent
    # 16-cpu runs at 2.6x the quiet wall under calib 0.32 s).  Each task
    # xors a privately-allocated 64 MB buffer 4x; the aggregate GB/s
    # classifies the window so efficiency pairs can be read post-hoc.
    @ray.remote(num_cpus=1)
    def _bw_probe() -> tuple:
        import numpy as np
        import time as _t
        buf = np.ones(8 << 20, dtype=np.uint64)  # 64 MB
        acc = np.uint64(0)
        acc ^= np.bitwise_xor.reduce(buf)        # warm (first touch)
        t0 = _t.time()                           # wall clock: one host
        for _ in range(4):
            acc ^= np.bitwise_xor.reduce(buf)
        return (t0, _t.time(), 4 * buf.nbytes)

    def _parallel_bw() -> float:
        # aggregate = total bytes / union window (max end - min start):
        # summing per-task GB/s over non-overlapping windows let late-
        # starting or straggling tasks run under less contention and
        # inflate the sum
        spans = ray.get([_bw_probe.remote() for _ in range(num_cpus)])
        window = max(t1 for _, t1, _ in spans) - min(t0 for t0, _, _ in spans)
        return round(sum(b for _, _, b in spans) / max(window, 1e-9) / 1e9, 2)

    bw_before = _parallel_bw()

    # The timed job is build + in-task zero-FN verify, end to end
    # distributed: hash -> one (pid,h) shuffle -> per-partition holistic
    # construction -> re-probe of the partition's own keys inside the
    # build task (self_check).  No driver-side state moves: the driver
    # sees only per-partition metadata rows.  Full-corpus/absent-key
    # probe throughput and FPR are the headline bench's job -- a probe
    # of a ~200 MB filter table is dominated by the fixed-cost broadcast
    # collection + per-worker decode, which measures the same at every
    # cluster size and therefore dilutes a scaling measurement.
    t0 = time.perf_counter()
    # the reference bench's full active config set (src/bench.zig:112-135,
    # ribbon u128/u16 is its headline, bench_result_low_hit.txt:5-8),
    # sharing ONE (pid,h) exchange via build_filter_tables: on this VM
    # fresh-page provisioning is a serial, host-throttled resource that
    # scales with bytes allocated, NOT with num_cpus, so the scaling job
    # maximizes compute per allocated byte -- four holistic
    # constructions per shuffled row
    specs = [("ribbon", {"coeff_bits": 128, "result_bits": 16}),
             ("ribbon", {"coeff_bits": 64, "result_bits": 16}),
             ("xorf", {"fp_bits": 16, "arity": 4}),
             ("xorf", {"fp_bits": 16, "arity": 3}),
             ("sbbf", {"bits_per_key": 24}),
             ("sbbf", {"bits_per_key": 10})]
    # consume via the streaming sum: no materialize barrier, and the
    # ~400 MB of filter payloads never persist (less fresh allocation --
    # see the provisioning note above); self_check already verified
    # zero FN inside each build task
    seen = build_filter_tables(urls, "url", specs, num_partitions=P,
                               self_check=True).sum("n_rows")
    assert seen == len(specs) * n_keys, "lost rows in scaling job"
    wall = time.perf_counter() - t0
    # bracket the timed job: a probe only BEFORE it stamps a mid-run
    # bandwidth storm as quiet -- exactly the blind spot the stamp
    # exists to close
    bw_after = _parallel_bw()
    ray.shutdown()
    # counting convention: keys_per_sec = key-BUILDS per second over ALL
    # len(specs) configs (every config's build cost is inside `wall`, so
    # the rate's numerator must count every config too)
    return {"num_cpus": num_cpus, "sec": round(wall, 3),
            "n_keys": n_keys, "num_partitions": P,
            "n_configs": len(specs),
            "keys_per_sec": round(len(specs) * n_keys / wall, 1),
            "keys_per_sec_def": "key-builds/sec over all n_configs",
            # window classification reads the WORSE bracket end
            "parallel_bw_gbps": min(bw_before, bw_after),
            "parallel_bw_gbps_before": bw_before,
            "parallel_bw_gbps_after": bw_after}


def _scaling() -> None:
    """N vs 4N parallelism on the same input in fresh processes (the
    in-sandbox stand-in for the north rule's N vs 4N cluster sizes)."""
    lo, hi = 4, 16
    runs = {}
    # three runs per level, INTERLEAVED (lo,hi,lo,hi,...), keep the
    # fastest per level: the first process pays cold page-cache/import
    # costs AND this VM's host-side page provisioning throttle
    # (first-touch of fresh memory measured 0.01-2 GB/s depending on
    # co-tenant pressure, varying on a minutes scale) -- interleaving
    # makes both levels sample the same provisioning windows instead of
    # each level drawing its own
    pairs = []
    for attempt in range(3):
        pair = {}
        for n in (lo, hi):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--scaling-worker"],
                env=env, capture_output=True, text=True, check=True).stdout
            r = json.loads(out.strip().splitlines()[-1])
            pair[n] = r
            if n not in runs or r["sec"] < runs[n]["sec"]:
                runs[n] = r
        pairs.append(round((pair[lo]["sec"] / pair[hi]["sec"]) / (hi / lo),
                           3))
    # headline = MEDIAN of the per-attempt pairwise efficiencies: each
    # pair samples (nearly) one provisioning/steal window, so its ratio
    # is unbiased, while min-per-level across attempts mixes windows and
    # can read spuriously sub- OR super-linear (both observed)
    eff = sorted(pairs)[len(pairs) // 2]
    t_lo, t_hi = runs[lo]["sec"], runs[hi]["sec"]
    print(json.dumps({
        "metric": f"scaling efficiency {lo}->{hi} cpus (N vs 4N)",
        f"sec_{lo}": t_lo, f"sec_{hi}": t_hi,
        "n_keys": runs[lo]["n_keys"],
        f"keys_per_sec_{lo}": runs[lo]["keys_per_sec"],
        f"keys_per_sec_{hi}": runs[hi]["keys_per_sec"],
        f"bw_gbps_{lo}": runs[lo].get("parallel_bw_gbps"),
        f"bw_gbps_{hi}": runs[hi].get("parallel_bw_gbps"),
        "pairwise_efficiencies": pairs,
        "scaling_efficiency": eff,
    }))


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        _scaling()
    elif "--scaling-worker" in sys.argv:
        print(json.dumps(_run_scaling_job(sf_dir, num_cpus)))
    else:
        print(json.dumps(_run_benchmarks(sf_dir, num_cpus)))
