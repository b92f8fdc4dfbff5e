"""Small shared helpers."""

from __future__ import annotations

import math
import os

# A read below this compressed size gets an explicit block count; larger
# inputs keep Ray's own target_max_block_size-driven splitting.
_SMALL_READ_BYTES = 256 << 20
# ~4 MB compressed per block (~15-40 MB decoded) for small inputs.
_SMALL_BLOCK_BYTES = 4 << 20


def read_parquet_sized(path: str, *, columns=None,
                       min_rows_per_block: int = 2000, **kwargs):
    """`read_parquet` with the block count derived from file size.

    Ray Data's parallelism heuristic floors the block count of every read
    at ~2x the cluster CPU count, so a sub-MB parquet file is split into
    dozens of micro-blocks (observed: 78-row blocks at bench scale, 192
    blocks after a 3-way union) and every downstream stage then pays
    per-task dispatch overhead per micro-block -- a measured 7-12x wall
    slowdown on build/probe pipelines.  The opposite extreme is as bad: a
    handful of huge blocks starves all-to-all ops (a 3-block string
    groupby measured 22 s vs 2.5 s at 24 blocks).  For small files we
    override with blocks = clamp(ceil(size / 4 MB), cpus/4, rows/2000);
    big inputs (>= 256 MB, i.e. anything at real scale) are left entirely
    to Ray's size-based splitting, so this is a small-scale fix with no
    effect on cluster-scale reads."""
    import ray
    import ray.data as rd

    try:
        if os.path.isdir(path):
            size = sum(os.path.getsize(os.path.join(root, f))
                       for root, _, files in os.walk(path) for f in files)
        else:
            size = os.path.getsize(path)
    except OSError:
        size = _SMALL_READ_BYTES  # unknown (remote URI): defer to Ray
    if size < _SMALL_READ_BYTES:
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0)) or 8
        else:
            cpus = os.cpu_count() or 8
        nb = max(math.ceil(size / _SMALL_BLOCK_BYTES), max(1, cpus // 4))
        try:  # never exceed rows/min_rows_per_block (no empty micro-blocks)
            import pyarrow.parquet as pq
            if os.path.isdir(path):
                rows = sum(pq.ParquetFile(os.path.join(root, f)).metadata
                           .num_rows for root, _, files in os.walk(path)
                           for f in files if f.endswith(".parquet"))
            else:
                rows = pq.ParquetFile(path).metadata.num_rows
            nb = min(nb, max(1, rows // min_rows_per_block))
        except Exception:
            pass
        kwargs.setdefault("override_num_blocks", nb)
    return rd.read_parquet(path, columns=columns, **kwargs)


def pool(concurrency):
    """Actor-pool concurrency spec: int N -> autoscaling (1, N).

    A FIXED pool of N actors on an N-cpu cluster reserves every CPU slot at
    launch, so upstream task stages (read/union/map) can never run and the
    pipeline deadlocks (observed at num_cpus=4 with concurrency=4 over a
    union corpus).  An autoscaling (1, N) pool starts with one actor and
    grows only as CPUs free up -- same peak parallelism, no deadlock."""
    if isinstance(concurrency, int):
        return (1, concurrency) if concurrency > 1 else concurrency
    return concurrency


# ---------------------------------------------------------------------------
# Per-process scratch buffers for the native build kernels.
# ---------------------------------------------------------------------------

#: name -> retained buffer.  Fresh multi-MB allocations per build attempt
#: pay this host's SERIAL first-touch page provisioning (0.01-2 GB/s,
#: see CLAUDE.md "VM noise"; measured 0.62 s vs 0.026 s for one 200k-key
#: u128 ribbon attempt), so hot work buffers are retained and reused.
_SCRATCH: dict = {}

#: total retained bytes cap.  Retention has its OWN measured cliff on
#: this host: >= 3 retained ~40 MB sets per long-lived worker degrade
#: ALL subsequent compute in that worker ~10x (see the decoded-filter
#: cache note in pipeline.py, which retains up to 2 such sets).  Capping
#: build scratch at ~one set keeps worker retention at most ~3 sets even
#: when builds and multi-table probes share warm workers; above the cap
#: the buffer is simply not retained -- a big build amortizes its own
#: first-touch, the cliff does not.
_SCRATCH_CAP = 40 << 20


def scratch(name: str, size: int, dtype) -> "np.ndarray":
    """A C-contiguous work buffer of at least `size` elements, reused
    across calls when total retention stays under _SCRATCH_CAP.
    Contents are UNINITIALIZED either way -- callers must overwrite.
    Ray tasks are single-threaded per worker process, so no lock."""
    import numpy as np

    buf = _SCRATCH.get(name)
    dt = np.dtype(dtype)
    if buf is not None and buf.size >= size and buf.dtype == dt:
        _SCRATCH[name] = _SCRATCH.pop(name)   # mark most-recently-used
        return buf[:size]
    need = size * dt.itemsize
    _SCRATCH.pop(name, None)
    if need > _SCRATCH_CAP:
        # single buffer over the cliff: bail BEFORE evicting -- popping
        # every retained buffer just to then not retain this one would
        # reintroduce per-call first-touch provisioning for all of them
        return np.empty(size, dtype=dt)
    # Evict least-recently-used OTHER entries until the new buffer fits
    # under the retention cliff (insertion order == recency; see the
    # move-to-end above).  The old behavior -- permanently disabling
    # retention for the REQUESTING name on overflow -- meant a multi-
    # spec build where xorf retained first left ribbon paying the
    # serial first-touch provisioning cost on every seed attempt.
    while _SCRATCH and (sum(b.nbytes for b in _SCRATCH.values())
                        + need > _SCRATCH_CAP):
        _SCRATCH.pop(next(iter(_SCRATCH)))
    _SCRATCH[name] = np.empty(size, dtype=dt)
    return _SCRATCH[name]
