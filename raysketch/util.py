"""Small shared helpers."""

from __future__ import annotations


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
