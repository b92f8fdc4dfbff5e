"""Env-scalable hypothesis budgets for the fuzz/property suites.

The reference runs continuous coverage-guided fuzzing (`zig build test
--fuzz`, /root/reference/build.zig:48-62) with an open-ended compute
budget; CI-bounded hypothesis runs are the equivalent in spirit but
weaker in budget.  `fuzz_settings(n)` keeps the default CI budget at
`n` examples while letting a long-budget run (scripts/fuzz_long.py, or
any `RAYSKETCH_FUZZ_SCALE=K pytest ...` invocation) multiply every
suite's example count uniformly without touching the tests.
"""

from __future__ import annotations

import os

from hypothesis import settings


def _scale() -> int:
    try:
        return max(1, int(os.environ.get("RAYSKETCH_FUZZ_SCALE", "1")))
    except ValueError:
        return 1


def fuzz_settings(max_examples: int, **kw):
    """`@settings(max_examples=n*RAYSKETCH_FUZZ_SCALE, deadline=None)`."""
    kw.setdefault("deadline", None)
    return settings(max_examples=max_examples * _scale(), **kw)
