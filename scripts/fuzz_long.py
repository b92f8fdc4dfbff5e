#!/usr/bin/env python
"""Long-budget fuzz run -- the repo's analogue of the reference's
continuous coverage-guided fuzzing (`zig build test --fuzz`,
/root/reference/build.zig:48-62).

Runs the three hypothesis suites (byte-framing fuzz over hash->build->
probe for all 17 filter configs, merge/partitioning property tests,
packed-exchange blob codec round-trips) with every example budget
multiplied by --scale (default 50x => ~1500-2500 examples per property
instead of the CI-bounded 15-50).  Pure-kernel: no Ray session is
started unless a selected test requests one.

Usage:
    python scripts/fuzz_long.py [--scale K] [pytest args...]
"""

from __future__ import annotations

import os
import subprocess
import sys

SUITES = [
    "tests/test_fuzz_framing.py",
    "tests/test_property.py",
    "tests/test_pack_codecs.py",
]


def main() -> int:
    args = sys.argv[1:]
    scale = "50"
    if "--scale" in args:
        i = args.index("--scale")
        scale = args[i + 1]
        del args[i:i + 2]
    env = dict(os.environ, RAYSKETCH_FUZZ_SCALE=scale)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable, "-m", "pytest", "-q", *SUITES, *args]
    print(f"fuzz_long: scale={scale}x over {len(SUITES)} suites")
    return subprocess.call(cmd, env=env, cwd=repo)


if __name__ == "__main__":
    raise SystemExit(main())
