"""Lazy ctypes loader for the optional compiled kernels (_native.c).

The sequential construction cascades (ribbon elimination/backsub, xorf
peeling, SBBF insert) are the kernels where pure NumPy is 30-100x off the
reference's compiled throughput (BASELINE.md kernel table).  When a C
compiler is present, _native.c is built ONCE per machine into a
content-addressed /tmp directory (sha256 of the source -> rebuilds
automatically whenever the source changes) and loaded via ctypes; every
caller keeps a pure-NumPy fallback, so environments without a compiler
lose only speed, never correctness.

Concurrency: many Ray workers may import this simultaneously -- each
compiles to a private temp name and os.replace()s it into place (atomic
on POSIX), so the worst case is a few redundant gcc runs, never a torn
.so.  Set RAYSKETCH_NATIVE=0 to force the NumPy paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_TRIED = False

_C_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_native.c")


def _build_and_load():
    with open(_C_SRC, "rb") as fh:
        src = fh.read()
    # the build recipe participates in the content address so a flag
    # change rebuilds (same source + new flags must not reuse the old .so)
    digest = hashlib.sha256(src + b"|flags:march-native-v1").hexdigest()[:16]
    lib_dir = os.path.join(tempfile.gettempdir(), f"raysketch-native-{digest}")
    lib_path = os.path.join(lib_dir, "libraysketch.so")
    if not os.path.exists(lib_path):
        os.makedirs(lib_dir, exist_ok=True)
        tmp = os.path.join(lib_dir, f".build-{os.getpid()}.so")
        # -march=native first: the .so is content-addressed PER MACHINE
        # (never shipped), and POPCNT/TZCNT/BMI make __builtin_parityll /
        # ctzll single instructions (the ribbon backsub/eliminate hot
        # ops compile to multi-op shift-xor sequences under the plain
        # x86-64 baseline).  Fall back to baseline flags for compilers /
        # targets that reject it.
        built = False
        for flags in (["-O3", "-march=native"], ["-O3"]):
            for cc in ("gcc", "cc", "clang"):
                try:
                    subprocess.run(
                        [cc, *flags, "-shared", "-fPIC", "-o", tmp,
                         _C_SRC],
                        check=True, capture_output=True, timeout=120)
                    os.replace(tmp, lib_path)
                    built = True
                    break
                except (OSError, subprocess.SubprocessError):
                    continue
            if built:
                break
        if not built:
            return None
    lib = ctypes.CDLL(lib_path)

    i64 = ctypes.c_int64
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_u64 = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    p_u32 = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.ribbon_build64.restype = ctypes.c_int
    lib.ribbon_build64.argtypes = [p_u64, i64, ctypes.c_uint64, i64,
                                   ctypes.c_int, ctypes.c_int,
                                   p_u64, p_u32]
    lib.ribbon_build128.restype = ctypes.c_int
    lib.ribbon_build128.argtypes = [p_u64, i64, ctypes.c_uint64, i64,
                                    ctypes.c_int, p_u64, p_u32]
    lib.ribbon_backsub64.restype = None
    lib.ribbon_backsub64.argtypes = [i64, p_u64, p_u64, ctypes.c_int, p_u32]
    lib.ribbon_backsub128.restype = None
    lib.ribbon_backsub128.argtypes = [i64, p_u64, p_u64, p_u64,
                                      ctypes.c_int, p_u32]
    lib.sbbf_insert.restype = None
    lib.sbbf_insert.argtypes = [p_u64, i64, p_u64, i64]
    lib.sbbf_check.restype = None
    lib.sbbf_check.argtypes = [p_u64, i64, p_u64, i64, p_u8]
    lib.gxh64_bytes.restype = None
    lib.gxh64_bytes.argtypes = [p_i64, p_u8, i64, ctypes.c_uint64, p_u64]
    lib.xxh3_64_bytes.restype = None
    lib.xxh3_64_bytes.argtypes = [p_i64, p_u8, i64, ctypes.c_uint64, p_u64]
    lib.xorf_check.restype = None
    lib.xorf_check.argtypes = [p_u64, i64, ctypes.c_uint64,
                               ctypes.c_uint32, ctypes.c_uint32,
                               ctypes.c_int, ctypes.c_int,
                               ctypes.c_void_p, p_u8]
    lib.ribbon_check.restype = None
    lib.ribbon_check.argtypes = [p_u64, i64, ctypes.c_uint64,
                                 ctypes.c_int, ctypes.c_int,
                                 ctypes.c_void_p, i64, p_u8]
    p_u16 = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    lib.md5_u16_bytes.restype = None
    lib.md5_u16_bytes.argtypes = [p_i64, p_u8, i64, p_u16]
    lib.md5_u64_bytes.restype = None
    lib.md5_u64_bytes.argtypes = [p_i64, p_u8, i64, p_u64]
    lib.xorf_build.restype = ctypes.c_int
    lib.xorf_build.argtypes = [p_u64, i64, ctypes.c_int, ctypes.c_int,
                               ctypes.c_uint32, ctypes.c_uint64, i64,
                               ctypes.c_uint64, ctypes.c_int,
                               p_u64, p_u32, p_u64, p_u8, p_u32,
                               ctypes.POINTER(ctypes.c_uint64)]
    return lib


def get_lib():
    """The loaded native library, or None (no compiler / disabled)."""
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        if os.environ.get("RAYSKETCH_NATIVE", "1") != "0":
            try:
                _LIB = _build_and_load()
            except Exception:   # noqa: BLE001 -- any failure => NumPy path
                _LIB = None
    return _LIB
