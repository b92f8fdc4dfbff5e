"""Ribbon filter (banded GF(2) system + smash) -- holistic per-partition.

Semantics re-derived from /root/reference/src/ribbon.zig (paper:
arXiv:2103.02515).  Start position with "smash" clamping at
src/ribbon.zig:9-17; coefficient rows at src/ribbon.zig:22-35 (constants
coeff_factor0/1 at :19-20); result rows at :46-49; incremental banded Gaussian
elimination with space-multiplier sweep 103%..140%, 3 seed tries each, at
src/ribbon.zig:51-139 (SplitMix64 chain from initial seed 12,
src/ribbon.zig:208); probe at src/ribbon.zig:141-192.

NOT a port: back-substitution uses the closed form derived from the
reference's per-bit-column shift-register recurrence:

    sol[i] = rr[i] ^ XOR_{k in 1..W-1, coeff[i] bit k set} sol[i+k]

(sol rows past the end are zero, matching the zero-initialized `state` at
src/ribbon.zig:112-113), and the probe is fully vectorized NumPy.  The
insertion cascade is inherently sequential: with a C compiler present the
whole per-seed attempt (derivation + packed-cell cascade + backsub) runs
as ONE fused native call (_native.c:ribbon_build64/128, see
_build_native); without one, a round-parallel NumPy elimination plus a
lane-packed backsub take over.  Partitions build in parallel as Ray
tasks either way.

Supported: coeff_bits in {32, 64, 128}; result_bits in {8, 16, 32}
(byte-aligned widths only; the reference's sub-byte ResultRows store one
result per integer anyway, src/ribbon.zig:108-131 -- we keep the aligned
subset and document the exclusion).
"""

from __future__ import annotations

import numpy as np

from ..hashing import U64, murmur64a_u64, splitmix64
from .base import Sketch, pack, unpack, register

_COEFF_F0 = 0x876F170BE4F1FCB9  # src/ribbon.zig:19
_COEFF_F1 = 0xF0433A4AECDA4C5F  # src/ribbon.zig:20
_MIN_MULT = 103                 # src/ribbon.zig:52
_MAX_MULT = 140                 # src/ribbon.zig:53
_NUM_TRIES = 3                  # src/ribbon.zig:67
_INIT_SEED = 12                 # src/ribbon.zig:208

_RES_DTYPES = {8: np.uint8, 16: np.uint16, 32: np.uint32}
_M64 = 0xFFFFFFFFFFFFFFFF


def _calc_size(num_hashes: int, multiplier: int, coeff_bits: int) -> int:
    """src/ribbon.zig:37-39."""
    return (num_hashes * multiplier + 99) // 100 + coeff_bits - 1


def _start_pos_np(seed: int, n: int, hashes: np.ndarray,
                  coeff_bits: int) -> np.ndarray:
    """Vectorized src/ribbon.zig:9-17 (n = start_range)."""
    w = coeff_bits // 8
    hash0 = np.asarray(hashes, dtype=U64) ^ U64(seed)
    h32 = (hash0 ^ (hash0 >> U64(32))) & U64(0xFFFFFFFF)
    with np.errstate(over="ignore"):
        smash = (U64(n + 2 * w) * h32) >> U64(32)
    pos = np.where(smash >= U64(w), smash - U64(w), U64(0))
    return np.minimum(pos, U64(max(n - 1, 0))).astype(np.int64)


def _coeff_rows_np(seed: int, hashes: np.ndarray, coeff_bits: int):
    """Vectorized src/ribbon.zig:22-35 -> (lo: u64[n], hi: u64[n] | None).

    Callers pass the seed-REMIXED hash (see _remix below), so the
    reference's exact formulas apply to a well-mixed value."""
    h = np.asarray(hashes, dtype=U64)
    s = U64(seed)
    if coeff_bits == 64:
        return (s ^ h) | U64(1), None
    if coeff_bits == 32:
        return ((s ^ h) | U64(1)) & U64(0xFFFFFFFF), None
    if coeff_bits == 128:
        with np.errstate(over="ignore"):
            a = (s * U64(_COEFF_F0)) ^ h
            b = (s * U64(_COEFF_F1)) ^ _byteswap64(h)
        return b | U64(1), a
    raise ValueError("coeff_bits must be 32, 64 or 128")


def _byteswap64(h: np.ndarray) -> np.ndarray:
    return h.byteswap() if h.dtype == U64 else np.asarray(h, U64).byteswap()


def _result_rows_np(seed: int, hashes: np.ndarray, result_bits: int):
    """Vectorized src/ribbon.zig:46-49."""
    h = np.asarray(hashes, dtype=U64) ^ U64(seed)
    return ((h >> U64(32)) ^ h).astype(_RES_DTYPES[result_bits])


def _remix(hashes: np.ndarray, seed: int) -> np.ndarray:
    """Multiply-mix each hash with the construction seed (murmur64a
    finalizer) before deriving positions/coefficients/results.

    DELIBERATE deviation from the reference, which feeds the raw hash into
    `(seed ^ hash)`-style derivations (src/ribbon.zig:9-49) and relies on
    the caller having XxHash3-mixed the keys (src/bench.zig:10-14).  Two
    raw hashes differing only in low bits then share a start position at
    any size < 2^32 AND (for u32/u64) an identical coefficient row under
    EVERY seed (xor preserves the bit-0 difference, `| 1` erases it), so
    construction retries forever -- at 10^12 keys an (h, h^1) pair is
    expected (~n^2 * 2^-64).  Remixing with the seed folds the "inputs
    must be well-mixed" precondition into the kernel and makes seed
    retries genuinely decorrelate; probe applies the identical remix, so
    the zero-FN / FPR / space contracts are unchanged.  Found by a
    hypothesis property test on arbitrary u64 inputs."""
    return murmur64a_u64(np.asarray(hashes, dtype=U64), seed)


def _tz64(x: np.ndarray) -> np.ndarray:
    """Trailing-zero count of each NONZERO u64 (vectorized)."""
    from ..hashing import popcount64
    with np.errstate(over="ignore"):
        low = x & (~x + U64(1))          # lowest set bit
        return popcount64(low - U64(1))


def _eliminate_tail(pos, lo, hi, rr, c_lo, c_hi, res):
    """Sequential finish for the last few active keys: the round-parallel
    loop's fixed per-round numpy overhead dominates once the active set is
    tiny (measured ~1000 rounds of <1k keys at 1M inputs), so the tail
    runs the reference-style one-key cascade on Python ints instead."""
    two64 = hi is not None
    n = len(pos)
    lo_l, rr_l, pos_l = lo.tolist(), rr.tolist(), pos.tolist()
    hi_l = hi.tolist() if two64 else None
    for i in range(n):
        p = pos_l[i]
        cr = lo_l[i] | (hi_l[i] << 64) if two64 else lo_l[i]
        r = rr_l[i]
        while True:
            exist = int(c_lo[p]) | (int(c_hi[p]) << 64) if two64 \
                else int(c_lo[p])
            if exist == 0:
                c_lo[p] = cr & 0xFFFFFFFFFFFFFFFF
                if two64:
                    c_hi[p] = cr >> 64
                res[p] = r
                break
            cr ^= exist
            r ^= int(res[p])
            if cr == 0:
                if r == 0:
                    break          # duplicate key, consistent
                return False       # inconsistent
            tz = (cr & -cr).bit_length() - 1
            p += tz
            cr >>= tz
    return True


_TAIL_SWITCH = 4096


def _eliminate_np(pos, lo, hi, rr, size: int, coeff_bits: int):
    """Round-parallel banded GF(2) elimination (same reduction as the
    reference's one-key-at-a-time cascade, src/ribbon.zig:78-106, but each
    round advances EVERY still-active key one step, fully vectorized).

    Per round: claim one pivot candidate per EMPTY position with a scatter
    (first active key in array order wins -- O(active), no sort); every
    other key XORs with its position's (possibly just-written) row, drops
    if it reduced to zero (duplicate), fails the try if inconsistent, else
    shifts past its new trailing zeros.  Terminates because every
    surviving key strictly advances (cr is odd before the XOR with an odd
    stored row, so tz>=1).  Once the active set is small the sequential
    tail finishes the job (_eliminate_tail).

    Returns (coeff_lo, coeff_hi | None, result) or None on inconsistency.
    """
    c_lo = np.zeros(size, dtype=U64)
    c_hi = np.zeros(size, dtype=U64) if hi is not None else None
    res = np.zeros(size, dtype=U64)
    pos = pos.astype(np.int64)
    rr = rr.astype(U64)
    claim = np.full(size, -1, dtype=np.int64)
    while len(pos):
        if len(pos) <= _TAIL_SWITCH:
            ok = _eliminate_tail(pos, lo, hi, rr, c_lo, c_hi, res)
            return (c_lo, c_hi, res) if ok else None
        idx = np.arange(len(pos))
        claim[pos[::-1]] = idx[::-1]          # lowest array index wins
        win = (claim[pos] == idx) & (c_lo[pos] == 0)
        claim[pos] = -1                       # reset touched entries only
        wpos = pos[win]
        c_lo[wpos] = lo[win]
        res[wpos] = rr[win]
        if hi is not None:
            c_hi[wpos] = hi[win]
        rest = ~win
        pos, lo, rr = pos[rest], lo[rest], rr[rest]
        if hi is not None:
            hi = hi[rest]
        if not len(pos):
            break
        lo = lo ^ c_lo[pos]
        rr = rr ^ res[pos]
        if hi is not None:
            hi = hi ^ c_hi[pos]
        zero = (lo == 0) if hi is None else ((lo == 0) & (hi == 0))
        if bool(np.any(zero & (rr != 0))):
            return None                   # inconsistent -> retry next seed
        keep = ~zero                      # zero & rr==0: duplicate, drop
        pos, lo, rr = pos[keep], lo[keep], rr[keep]
        if hi is not None:
            hi = hi[keep]
        if not len(pos):
            break
        if hi is None:
            tz = _tz64(lo)
            lo = lo >> tz.astype(U64)
        else:
            lo_z = lo == 0
            tz = np.where(lo_z,
                          64 + _tz64(np.where(hi == 0, U64(1), hi)),
                          _tz64(np.where(lo_z, U64(1), lo)))
            big = tz >= 64
            sh = np.where(big, 0, tz).astype(U64)      # 1..63 (or 0 if big)
            inv = (U64(64) - sh) % U64(64)
            bsh = np.where(big, tz - 64, 0).astype(U64)
            new_lo = np.where(big, hi >> bsh, (lo >> sh) | (hi << inv))
            new_hi = np.where(big, U64(0), hi >> sh)
            lo, hi = new_lo, new_hi
        pos = pos + tz
    return c_lo, c_hi, res


def _backsub_packed(c_lo, c_hi, res, size: int, coeff_bits: int,
                    result_bits: int) -> np.ndarray:
    """Back-substitution with ALL result-bit shift registers packed into
    one wide Python int (one lane of 2*coeff_bits per result bit).

    Derived from the reference's per-bit-column shift registers
    (src/ribbon.zig:108-131): lane b holds state_b (sol bit b of the next
    coeff_bits-1 rows); the per-row parity of (coeff[i]>>1) & state_b for
    ALL b happens in one AND + log2(W) XOR-folds.  Lanes are 2W wide so
    cross-lane leakage from the folds lands >= W above the lane base and
    can never fold down to the parity bit (fold shifts sum to < W)."""
    lane = 2 * coeff_bits
    nb = result_bits
    repl = sum(1 << (lane * b) for b in range(nb))
    data_mask = (1 << (coeff_bits - 1)) - 1
    mask_rep = data_mask * repl
    folds = [w for w in (64, 32, 16, 8, 4, 2, 1) if w < coeff_bits]
    # spread tables, one per result byte: value -> bits fanned to lane bases
    spread = [[sum(((v >> j) & 1) << (lane * (8 * k + j)) for j in range(8))
               for v in range(256)] for k in range(nb // 8 or 1)]
    if c_hi is None:
        coeff = c_lo.tolist()
    else:
        coeff = [(int(a) << 64) | int(b)
                 for a, b in zip(c_hi.tolist(), c_lo.tolist())]
    result = res.tolist()
    state = 0
    bytes_per_row = lane * nb // 8
    buf = bytearray(size * bytes_per_row)
    mv = memoryview(buf)
    off = 0
    s0 = spread[0]
    s1 = spread[1] if nb > 8 else None
    for i in range(size - 1, -1, -1):
        a = (coeff[i] >> 1) * repl & state
        for w in folds:
            a ^= a >> w
        bits = a & repl
        rr = result[i]
        if rr:
            bits ^= s0[rr & 255] if s1 is None else \
                s0[rr & 255] | s1[(rr >> 8) & 255]
            if rr >> 16:                     # result_bits == 32
                bits ^= spread[2][(rr >> 16) & 255] | \
                    spread[3][(rr >> 24) & 255]
        mv[off:off + bytes_per_row] = bits.to_bytes(bytes_per_row, "little")
        off += bytes_per_row
        state = ((state << 1) & mask_rep) | bits
    flags = np.frombuffer(buf, dtype=np.uint8).reshape(size, bytes_per_row)
    flags = flags[:, ::lane // 8][:, :nb] & 1        # (size, nb), rows i desc
    sol = (flags.astype(np.uint32)
           << np.arange(nb, dtype=np.uint32)).sum(axis=1)
    return sol[::-1].astype(_RES_DTYPES[result_bits])


def _scratch(n_cells: int, n_sol: int):
    """Reused work buffers for the fused C build (band cells + u32
    solution) via the shared capped per-process scratch (util.scratch:
    first-touch-provisioning rationale and the retention-cliff cap)."""
    from ..util import scratch
    return (scratch("ribbon.cells", n_cells, U64),
            scratch("ribbon.sol", n_sol, np.uint32))


def _build_native(lib, hashes: np.ndarray, seed: int, size: int,
                  coeff_bits: int, result_bits: int):
    """Fused C construction attempt (_native.c:ribbon_build64/128):
    per-key derivation (seed remix, smash start position, coefficient
    and result rows -- the exact formulas _remix/_start_pos_np/
    _coeff_rows_np/_result_rows_np vectorize), the one-key-at-a-time
    banded elimination cascade, and shift-register back-substitution in
    ONE call per (seed, size) try.  The band's {coeff, result} pair is
    packed into one 16-byte (u64) / 32-byte (u128) cell so each
    data-dependent chase step touches one cache line instead of two,
    and derivation runs a few keys ahead so each key's start cell is
    prefetched.  Same success set as the NumPy round-parallel path
    (consistency is a rank property, independent of pivot order), so
    native and NumPy accept the SAME (multiplier, seed) and the seed
    schedule stays deterministic (pinned by tests/test_native.py).
    Returns the solution array or None on inconsistency."""
    hashes = np.ascontiguousarray(hashes, dtype=U64)
    if coeff_bits <= 64:
        cells, sol32 = _scratch(2 * size, size)
        ok = lib.ribbon_build64(hashes, len(hashes), seed, size,
                                coeff_bits, result_bits, cells, sol32)
    else:
        cells, sol32 = _scratch(4 * size, size)
        ok = lib.ribbon_build128(hashes, len(hashes), seed, size,
                                 result_bits, cells, sol32)
    return sol32.astype(_RES_DTYPES[result_bits]) if ok else None


def _backsub_native(lib, c_lo, c_hi, res, size: int, coeff_bits: int,
                    result_bits: int) -> np.ndarray:
    """C shift-register back-substitution; byte-identical to
    _backsub_packed on the same (c_lo, c_hi, res) -- pytest-verified."""
    sol32 = np.zeros(size, dtype=np.uint32)
    if coeff_bits <= 64:
        lib.ribbon_backsub64(size, np.ascontiguousarray(c_lo, U64),
                             np.ascontiguousarray(res, U64),
                             result_bits, sol32)
    else:
        lib.ribbon_backsub128(size, np.ascontiguousarray(c_lo, U64),
                              np.ascontiguousarray(c_hi, U64),
                              np.ascontiguousarray(res, U64),
                              result_bits, sol32)
    return sol32.astype(_RES_DTYPES[result_bits])


def _start_multiplier(n: int, coeff_bits: int) -> int:
    """Deterministic sweep entry point (documented deviation from the
    reference's fixed 103% start, src/ribbon.zig:52): for a 64-bit band
    the failure probability at minimal space grows with n, and measured
    first-success multipliers over the _INIT_SEED chain are 103 below
    ~25k keys, then 105/106/107 at 50k/100k/200k+ keys.  Entering the
    sweep at the measured level skips attempts that are (near-)certain to
    fail -- each costs a full elimination pass -- while the space the
    sweep ultimately picks is the same.  u128 bands succeed at 103
    through 1M keys and u32 is only used at small n, so both keep the
    reference entry point.  Purely a function of (n, coeff_bits):
    deterministic across workers and retries."""
    if coeff_bits != 64 or n < 25000:
        return _MIN_MULT
    return _MIN_MULT + min(4, int(np.log2(n / 25000.0)) + 1)


def construct(hashes: np.ndarray, coeff_bits: int, result_bits: int):
    """Banded elimination build. Returns (seed, solution ndarray).

    Fully vectorized: round-parallel elimination (_eliminate_np) +
    lane-packed back-substitution (_backsub_packed).  Any elimination
    order yields a valid filter: the stored pivot rows are linear
    combinations of the input rows, dropped rows reduced to zero
    consistently, so the back-substituted solution satisfies every input
    equation regardless of which key won each pivot."""
    from ..native import get_lib

    hashes = np.asarray(hashes, dtype=U64)
    n = len(hashes)
    next_seed = splitmix64(_INIT_SEED)
    start_mult = _start_multiplier(n, coeff_bits)
    lib = get_lib()

    for multiplier in range(_MIN_MULT, _MAX_MULT + 1):
        if multiplier < start_mult:
            # skip multipliers that are (near-)certain to fail at this n,
            # but CONSUME their seeds so every multiplier pairs with the
            # same seed as in the unskipped sweep -- the skip then cannot
            # change which (multiplier, seed) ultimately succeeds
            for _ in range(_NUM_TRIES):
                next_seed()
            continue
        size = _calc_size(n, multiplier, coeff_bits)
        start_range = size + 1 - coeff_bits
        for _ in range(_NUM_TRIES):
            seed = next_seed()
            if lib is not None:
                solution = _build_native(lib, hashes, seed, size,
                                         coeff_bits, result_bits)
                if solution is None:
                    continue
                return seed, solution
            mixed = _remix(hashes, seed)
            pos_arr = _start_pos_np(seed, start_range, mixed, coeff_bits)
            lo, hi = _coeff_rows_np(seed, mixed, coeff_bits)
            rr = _result_rows_np(seed, mixed, result_bits)
            elim = _eliminate_np(pos_arr, lo, hi, rr, size, coeff_bits)
            if elim is None:
                continue
            c_lo, c_hi, res = elim
            solution = _backsub_packed(c_lo, c_hi, res, size,
                                       coeff_bits, result_bits)
            return seed, solution

    raise RuntimeError(
        f"ribbon construction failed (n={n}, coeff_bits={coeff_bits})")


@register
class RibbonFilter(Sketch):
    kind = "ribbon"
    mergeable = False

    def __init__(self, seed: int, solution: np.ndarray, coeff_bits: int,
                 result_bits: int, num_keys: int = 0):
        self.seed = int(seed)
        self.solution = np.ascontiguousarray(solution)
        self.coeff_bits = int(coeff_bits)
        self.result_bits = int(result_bits)
        self.num_keys = int(num_keys)

    @classmethod
    def build(cls, hashes: np.ndarray, coeff_bits: int = 64,
              result_bits: int = 16,
              assume_unique: bool = False) -> "RibbonFilter":
        if assume_unique:  # caller already honored the sort+dedup contract
            hashes = np.asarray(hashes, dtype=U64)
        else:
            hashes = np.unique(np.asarray(hashes, dtype=U64))  # dedup contract
        if len(hashes) == 0:
            return cls(0, np.zeros(0, dtype=_RES_DTYPES[result_bits]),
                       coeff_bits, result_bits, 0)
        seed, sol = construct(hashes, coeff_bits, result_bits)
        return cls(seed, sol, coeff_bits, result_bits, num_keys=len(hashes))

    def check(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized probe -- semantics of src/ribbon.zig:141-192."""
        hashes = np.asarray(hashes, dtype=U64)
        nq = hashes.size
        if nq == 0:
            return np.zeros(0, dtype=bool)
        size = len(self.solution)
        if size == 0:
            return np.zeros(nq, dtype=bool)
        cb = self.coeff_bits
        from ..native import get_lib
        lib = get_lib()
        if lib is not None and size >= cb:
            # bit-identical C probe (tests/test_native.py); one call per
            # partition slice beats ~30 NumPy launches on small slices.
            # size >= cb makes every banded access in-range (the C fold
            # is branchless and does not bounds-check).
            h64 = np.ascontiguousarray(hashes)
            sol = np.ascontiguousarray(self.solution)
            out = np.empty(nq, dtype=np.uint8)
            lib.ribbon_check(h64, nq, int(self.seed), cb,
                             self.result_bits, sol.ctypes.data, size, out)
            return out.view(bool)
        start_range = size + 1 - cb
        mixed = _remix(hashes, self.seed)
        pos = _start_pos_np(self.seed, start_range, mixed, cb)
        lo, hi = _coeff_rows_np(self.seed, mixed, cb)
        expected = _result_rows_np(self.seed, mixed, self.result_bits)
        padded = np.concatenate(
            [self.solution, np.zeros(cb, dtype=self.solution.dtype)])
        window = padded[pos[:, None] + np.arange(cb)]
        rdt = self.solution.dtype.type
        halves = [(lo, 0)] if hi is None else [(lo, 0), (hi, 64)]
        acc = np.zeros(nq, dtype=self.solution.dtype)
        for half, base in halves:
            nbits = min(64, cb)
            shifts = np.arange(nbits, dtype=U64)
            bits = ((half[:, None] >> shifts[None, :]) & U64(1)) != 0
            sel = np.where(bits, window[:, base:base + nbits], rdt(0))
            acc = acc ^ np.bitwise_xor.reduce(sel, axis=1)
        return acc == expected

    #: hash-derivation version stamped into serialized payloads; bumped
    #: when the position/coefficient derivation changes so stale filters
    #: fail LOUDLY instead of silently returning false negatives
    DERIVATION = "remix1"

    def to_bytes(self) -> bytes:
        return pack(self.kind,
                    {"seed": self.seed, "coeff_bits": self.coeff_bits,
                     "result_bits": self.result_bits,
                     "num_keys": self.num_keys,
                     "derivation": self.DERIVATION},
                    {"solution": self.solution})

    @classmethod
    def from_bytes(cls, blob: bytes) -> "RibbonFilter":
        kind, meta, arrays = unpack(blob)
        assert kind == cls.kind
        return cls._from_parts(meta, arrays)

    @classmethod
    def _from_parts(cls, meta, arrays) -> "RibbonFilter":
        got = meta.get("derivation")
        if got != cls.DERIVATION:
            raise ValueError(
                f"ribbon payload uses hash derivation {got!r} but this "
                f"code probes with {cls.DERIVATION!r}; rebuild the filter "
                "(probing a stale payload would mass-produce false "
                "negatives)")
        # no copy: the solution is never mutated after construction, so a
        # decoded filter keeps the (possibly read-only, plasma-backed)
        # envelope view shared by every probing worker on the node
        return cls(meta["seed"], arrays["solution"],
                   meta["coeff_bits"], meta["result_bits"], meta["num_keys"])

    def mem_usage(self) -> int:
        return self.solution.size * self.result_bits // 8  # src/ribbon.zig:227-229

    def ideal_mem_usage(self) -> int:
        return self.num_keys * self.result_bits // 8  # src/ribbon.zig:231-233
