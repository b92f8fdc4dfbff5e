/* Optional compiled kernels for the sequential filter-construction
 * cascades (ribbon banded elimination + back-substitution, SBBF block
 * insert/check, xorf peeling) -- the three kernels BASELINE.md flags as
 * the pure-NumPy bottlenecks.  Compiled lazily by raysketch/native.py
 * with plain `gcc -O3 -shared -fPIC` and loaded via ctypes; every entry
 * point has a bit-compatible (or solution-equivalent, see ribbon notes)
 * NumPy fallback, and RAYSKETCH_NATIVE=0 disables this file entirely.
 *
 * Semantics mirror the NumPy kernels, which are themselves re-derived
 * from /root/reference/src/{ribbon,sbbf,xorf}.zig -- citations live in
 * the corresponding .py files.  No external dependencies: stdint only.
 */

#include <stddef.h>
#include <stdint.h>

typedef unsigned __int128 u128;

/* ---------------- ribbon: banded GF(2) elimination -------------------
 * One-key-at-a-time cascade (the reference's insertion loop,
 * src/ribbon.zig:78-106).  Inputs are the seed-remixed derivations
 * computed vectorized in NumPy (positions, coefficient rows, result
 * rows); this only runs the data-dependent sequential part.
 * Returns 1 on success, 0 on inconsistency (caller retries next seed).
 * Solutions may differ from the NumPy round-parallel elimination's
 * (different pivot choices) but satisfy the same equations; SUCCESS is
 * order-independent (rank property), so both paths accept the same
 * (seed, multiplier) and determinism of the seed schedule holds. */
int ribbon_eliminate64(int64_t n, const int64_t *pos, const uint64_t *lo,
                       const uint64_t *rr, uint64_t *c_lo, uint64_t *res)
{
    for (int64_t i = 0; i < n; i++) {
        int64_t p = pos[i];
        uint64_t cr = lo[i];
        uint64_t r = rr[i];
        for (;;) {
            uint64_t exist = c_lo[p];
            if (exist == 0) { c_lo[p] = cr; res[p] = r; break; }
            cr ^= exist;
            r ^= res[p];
            if (cr == 0) {
                if (r == 0) break;   /* duplicate row, consistent */
                return 0;            /* inconsistent -> retry seed */
            }
            int tz = __builtin_ctzll(cr);
            p += tz;
            cr >>= tz;
        }
    }
    return 1;
}

int ribbon_eliminate128(int64_t n, const int64_t *pos, const uint64_t *lo,
                        const uint64_t *hi, const uint64_t *rr,
                        uint64_t *c_lo, uint64_t *c_hi, uint64_t *res)
{
    for (int64_t i = 0; i < n; i++) {
        int64_t p = pos[i];
        u128 cr = ((u128)hi[i] << 64) | lo[i];
        uint64_t r = rr[i];
        for (;;) {
            u128 exist = ((u128)c_hi[p] << 64) | c_lo[p];
            if (exist == 0) {
                c_lo[p] = (uint64_t)cr;
                c_hi[p] = (uint64_t)(cr >> 64);
                res[p] = r;
                break;
            }
            cr ^= exist;
            r ^= res[p];
            if (cr == 0) {
                if (r == 0) break;
                return 0;
            }
            uint64_t lo64 = (uint64_t)cr;
            int tz = lo64 ? __builtin_ctzll(lo64)
                          : 64 + __builtin_ctzll((uint64_t)(cr >> 64));
            p += tz;
            cr >>= tz;
        }
    }
    return 1;
}

/* ---------------- ribbon: back-substitution ---------------------------
 * Per-result-bit shift registers (src/ribbon.zig:108-131): register b
 * bit j holds sol bit b of row i+1+j; row i's bit b is the parity of
 * (coeff[i]>>1) & state[b], XOR the stored result bit.  Registers
 * naturally drop bits past the band width on the left shift.  `sol` is
 * written as u32; callers truncate to the result dtype. */
void ribbon_backsub64(int64_t size, const uint64_t *c_lo,
                      const uint64_t *res, int result_bits, uint32_t *sol)
{
    uint64_t state[32] = {0};
    for (int64_t i = size - 1; i >= 0; i--) {
        uint64_t cr = c_lo[i] >> 1;
        uint32_t out = 0;
        for (int b = 0; b < result_bits; b++)
            out |= (uint32_t)__builtin_parityll(cr & state[b]) << b;
        out ^= (uint32_t)res[i];
        sol[i] = out;
        for (int b = 0; b < result_bits; b++)
            state[b] = (state[b] << 1) | ((out >> b) & 1u);
    }
}

void ribbon_backsub128(int64_t size, const uint64_t *c_lo,
                       const uint64_t *c_hi, const uint64_t *res,
                       int result_bits, uint32_t *sol)
{
    u128 state[32] = {0};
    for (int64_t i = size - 1; i >= 0; i--) {
        u128 cr = (((u128)c_hi[i] << 64) | c_lo[i]) >> 1;
        uint32_t out = 0;
        for (int b = 0; b < result_bits; b++) {
            u128 a = cr & state[b];
            out |= (uint32_t)__builtin_parityll(
                       (uint64_t)a ^ (uint64_t)(a >> 64)) << b;
        }
        out ^= (uint32_t)res[i];
        sol[i] = out;
        for (int b = 0; b < result_bits; b++)
            state[b] = (state[b] << 1) | ((out >> b) & 1u);
    }
}

/* ---------------- SBBF: block insert / check --------------------------
 * Parquet split-block blooms (src/sbbf.zig:28-80): block by
 * multiply-shift on low32, one bit per 64-bit lane from the 8 SALT
 * constants.  Bit-compatible with the NumPy insert()/check(). */
static const uint64_t SBBF_SALT[8] = {
    0x47B6137Bu, 0x44974D91u, 0x8824AD5Bu, 0xA2B7289Du,
    0x705495C7u, 0x2DF1424Bu, 0x9EFC4947u, 0x5C6BFB31u
};

void sbbf_insert(uint64_t *words, int64_t num_blocks, const uint64_t *h,
                 int64_t n)
{
    for (int64_t i = 0; i < n; i++) {
        uint64_t hh = h[i];
        uint64_t block =
            (((uint64_t)num_blocks * (hh & 0xFFFFFFFFull)) >> 32) * 8;
        for (int j = 0; j < 8; j++)
            words[block + j] |= 1ull << (((hh * SBBF_SALT[j]) >> 27) & 63);
    }
}

void sbbf_check(const uint64_t *words, int64_t num_blocks,
                const uint64_t *h, int64_t n, uint8_t *out)
{
    for (int64_t i = 0; i < n; i++) {
        uint64_t hh = h[i];
        uint64_t block =
            (((uint64_t)num_blocks * (hh & 0xFFFFFFFFull)) >> 32) * 8;
        uint8_t ok = 1;
        for (int j = 0; j < 8; j++) {
            uint64_t mask = 1ull << (((hh * SBBF_SALT[j]) >> 27) & 63);
            ok &= (uint8_t)((words[block + j] & mask) == mask);
        }
        out[i] = ok;
    }
}

/* ---------------- gxh64: string hash ---------------------------------
 * BIT-IDENTICAL to raysketch/hashing.py:_gxh64_bytes (kernel version
 * "gxh64-v2" -- envelope hashv stamps stay valid across the native and
 * NumPy paths).  Per row: acc = (seed ^ len*P1) + P4, then one mixing
 * round per 8 input bytes (little-endian word, zero-padded tail):
 * acc = rotl31(acc ^ w*P2)*P3 + P4, finished with the murmur-style
 * avalanche.  The NumPy kernel reads words via an explicit "<u8" view,
 * so on a big-endian host the memcpy load must be byte-swapped. */
static inline uint64_t rotl31(uint64_t x) { return (x << 31) | (x >> 33); }

void gxh64_bytes(const int64_t *offsets, const uint8_t *data, int64_t n,
                 uint64_t seed, uint64_t *out)
{
    const uint64_t P1 = 0x9E3779B185EBCA87ull, P2 = 0xC2B2AE3D27D4EB4Full,
                   P3 = 0x165667B19E3779F9ull, P4 = 0x27D4EB2F165667C5ull;
    for (int64_t i = 0; i < n; i++) {
        int64_t start = offsets[i], len = offsets[i + 1] - start;
        uint64_t acc = (seed ^ ((uint64_t)len * P1)) + P4;
        int64_t j = 0;
        for (; j + 8 <= len; j += 8) {
            uint64_t w;
            __builtin_memcpy(&w, data + start + j, 8);
#if defined(__BYTE_ORDER__) && __BYTE_ORDER__ == __ORDER_BIG_ENDIAN__
            w = __builtin_bswap64(w);
#endif
            acc ^= w * P2;
            acc = rotl31(acc) * P3 + P4;
        }
        if (j < len) {
            uint64_t w = 0;
            __builtin_memcpy(&w, data + start + j, (size_t)(len - j));
#if defined(__BYTE_ORDER__) && __BYTE_ORDER__ == __ORDER_BIG_ENDIAN__
            w = __builtin_bswap64(w);
#endif
            acc ^= w * P2;
            acc = rotl31(acc) * P3 + P4;
        }
        acc ^= acc >> 33; acc *= P2;
        acc ^= acc >> 29; acc *= P3;
        acc ^= acc >> 32;
        out[i] = acc;
    }
}

/* ---------------- membership checks ----------------------------------
 * Native probe kernels for xorf + ribbon (sbbf_check above).  The probe
 * stage splits each Arrow batch by filter partition, so the per-call key
 * count is small (batch/num_partitions); NumPy's fixed per-kernel-launch
 * cost dominates there (~30 launches per check), while one C call is
 * ~1 us.  Bit-identical to XorFilter.check / RibbonFilter.check. */

static inline uint64_t murmur64a_one(uint64_t h, uint64_t seed)
{
    /* MurmurHash64A of one u64 (hashing.py:murmur64a_u64) */
    const uint64_t M = 0xC6A4A7935BD1E995ull;
    uint64_t acc = seed ^ (8ull * M);
    uint64_t k = h * M;
    k ^= k >> 47; k *= M;
    acc ^= k; acc *= M;
    acc ^= acc >> 47; acc *= M;
    acc ^= acc >> 47;
    return acc;
}

void xorf_check(const uint64_t *hashes, int64_t n, uint64_t seed,
                uint32_t segment_length, uint32_t segment_count_length,
                int arity, int fp_bits, const void *fps, uint8_t *out)
{
    /* mirrors xorf.py:_make_subhashes (incl. the documented _HL_MIX
     * deviation) + _fingerprint + XorFilter.check */
    const uint64_t HL_MIX = 0xBF58476D1CE4E5B9ull;
    const uint32_t seg_mask = segment_length - 1u;
    const int rot_step = 64 / arity;
    const uint32_t fp_mask = fp_bits >= 32 ? 0xFFFFFFFFu
                                           : ((1u << fp_bits) - 1u);
    for (int64_t i = 0; i < n; i++) {
        uint64_t h = murmur64a_one(hashes[i], seed);
        uint64_t hmix = (h * HL_MIX) >> 32;
        uint32_t hl = (uint32_t)(((uint64_t)segment_count_length *
                                  (hmix & 0xFFFFFFFFull)) >> 32);
        uint32_t f = (uint32_t)(h ^ (h >> 32)) & fp_mask;
        for (int a = 0; a < arity; a++) {
            int rot = (a * rot_step) % 64;
            uint64_t rotated = rot ? ((h << rot) | (h >> (64 - rot))) : h;
            uint32_t p = (hl + (uint32_t)a * segment_length)
                         ^ ((uint32_t)rotated & seg_mask);
            if (fp_bits == 8)       f ^= ((const uint8_t *)fps)[p];
            else if (fp_bits == 16) f ^= ((const uint16_t *)fps)[p];
            else                    f ^= ((const uint32_t *)fps)[p];
        }
        out[i] = (uint8_t)(f == 0);
    }
}

/* Branchless banded XOR-fold: per-bit mask instead of a (random,
 * 50/50-mispredicted) branch per coefficient bit -- the mispredicts were
 * the whole cost at ~3.6M keys/s.  Callers guarantee size >= coeff_bits
 * (ribbon.py falls back to NumPy otherwise), which makes every access
 * pos+j < size in-range: pos <= start_range-1 = size-coeff_bits. */
#define RIBBON_FOLD(T)                                                  \
static inline uint32_t ribbon_fold_##T(const T *sol, uint64_t pos,      \
                                       uint64_t lo, uint64_t hi,        \
                                       int nbits, int use_hi)           \
{                                                                       \
    uint32_t acc = 0;                                                   \
    for (int j = 0; j < nbits; j++) {                                   \
        T m = (T)((T)0 - (T)((lo >> j) & 1ull));                        \
        acc ^= (uint32_t)(sol[pos + j] & m);                            \
    }                                                                   \
    if (use_hi)                                                         \
        for (int j = 0; j < 64; j++) {                                  \
            T m = (T)((T)0 - (T)((hi >> j) & 1ull));                    \
            acc ^= (uint32_t)(sol[pos + 64 + j] & m);                   \
        }                                                               \
    return acc;                                                         \
}
RIBBON_FOLD(uint8_t)
RIBBON_FOLD(uint16_t)
RIBBON_FOLD(uint32_t)

void ribbon_check(const uint64_t *hashes, int64_t n, uint64_t seed,
                  int coeff_bits, int result_bits, const void *sol,
                  int64_t size, uint8_t *out)
{
    /* mirrors RibbonFilter.check: _remix -> _start_pos_np ->
     * _coeff_rows_np -> banded dot-product vs _result_rows_np.
     * REQUIRES size >= coeff_bits (see RIBBON_FOLD). */
    const uint64_t F0 = 0x876F170BE4F1FCB9ull;  /* src/ribbon.zig:19 */
    const uint64_t F1 = 0xF0433A4AECDA4C5Full;  /* src/ribbon.zig:20 */
    const int64_t start_range = size + 1 - coeff_bits;
    const int w8 = coeff_bits / 8;
    const uint64_t maxpos = start_range > 0 ? (uint64_t)(start_range - 1)
                                            : 0;
    const uint32_t res_mask = result_bits >= 32 ? 0xFFFFFFFFu
                                                : ((1u << result_bits) - 1u);
    const int nbits = coeff_bits < 64 ? coeff_bits : 64;
    const int use_hi = coeff_bits == 128;
    for (int64_t i = 0; i < n; i++) {
        uint64_t mixed = murmur64a_one(hashes[i], seed);
        uint64_t hash0 = mixed ^ seed;
        uint64_t h32 = (hash0 ^ (hash0 >> 32)) & 0xFFFFFFFFull;
        uint64_t smash = ((uint64_t)(start_range + 2 * w8) * h32) >> 32;
        uint64_t pos = smash >= (uint64_t)w8 ? smash - (uint64_t)w8 : 0;
        if (pos > maxpos) pos = maxpos;
        uint64_t lo, hi = 0;
        if (coeff_bits == 64) {
            lo = (seed ^ mixed) | 1ull;
        } else if (coeff_bits == 32) {
            lo = ((seed ^ mixed) | 1ull) & 0xFFFFFFFFull;
        } else {
            hi = (seed * F0) ^ mixed;
            lo = ((seed * F1) ^ __builtin_bswap64(mixed)) | 1ull;
        }
        uint32_t expected = (uint32_t)((hash0 >> 32) ^ hash0) & res_mask;
        uint32_t acc;
        if (result_bits == 8)
            acc = ribbon_fold_uint8_t((const uint8_t *)sol, pos, lo, hi,
                                      nbits, use_hi);
        else if (result_bits == 16)
            acc = ribbon_fold_uint16_t((const uint16_t *)sol, pos, lo, hi,
                                       nbits, use_hi);
        else
            acc = ribbon_fold_uint32_t((const uint32_t *)sol, pos, lo, hi,
                                       nbits, use_hi);
        out[i] = (uint8_t)((acc & res_mask) == expected);
    }
}

/* ---------------- xorf: peeling construction ---------------------------
 * Queue-based peel (the reference's one-cell-at-a-time loop,
 * src/xorf.zig:111-220) over precomputed probe positions `sub`
 * ((n, arity) u32, row-major -- derived in NumPy with the documented
 * _HL_MIX deviation) and seeded hashes `h`.  On success writes the
 * fingerprint array (u32; caller truncates) and returns 1; returns 0
 * when the 2-core is non-empty (caller retries next seed).
 *
 * Scratch buffers are caller-allocated NumPy arrays:
 *   count:    u32[array_len]   (zeroed)
 *   xormask:  u64[array_len]   (zeroed -- XOR of unpeeled keys' h)
 *   cellmask: u64[array_len]   (zeroed -- XOR of unpeeled keys' row idx)
 *   stack_cell/stack_key: u32/u32[n] peel order
 * Peeling tracks the ROW INDEX of each key (via cellmask) so a peeled
 * key's arity positions are read back from `sub` without re-deriving
 * subhashes in C. */
int xorf_peel_solve(int64_t n, const uint64_t *h, const uint32_t *sub,
                    int arity, int64_t array_len, uint32_t *count,
                    uint64_t *xormask, uint64_t *rowmask,
                    uint32_t *stack_cell, uint32_t *stack_row,
                    int64_t *queue, uint32_t *fp_out, int fp_bits)
{
    for (int64_t i = 0; i < n; i++)
        for (int a = 0; a < arity; a++) {
            uint32_t c = sub[i * arity + a];
            count[c] += 1;
            xormask[c] ^= h[i];
            rowmask[c] ^= (uint64_t)i;
        }
    int64_t qh = 0, qt = 0;
    for (int64_t c = 0; c < array_len; c++)
        if (count[c] == 1) queue[qt++] = c;
    int64_t peeled = 0;
    while (qh < qt) {
        int64_t c = queue[qh++];
        if (count[c] != 1) continue;
        int64_t row = (int64_t)rowmask[c];
        uint64_t key = xormask[c];
        stack_cell[peeled] = (uint32_t)c;
        stack_row[peeled] = (uint32_t)row;
        peeled++;
        for (int a = 0; a < arity; a++) {
            uint32_t cc = sub[row * arity + a];
            count[cc] -= 1;
            xormask[cc] ^= key;
            rowmask[cc] ^= (uint64_t)row;
            if (count[cc] == 1) queue[qt++] = cc;
        }
    }
    if (peeled < n) return 0;
    /* reverse-order solve: fp[assign] = fingerprint ^ XOR(other cells) */
    uint32_t fp_mask = fp_bits >= 32 ? 0xFFFFFFFFu
                                     : ((1u << fp_bits) - 1u);
    for (int64_t s = peeled - 1; s >= 0; s--) {
        uint32_t c = stack_cell[s];
        int64_t row = (int64_t)stack_row[s];
        uint64_t hh = h[row];
        uint32_t f = (uint32_t)((hh ^ (hh >> 32))) & fp_mask;
        for (int a = 0; a < arity; a++) {
            uint32_t cc = sub[row * arity + a];
            if (cc != c) f ^= fp_out[cc];
        }
        fp_out[c] = f & fp_mask;
    }
    return 1;
}
