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
#include <stdlib.h>
#include <string.h>

typedef unsigned __int128 u128;

/* MurmurHash64A of one u64 with a seed (std.hash.Murmur2_64 semantics,
 * reference src/xorf.zig:7-9 `apply_seed`); also the ribbon seed remix
 * (_remix in sketches/ribbon.py).  Shared by the xorf and ribbon
 * builds below; parity with hashing.murmur64a_u64 is pinned by
 * tests/test_native.py. */
static inline uint64_t murmur64a_u64_scalar(uint64_t h, uint64_t seed)
{
    const uint64_t m = 0xC6A4A7935BD1E995ull;
    uint64_t acc = seed ^ (8ull * m);
    uint64_t k = h * m;
    k ^= k >> 47;
    k *= m;
    acc ^= k;
    acc *= m;
    acc ^= acc >> 47;
    acc *= m;
    acc ^= acc >> 47;
    return acc;
}

/* ---------------- ribbon: fused build ---------------------------------
 * The reference's whole construction (src/ribbon.zig:51-139) in one
 * call per (seed, size) attempt: per-key derivation (seed remix,
 * smash start position src/ribbon.zig:9-17, coefficient row :22-35,
 * result row :46-49 -- the same formulas the NumPy kernels in
 * sketches/ribbon.py vectorize, so the accepted-seed schedule is
 * bit-identical), the one-key-at-a-time banded elimination cascade
 * (:78-106), and shift-register back-substitution (:108-131).
 * Returns 1 on success, 0 on inconsistency (caller retries next seed).
 *
 * Layout: band cells pack {coefficient row, result row} into one
 * 16-byte (u64 band) / 32-byte (u128 band) cell so each data-dependent
 * chase step touches ONE cache line instead of two, and derivation
 * runs RIBBON_PF keys ahead of insertion so each key's first access
 * (its start position) is prefetched while earlier keys chase (the
 * chase steps themselves are data-dependent and cannot be).  cellbuf
 * is caller-allocated (2*size u64s for u64 bands, 4*size for u128).
 *
 * Solutions may differ from the NumPy round-parallel elimination's
 * (different pivot choices) but satisfy the same equations; SUCCESS is
 * order-independent (rank property), so both paths accept the same
 * (seed, multiplier) and determinism of the seed schedule holds
 * (pinned by tests/test_native.py). */
#define RIBBON_PF 12

typedef struct { uint64_t coeff; uint64_t res; } ribbon_cell64;
typedef struct { uint64_t lo; uint64_t hi;
                 uint64_t res; uint64_t pad; } ribbon_cell128;

/* coefficient-row multipliers for the u128 band, src/ribbon.zig:19-20 */
#define RIBBON_COEFF_F0 0x876F170BE4F1FCB9ull
#define RIBBON_COEFF_F1 0xF0433A4AECDA4C5Full

/* smash start position, src/ribbon.zig:9-17 (start_range = size + 1 -
 * coeff_bits; w = coeff_bits / 8) -- mirrors _start_pos_np */
static inline int64_t ribbon_start_pos(uint64_t mixed, uint64_t seed,
                                       int64_t start_range, int w)
{
    uint64_t h0 = mixed ^ seed;
    uint64_t h32 = (h0 ^ (h0 >> 32)) & 0xFFFFFFFFull;
    uint64_t smash = ((uint64_t)(start_range + 2 * w) * h32) >> 32;
    int64_t p = smash >= (uint64_t)w ? (int64_t)(smash - (uint64_t)w) : 0;
    int64_t mx = start_range - 1 > 0 ? start_range - 1 : 0;
    return p > mx ? mx : p;
}

/* shift-register back-substitution (src/ribbon.zig:108-131) over a
 * strided coefficient/result view, so the SAME recurrence serves both
 * the packed fused-build cells (stride 2/4) and the split arrays the
 * parity tests feed (stride 1); gcc specializes each inlined copy.
 * Register b bit j holds sol bit b of row i+1+j; row i's bit b is the
 * parity of (coeff[i]>>1) & state[b], XOR the stored result bit.  `sol`
 * is written as u32; callers truncate to the result dtype. */
static inline void ribbon_backsub64_strided(
    int64_t size, const uint64_t *coeff, int64_t cstride,
    const uint64_t *res, int64_t rstride, int result_bits, uint32_t *sol)
{
    uint64_t state[32] = {0};
    for (int64_t i = size - 1; i >= 0; i--) {
        uint64_t cr = coeff[i * cstride] >> 1;
        uint32_t out = 0;
        for (int b = 0; b < result_bits; b++)
            out |= (uint32_t)__builtin_parityll(cr & state[b]) << b;
        out ^= (uint32_t)res[i * rstride];
        sol[i] = out;
        for (int b = 0; b < result_bits; b++)
            state[b] = (state[b] << 1) | ((out >> b) & 1u);
    }
}

static inline void ribbon_backsub128_strided(
    int64_t size, const uint64_t *c_lo, const uint64_t *c_hi,
    int64_t cstride, const uint64_t *res, int64_t rstride,
    int result_bits, uint32_t *sol)
{
    u128 state[32] = {0};
    for (int64_t i = size - 1; i >= 0; i--) {
        u128 cr = (((u128)c_hi[i * cstride] << 64) | c_lo[i * cstride])
                  >> 1;
        uint32_t out = 0;
        for (int b = 0; b < result_bits; b++) {
            u128 a = cr & state[b];
            out |= (uint32_t)__builtin_parityll(
                       (uint64_t)a ^ (uint64_t)(a >> 64)) << b;
        }
        out ^= (uint32_t)res[i * rstride];
        sol[i] = out;
        for (int b = 0; b < result_bits; b++)
            state[b] = (state[b] << 1) | ((out >> b) & 1u);
    }
}

void ribbon_backsub64(int64_t size, const uint64_t *c_lo,
                      const uint64_t *res, int result_bits, uint32_t *sol)
{
    ribbon_backsub64_strided(size, c_lo, 1, res, 1, result_bits, sol);
}

void ribbon_backsub128(int64_t size, const uint64_t *c_lo,
                       const uint64_t *c_hi, const uint64_t *res,
                       int result_bits, uint32_t *sol)
{
    ribbon_backsub128_strided(size, c_lo, c_hi, 1, res, 1,
                              result_bits, sol);
}

/* coeff_bits is 32 or 64 (both use a u64 band word; the u32 row simply
 * has its high bits clear); hashes are the RAW u64 key hashes -- the
 * murmur64a seed remix (_remix in sketches/ribbon.py) happens here. */
int ribbon_build64(const uint64_t *hashes, int64_t n, uint64_t seed,
                   int64_t size, int coeff_bits, int result_bits,
                   uint64_t *cellbuf, uint32_t *sol)
{
    ribbon_cell64 *cells = (ribbon_cell64 *)cellbuf;
    memset(cells, 0, (size_t)size * sizeof(ribbon_cell64));
    int w = coeff_bits / 8;
    int64_t start_range = size + 1 - coeff_bits;
    uint64_t coeff_mask = coeff_bits >= 64 ? ~0ull
                                           : ((1ull << coeff_bits) - 1);
    uint64_t res_mask = result_bits >= 32
                            ? 0xFFFFFFFFull
                            : ((1ull << result_bits) - 1);
    int64_t ring_p[RIBBON_PF];
    uint64_t ring_c[RIBBON_PF], ring_r[RIBBON_PF];
    int64_t lead = n < RIBBON_PF ? n : RIBBON_PF;
    for (int64_t i = 0; i < lead; i++) {
        uint64_t mixed = murmur64a_u64_scalar(hashes[i], seed);
        ring_p[i] = ribbon_start_pos(mixed, seed, start_range, w);
        ring_c[i] = ((seed ^ mixed) | 1ull) & coeff_mask;
        uint64_t h0 = mixed ^ seed;
        ring_r[i] = ((h0 >> 32) ^ h0) & res_mask;
        __builtin_prefetch(&cells[ring_p[i]], 1, 1);
    }
    for (int64_t i = 0; i < n; i++) {
        int slot = (int)(i % RIBBON_PF);
        int64_t p = ring_p[slot];
        uint64_t cr = ring_c[slot];
        uint64_t r = ring_r[slot];
        int64_t nx = i + RIBBON_PF;
        if (nx < n) {
            uint64_t mixed = murmur64a_u64_scalar(hashes[nx], seed);
            ring_p[slot] = ribbon_start_pos(mixed, seed, start_range, w);
            ring_c[slot] = ((seed ^ mixed) | 1ull) & coeff_mask;
            uint64_t h0 = mixed ^ seed;
            ring_r[slot] = ((h0 >> 32) ^ h0) & res_mask;
            __builtin_prefetch(&cells[ring_p[slot]], 1, 1);
        }
        for (;;) {
            uint64_t exist = cells[p].coeff;
            if (exist == 0) {
                cells[p].coeff = cr;
                cells[p].res = r;
                break;
            }
            cr ^= exist;
            r ^= cells[p].res;
            if (cr == 0) {
                if (r == 0) break;   /* duplicate row, consistent */
                return 0;            /* inconsistent -> retry seed */
            }
            int tz = __builtin_ctzll(cr);
            p += tz;
            cr >>= tz;
        }
    }
    ribbon_backsub64_strided(size, &cells[0].coeff, 2, &cells[0].res, 2,
                             result_bits, sol);
    return 1;
}

int ribbon_build128(const uint64_t *hashes, int64_t n, uint64_t seed,
                    int64_t size, int result_bits,
                    uint64_t *cellbuf, uint32_t *sol)
{
    ribbon_cell128 *cells = (ribbon_cell128 *)cellbuf;
    memset(cells, 0, (size_t)size * sizeof(ribbon_cell128));
    int w = 16;
    int64_t start_range = size + 1 - 128;
    uint64_t res_mask = result_bits >= 32
                            ? 0xFFFFFFFFull
                            : ((1ull << result_bits) - 1);
    uint64_t f0 = seed * RIBBON_COEFF_F0;
    uint64_t f1 = seed * RIBBON_COEFF_F1;
    int64_t ring_p[RIBBON_PF];
    uint64_t ring_lo[RIBBON_PF], ring_hi[RIBBON_PF], ring_r[RIBBON_PF];
    int64_t lead = n < RIBBON_PF ? n : RIBBON_PF;
    for (int64_t i = 0; i < lead; i++) {
        uint64_t mixed = murmur64a_u64_scalar(hashes[i], seed);
        ring_p[i] = ribbon_start_pos(mixed, seed, start_range, w);
        ring_hi[i] = f0 ^ mixed;
        ring_lo[i] = (f1 ^ __builtin_bswap64(mixed)) | 1ull;
        uint64_t h0 = mixed ^ seed;
        ring_r[i] = ((h0 >> 32) ^ h0) & res_mask;
        __builtin_prefetch(&cells[ring_p[i]], 1, 1);
    }
    for (int64_t i = 0; i < n; i++) {
        int slot = (int)(i % RIBBON_PF);
        int64_t p = ring_p[slot];
        u128 cr = ((u128)ring_hi[slot] << 64) | ring_lo[slot];
        uint64_t r = ring_r[slot];
        int64_t nx = i + RIBBON_PF;
        if (nx < n) {
            uint64_t mixed = murmur64a_u64_scalar(hashes[nx], seed);
            ring_p[slot] = ribbon_start_pos(mixed, seed, start_range, w);
            ring_hi[slot] = f0 ^ mixed;
            ring_lo[slot] = (f1 ^ __builtin_bswap64(mixed)) | 1ull;
            uint64_t h0 = mixed ^ seed;
            ring_r[slot] = ((h0 >> 32) ^ h0) & res_mask;
            __builtin_prefetch(&cells[ring_p[slot]], 1, 1);
        }
        for (;;) {
            u128 exist = ((u128)cells[p].hi << 64) | cells[p].lo;
            if (exist == 0) {
                cells[p].lo = (uint64_t)cr;
                cells[p].hi = (uint64_t)(cr >> 64);
                cells[p].res = r;
                break;
            }
            cr ^= exist;
            r ^= cells[p].res;
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
    ribbon_backsub128_strided(size, &cells[0].lo, &cells[0].hi, 4,
                              &cells[0].res, 4, result_bits, sol);
    return 1;
}

/* ---------------- SBBF: block insert / check --------------------------
 * Parquet split-block blooms (src/sbbf.zig:28-80): block by
 * multiply-shift on low32, one bit per 64-bit lane from the 8 SALT
 * constants.  Bit-compatible with the NumPy insert()/check(). */
static const uint64_t SBBF_SALT[8] = {
    0x47B6137Bu, 0x44974D91u, 0x8824AD5Bu, 0xA2B7289Du,
    0x705495C7u, 0x2DF1424Bu, 0x9EFC4947u, 0x5C6BFB31u
};

/* Both loops software-pipeline the random block access: each key's
 * 64-byte block is prefetched SBBF_PF keys ahead so the (DRAM/L3) miss
 * overlaps the salt multiplies of preceding keys.  Bit-identity is
 * unaffected: inserts are commutative ORs and check is read-only. */
#define SBBF_PF 16

static inline uint64_t sbbf_block_of(uint64_t hh, int64_t num_blocks)
{
    return (((uint64_t)num_blocks * (hh & 0xFFFFFFFFull)) >> 32) * 8;
}

void sbbf_insert(uint64_t *words, int64_t num_blocks, const uint64_t *h,
                 int64_t n)
{
    for (int64_t i = 0; i < n; i++) {
        if (i + SBBF_PF < n)
            __builtin_prefetch(
                &words[sbbf_block_of(h[i + SBBF_PF], num_blocks)], 1, 1);
        uint64_t hh = h[i];
        uint64_t block = sbbf_block_of(hh, num_blocks);
        for (int j = 0; j < 8; j++)
            words[block + j] |= 1ull << (((hh * SBBF_SALT[j]) >> 27) & 63);
    }
}

void sbbf_check(const uint64_t *words, int64_t num_blocks,
                const uint64_t *h, int64_t n, uint8_t *out)
{
    for (int64_t i = 0; i < n; i++) {
        if (i + SBBF_PF < n)
            __builtin_prefetch(
                &words[sbbf_block_of(h[i + SBBF_PF], num_blocks)], 0, 1);
        uint64_t hh = h[i];
        uint64_t block = sbbf_block_of(hh, num_blocks);
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

/* u16/u32 folds process 4 (resp. 2) solution rows per unaligned u64
 * load with a carry-free SWAR mask: the multiplier places coefficient
 * bit k at lane boundary 16k (positions {j+15k'} are pairwise distinct
 * for j<4, so no carries), the AND keeps one bit per lane, and the
 * final multiply widens it to a full-lane mask.  XOR is associative,
 * so folding 64-bit lanes at the end is bit-identical to the scalar
 * row loop (probe parity incl. FP patterns pinned by
 * tests/test_native.py).  nbits is 32 or 64, always a multiple of the
 * lane count, and the band read stays inside [pos, pos+coeff_bits). */
static inline uint32_t ribbon_fold_uint16_t(const uint16_t *sol,
                                            uint64_t pos, uint64_t lo,
                                            uint64_t hi, int nbits,
                                            int use_hi)
{
    uint64_t acc = 0;
    const uint8_t *base = (const uint8_t *)(sol + pos);
    for (int k = 0; k < (nbits >> 2); k++) {
        uint64_t w;
        memcpy(&w, base + 8 * k, 8);
        uint64_t b = (lo >> (4 * k)) & 0xFull;
        uint64_t m = ((b * 0x0000200040008001ull)
                      & 0x0001000100010001ull) * 0xFFFFull;
        acc ^= w & m;
    }
    if (use_hi) {
        const uint8_t *b2 = (const uint8_t *)(sol + pos + 64);
        for (int k = 0; k < 16; k++) {
            uint64_t w;
            memcpy(&w, b2 + 8 * k, 8);
            uint64_t b = (hi >> (4 * k)) & 0xFull;
            uint64_t m = ((b * 0x0000200040008001ull)
                          & 0x0001000100010001ull) * 0xFFFFull;
            acc ^= w & m;
        }
    }
    acc ^= acc >> 32;
    acc ^= acc >> 16;
    return (uint32_t)(acc & 0xFFFFull);
}

static inline uint32_t ribbon_fold_uint32_t(const uint32_t *sol,
                                            uint64_t pos, uint64_t lo,
                                            uint64_t hi, int nbits,
                                            int use_hi)
{
    uint64_t acc = 0;
    const uint8_t *base = (const uint8_t *)(sol + pos);
    for (int k = 0; k < (nbits >> 1); k++) {
        uint64_t w;
        memcpy(&w, base + 8 * k, 8);
        uint64_t b = (lo >> (2 * k)) & 0x3ull;
        uint64_t m = ((b * 0x0000000080000001ull)
                      & 0x0000000100000001ull) * 0xFFFFFFFFull;
        acc ^= w & m;
    }
    if (use_hi) {
        const uint8_t *b2 = (const uint8_t *)(sol + pos + 64);
        for (int k = 0; k < 32; k++) {
            uint64_t w;
            memcpy(&w, b2 + 8 * k, 8);
            uint64_t b = (hi >> (2 * k)) & 0x3ull;
            uint64_t m = ((b * 0x0000000080000001ull)
                          & 0x0000000100000001ull) * 0xFFFFFFFFull;
            acc ^= w & m;
        }
    }
    acc ^= acc >> 32;
    return (uint32_t)acc;
}

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
/* ---------------- XXH3-64: byte-compatible string hash ----------------
 * Scalar XXH3_64bits_withSeed from the published xxHash specification
 * (same algorithm raysketch/xxh3.py implements in NumPy, validated
 * against the 11 published sanity vectors) -- the reference engine's
 * cross-engine determinism anchor (src/bench.zig:10-14, XxHash3 seed 0).
 * BIT-IDENTICAL to xxh3.py:xxh3_64; parity pinned by tests/test_native.py.
 * Stays scalar-C (no SIMD intrinsics) for portability; -O3 autovectorizes
 * the accumulate loop well enough (BASELINE.md kernel table). */

static const uint8_t XXH3_KSECRET[192] = {
    0xb8, 0xfe, 0x6c, 0x39, 0x23, 0xa4, 0x4b, 0xbe, 0x7c, 0x01, 0x81, 0x2c,
    0xf7, 0x21, 0xad, 0x1c, 0xde, 0xd4, 0x6d, 0xe9, 0x83, 0x90, 0x97, 0xdb,
    0x72, 0x40, 0xa4, 0xa4, 0xb7, 0xb3, 0x67, 0x1f, 0xcb, 0x79, 0xe6, 0x4e,
    0xcc, 0xc0, 0xe5, 0x78, 0x82, 0x5a, 0xd0, 0x7d, 0xcc, 0xff, 0x72, 0x21,
    0xb8, 0x08, 0x46, 0x74, 0xf7, 0x43, 0x24, 0x8e, 0xe0, 0x35, 0x90, 0xe6,
    0x81, 0x3a, 0x26, 0x4c, 0x3c, 0x28, 0x52, 0xbb, 0x91, 0xc3, 0x00, 0xcb,
    0x88, 0xd0, 0x65, 0x8b, 0x1b, 0x53, 0x2e, 0xa3, 0x71, 0x64, 0x48, 0x97,
    0xa2, 0x0d, 0xf9, 0x4e, 0x38, 0x19, 0xef, 0x46, 0xa9, 0xde, 0xac, 0xd8,
    0xa8, 0xfa, 0x76, 0x3f, 0xe3, 0x9c, 0x34, 0x3f, 0xf9, 0xdc, 0xbb, 0xc7,
    0xc7, 0x0b, 0x4f, 0x1d, 0x8a, 0x51, 0xe0, 0x4b, 0xcd, 0xb4, 0x59, 0x31,
    0xc8, 0x9f, 0x7e, 0xc9, 0xd9, 0x78, 0x73, 0x64, 0xea, 0xc5, 0xac, 0x83,
    0x34, 0xd3, 0xeb, 0xc3, 0xc5, 0x81, 0xa0, 0xff, 0xfa, 0x13, 0x63, 0xeb,
    0x17, 0x0d, 0xdd, 0x51, 0xb7, 0xf0, 0xda, 0x49, 0xd3, 0x16, 0x55, 0x26,
    0x29, 0xd4, 0x68, 0x9e, 0x2b, 0x16, 0xbe, 0x58, 0x7d, 0x47, 0xa1, 0xfc,
    0x8f, 0xf8, 0xb8, 0xd1, 0x7a, 0xd0, 0x31, 0xce, 0x45, 0xcb, 0x3a, 0x8f,
    0x95, 0x16, 0x04, 0x28, 0xaf, 0xd7, 0xfb, 0xca, 0xbb, 0x4b, 0x40, 0x7e,
};

#define XXH_P64_1 0x9E3779B185EBCA87ull
#define XXH_P64_2 0xC2B2AE3D27D4EB4Full
#define XXH_P64_3 0x165667B19E3779F9ull
#define XXH_P32_1 0x9E3779B1ull
#define XXH_PMX1  0x165667919E3779F9ull
#define XXH_PMX2  0x9FB21C651E98DF25ull

static inline uint64_t xxh_read64(const uint8_t *p)
{
    uint64_t w;
    __builtin_memcpy(&w, p, 8);
#if defined(__BYTE_ORDER__) && __BYTE_ORDER__ == __ORDER_BIG_ENDIAN__
    w = __builtin_bswap64(w);
#endif
    return w;
}

static inline uint64_t xxh_read32(const uint8_t *p)
{
    uint32_t w;
    __builtin_memcpy(&w, p, 4);
#if defined(__BYTE_ORDER__) && __BYTE_ORDER__ == __ORDER_BIG_ENDIAN__
    w = __builtin_bswap32(w);
#endif
    return (uint64_t)w;
}

static inline uint64_t xxh_rotl64(uint64_t x, int r)
{
    return (x << r) | (x >> (64 - r));
}

static inline uint64_t xxh_mul128_fold64(uint64_t a, uint64_t b)
{
    u128 p = (u128)a * b;
    return (uint64_t)p ^ (uint64_t)(p >> 64);
}

static inline uint64_t xxh64_avalanche(uint64_t h)
{
    h ^= h >> 33; h *= XXH_P64_2;
    h ^= h >> 29; h *= XXH_P64_3;
    h ^= h >> 32;
    return h;
}

static inline uint64_t xxh3_avalanche(uint64_t h)
{
    h ^= h >> 37; h *= XXH_PMX1; h ^= h >> 32;
    return h;
}

static inline uint64_t xxh3_rrmxmx(uint64_t h, uint64_t len)
{
    h ^= xxh_rotl64(h, 49) ^ xxh_rotl64(h, 24);
    h *= XXH_PMX2;
    h ^= (h >> 35) + len;
    h *= XXH_PMX2;
    h ^= h >> 28;
    return h;
}

static inline uint64_t xxh3_mix16(const uint8_t *in, const uint8_t *sec,
                                  uint64_t seed)
{
    return xxh_mul128_fold64(xxh_read64(in) ^ (xxh_read64(sec) + seed),
                             xxh_read64(in + 8)
                             ^ (xxh_read64(sec + 8) - seed));
}

#if defined(__AVX2__)
#include <immintrin.h>
/* AVX2 stripe accumulate -- the spec's lane math verbatim, 4 lanes per
 * 256-bit op: acc[i^1] += v is a 64-bit half-swap within each 128-bit
 * pair; acc[i] += low32(k)*high32(k) is mul_epu32 on k and k>>32.
 * Output is bit-identical to the scalar loop (pinned by the 11
 * published sanity vectors + NumPy parity in tests/test_native.py). */
static inline void xxh3_accumulate512(uint64_t *acc, const uint8_t *in,
                                      const uint8_t *sec)
{
    __m256i *xacc = (__m256i *)acc;
    for (int i = 0; i < 2; i++) {
        __m256i v = _mm256_loadu_si256((const __m256i *)(in + 32 * i));
        __m256i s = _mm256_loadu_si256((const __m256i *)(sec + 32 * i));
        __m256i k = _mm256_xor_si256(v, s);
        __m256i k_hi = _mm256_srli_epi64(k, 32);
        __m256i prod = _mm256_mul_epu32(k, k_hi);
        __m256i v_swap = _mm256_shuffle_epi32(v, _MM_SHUFFLE(1, 0, 3, 2));
        __m256i a = _mm256_loadu_si256(xacc + i);
        a = _mm256_add_epi64(a, v_swap);
        a = _mm256_add_epi64(a, prod);
        _mm256_storeu_si256(xacc + i, a);
    }
}

/* AVX2 scramble: acc = (acc ^ (acc >> 47) ^ secret) * PRIME32_1 */
static inline void xxh3_scramble256(uint64_t *acc, const uint8_t *sec)
{
    __m256i *xacc = (__m256i *)acc;
    const __m256i prime = _mm256_set1_epi32((int)0x9E3779B1u);
    for (int i = 0; i < 2; i++) {
        __m256i a = _mm256_loadu_si256(xacc + i);
        __m256i s = _mm256_loadu_si256((const __m256i *)(sec + 32 * i));
        a = _mm256_xor_si256(a, _mm256_srli_epi64(a, 47));
        a = _mm256_xor_si256(a, s);
        /* 64x32 multiply: lo32(a)*prime + ((hi32(a)*prime) << 32) */
        __m256i lo = _mm256_mul_epu32(a, prime);
        __m256i hi = _mm256_mul_epu32(_mm256_srli_epi64(a, 32), prime);
        a = _mm256_add_epi64(lo, _mm256_slli_epi64(hi, 32));
        _mm256_storeu_si256(xacc + i, a);
    }
}
#define XXH3_HAVE_SCRAMBLE_SIMD 1
#else
static inline void xxh3_accumulate512(uint64_t *acc, const uint8_t *in,
                                      const uint8_t *sec)
{
    for (int i = 0; i < 8; i++) {
        uint64_t v = xxh_read64(in + 8 * i);
        uint64_t k = v ^ xxh_read64(sec + 8 * i);
        acc[i ^ 1] += v;
        acc[i] += (k & 0xFFFFFFFFull) * (k >> 32);
    }
}
#endif

static uint64_t xxh3_long(const uint8_t *in, int64_t len,
                          const uint8_t *secret)
{
    uint64_t acc[8] = {
        0xC2B2AE3Dull,                 /* PRIME32_3 */
        XXH_P64_1, XXH_P64_2, XXH_P64_3,
        0x85EBCA77C2B2AE63ull,         /* PRIME64_4 */
        0x85EBCA77ull,                 /* PRIME32_2 */
        0x27D4EB2F165667C5ull,         /* PRIME64_5 */
        XXH_P32_1,                     /* PRIME32_1 */
    };
    const int64_t block_len = 1024;    /* 16 stripes * 64 B */
    int64_t nb_blocks = (len - 1) / block_len;
    for (int64_t b = 0; b < nb_blocks; b++) {
        for (int s = 0; s < 16; s++)
            xxh3_accumulate512(acc, in + b * block_len + s * 64,
                               secret + 8 * s);
#ifdef XXH3_HAVE_SCRAMBLE_SIMD
        xxh3_scramble256(acc, secret + 128);
#else
        for (int i = 0; i < 8; i++)
            acc[i] = (acc[i] ^ (acc[i] >> 47)
                      ^ xxh_read64(secret + 128 + 8 * i)) * XXH_P32_1;
#endif
    }
    int64_t nb_stripes = ((len - 1) - block_len * nb_blocks) / 64;
    for (int64_t s = 0; s < nb_stripes; s++)
        xxh3_accumulate512(acc, in + nb_blocks * block_len + s * 64,
                           secret + 8 * s);
    xxh3_accumulate512(acc, in + len - 64, secret + 121);
    uint64_t result = (uint64_t)len * XXH_P64_1;
    for (int i = 0; i < 4; i++)
        result += xxh_mul128_fold64(
            acc[2 * i] ^ xxh_read64(secret + 11 + 16 * i),
            acc[2 * i + 1] ^ xxh_read64(secret + 19 + 16 * i));
    return xxh3_avalanche(result);
}

static uint64_t xxh3_one(const uint8_t *in, int64_t len, uint64_t seed,
                         const uint8_t *long_secret)
{
    const uint8_t *sec = XXH3_KSECRET;
    if (len == 0)
        return xxh64_avalanche(seed ^ xxh_read64(sec + 56)
                               ^ xxh_read64(sec + 64));
    if (len <= 3) {
        uint64_t c1 = in[0], c2 = in[len >> 1], c3 = in[len - 1];
        uint64_t combined = (c1 << 16) | (c2 << 24) | c3
                            | ((uint64_t)len << 8);
        uint64_t bitflip = ((uint64_t)(uint32_t)(xxh_read32(sec)
                            ^ xxh_read32(sec + 4))) + seed;
        return xxh64_avalanche(combined ^ bitflip);
    }
    if (len <= 8) {
        uint64_t s32 = seed & 0xFFFFFFFFull;
        uint64_t swapped = ((s32 & 0xFFull) << 24)
                           | ((s32 & 0xFF00ull) << 8)
                           | ((s32 & 0xFF0000ull) >> 8) | (s32 >> 24);
        uint64_t seed2 = seed ^ (swapped << 32);
        uint64_t in1 = xxh_read32(in);
        uint64_t in2 = xxh_read32(in + len - 4);
        uint64_t input64 = in2 + (in1 << 32);
        uint64_t bitflip = (xxh_read64(sec + 8) ^ xxh_read64(sec + 16))
                           - seed2;
        return xxh3_rrmxmx(input64 ^ bitflip, (uint64_t)len);
    }
    if (len <= 16) {
        uint64_t bitflip1 = (xxh_read64(sec + 24) ^ xxh_read64(sec + 32))
                            + seed;
        uint64_t bitflip2 = (xxh_read64(sec + 40) ^ xxh_read64(sec + 48))
                            - seed;
        uint64_t lo = xxh_read64(in) ^ bitflip1;
        uint64_t hi = xxh_read64(in + len - 8) ^ bitflip2;
        uint64_t acc = (uint64_t)len + __builtin_bswap64(lo) + hi
                       + xxh_mul128_fold64(lo, hi);
        return xxh3_avalanche(acc);
    }
    if (len <= 128) {
        uint64_t acc = (uint64_t)len * XXH_P64_1;
        if (len > 32) {
            if (len > 64) {
                if (len > 96) {
                    acc += xxh3_mix16(in + 48, sec + 96, seed);
                    acc += xxh3_mix16(in + len - 64, sec + 112, seed);
                }
                acc += xxh3_mix16(in + 32, sec + 64, seed);
                acc += xxh3_mix16(in + len - 48, sec + 80, seed);
            }
            acc += xxh3_mix16(in + 16, sec + 32, seed);
            acc += xxh3_mix16(in + len - 32, sec + 48, seed);
        }
        acc += xxh3_mix16(in, sec, seed);
        acc += xxh3_mix16(in + len - 16, sec + 16, seed);
        return xxh3_avalanche(acc);
    }
    if (len <= 240) {
        uint64_t acc = (uint64_t)len * XXH_P64_1;
        for (int i = 0; i < 8; i++)
            acc += xxh3_mix16(in + 16 * i, sec + 16 * i, seed);
        acc = xxh3_avalanche(acc);
        int nb = (int)(len / 16);
        for (int i = 8; i < nb; i++)
            acc += xxh3_mix16(in + 16 * i, sec + 16 * (i - 8) + 3, seed);
        acc += xxh3_mix16(in + len - 16, sec + 136 - 17, seed);
        return xxh3_avalanche(acc);
    }
    return xxh3_long(in, len, long_secret);
}

void xxh3_64_bytes(const int64_t *offsets, const uint8_t *data, int64_t n,
                   uint64_t seed, uint64_t *out)
{
    uint8_t custom[192];
    const uint8_t *long_secret = XXH3_KSECRET;
    if (seed != 0) {
        /* initCustomSecret: per 16-byte pair, word0+seed, word1-seed;
         * only the long path (>240 B) consumes the custom secret */
        for (int i = 0; i < 12; i++) {
            uint64_t w0 = xxh_read64(XXH3_KSECRET + 16 * i) + seed;
            uint64_t w1 = xxh_read64(XXH3_KSECRET + 16 * i + 8) - seed;
            for (int b = 0; b < 8; b++) {
                custom[16 * i + b] = (uint8_t)(w0 >> (8 * b));
                custom[16 * i + 8 + b] = (uint8_t)(w1 >> (8 * b));
            }
        }
        long_secret = custom;
    }
    for (int64_t i = 0; i < n; i++)
        out[i] = xxh3_one(data + offsets[i], offsets[i + 1] - offsets[i],
                          seed, long_secret);
}

/* ---------------- xorf: full in-C retry build ----------------
 * Entire seed-retry loop (apply_seed -> subhash -> count -> LIFO stack
 * peel -> reverse solve) in one call, mirroring the reference's storage
 * discipline (src/xorf.zig:111-220): per cell only (xormask u64,
 * count u32); the peel stack stores (h, which-position u8) and
 * RECOMPUTES the arity probe positions from h on every visit (~10 ALU
 * ops) instead of materializing an (n x arity) position matrix -- the
 * old xorf_peel_solve shipped that matrix plus a rowmask through every
 * random-access update and was memory-bound at ~10 M keys/s.  Subhash
 * derivation keeps the documented _HL_MIX deviation (xorf.py
 * _make_subhashes) and the seed schedule is the same SplitMix64 stream,
 * so native and NumPy builds accept the SAME seed (pinned by
 * tests/test_native.py). */

static inline uint64_t sm64_next(uint64_t *state)
{
    *state += 0x9E3779B97F4A7C15ull;
    uint64_t z = *state;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
}

static inline void xorf_subhashes(uint64_t h, int arity,
                                  uint32_t segment_length,
                                  uint64_t segment_count_length,
                                  uint32_t *sub)
{
    uint64_t hmix = (h * 0xBF58476D1CE4E5B9ull) >> 32;
    uint32_t hl = (uint32_t)((segment_count_length
                              * (hmix & 0xFFFFFFFFull)) >> 32);
    uint32_t seg_mask = segment_length - 1;
    int shift = 64 / arity;
    for (int i = 0; i < arity; i++) {
        int rot = (i * shift) & 63;
        uint64_t rotated = rot ? ((h << rot) | (h >> (64 - rot))) : h;
        uint32_t r32 = (uint32_t)rotated;
        sub[i] = (hl + (uint32_t)i * segment_length) ^ (r32 & seg_mask);
    }
}

/* Returns number of seed attempts used (>=1) on success, 0 on failure
 * after max_attempts.  seed_out receives the accepted seed.  Work
 * buffers are caller-allocated and reused across attempts; cellbuf
 * u64[2*array_len] is carved into xormask u64[array_len] (first half)
 * + count u8[array_len] (start of the second half): split arrays make
 * the memset 9 bytes/cell instead of 16 and let the singleton scan
 * stream 1 byte/cell, while the chunked prefetch phases below hide the
 * extra line touch on the random accesses.  u8 counts can in principle
 * wrap at 256 keys per cell, but with murmur-mixed positions the
 * probability of any cell reaching 256 is astronomically small
 * (multinomial tail ~1e-400 at the 1M-key partition target; the
 * binary-fuse reference implementation makes the same call with a
 * 6-bit count).  queue u32[array_len + 1] -- the branchless FIFO push
 * below stores queue[qtail] unconditionally before advancing, and if
 * every cell ever becomes a singleton the final dead store lands one
 * slot past array_len -- stack_h u64[n], stack_hi u8[n],
 * fp_out u32[array_len]. */

/* Segment index of a key's probe window base: first half of
 * xorf_subhashes.  A key's arity positions land in segments
 * [bucket, bucket + arity) exactly (the per-position XOR offset only
 * perturbs bits BELOW the segment boundary), so counting-sorting keys
 * by this bucket makes the cell-update pass walk segments in ascending
 * order with a working set of `arity` segments -- the binary-fuse
 * paper's startPos bucketing (arXiv:2201.01174 sec 4; the reference's
 * Zig build inherits the same layout from src/xorf.zig:29-40). */
static inline uint32_t xorf_bucket(uint64_t h, uint64_t scl, int seg_shift)
{
    uint64_t hmix = (h * 0xBF58476D1CE4E5B9ull) >> 32;
    uint32_t hl = (uint32_t)((scl * (hmix & 0xFFFFFFFFull)) >> 32);
    return hl >> seg_shift;
}

/* The build body lives in an always_inline impl taking `arity` so the
 * two public entry arities compile as separate specializations: the
 * per-position loops fully unroll, which matters in the three
 * random-access hot loops below. */
__attribute__((always_inline))
static inline int xorf_build_impl(
    const uint64_t *hashes, int64_t n, const int arity, int fp_bits,
    uint32_t segment_length, uint64_t segment_count_length,
    int64_t array_len, uint64_t seed_root, int max_attempts,
    uint64_t *cellbuf, uint32_t *queue,
    uint64_t *stack_h, uint8_t *stack_hi,
    uint32_t *fp_out, uint64_t *seed_out)
{
    uint64_t *xormask = cellbuf;
    uint8_t *count = (uint8_t *)(cellbuf + array_len);
    uint64_t state = seed_root;
    uint32_t sub[4];
    uint32_t fp_mask = fp_bits >= 32 ? 0xFFFFFFFFu
                                     : ((1u << fp_bits) - 1u);
    /* counting-sort cursors, one per segment (a few hundred u32s) */
    int seg_shift = __builtin_ctz(segment_length);
    int64_t nbuckets = (int64_t)(segment_count_length >> seg_shift);
    if (nbuckets < 1) nbuckets = 1;
    uint32_t *cur = (uint32_t *)malloc((size_t)(nbuckets + 1) * 4);
    if (cur == NULL)
        return 0;  /* a few-KB malloc failing => let the caller retry/raise */
    for (int attempt = 1; attempt <= max_attempts; attempt++) {
        uint64_t seed = sm64_next(&state);
        /* Counting-sort the seeded hashes by probe-window segment into
         * stack_h (free until the peel stack starts), then run the cell
         * counting pass in ascending-segment order: the working set is
         * `arity` consecutive segments (L2-resident) instead of random
         * touches over the whole cell array.  Pass 1 stashes the seeded
         * hashes in the xormask half of cellbuf -- free until the
         * memset below -- so the scatter rereads them instead of
         * recomputing murmur. */
        memset(cur, 0, (size_t)(nbuckets + 1) * 4);
        uint64_t *htmp = xormask;          /* array_len u64 >= n */
        for (int64_t i = 0; i < n; i++) {
            uint64_t h = murmur64a_u64_scalar(hashes[i], seed);
            htmp[i] = h;
            cur[xorf_bucket(h, segment_count_length, seg_shift) + 1]++;
        }
        for (int64_t b = 1; b <= nbuckets; b++)
            cur[b] += cur[b - 1];
        uint64_t *hsorted = stack_h;
        for (int64_t i = 0; i < n; i++) {
            uint64_t h = htmp[i];
            hsorted[cur[xorf_bucket(h, segment_count_length,
                                    seg_shift)]++] = h;
        }
        memset(xormask, 0, (size_t)array_len * 8);
        memset(count, 0, (size_t)array_len);
        for (int64_t i = 0; i < n; i++) {
            uint64_t h = hsorted[i];
            xorf_subhashes(h, arity, segment_length,
                           segment_count_length, sub);
            for (int a = 0; a < arity; a++) {
                xormask[sub[a]] ^= h;
                count[sub[a]] += 1;
            }
        }
        int64_t queue_len = 0;
        for (int64_t c = 0; c < array_len; c++) {
            queue[queue_len] = (uint32_t)c;       /* branchless push */
            queue_len += (count[c] == 1);
        }
        /* Chunked two-phase peel.  The classic serial pop->derive->
         * update loop runs at ~30 M pops/s HERE regardless of cell-
         * array size -- it is bound by data-dependent branches (the
         * singleton push, the assignment-position compare), not cache
         * misses.  So: (a) every conditional in the hot path is a
         * cmov-style arithmetic update, and (b) the FIFO frontier is
         * processed in chunks of XORF_CH with a derive+prefetch phase
         * (independent iterations -> full memory-level parallelism;
         * this VM sustains 16+ concurrent misses at ~6 ns/access vs
         * 140 ns serial) followed by an apply phase.  Order-freedom:
         * count==1 means h is the ONLY unpeeled key touching c, so a
         * parked entry can only be invalidated by h itself peeling via
         * a sibling cell earlier in the chunk -- the apply-time
         * `count == 1` recheck drops exactly those, and peel success
         * stays a 2-core property of (seed, keys) alone (same accepted
         * seed as the NumPy path, pinned by tests/test_native.py). */
        enum { XORF_CH = 512 };
        struct { uint32_t c; uint64_t h; uint32_t sub[4]; }
            batch[XORF_CH];
        int64_t qhead = 0, qtail = queue_len, stack_len = 0;
        while (qhead < qtail) {
            int64_t take = qtail - qhead;
            if (take > XORF_CH) take = XORF_CH;
            int nb = 0;
            for (int64_t i = 0; i < take; i++) {
                uint32_t c = queue[qhead + i];
                int64_t nx = qhead + i + take;
                if (nx < qtail) {
                    __builtin_prefetch(&xormask[queue[nx]], 1, 1);
                    __builtin_prefetch(&count[queue[nx]], 1, 1);
                }
                int live = (count[c] == 1);
                uint64_t h = xormask[c];
                batch[nb].c = c;
                batch[nb].h = h;
                xorf_subhashes(h, arity, segment_length,
                               segment_count_length, batch[nb].sub);
                for (int a = 0; a < arity; a++) {
                    __builtin_prefetch(&xormask[batch[nb].sub[a]], 1, 1);
                    __builtin_prefetch(&count[batch[nb].sub[a]], 1, 1);
                }
                nb += live;   /* dead entries overwritten next iter */
            }
            qhead += take;
            for (int b = 0; b < nb; b++) {
                uint32_t c = batch[b].c;
                if (count[c] != 1) continue;  /* sibling peeled h */
                uint64_t h = batch[b].h;
                stack_h[stack_len] = h;
                uint32_t hi = 0;
                for (int a = 0; a < arity; a++) {
                    uint32_t s = batch[b].sub[a];
                    xormask[s] ^= h;
                    uint8_t cnt = count[s] - 1;
                    count[s] = cnt;
                    hi |= (uint32_t)a & (uint32_t)-(s == c);
                    queue[qtail] = s;
                    qtail += (cnt == 1);
                }
                stack_hi[stack_len] = (uint8_t)hi;
                stack_len++;
            }
        }
        if (stack_len < n) continue;
        memset(fp_out, 0, (size_t)array_len * 4);
        /* Back-substitution, same chunked shape: phase A derives
         * positions and prefetches fp_out lines (no value reads), the
         * apply phase runs in strict reverse-stack order so the
         * later-peeled-assignments-first invariant is untouched; the
         * assignment-position select is branchless masking. */
        {
            struct { uint32_t sub[4]; uint32_t hi; uint64_t h; }
                sb[XORF_CH];
            int64_t j = stack_len;
            while (j > 0) {
                int64_t take = j < XORF_CH ? j : XORF_CH;
                for (int64_t i = 0; i < take; i++) {
                    uint64_t h = stack_h[j - 1 - i];
                    sb[i].h = h;
                    sb[i].hi = stack_hi[j - 1 - i];
                    xorf_subhashes(h, arity, segment_length,
                                   segment_count_length, sb[i].sub);
                    for (int a = 0; a < arity; a++)
                        __builtin_prefetch(&fp_out[sb[i].sub[a]], 1, 1);
                }
                for (int64_t i = 0; i < take; i++) {
                    uint64_t h = sb[i].h;
                    uint32_t hi = sb[i].hi;
                    uint32_t f = (uint32_t)(h ^ (h >> 32)) & fp_mask;
                    for (int a = 0; a < arity; a++)
                        f ^= fp_out[sb[i].sub[a]]
                             & (uint32_t)-((uint32_t)a != hi);
                    fp_out[sb[i].sub[hi]] = f & fp_mask;
                }
                j -= take;
            }
        }
        *seed_out = seed;
        free(cur);
        return attempt;
    }
    free(cur);
    return 0;
}

int xorf_build(const uint64_t *hashes, int64_t n, int arity, int fp_bits,
               uint32_t segment_length, uint64_t segment_count_length,
               int64_t array_len, uint64_t seed_root, int max_attempts,
               uint64_t *cellbuf, uint32_t *queue,
               uint64_t *stack_h, uint8_t *stack_hi,
               uint32_t *fp_out, uint64_t *seed_out)
{
    if (arity == 3)
        return xorf_build_impl(hashes, n, 3, fp_bits, segment_length,
                               segment_count_length, array_len, seed_root,
                               max_attempts, cellbuf, queue, stack_h,
                               stack_hi, fp_out, seed_out);
    return xorf_build_impl(hashes, n, 4, fp_bits, segment_length,
                           segment_count_length, array_len, seed_root,
                           max_attempts, cellbuf, queue, stack_h,
                           stack_hi, fp_out, seed_out);
}

/* ---------------- MD5 (RFC 1321), first-2-digest-bytes batch ----------
 * Serves hash_sample(kernel="md5"): the cross-engine sampling selector
 * `('0x' || substr(md5(key), 1, 4))::INT` any SQL engine can reproduce.
 * MD5 is inherently per-string/sequential, so the win over the Python
 * hashlib loop is loop + allocation overhead (~10-20x on url-sized
 * keys), not vectorization.  out[i] = big-endian u16 of digest bytes
 * 0..1, i.e. exactly the DuckDB expression's value. */

static const uint32_t MD5_K[64] = {
    0xd76aa478u, 0xe8c7b756u, 0x242070dbu, 0xc1bdceeeu,
    0xf57c0fafu, 0x4787c62au, 0xa8304613u, 0xfd469501u,
    0x698098d8u, 0x8b44f7afu, 0xffff5bb1u, 0x895cd7beu,
    0x6b901122u, 0xfd987193u, 0xa679438eu, 0x49b40821u,
    0xf61e2562u, 0xc040b340u, 0x265e5a51u, 0xe9b6c7aau,
    0xd62f105du, 0x02441453u, 0xd8a1e681u, 0xe7d3fbc8u,
    0x21e1cde6u, 0xc33707d6u, 0xf4d50d87u, 0x455a14edu,
    0xa9e3e905u, 0xfcefa3f8u, 0x676f02d9u, 0x8d2a4c8au,
    0xfffa3942u, 0x8771f681u, 0x6d9d6122u, 0xfde5380cu,
    0xa4beea44u, 0x4bdecfa9u, 0xf6bb4b60u, 0xbebfbc70u,
    0x289b7ec6u, 0xeaa127fau, 0xd4ef3085u, 0x04881d05u,
    0xd9d4d039u, 0xe6db99e5u, 0x1fa27cf8u, 0xc4ac5665u,
    0xf4292244u, 0x432aff97u, 0xab9423a7u, 0xfc93a039u,
    0x655b59c3u, 0x8f0ccc92u, 0xffeff47du, 0x85845dd1u,
    0x6fa87e4fu, 0xfe2ce6e0u, 0xa3014314u, 0x4e0811a1u,
    0xf7537e82u, 0xbd3af235u, 0x2ad7d2bbu, 0xeb86d391u
};

static const uint8_t MD5_R[64] = {
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5,  9, 14, 20, 5,  9, 14, 20, 5,  9, 14, 20, 5,  9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21
};

static void md5_block(uint32_t st[4], const uint8_t *p)
{
    uint32_t M[16];
    for (int j = 0; j < 16; j++)
        M[j] = (uint32_t)p[4 * j] | ((uint32_t)p[4 * j + 1] << 8)
             | ((uint32_t)p[4 * j + 2] << 16)
             | ((uint32_t)p[4 * j + 3] << 24);
    uint32_t a = st[0], b = st[1], c = st[2], d = st[3];
    for (int i = 0; i < 64; i++) {
        uint32_t f;
        int g;
        if (i < 16)      { f = (b & c) | (~b & d); g = i; }
        else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) & 15; }
        else if (i < 48) { f = b ^ c ^ d;          g = (3 * i + 5) & 15; }
        else             { f = c ^ (b | ~d);       g = (7 * i) & 15; }
        uint32_t tmp = d;
        d = c;
        c = b;
        uint32_t x = a + f + MD5_K[i] + M[g];
        int r = MD5_R[i];
        b = b + ((x << r) | (x >> (32 - r)));
        a = tmp;
    }
    st[0] += a; st[1] += b; st[2] += c; st[3] += d;
}

static void md5_state(const uint8_t *msg, uint64_t len, uint32_t st[4])
{
    st[0] = 0x67452301u; st[1] = 0xefcdab89u;
    st[2] = 0x98badcfeu; st[3] = 0x10325476u;
    uint64_t k = 0;
    for (; k + 64 <= len; k += 64)
        md5_block(st, msg + k);
    uint8_t tail[128];
    uint64_t rem = len - k;
    if (rem)
        memcpy(tail, msg + k, rem);
    tail[rem] = 0x80;
    uint64_t padlen = rem < 56 ? 64 : 128;
    memset(tail + rem + 1, 0, (size_t)(padlen - rem - 1 - 8));
    uint64_t bits = len * 8;
    for (int j = 0; j < 8; j++)
        tail[padlen - 8 + j] = (uint8_t)(bits >> (8 * j));
    md5_block(st, tail);
    if (padlen == 128)
        md5_block(st, tail + 64);
}

void md5_u16_bytes(const int64_t *offsets, const uint8_t *data, int64_t n,
                   uint16_t *out)
{
    for (int64_t i = 0; i < n; i++) {
        uint32_t st[4];
        md5_state(data + offsets[i],
                  (uint64_t)(offsets[i + 1] - offsets[i]), st);
        /* digest[0..1] are the low two LE bytes of st[0]; the DuckDB
         * expression reads them as a big-endian u16 */
        out[i] = (uint16_t)(((st[0] & 0xFFu) << 8) | ((st[0] >> 8) & 0xFFu));
    }
}

/* Big-endian u64 of digest bytes 0..7 -- the value of the DuckDB
 * expression ('0x' || substr(md5(k), 1, 16))::UBIGINT.  digest[0..3]
 * are the LE bytes of st[0] and digest[4..7] the LE bytes of st[1],
 * so the BE read is (bswap32(st0) << 32) | bswap32(st1).  Serves
 * fingerprints(kernel="md5"): a content fingerprint any SQL engine
 * reproduces byte-for-byte. */
void md5_u64_bytes(const int64_t *offsets, const uint8_t *data, int64_t n,
                   uint64_t *out)
{
    for (int64_t i = 0; i < n; i++) {
        uint32_t st[4];
        md5_state(data + offsets[i],
                  (uint64_t)(offsets[i + 1] - offsets[i]), st);
        out[i] = ((uint64_t)__builtin_bswap32(st[0]) << 32)
               | (uint64_t)__builtin_bswap32(st[1]);
    }
}

