/* 8-way Goldilocks field arithmetic on AVX-512 (F+DQ), used by the native
 * host planes in svt_poseidon.c. Each __m512i holds 8 independent field
 * elements; semantics are bit-exact with the scalar helpers (canonical
 * representatives 0 <= r < p in, canonical out).
 *
 * Why: the scalar Poseidon permutation measures ~0.13 M perms/s/core on
 * this host — the x^7 sbox is a 3-mul dependency chain and the compiler
 * does not interleave enough across wires to hide the mulx latency.
 * Running 8 states per vector turns the latency chain into throughput.
 */
#ifndef GL_AVX512_H
#define GL_AVX512_H

#if defined(__AVX512F__) && defined(__AVX512DQ__)
#define GL_HAVE_AVX512 1
#include <immintrin.h>

#define V8 __m512i

static inline V8 v_set1(uint64_t x) { return _mm512_set1_epi64((long long)x); }

#define V_GL_P   v_set1(0xFFFFFFFF00000001ULL)
#define V_GL_EPS v_set1(0xFFFFFFFFULL)
#define V_M32    v_set1(0xFFFFFFFFULL)

/* canonical a + b mod p (at most one EPS correction, like gl_add) */
static inline V8 v_gl_add(V8 a, V8 b) {
    V8 s = _mm512_add_epi64(a, b);
    __mmask8 c = _mm512_cmplt_epu64_mask(s, a);
    s = _mm512_mask_add_epi64(s, c, s, V_GL_EPS);
    __mmask8 ge = _mm512_cmpge_epu64_mask(s, V_GL_P);
    s = _mm512_mask_sub_epi64(s, ge, s, V_GL_P);
    return s;
}

/* a - b mod p for any u64 representatives (mirrors gl_sub_any) */
static inline V8 v_gl_sub_any(V8 a, V8 b) {
    V8 d = _mm512_sub_epi64(a, b);
    __mmask8 bor = _mm512_cmplt_epu64_mask(a, b);
    d = _mm512_mask_sub_epi64(d, bor, d, V_GL_EPS);
    __mmask8 ge = _mm512_cmpge_epu64_mask(d, V_GL_P);
    d = _mm512_mask_sub_epi64(d, ge, d, V_GL_P);
    return d;
}

/* full 64x64 -> 128 product: returns low 64, writes high 64 to *hi.
 * Decomposition over 32-bit halves with vpmuludq (mirrors mul128). */
static inline V8 v_mul_wide(V8 a, V8 b, V8 *hi) {
    V8 aH = _mm512_srli_epi64(a, 32);
    V8 bH = _mm512_srli_epi64(b, 32);
    V8 ll = _mm512_mul_epu32(a, b);
    V8 lh = _mm512_mul_epu32(a, bH);
    V8 hl = _mm512_mul_epu32(aH, b);
    V8 hh = _mm512_mul_epu32(aH, bH);
    /* mid = (ll >> 32) + lo32(lh) + lo32(hl)  (< 2^34) */
    V8 mid = _mm512_add_epi64(
        _mm512_srli_epi64(ll, 32),
        _mm512_add_epi64(_mm512_and_epi64(lh, V_M32),
                         _mm512_and_epi64(hl, V_M32)));
    V8 lo = _mm512_or_epi64(_mm512_and_epi64(ll, V_M32),
                            _mm512_slli_epi64(mid, 32));
    *hi = _mm512_add_epi64(
        hh, _mm512_add_epi64(
                _mm512_srli_epi64(mid, 32),
                _mm512_add_epi64(_mm512_srli_epi64(lh, 32),
                                 _mm512_srli_epi64(hl, 32))));
    return lo;
}

/* Goldilocks reduction of a 128-bit value (mirrors gl_reduce128):
 * 2^64 == 2^32 - 1 and 2^96 == -1 (mod p). */
static inline V8 v_gl_reduce128(V8 lo, V8 hi) {
    V8 x2 = _mm512_and_epi64(hi, V_M32);
    V8 x3 = _mm512_srli_epi64(hi, 32);
    V8 t0 = _mm512_sub_epi64(lo, x3);
    __mmask8 bor = _mm512_cmplt_epu64_mask(lo, x3);
    t0 = _mm512_mask_sub_epi64(t0, bor, t0, V_GL_EPS);
    V8 t1 = _mm512_sub_epi64(_mm512_slli_epi64(x2, 32), x2);
    V8 t2 = _mm512_add_epi64(t0, t1);
    __mmask8 car = _mm512_cmplt_epu64_mask(t2, t1);
    t2 = _mm512_mask_add_epi64(t2, car, t2, V_GL_EPS);
    __mmask8 ge = _mm512_cmpge_epu64_mask(t2, V_GL_P);
    t2 = _mm512_mask_sub_epi64(t2, ge, t2, V_GL_P);
    return t2;
}

static inline V8 v_gl_mul(V8 a, V8 b) {
    V8 hi;
    V8 lo = v_mul_wide(a, b, &hi);
    return v_gl_reduce128(lo, hi);
}

static inline V8 v_gl_sbox7(V8 x) {
    V8 x2 = v_gl_mul(x, x);
    V8 x3 = v_gl_mul(x2, x);
    V8 x4 = v_gl_mul(x2, x2);
    return v_gl_mul(x3, x4);
}

/* 12x12 MDS layer over 8 states held as s[12] vectors. MDS entries are
 * < 2^6, so each 32-bit-half partial product is < 2^38 and 12 of them
 * accumulate in a u64 without carries (sum < 2^42); one 128-bit
 * recombine + reduction per output wire. Bit-exact with gl_mds12. */
static inline void v_gl_mds12(V8 *s, const uint64_t mds[12][12]) {
    V8 t[12];
    for (int r = 0; r < 12; r++) {
        V8 sum_ll = _mm512_setzero_si512();
        V8 sum_hl = _mm512_setzero_si512();
        for (int j = 0; j < 12; j++) {
            V8 m = v_set1(mds[r][j]);
            sum_ll = _mm512_add_epi64(sum_ll, _mm512_mul_epu32(s[j], m));
            sum_hl = _mm512_add_epi64(
                sum_hl, _mm512_mul_epu32(_mm512_srli_epi64(s[j], 32), m));
        }
        /* total = sum_ll + sum_hl * 2^32 */
        V8 shl = _mm512_slli_epi64(sum_hl, 32);
        V8 lo = _mm512_add_epi64(sum_ll, shl);
        __mmask8 car = _mm512_cmplt_epu64_mask(lo, shl);
        V8 hi = _mm512_srli_epi64(sum_hl, 32);
        hi = _mm512_mask_add_epi64(hi, car, hi, v_set1(1));
        t[r] = v_gl_reduce128(lo, hi);
    }
    for (int r = 0; r < 12; r++) s[r] = t[r];
}

/* acc(lo,hi) += x where x is a canonical field element (< 2^64); the
 * caller keeps a 128-bit accumulator split across two vectors. */
static inline void v_acc128_add(V8 *acc_lo, V8 *acc_hi, V8 x) {
    V8 lo = _mm512_add_epi64(*acc_lo, x);
    __mmask8 car = _mm512_cmplt_epu64_mask(lo, x);
    *acc_lo = lo;
    *acc_hi = _mm512_mask_add_epi64(*acc_hi, car, *acc_hi, v_set1(1));
}

#else /* no AVX-512 on this host */
#define GL_HAVE_AVX512 0
#endif

#endif /* GL_AVX512_H */
