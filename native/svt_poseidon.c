/* Native host runtime for the framework's hash plane: Goldilocks Poseidon
 * permutation, sponge hashing, Merkle-level compression, and Fiat-Shamir
 * proof-of-work grinding, as a C shared library consumed via ctypes
 * (stark_verifier_tpu/native.py).
 *
 * This is the TPU framework's equivalent of the host-side hashing the
 * reference gets from its native Rust plonky2 dependency (field/Poseidon/
 * MerkleTree; reference Cargo.toml:11): the TPU owns the batched verify
 * path, while fixture generation (proving) and golden verification run on
 * the host, where python-level dispatch dominates. Semantics are bit-exact
 * with ops/gl64_np.py + ops/poseidon_gl.py (canonical representatives
 * 0 <= r < p after every op; overwrite-mode rate-8 sponge; reference:
 * chip/hasher_chip.rs:61-171, chip/merkle_proof_chip.rs:58-70).
 *
 * Build: gcc -O3 -march=native -fopenmp -shared -fPIC (see native.py).
 */
#include <stdint.h>
#include <stddef.h>
#include <stdlib.h>
#include <string.h>

#include "poseidon_constants.h"
#include "gl_avx512.h"

#define GL_P 0xFFFFFFFF00000001ULL
#define GL_EPS 0xFFFFFFFFULL
#define WIDTH 12
#define RATE 8
#define N_ROUNDS 30
#define HALF_FULL 4
#define N_PARTIAL 22

static inline uint64_t gl_add(uint64_t a, uint64_t b) {
    uint64_t s = a + b; /* a, b canonical: at most one EPS correction */
    if (s < a) s += GL_EPS;
    if (s >= GL_P) s -= GL_P;
    return s;
}

static inline uint64_t gl_reduce128(__uint128_t w) {
    uint64_t lo = (uint64_t)w;
    uint64_t hi = (uint64_t)(w >> 64);
    uint64_t x2 = hi & 0xFFFFFFFFULL; /* bits 64..95:  2^64 ==  2^32 - 1 */
    uint64_t x3 = hi >> 32;           /* bits 96..127: 2^96 == -1 (mod p) */
    uint64_t t0 = lo - x3;
    if (lo < x3) t0 -= GL_EPS;
    uint64_t t1 = (x2 << 32) - x2;
    uint64_t t2 = t0 + t1;
    if (t2 < t1) t2 += GL_EPS;
    if (t2 >= GL_P) t2 -= GL_P;
    return t2;
}

static inline uint64_t gl_mul(uint64_t a, uint64_t b) {
    return gl_reduce128((__uint128_t)a * b);
}

static inline uint64_t gl_sbox7(uint64_t x) {
    uint64_t x2 = gl_mul(x, x);
    uint64_t x3 = gl_mul(x2, x);
    uint64_t x4 = gl_mul(x2, x2);
    return gl_mul(x3, x4);
}

static inline void gl_mds12(uint64_t *s) {
    uint64_t t[WIDTH];
    for (int r = 0; r < WIDTH; r++) {
        __uint128_t acc = 0; /* 12 x (2^64 x 49) < 2^74: no overflow */
        for (int j = 0; j < WIDTH; j++)
            acc += (__uint128_t)s[j] * SVT_MDS[r][j];
        t[r] = gl_reduce128(acc);
    }
    memcpy(s, t, sizeof t);
}

static void poseidon12(uint64_t *s) {
    int r = 0;
    for (; r < HALF_FULL; r++) {
        for (int i = 0; i < WIDTH; i++)
            s[i] = gl_add(s[i], SVT_RC[r * WIDTH + i]);
        for (int i = 0; i < WIDTH; i++) s[i] = gl_sbox7(s[i]);
        gl_mds12(s);
    }
    for (; r < HALF_FULL + N_PARTIAL; r++) {
        for (int i = 0; i < WIDTH; i++)
            s[i] = gl_add(s[i], SVT_RC[r * WIDTH + i]);
        s[0] = gl_sbox7(s[0]);
        gl_mds12(s);
    }
    for (; r < N_ROUNDS; r++) {
        for (int i = 0; i < WIDTH; i++)
            s[i] = gl_add(s[i], SVT_RC[r * WIDTH + i]);
        for (int i = 0; i < WIDTH; i++) s[i] = gl_sbox7(s[i]);
        gl_mds12(s);
    }
}

#if GL_HAVE_AVX512
/* 8 independent permutations per call: state wire i of the 8 states lives
 * in one vector. Same naive schedule as poseidon12; bit-exact. */
static void poseidon12_x8(V8 *s) {
    int r = 0;
    for (; r < HALF_FULL; r++) {
        for (int i = 0; i < WIDTH; i++)
            s[i] = v_gl_add(s[i], v_set1(SVT_RC[r * WIDTH + i]));
        for (int i = 0; i < WIDTH; i++) s[i] = v_gl_sbox7(s[i]);
        v_gl_mds12(s, SVT_MDS);
    }
    for (; r < HALF_FULL + N_PARTIAL; r++) {
        for (int i = 0; i < WIDTH; i++)
            s[i] = v_gl_add(s[i], v_set1(SVT_RC[r * WIDTH + i]));
        s[0] = v_gl_sbox7(s[0]);
        v_gl_mds12(s, SVT_MDS);
    }
    for (; r < N_ROUNDS; r++) {
        for (int i = 0; i < WIDTH; i++)
            s[i] = v_gl_add(s[i], v_set1(SVT_RC[r * WIDTH + i]));
        for (int i = 0; i < WIDTH; i++) s[i] = v_gl_sbox7(s[i]);
        v_gl_mds12(s, SVT_MDS);
    }
}

/* element indices {0, stride, ..., 7*stride} for gang gathers/scatters */
static inline __m512i v_iota_stride(int64_t stride) {
    return _mm512_mullo_epi64(
        _mm512_setr_epi64(0, 1, 2, 3, 4, 5, 6, 7), v_set1((uint64_t)stride));
}
#endif

/* states: [n, 12] row-major, in-place. */
void svt_permute_batch(uint64_t *states, int64_t n) {
#if GL_HAVE_AVX512
    int64_t ng = n / 8;
#pragma omp parallel for schedule(static) if(ng >= 8)
    for (int64_t g = 0; g < ng; g++) {
        uint64_t *base = states + (size_t)8 * WIDTH * g;
        __m512i vidx = v_iota_stride(WIDTH);
        V8 s[WIDTH];
        for (int i = 0; i < WIDTH; i++)
            s[i] = _mm512_i64gather_epi64(vidx, (const void *)(base + i), 8);
        poseidon12_x8(s);
        for (int i = 0; i < WIDTH; i++)
            _mm512_i64scatter_epi64((void *)(base + i), vidx, s[i], 8);
    }
    for (int64_t i = ng * 8; i < n; i++)
        poseidon12(states + (size_t)WIDTH * i);
#else
#pragma omp parallel for schedule(static) if(n >= 8)
    for (int64_t i = 0; i < n; i++) poseidon12(states + (size_t)WIDTH * i);
#endif
}

static void hash_no_pad_row(const uint64_t *row, int64_t w, uint64_t *out4) {
    uint64_t s[WIDTH] = {0};
    for (int64_t start = 0; start < w; start += RATE) {
        int64_t c = w - start < RATE ? w - start : RATE;
        for (int64_t j = 0; j < c; j++) s[j] = row[start + j];
        poseidon12(s);
    }
    memcpy(out4, s, 4 * sizeof(uint64_t));
}

/* plonky2 hash_n_to_m_no_pad, m=4: in [n, w] -> out [n, 4]. */
void svt_hash_no_pad_batch(const uint64_t *in, int64_t n, int64_t w,
                           uint64_t *out) {
#if GL_HAVE_AVX512
    int64_t ng = n / 8;
#pragma omp parallel for schedule(static) if(ng >= 8)
    for (int64_t g = 0; g < ng; g++) {
        const uint64_t *rows = in + (size_t)8 * w * g;
        __m512i vrow = v_iota_stride(w);
        V8 s[WIDTH];
        for (int i = 0; i < WIDTH; i++) s[i] = _mm512_setzero_si512();
        for (int64_t start = 0; start < w; start += RATE) {
            int64_t c = w - start < RATE ? w - start : RATE;
            for (int64_t j = 0; j < c; j++)
                s[j] = _mm512_i64gather_epi64(
                    vrow, (const void *)(rows + start + j), 8);
            poseidon12_x8(s);
        }
        __m512i vout = v_iota_stride(4);
        for (int j = 0; j < 4; j++)
            _mm512_i64scatter_epi64((void *)(out + 32 * g + j), vout, s[j], 8);
    }
    for (int64_t i = ng * 8; i < n; i++)
        hash_no_pad_row(in + (size_t)w * i, w, out + 4 * i);
#else
#pragma omp parallel for schedule(static) if(n >= 8)
    for (int64_t i = 0; i < n; i++)
        hash_no_pad_row(in + (size_t)w * i, w, out + 4 * i);
#endif
}

/* Merkle 8->4 compression over one level: in [m, 8] (left||right digests)
 * -> out [m, 4] (reference: chip/merkle_proof_chip.rs:58-70). */
void svt_merkle_level(const uint64_t *in, int64_t m, uint64_t *out) {
#if GL_HAVE_AVX512
    int64_t ng = m / 8;
#pragma omp parallel for schedule(static) if(ng >= 8)
    for (int64_t g = 0; g < ng; g++) {
        const uint64_t *rows = in + (size_t)64 * g;
        __m512i vin = v_iota_stride(8);
        V8 s[WIDTH];
        for (int j = 0; j < 8; j++)
            s[j] = _mm512_i64gather_epi64(vin, (const void *)(rows + j), 8);
        for (int j = 8; j < WIDTH; j++) s[j] = _mm512_setzero_si512();
        poseidon12_x8(s);
        __m512i vout = v_iota_stride(4);
        for (int j = 0; j < 4; j++)
            _mm512_i64scatter_epi64((void *)(out + 32 * g + j), vout, s[j], 8);
    }
    for (int64_t i = ng * 8; i < m; i++) {
        uint64_t s[WIDTH] = {0};
        memcpy(s, in + 8 * i, 8 * sizeof(uint64_t));
        poseidon12(s);
        memcpy(out + 4 * i, s, 4 * sizeof(uint64_t));
    }
#else
#pragma omp parallel for schedule(static) if(m >= 8)
    for (int64_t i = 0; i < m; i++) {
        uint64_t s[WIDTH] = {0};
        memcpy(s, in + 8 * i, 8 * sizeof(uint64_t));
        poseidon12(s);
        memcpy(out + 4 * i, s, 4 * sizeof(uint64_t));
    }
#endif
}

/* Fiat-Shamir PoW grind, one lane: duplex state12 with `k` buffered inputs
 * plus the candidate, pop the challenge from the END of the rate window
 * (state[7]; reference: chip/hasher_chip.rs:86), and require `pow_bits`
 * leading zero bits. Returns the first witness >= start. */
uint64_t svt_grind_pow(const uint64_t *state12, const uint64_t *prefix,
                       int64_t k, int32_t pow_bits, uint64_t start) {
#if GL_HAVE_AVX512
    /* 8 candidates per permutation gang; first hit in lane order keeps
     * the result identical to the scalar scan (lowest witness >= start) */
    for (uint64_t cand = start;; cand += 8) {
        V8 s[WIDTH];
        for (int i = 0; i < WIDTH; i++) s[i] = v_set1(state12[i]);
        for (int64_t j = 0; j < k; j++) s[j] = v_set1(prefix[j]);
        s[k] = _mm512_add_epi64(
            v_set1(cand), _mm512_setr_epi64(0, 1, 2, 3, 4, 5, 6, 7));
        poseidon12_x8(s);
        uint64_t out7[8];
        _mm512_storeu_si512((void *)out7, s[RATE - 1]);
        for (int l = 0; l < 8; l++)
            if (pow_bits == 0 || (out7[l] >> (64 - pow_bits)) == 0)
                return cand + (uint64_t)l;
    }
#else
    for (uint64_t cand = start;; cand++) {
        uint64_t s[WIDTH];
        memcpy(s, state12, sizeof s);
        for (int64_t j = 0; j < k; j++) s[j] = prefix[j];
        s[k] = cand;
        poseidon12(s);
        if (pow_bits == 0 || (s[RATE - 1] >> (64 - pow_bits)) == 0)
            return cand;
    }
#endif
}

/* Batched grind: states [B, 12], prefixes [B, k] -> out [B]. */
void svt_grind_pow_batch(const uint64_t *states, const uint64_t *prefixes,
                         int64_t B, int64_t k, int32_t pow_bits,
                         uint64_t *out) {
#pragma omp parallel for schedule(dynamic) if(B > 1)
    for (int64_t b = 0; b < B; b++)
        out[b] = svt_grind_pow(states + (size_t)WIDTH * b,
                               prefixes + (size_t)k * b, k, pow_bits, 0);
}

/* Elementwise canonical Goldilocks multiply: out = a * b mod p. The numpy
 * golden model's 32-bit limb decomposition costs ~12 memory passes per
 * mul; this is one fused pass (gl64_np.mul routes arrays here). */
void svt_gl_mul(const uint64_t *a, const uint64_t *b, uint64_t *out,
                int64_t n) {
#if GL_HAVE_AVX512
    int64_t nv = n & ~7ll;
#pragma omp parallel for schedule(static) if(n >= 4096)
    for (int64_t i = 0; i < nv; i += 8) {
        V8 va = _mm512_loadu_si512((const void *)(a + i));
        V8 vb = _mm512_loadu_si512((const void *)(b + i));
        _mm512_storeu_si512((void *)(out + i), v_gl_mul(va, vb));
    }
    for (int64_t i = nv; i < n; i++) out[i] = gl_mul(a[i], b[i]);
#else
#pragma omp parallel for schedule(static) if(n >= 4096)
    for (int64_t i = 0; i < n; i++) out[i] = gl_mul(a[i], b[i]);
#endif
}

/* out = a + b mod p (one EPS correction, mirrors gl64_np.add). */
void svt_gl_add_arr(const uint64_t *a, const uint64_t *b, uint64_t *out,
                    int64_t n) {
#if GL_HAVE_AVX512
    int64_t nv = n & ~7ll;
#pragma omp parallel for schedule(static) if(n >= 65536)
    for (int64_t i = 0; i < nv; i += 8)
        _mm512_storeu_si512(
            (void *)(out + i),
            v_gl_add(_mm512_loadu_si512((const void *)(a + i)),
                     _mm512_loadu_si512((const void *)(b + i))));
    for (int64_t i = nv; i < n; i++) out[i] = gl_add(a[i], b[i]);
#else
#pragma omp parallel for schedule(static) if(n >= 65536)
    for (int64_t i = 0; i < n; i++) out[i] = gl_add(a[i], b[i]);
#endif
}

static inline uint64_t gl_sub_any(uint64_t a, uint64_t b) {
    /* a - b mod p for ANY u64 representatives (matches gl64_np.sub) */
    uint64_t d = a - b;
    if (a < b) d -= GL_EPS;
    if (d >= GL_P) d -= GL_P;
    return d;
}

/* out = a - b mod p (any u64 reps, mirrors gl64_np.sub). */
void svt_gl_sub_arr(const uint64_t *a, const uint64_t *b, uint64_t *out,
                    int64_t n) {
#if GL_HAVE_AVX512
    int64_t nv = n & ~7ll;
#pragma omp parallel for schedule(static) if(n >= 65536)
    for (int64_t i = 0; i < nv; i += 8)
        _mm512_storeu_si512(
            (void *)(out + i),
            v_gl_sub_any(_mm512_loadu_si512((const void *)(a + i)),
                         _mm512_loadu_si512((const void *)(b + i))));
    for (int64_t i = nv; i < n; i++) out[i] = gl_sub_any(a[i], b[i]);
#else
#pragma omp parallel for schedule(static) if(n >= 65536)
    for (int64_t i = 0; i < n; i++) out[i] = gl_sub_any(a[i], b[i]);
#endif
}

/* out = a * b + c mod p (canonical inputs). */
void svt_gl_mul_add(const uint64_t *a, const uint64_t *b, const uint64_t *c,
                    uint64_t *out, int64_t n) {
#if GL_HAVE_AVX512
    int64_t nv = n & ~7ll;
#pragma omp parallel for schedule(static) if(n >= 4096)
    for (int64_t i = 0; i < nv; i += 8) {
        V8 va = _mm512_loadu_si512((const void *)(a + i));
        V8 vb = _mm512_loadu_si512((const void *)(b + i));
        V8 vc = _mm512_loadu_si512((const void *)(c + i));
        _mm512_storeu_si512((void *)(out + i),
                            v_gl_add(v_gl_mul(va, vb), vc));
    }
    for (int64_t i = nv; i < n; i++) out[i] = gl_add(gl_mul(a[i], b[i]), c[i]);
#else
#pragma omp parallel for schedule(static) if(n >= 4096)
    for (int64_t i = 0; i < n; i++) out[i] = gl_add(gl_mul(a[i], b[i]), c[i]);
#endif
}

/* ---- PoseidonGate witness-trace fill (prover hot spot) ----------------
 *
 * Computes every wire of one plonky2 PoseidonGate row in GATE-WIRE ORDER
 * (inputs 0..11, outputs 12..23, swap 24, deltas 25..28, full_sbox_0
 * 29..64, partial_sbox 65..86, full_sbox_1 87..134) using the fast-partial
 * round schedule — bit-identical to core/gates.poseidon_witness_fill
 * (reference wire layout: chip/plonk/gates/poseidon.rs:604-686).
 * io: uint64[n][135], inputs+swap prefilled; the rest written in place.
 */
#define FP_RP 22

static void poseidon_fill_one(uint64_t *w) {
    uint64_t *in = w;        /* 0..11 */
    uint64_t *out = w + 12;  /* 12..23 */
    uint64_t swap = w[24];
    uint64_t *delta = w + 25;
    uint64_t *sb0 = w + 29;  /* 3 rounds x 12 */
    uint64_t *psb = w + 65;  /* 22 */
    uint64_t *sb1 = w + 87;  /* 4 rounds x 12 */

    uint64_t st[WIDTH];
    for (int i = 0; i < 4; i++) {
        delta[i] = gl_mul(swap, gl_sub_any(in[4 + i], in[i]));
        st[i] = gl_add(in[i], delta[i]);
        st[4 + i] = gl_sub_any(in[4 + i], delta[i]);
    }
    for (int i = 8; i < WIDTH; i++) st[i] = in[i];

    for (int r = 0; r < HALF_FULL; r++) {
        for (int i = 0; i < WIDTH; i++)
            st[i] = gl_add(st[i], SVT_RC[r * WIDTH + i]);
        if (r != 0)
            memcpy(sb0 + (r - 1) * WIDTH, st, sizeof st);
        for (int i = 0; i < WIDTH; i++) st[i] = gl_sbox7(st[i]);
        gl_mds12(st);
    }

    for (int i = 0; i < WIDTH; i++)
        st[i] = gl_add(st[i], SVT_FP_FIRST[i]);
    /* partial-layer init: st'[c] = sum_r IM[r-1][c-1] * st[r], st'[0]=st[0] */
    {
        uint64_t t[WIDTH];
        t[0] = st[0];
        for (int c = 1; c < WIDTH; c++) {
            __uint128_t acc = 0;
            for (int r = 1; r < WIDTH; r++)
                acc += (__uint128_t)gl_mul(SVT_FP_IM[r - 1][c - 1], st[r]);
            t[c] = gl_reduce128(acc);
        }
        memcpy(st, t, sizeof t);
    }

    const uint64_t M0 = SVT_MDS[0][0]; /* CIRC[0] + DIAG[0] */
    for (int r = 0; r < FP_RP; r++) {
        psb[r] = st[0];
        uint64_t s0 = gl_sbox7(st[0]);
        if (r < FP_RP - 1) s0 = gl_add(s0, SVT_FP_RC[r]);
        __uint128_t acc = (__uint128_t)gl_mul(M0, s0);
        for (int i = 1; i < WIDTH; i++)
            acc += (__uint128_t)gl_mul(SVT_FP_WH[r][i - 1], st[i]);
        uint64_t d = gl_reduce128(acc);
        for (int i = 1; i < WIDTH; i++)
            st[i] = gl_add(gl_mul(SVT_FP_VS[r][i - 1], s0), st[i]);
        st[0] = d;
    }

    for (int r = 0; r < HALF_FULL; r++) {
        for (int i = 0; i < WIDTH; i++)
            st[i] = gl_add(st[i], SVT_RC[(HALF_FULL + N_PARTIAL + r) * WIDTH + i]);
        memcpy(sb1 + r * WIDTH, st, sizeof st);
        for (int i = 0; i < WIDTH; i++) st[i] = gl_sbox7(st[i]);
        gl_mds12(st);
    }
    memcpy(out, st, sizeof st);
}

void svt_poseidon_fill_batch(uint64_t *io, int64_t n) {
#pragma omp parallel for schedule(static) if(n >= 4)
    for (int64_t k = 0; k < n; k++) poseidon_fill_one(io + 135 * k);
}

/* ---- ext2 witness-generator helpers (tiny-batch prover hot path) ------
 *
 * The recursion prover's witness generators chain GF(p^2) ops over [B]
 * arrays with B <= 64; numpy dispatch costs ~25 us per op there. These
 * run whole generator bodies in one call (no OpenMP/AVX: B is tiny and
 * call rate is high). GF(p^2) = GF(p)[x]/(x^2 - 7); any correct formula
 * yields the same canonical components (ops/ext2.py uses Karatsuba,
 * schoolbook here).
 */
static inline void e2_mul1(uint64_t a0, uint64_t a1, uint64_t b0,
                           uint64_t b1, uint64_t *c0, uint64_t *c1) {
    uint64_t t0 = gl_mul(a0, b0), t1 = gl_mul(a1, b1);
    *c0 = gl_add(t0, gl_mul(t1, 7));
    *c1 = gl_add(gl_mul(a0, b1), gl_mul(a1, b0));
}

/* out = c0 * (x * y) + c1 * z over GF(p^2), elementwise on [n] lanes
 * (the ArithmeticExtensionGate generator body; gates/arithmetic_extension.rs). */
void svt_ext2_arith_batch(uint64_t c0, uint64_t c1, const uint64_t *x0,
                          const uint64_t *x1, const uint64_t *y0,
                          const uint64_t *y1, const uint64_t *z0,
                          const uint64_t *z1, uint64_t *o0, uint64_t *o1,
                          int64_t n) {
    for (int64_t i = 0; i < n; i++) {
        uint64_t p0, p1;
        e2_mul1(x0[i], x1[i], y0[i], y1[i], &p0, &p1);
        o0[i] = gl_add(gl_mul(c0, p0), gl_mul(c1, z0[i]));
        o1[i] = gl_add(gl_mul(c0, p1), gl_mul(c1, z1[i]));
    }
}

/* Horner accumulator chain with every intermediate emitted (the
 * Reducing(Extension)Gate generator body; gates/reducing.rs):
 *   acc_j = acc_{j-1} * alpha + coeff_j
 * alpha/acc0 as component pairs of [n]; coeffs/accs as [k][2][n]. */
void svt_ext2_reduce_chain(const uint64_t *a0, const uint64_t *a1,
                           const uint64_t *s0, const uint64_t *s1,
                           const uint64_t *coeffs, uint64_t *accs,
                           int64_t k, int64_t n) {
    for (int64_t i = 0; i < n; i++) {
        uint64_t c0 = s0[i], c1 = s1[i];
        for (int64_t j = 0; j < k; j++) {
            uint64_t m0, m1;
            e2_mul1(c0, c1, a0[i], a1[i], &m0, &m1);
            c0 = gl_add(m0, coeffs[(size_t)(2 * j) * n + i]);
            c1 = gl_add(m1, coeffs[(size_t)(2 * j + 1) * n + i]);
            accs[(size_t)(2 * j) * n + i] = c0;
            accs[(size_t)(2 * j + 1) * n + i] = c1;
        }
    }
}

/* ---- PoseidonGate constraint evaluation (prover quotient hot spot) ----
 *
 * Pointwise evaluation of all 123 PoseidonGate constraints over the LDE
 * coset (base field), bit-exact with the generic-ring schedule in
 * core/gates.PoseidonGate.eval_unfiltered over the numpy BaseRing
 * (reference constraint set: chip/plonk/gates/poseidon.rs:173-276).
 * The prover's quotient pass was dominated by ~2,600 Goldilocks muls per
 * point dispatched as whole-array numpy ops; one C pass is compute-bound
 * at ~5 muls/ns/core instead.
 *
 * wires: [135][n] plane-major in gate-wire order (inputs 0..11, outputs
 * 12..23, swap 24, deltas 25..28, full_sbox_0 29..64, partial_sbox 65..86,
 * full_sbox_1 87..134); out: [123][n] plane-major in constraint order.
 */
static void poseidon_eval_one(const uint64_t *w, uint64_t *o) {
    {
        const uint64_t *in = w;
        const uint64_t *wout = w + 12;
        uint64_t swap = w[24];
        const uint64_t *delta = w + 25;
        const uint64_t *sb0 = w + 29;
        const uint64_t *psb = w + 65;
        const uint64_t *sb1 = w + 87;
        int oc = 0;

        o[oc++] = gl_sub_any(gl_mul(swap, swap), swap);
        uint64_t st[WIDTH];
        for (int i = 0; i < 4; i++) {
            uint64_t diff = gl_sub_any(in[4 + i], in[i]);
            o[oc++] = gl_sub_any(gl_mul(swap, diff), delta[i]);
            st[i] = gl_add(in[i], delta[i]);
            st[4 + i] = gl_sub_any(in[4 + i], delta[i]);
        }
        for (int i = 8; i < WIDTH; i++) st[i] = in[i];

        for (int r = 0; r < HALF_FULL; r++) {
            for (int i = 0; i < WIDTH; i++)
                st[i] = gl_add(st[i], SVT_RC[r * WIDTH + i]);
            if (r != 0)
                for (int i = 0; i < WIDTH; i++) {
                    o[oc++] = gl_sub_any(st[i], sb0[(r - 1) * WIDTH + i]);
                    st[i] = sb0[(r - 1) * WIDTH + i];
                }
            for (int i = 0; i < WIDTH; i++) st[i] = gl_sbox7(st[i]);
            gl_mds12(st);
        }

        for (int i = 0; i < WIDTH; i++)
            st[i] = gl_add(st[i], SVT_FP_FIRST[i]);
        {
            uint64_t t[WIDTH];
            t[0] = st[0];
            for (int c = 1; c < WIDTH; c++) {
                __uint128_t acc = 0;
                for (int r = 1; r < WIDTH; r++)
                    acc += (__uint128_t)gl_mul(SVT_FP_IM[r - 1][c - 1], st[r]);
                t[c] = gl_reduce128(acc);
            }
            memcpy(st, t, sizeof t);
        }

        const uint64_t M0 = SVT_MDS[0][0]; /* CIRC[0] + DIAG[0] */
        for (int r = 0; r < FP_RP; r++) {
            o[oc++] = gl_sub_any(st[0], psb[r]);
            uint64_t s0 = gl_sbox7(psb[r]);
            if (r < FP_RP - 1) s0 = gl_add(s0, SVT_FP_RC[r]);
            __uint128_t acc = (__uint128_t)gl_mul(M0, s0);
            for (int i = 1; i < WIDTH; i++)
                acc += (__uint128_t)gl_mul(SVT_FP_WH[r][i - 1], st[i]);
            uint64_t d = gl_reduce128(acc);
            for (int i = 1; i < WIDTH; i++)
                st[i] = gl_add(gl_mul(SVT_FP_VS[r][i - 1], s0), st[i]);
            st[0] = d;
        }

        for (int r = 0; r < HALF_FULL; r++) {
            for (int i = 0; i < WIDTH; i++)
                st[i] = gl_add(st[i],
                               SVT_RC[(HALF_FULL + N_PARTIAL + r) * WIDTH + i]);
            for (int i = 0; i < WIDTH; i++) {
                o[oc++] = gl_sub_any(st[i], sb1[r * WIDTH + i]);
                st[i] = sb1[r * WIDTH + i];
            }
            for (int i = 0; i < WIDTH; i++) st[i] = gl_sbox7(st[i]);
            gl_mds12(st);
        }
        for (int i = 0; i < WIDTH; i++)
            o[oc++] = gl_sub_any(st[i], wout[i]);
    }
}

#if GL_HAVE_AVX512
/* 8 LDE points per call; wires/out are plane-major so every access is a
 * contiguous vector load/store. Mirrors poseidon_eval_one op for op. */
static void poseidon_eval_x8_vec(V8 *w, uint64_t *out, int64_t n, int64_t j) {
    const V8 *in = w;
    const V8 *wout = w + 12;
    V8 swap = w[24];
    const V8 *delta = w + 25;
    const V8 *sb0 = w + 29;
    const V8 *psb = w + 65;
    const V8 *sb1 = w + 87;
    V8 o[123];
    int oc = 0;

    o[oc++] = v_gl_sub_any(v_gl_mul(swap, swap), swap);
    V8 st[WIDTH];
    for (int i = 0; i < 4; i++) {
        V8 diff = v_gl_sub_any(in[4 + i], in[i]);
        o[oc++] = v_gl_sub_any(v_gl_mul(swap, diff), delta[i]);
        st[i] = v_gl_add(in[i], delta[i]);
        st[4 + i] = v_gl_sub_any(in[4 + i], delta[i]);
    }
    for (int i = 8; i < WIDTH; i++) st[i] = in[i];

    for (int r = 0; r < HALF_FULL; r++) {
        for (int i = 0; i < WIDTH; i++)
            st[i] = v_gl_add(st[i], v_set1(SVT_RC[r * WIDTH + i]));
        if (r != 0)
            for (int i = 0; i < WIDTH; i++) {
                o[oc++] = v_gl_sub_any(st[i], sb0[(r - 1) * WIDTH + i]);
                st[i] = sb0[(r - 1) * WIDTH + i];
            }
        for (int i = 0; i < WIDTH; i++) st[i] = v_gl_sbox7(st[i]);
        v_gl_mds12(st, SVT_MDS);
    }

    for (int i = 0; i < WIDTH; i++)
        st[i] = v_gl_add(st[i], v_set1(SVT_FP_FIRST[i]));
    {
        V8 t[WIDTH];
        t[0] = st[0];
        for (int c = 1; c < WIDTH; c++) {
            V8 acc_lo = _mm512_setzero_si512();
            V8 acc_hi = _mm512_setzero_si512();
            for (int r = 1; r < WIDTH; r++)
                v_acc128_add(&acc_lo, &acc_hi,
                             v_gl_mul(v_set1(SVT_FP_IM[r - 1][c - 1]), st[r]));
            t[c] = v_gl_reduce128(acc_lo, acc_hi);
        }
        for (int i = 0; i < WIDTH; i++) st[i] = t[i];
    }

    const uint64_t M0 = SVT_MDS[0][0]; /* CIRC[0] + DIAG[0] */
    for (int r = 0; r < FP_RP; r++) {
        o[oc++] = v_gl_sub_any(st[0], psb[r]);
        V8 s0 = v_gl_sbox7(psb[r]);
        if (r < FP_RP - 1) s0 = v_gl_add(s0, v_set1(SVT_FP_RC[r]));
        V8 acc_lo = v_gl_mul(v_set1(M0), s0);
        V8 acc_hi = _mm512_setzero_si512();
        for (int i = 1; i < WIDTH; i++)
            v_acc128_add(&acc_lo, &acc_hi,
                         v_gl_mul(v_set1(SVT_FP_WH[r][i - 1]), st[i]));
        V8 d = v_gl_reduce128(acc_lo, acc_hi);
        for (int i = 1; i < WIDTH; i++)
            st[i] = v_gl_add(v_gl_mul(v_set1(SVT_FP_VS[r][i - 1]), s0), st[i]);
        st[0] = d;
    }

    for (int r = 0; r < HALF_FULL; r++) {
        for (int i = 0; i < WIDTH; i++)
            st[i] = v_gl_add(
                st[i], v_set1(SVT_RC[(HALF_FULL + N_PARTIAL + r) * WIDTH + i]));
        for (int i = 0; i < WIDTH; i++) {
            o[oc++] = v_gl_sub_any(st[i], sb1[r * WIDTH + i]);
            st[i] = sb1[r * WIDTH + i];
        }
        for (int i = 0; i < WIDTH; i++) st[i] = v_gl_sbox7(st[i]);
        v_gl_mds12(st, SVT_MDS);
    }
    for (int i = 0; i < WIDTH; i++)
        o[oc++] = v_gl_sub_any(st[i], wout[i]);

    for (int i = 0; i < 123; i++)
        _mm512_storeu_si512((void *)(out + (size_t)i * n + j), o[i]);
}

static void poseidon_eval_x8(const uint64_t *wires, int64_t n, int64_t j,
                             uint64_t *out) {
    V8 w[135];
    for (int i = 0; i < 135; i++)
        w[i] = _mm512_loadu_si512((const void *)(wires + (size_t)i * n + j));
    poseidon_eval_x8_vec(w, out, n, j);
}
#endif

/* Pointer-per-plane variant: wires_p[135] each a contiguous [n] plane
 * (avoids the caller materializing one [135, n] block — ~300 MB of copy
 * per quotient pass at the aggregation degrees). */
void svt_poseidon_eval_batch_p(const uint64_t **wires_p, int64_t n,
                               uint64_t *out) {
#if GL_HAVE_AVX512
    int64_t ng = n / 8;
#pragma omp parallel for schedule(static) if(ng >= 8)
    for (int64_t g = 0; g < ng; g++) {
        int64_t j = 8 * g;
        V8 w[135];
        for (int i = 0; i < 135; i++)
            w[i] = _mm512_loadu_si512((const void *)(wires_p[i] + j));
        poseidon_eval_x8_vec(w, out, n, j);
    }
    for (int64_t j = ng * 8; j < n; j++) {
        uint64_t w[135], o[123];
        for (int i = 0; i < 135; i++) w[i] = wires_p[i][j];
        poseidon_eval_one(w, o);
        for (int i = 0; i < 123; i++) out[(size_t)i * n + j] = o[i];
    }
#else
#pragma omp parallel for schedule(static) if(n >= 4096)
    for (int64_t j = 0; j < n; j++) {
        uint64_t w[135], o[123];
        for (int i = 0; i < 135; i++) w[i] = wires_p[i][j];
        poseidon_eval_one(w, o);
        for (int i = 0; i < 123; i++) out[(size_t)i * n + j] = o[i];
    }
#endif
}

void svt_poseidon_eval_batch(const uint64_t *wires, int64_t n,
                             uint64_t *out) {
#if GL_HAVE_AVX512
    int64_t ng = n / 8;
#pragma omp parallel for schedule(static) if(ng >= 8)
    for (int64_t g = 0; g < ng; g++)
        poseidon_eval_x8(wires, n, 8 * g, out);
    for (int64_t j = ng * 8; j < n; j++) {
        uint64_t w[135], o[123];
        for (int i = 0; i < 135; i++) w[i] = wires[(size_t)i * n + j];
        poseidon_eval_one(w, o);
        for (int i = 0; i < 123; i++) out[(size_t)i * n + j] = o[i];
    }
#else
#pragma omp parallel for schedule(static) if(n >= 4096)
    for (int64_t j = 0; j < n; j++) {
        uint64_t w[135], o[123];
        for (int i = 0; i < 135; i++) w[i] = wires[(size_t)i * n + j];
        poseidon_eval_one(w, o);
        for (int i = 0; i < 123; i++) out[(size_t)i * n + j] = o[i];
    }
#endif
}

/* ================= batched radix-2 NTT (prover FFT plane) =================
 *
 * In-place DIT NTT along the last axis of data[nb][n], bit-exact with the
 * numpy golden (ops/ntt_np.py): bit-reversal permutation, then stages
 * s = 0..log2(n)-1 with half-size m = 2^s and twiddles w_{2m}^k. The
 * batch rows are independent -> OpenMP across rows. Replaces the prover's
 * dominant host cost for fixture generation and recursive aggregation
 * (reference workload: plonky2_semaphore/recursion.rs proving).
 */

static inline uint64_t gl_pow(uint64_t a, uint64_t e) {
    uint64_t r = 1;
    while (e) {
        if (e & 1) r = gl_mul(r, a);
        a = gl_mul(a, a);
        e >>= 1;
    }
    return r;
}

/* data: [nb][n] uint64 in place; w_n: primitive n-th root of unity. */
void svt_ntt_batch(uint64_t *data, int64_t nb, int64_t n, uint64_t w_n) {
    int bits = __builtin_ctzll((unsigned long long)n);
    /* per-stage twiddle tables, total n-1 entries */
    uint64_t *tws = (uint64_t *)malloc(sizeof(uint64_t) * (size_t)n);
    uint64_t *p = tws;
    for (int s = 0; s < bits; s++) {
        int64_t m = 1ll << s;
        uint64_t wm = gl_pow(w_n, (uint64_t)(n / (2 * m)));
        uint64_t acc = 1;
        for (int64_t k = 0; k < m; k++) {
            p[k] = acc;
            acc = gl_mul(acc, wm);
        }
        p += m;
    }
#pragma omp parallel for schedule(static) if(nb > 1)
    for (int64_t b = 0; b < nb; b++) {
        uint64_t *v = data + b * n;
        for (int64_t i = 1, j = 0; i < n; i++) {
            int64_t bit = n >> 1;
            for (; j & bit; bit >>= 1) j ^= bit;
            j ^= bit;
            if (i < j) {
                uint64_t t = v[i];
                v[i] = v[j];
                v[j] = t;
            }
        }
        const uint64_t *pp = tws;
        for (int s = 0; s < bits; s++) {
            int64_t m = 1ll << s;
            for (int64_t blk = 0; blk < n; blk += 2 * m) {
                int64_t k = 0;
#if GL_HAVE_AVX512
                for (; k + 8 <= m; k += 8) {
                    V8 a = _mm512_loadu_si512((const void *)(v + blk + k));
                    V8 b = _mm512_loadu_si512((const void *)(v + blk + m + k));
                    V8 w = _mm512_loadu_si512((const void *)(pp + k));
                    V8 t = v_gl_mul(b, w);
                    _mm512_storeu_si512((void *)(v + blk + k), v_gl_add(a, t));
                    _mm512_storeu_si512((void *)(v + blk + m + k),
                                        v_gl_sub_any(a, t));
                }
#endif
                for (; k < m; k++) {
                    uint64_t a = v[blk + k];
                    uint64_t t = gl_mul(v[blk + m + k], pp[k]);
                    v[blk + k] = gl_add(a, t);
                    v[blk + m + k] = gl_sub_any(a, t);
                }
            }
            pp += m;
        }
    }
    free(tws);
}

/* coeffs[nb][n] -> out[nb][n_lde] on the coset shift*H: scale by shift^i,
 * zero-pad, forward NTT (bit-exact with ntt_np.coset_lde). */
void svt_coset_lde_batch(const uint64_t *coeffs, int64_t nb, int64_t n,
                         int rate_bits, uint64_t shift, uint64_t w_lde,
                         uint64_t *out) {
    int64_t n_lde = n << rate_bits;
    uint64_t *powers = (uint64_t *)malloc(sizeof(uint64_t) * (size_t)n);
    uint64_t acc = 1;
    for (int64_t i = 0; i < n; i++) {
        powers[i] = acc;
        acc = gl_mul(acc, shift);
    }
#pragma omp parallel for schedule(static) if(nb > 1)
    for (int64_t b = 0; b < nb; b++) {
        const uint64_t *src = coeffs + b * n;
        uint64_t *dst = out + b * n_lde;
        for (int64_t i = 0; i < n; i++) dst[i] = gl_mul(src[i], powers[i]);
        for (int64_t i = n; i < n_lde; i++) dst[i] = 0;
    }
    free(powers);
    svt_ntt_batch(out, nb, n_lde, w_lde);
}
