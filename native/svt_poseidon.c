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

/* states: [n, 12] row-major, in-place. */
void svt_permute_batch(uint64_t *states, int64_t n) {
#pragma omp parallel for schedule(static) if(n >= 8)
    for (int64_t i = 0; i < n; i++) poseidon12(states + (size_t)WIDTH * i);
}

/* plonky2 hash_n_to_m_no_pad, m=4: in [n, w] -> out [n, 4]. */
void svt_hash_no_pad_batch(const uint64_t *in, int64_t n, int64_t w,
                           uint64_t *out) {
#pragma omp parallel for schedule(static) if(n >= 8)
    for (int64_t i = 0; i < n; i++) {
        uint64_t s[WIDTH] = {0};
        const uint64_t *row = in + (size_t)w * i;
        for (int64_t start = 0; start < w; start += RATE) {
            int64_t c = w - start < RATE ? w - start : RATE;
            for (int64_t j = 0; j < c; j++) s[j] = row[start + j];
            poseidon12(s);
        }
        memcpy(out + 4 * i, s, 4 * sizeof(uint64_t));
    }
}

/* Merkle 8->4 compression over one level: in [m, 8] (left||right digests)
 * -> out [m, 4] (reference: chip/merkle_proof_chip.rs:58-70). */
void svt_merkle_level(const uint64_t *in, int64_t m, uint64_t *out) {
#pragma omp parallel for schedule(static) if(m >= 8)
    for (int64_t i = 0; i < m; i++) {
        uint64_t s[WIDTH] = {0};
        memcpy(s, in + 8 * i, 8 * sizeof(uint64_t));
        poseidon12(s);
        memcpy(out + 4 * i, s, 4 * sizeof(uint64_t));
    }
}

/* Fiat-Shamir PoW grind, one lane: duplex state12 with `k` buffered inputs
 * plus the candidate, pop the challenge from the END of the rate window
 * (state[7]; reference: chip/hasher_chip.rs:86), and require `pow_bits`
 * leading zero bits. Returns the first witness >= start. */
uint64_t svt_grind_pow(const uint64_t *state12, const uint64_t *prefix,
                       int64_t k, int32_t pow_bits, uint64_t start) {
    for (uint64_t cand = start;; cand++) {
        uint64_t s[WIDTH];
        memcpy(s, state12, sizeof s);
        for (int64_t j = 0; j < k; j++) s[j] = prefix[j];
        s[k] = cand;
        poseidon12(s);
        if (pow_bits == 0 || (s[RATE - 1] >> (64 - pow_bits)) == 0)
            return cand;
    }
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
#pragma omp parallel for schedule(static) if(n >= 4096)
    for (int64_t i = 0; i < n; i++) out[i] = gl_mul(a[i], b[i]);
}

/* out = a * b + c mod p (canonical inputs). */
void svt_gl_mul_add(const uint64_t *a, const uint64_t *b, const uint64_t *c,
                    uint64_t *out, int64_t n) {
#pragma omp parallel for schedule(static) if(n >= 4096)
    for (int64_t i = 0; i < n; i++) out[i] = gl_add(gl_mul(a[i], b[i]), c[i]);
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

static inline uint64_t gl_sub_any(uint64_t a, uint64_t b) {
    /* a - b mod p for ANY u64 representatives (matches gl64_np.sub) */
    uint64_t d = a - b;
    if (a < b) d -= GL_EPS;
    if (d >= GL_P) d -= GL_P;
    return d;
}

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
void svt_poseidon_eval_batch(const uint64_t *wires, int64_t n,
                             uint64_t *out) {
#pragma omp parallel for schedule(static) if(n >= 4096)
    for (int64_t j = 0; j < n; j++) {
        uint64_t w[135];
        for (int i = 0; i < 135; i++) w[i] = wires[(size_t)i * n + j];
        const uint64_t *in = w;
        const uint64_t *wout = w + 12;
        uint64_t swap = w[24];
        const uint64_t *delta = w + 25;
        const uint64_t *sb0 = w + 29;
        const uint64_t *psb = w + 65;
        const uint64_t *sb1 = w + 87;
        uint64_t o[123];
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

        for (int i = 0; i < 123; i++) out[(size_t)i * n + j] = o[i];
    }
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
                for (int64_t k = 0; k < m; k++) {
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
