/* Native host plane for the BN254 bridge hash
 * (Bn254PoseidonGoldilocksConfig; reference: bn245_poseidon/native.rs:43-77,
 * plonky2_config.rs:38-51, constants.rs:402-404).
 *
 * Fr (254-bit) elements are 4x64-bit limbs; multiplication is Montgomery
 * CIOS with __uint128_t partial products (R = 2^256). The width-12
 * Goldilocks bridge permutation packs 3 canonical Goldilocks per Fr in base
 * p (4 Fr + zero pad to t=5), runs the t=5 / R_F=8 / R_P=60 / x^5 Poseidon,
 * and unpacks the first 4 Fr back to 12 base-p digits (4th digit dropped,
 * like the reference's goldilocks_decompose).
 *
 * This is the prover/host-side accelerator: the TPU path is
 * ops/fr_bn254_jax.py (16-bit limb planes); bit-exactness between the two
 * and the python-int golden model is pinned in tests/test_native.py.
 *
 * Build: gcc -O3 -march=native -fopenmp -shared -fPIC svt_bn254.c
 */
#include <stdint.h>
#include <string.h>

#include "bn254_constants.h"

typedef unsigned __int128 u128;
typedef uint64_t u64;

typedef struct { u64 l[4]; } fr;

static inline int fr_ge(const fr *a, const u64 b[4]) {
    for (int i = 3; i >= 0; i--) {
        if (a->l[i] > b[i]) return 1;
        if (a->l[i] < b[i]) return 0;
    }
    return 1;
}

static inline void fr_cond_sub_q(fr *a) {
    if (fr_ge(a, BN_Q)) {
        u128 bor = 0;
        for (int i = 0; i < 4; i++) {
            u128 d = (u128)a->l[i] - BN_Q[i] - bor;
            a->l[i] = (u64)d;
            bor = (d >> 64) & 1;
        }
    }
}

static inline void fr_add(fr *out, const fr *a, const fr *b) {
    u128 c = 0;
    for (int i = 0; i < 4; i++) {
        c += (u128)a->l[i] + b->l[i];
        out->l[i] = (u64)c;
        c >>= 64;
    }
    /* a + b < 2q < 2^255: no carry out of limb 3 */
    fr_cond_sub_q(out);
}

/* Montgomery product a*b*R^-1 mod q (CIOS, 4 limbs + 2 carry words). */
static inline void fr_mont_mul(fr *out, const fr *a, const fr *b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 c = 0;
        for (int j = 0; j < 4; j++) {
            c += (u128)t[j] + (u128)a->l[i] * b->l[j];
            t[j] = (u64)c;
            c >>= 64;
        }
        c += t[4];
        t[4] = (u64)c;
        t[5] = (u64)(c >> 64);

        u64 m = t[0] * BN_QINV;
        c = (u128)t[0] + (u128)m * BN_Q[0];
        c >>= 64;
        for (int j = 1; j < 4; j++) {
            c += (u128)t[j] + (u128)m * BN_Q[j];
            t[j - 1] = (u64)c;
            c >>= 64;
        }
        c += t[4];
        t[3] = (u64)c;
        t[4] = t[5] + (u64)(c >> 64);
        t[5] = 0;
    }
    /* CONTRACT: a, b < q (canonical). CIOS then guarantees the pre-
     * reduction result < 2q, so t[4] == 0 and one conditional subtract
     * canonicalizes. (A former t[4] overflow branch was unreachable for
     * canonical inputs — and dropped a borrow — so it was removed; the
     * exported entry points document and enforce the contract.) */
    fr co = {{t[0], t[1], t[2], t[3]}};
    fr_cond_sub_q(&co);
    *out = co;
}

static inline void fr_sbox5(fr *x) {
    fr x2, x4;
    fr_mont_mul(&x2, x, x);
    fr_mont_mul(&x4, &x2, &x2);
    fr_mont_mul(x, &x4, x);
}

static inline void bn_mds(fr st[BN_T]) {
    fr out[BN_T];
    for (int i = 0; i < BN_T; i++) {
        fr acc = {{0, 0, 0, 0}};
        for (int j = 0; j < BN_T; j++) {
            fr p;
            const fr *m = (const fr *)BN_MDS[i * BN_T + j];
            fr_mont_mul(&p, m, &st[j]);
            fr_add(&acc, &acc, &p);
        }
        out[i] = acc;
    }
    memcpy(st, out, sizeof(out));
}

/* Full t=5 permutation on Montgomery-domain state
 * (schedule: add round constants, sbox (all lanes on full rounds, lane 0 on
 * partial rounds), MDS — reference: bn245_poseidon/native.rs:43-60). */
static void bn_permute_mont(fr st[BN_T]) {
    int r = 0;
    const int half = BN_RF / 2;
    for (int k = 0; k < half; k++, r++) {
        for (int i = 0; i < BN_T; i++)
            fr_add(&st[i], &st[i], (const fr *)BN_RC[r * BN_T + i]);
        for (int i = 0; i < BN_T; i++) fr_sbox5(&st[i]);
        bn_mds(st);
    }
    for (int k = 0; k < BN_RP; k++, r++) {
        for (int i = 0; i < BN_T; i++)
            fr_add(&st[i], &st[i], (const fr *)BN_RC[r * BN_T + i]);
        fr_sbox5(&st[0]);
        bn_mds(st);
    }
    for (int k = 0; k < half; k++, r++) {
        for (int i = 0; i < BN_T; i++)
            fr_add(&st[i], &st[i], (const fr *)BN_RC[r * BN_T + i]);
        for (int i = 0; i < BN_T; i++) fr_sbox5(&st[i]);
        bn_mds(st);
    }
}

/* ---- base-p Goldilocks pack / unpack ------------------------------- */

/* acc = acc * p + d  (acc 4 limbs, < p^3 throughout) */
static inline void horner_p(fr *acc, u64 d) {
    u128 c = d;
    for (int i = 0; i < 4; i++) {
        c += (u128)acc->l[i] * BN_GLP;
        acc->l[i] = (u64)c;
        c >>= 64;
    }
}

/* 3 canonical Goldilocks -> Fr (NOT Montgomery): x0 + x1 p + x2 p^2 < p^3 */
static inline void encode_gl3(fr *out, u64 x0, u64 x1, u64 x2) {
    memset(out, 0, sizeof(*out));
    out->l[0] = x2;
    horner_p(out, x1);
    horner_p(out, x0);
}

/* v -> (v mod p, v / p), high-to-low 128/64 schoolbook */
static inline u64 divmod_p(fr *v) {
    u128 rem = 0;
    for (int i = 3; i >= 0; i--) {
        u128 cur = (rem << 64) | v->l[i];
        v->l[i] = (u64)(cur / BN_GLP);
        rem = cur % BN_GLP;
    }
    return (u64)rem;
}

/* Canonical Fr -> 3 base-p digits (4th dropped; native.rs:70-77) */
static inline void decode_gl3(fr v, u64 d[3]) {
    d[0] = divmod_p(&v);
    d[1] = divmod_p(&v);
    d[2] = divmod_p(&v);
}

static inline u64 gl_canon(u64 x) {
    return x >= BN_GLP ? x - BN_GLP : x;
}

/* One width-12 bridge permutation in place. */
static void bridge_permute12_one(u64 s[12]) {
    fr st[BN_T];
    const fr r2 = {{BN_R2[0], BN_R2[1], BN_R2[2], BN_R2[3]}};
    for (int i = 0; i < 4; i++) {
        fr e;
        encode_gl3(&e, gl_canon(s[3 * i]), gl_canon(s[3 * i + 1]),
                   gl_canon(s[3 * i + 2]));
        fr_mont_mul(&st[i], &e, &r2); /* to Montgomery */
    }
    memset(&st[4], 0, sizeof(fr));
    bn_permute_mont(st);
    const fr one = {{1, 0, 0, 0}};
    for (int i = 0; i < 4; i++) {
        fr v;
        fr_mont_mul(&v, &st[i], &one); /* from Montgomery (canonical) */
        decode_gl3(v, &s[3 * i]);
    }
}

/* state: [n][12] uint64, permuted in place. */
void svt_bridge_permute_batch(u64 *state, int64_t n) {
#pragma omp parallel for schedule(static)
    for (int64_t k = 0; k < n; k++) bridge_permute12_one(state + 12 * k);
}

/* t=5 Fr permutation on canonical (non-Montgomery) 4-limb states
 * [n][5][4], in place — for differential tests against the python model.
 *
 * INPUT CONTRACT: fr_mont_mul requires operands < q; raw 256-bit inputs
 * are canonicalized on entry (at most 4 conditional subtracts: 2^256 < 5q)
 * so callers may pass any 4-limb value. */
void svt_bn254_permute_fr_batch(u64 *state, int64_t n) {
#pragma omp parallel for schedule(static)
    for (int64_t k = 0; k < n; k++) {
        fr st[BN_T];
        const fr r2 = {{BN_R2[0], BN_R2[1], BN_R2[2], BN_R2[3]}};
        u64 *s = state + 20 * k;
        for (int i = 0; i < BN_T; i++) {
            fr e;
            memcpy(e.l, s + 4 * i, 32);
            for (int r = 0; r < 4; r++) fr_cond_sub_q(&e);
            fr_mont_mul(&st[i], &e, &r2);
        }
        bn_permute_mont(st);
        const fr one = {{1, 0, 0, 0}};
        for (int i = 0; i < BN_T; i++) {
            fr v;
            fr_mont_mul(&v, &st[i], &one);
            memcpy(s + 4 * i, v.l, 32);
        }
    }
}
