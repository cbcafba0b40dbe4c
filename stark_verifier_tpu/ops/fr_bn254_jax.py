"""BN254 scalar-field (Fr) arithmetic and the width-5 Poseidon bridge
permutation — JAX/TPU backend.

TPUs have no wide-integer datapath, so Fr elements (254 bits) are carried as
SIXTEEN 16-bit limb planes in uint32 lanes (leading axis 16, batch trailing):
limb products are exact in uint32 and every carry is a shift/add, the same
design as the Goldilocks backend (ops/gl64_jax.py). Multiplication is
Montgomery (R = 2^256) with a 16-step CIOS loop.

This implements the TPU side of `Bn254PoseidonGoldilocksConfig`: the t=5,
R_F=8, R_P=60, x^5 Poseidon permutation over Fr, and the 3-Goldilocks<->Fr
base-p pack/unpack (reference: bn245_poseidon/native.rs:43-77,
plonky2_config.rs:38-51, constants.rs:402-404). The host python-int model
(ops/poseidon_bn254.py) is the differential-test golden model.

The base-p unpack needs v mod p and v div p on 254-bit values: mod p is the
Goldilocks fold of the four 64-bit chunks; div p is Hensel exact division
(multiply by p^-1 mod 2^192 — exact because the true quotient fits).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ._poseidon_bn254_constants import (
    FR_MODULUS,
    MDS_MATRIX,
    R_F,
    R_P,
    ROUND_CONSTANTS,
    T,
)
from . import gl64_jax as gj

N_LIMBS = 16
_M16 = np.uint32(0xFFFF)
_16 = np.uint32(16)

Q = FR_MODULUS
R = 1 << (16 * N_LIMBS)            # Montgomery radix 2^256
R2 = (R * R) % Q
QP16 = (-pow(Q, -1, 1 << 16)) % (1 << 16)   # -q^-1 mod 2^16
GL_P = 0xFFFFFFFF00000001


def _int_to_limbs(v: int, n: int) -> np.ndarray:
    return np.array([(v >> (16 * i)) & 0xFFFF for i in range(n)], np.uint32)


def _limbs_to_int(limbs) -> int:
    out = 0
    for i, l in enumerate(np.asarray(limbs, np.uint64)):
        out |= int(l) << (16 * i)
    return out


_Q_LIMBS = _int_to_limbs(Q, N_LIMBS)
_PINV192 = _int_to_limbs(pow(GL_P, -1, 1 << 192), 12)   # p^-1 mod 2^192
_P_LIMBS4 = _int_to_limbs(GL_P, 4)
_P2_LIMBS8 = _int_to_limbs(GL_P * GL_P, 8)
# 2^(64k) mod p for the fold in `mod_glp`
_C64 = [pow(2, 64 * k, GL_P) for k in range(4)]

# Montgomery-domain constants
_RC_M = np.stack([
    _int_to_limbs(c * R % Q, N_LIMBS) for c in ROUND_CONSTANTS
])  # [R_F*T + R_P*T? actually len(ROUND_CONSTANTS), 16]
_MDS_M = np.stack([
    _int_to_limbs(c * R % Q, N_LIMBS) for c in MDS_MATRIX
])  # [T*T, 16]


# ------------------------------------------------------------ host converts
def from_int(v: int, shape=()) -> jnp.ndarray:
    """Canonical python int -> Fr limbs [16, *shape] (NOT Montgomery)."""
    limbs = _int_to_limbs(v % Q, N_LIMBS)
    return jnp.broadcast_to(
        jnp.asarray(limbs).reshape((N_LIMBS,) + (1,) * len(shape)),
        (N_LIMBS,) + tuple(shape)).astype(jnp.uint32)


def from_ints(vals) -> jnp.ndarray:
    """List of python ints -> Fr limbs [16, len(vals)]."""
    arr = np.stack([_int_to_limbs(int(v) % Q, N_LIMBS) for v in vals], axis=1)
    return jnp.asarray(arr)


def to_ints(x) -> list:
    """Fr limbs [16, n] -> python ints (host)."""
    a = np.asarray(x, np.uint64)
    flat = a.reshape(N_LIMBS, -1)
    return [
        sum(int(flat[i, k]) << (16 * i) for i in range(N_LIMBS))
        for k in range(flat.shape[1])
    ]


def zeros(shape=()) -> jnp.ndarray:
    return jnp.zeros((N_LIMBS,) + tuple(shape), jnp.uint32)


# ------------------------------------------------------------- limb helpers
def _carry_pass_n(cols):
    """List of u32 columns -> normalized 16-bit limbs + top carry."""
    out = []
    r = cols[0]
    for j in range(len(cols)):
        out.append(r & _M16)
        nxt = cols[j + 1] if j + 1 < len(cols) else None
        r = (r >> _16) + (nxt if nxt is not None else 0)
    return out, r  # r = final carry-out


def _sub_limbs(a_limbs, b_limbs):
    """a - b over n 16-bit limbs (borrow chain); returns (limbs, borrow)."""
    n = len(a_limbs)
    out = []
    borrow = jnp.zeros_like(a_limbs[0])
    for j in range(n):
        d = a_limbs[j] + (_M16 + np.uint32(1)) - b_limbs[j] - borrow
        out.append(d & _M16)
        borrow = np.uint32(1) - (d >> _16)  # 1 if a_j < b_j + borrow
    return out, borrow


def _cond_sub_q(t):
    """t (< 2q, 16 limbs [16, ...]) -> canonical t mod q."""
    limbs = [t[j] for j in range(N_LIMBS)]
    qb = [jnp.asarray(np.uint32(_Q_LIMBS[j])) for j in range(N_LIMBS)]
    diff, borrow = _sub_limbs(limbs, qb)
    ge = borrow == 0  # t >= q
    return jnp.stack([jnp.where(ge, diff[j], limbs[j]) for j in range(N_LIMBS)])


# ---------------------------------------------------------------- field ops
def add(a, b):
    """Fr addition (works in and out of Montgomery domain)."""
    cols = [a[j] + b[j] for j in range(N_LIMBS)]
    limbs, top = _carry_pass_n(cols)
    # a + b < 2q < 2^255: top carry is always 0
    return _cond_sub_q(jnp.stack(limbs))


def mont_mul(a, b):
    """Montgomery product a*b*R^-1 mod q on [16, ...] limb stacks.

    CIOS: 16 iterations of (t += a_i*b; m = -t0/q0 mod 2^16; t += m*q;
    t >>= 16), all carries shift/add, partial products exact in uint32.
    The iteration runs as a lax.scan over a_i so the trace holds ONE body
    (~200 ops) instead of 16 unrolled copies — XLA:CPU's pass pipeline is
    pathologically slow on the unrolled form (hour-scale compiles)."""
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    bb = jnp.broadcast_to(b, (N_LIMBS,) + shape)
    aa = jnp.broadcast_to(a, (N_LIMBS,) + shape)
    qb = jnp.asarray(_Q_LIMBS).reshape((N_LIMBS,) + (1,) * len(shape))
    qp = np.uint32(QP16)
    zero_row = jnp.zeros((1,) + shape, jnp.uint32)

    def body(t, ai):
        # t: [17, ...] running accumulator (16-bit limbs, normalized)
        u = ai * bb                                   # [16,...] exact
        u_sh = jnp.concatenate([zero_row, u[:-1] >> _16], axis=0)
        c = jnp.concatenate(
            [t[:N_LIMBS] + (u & _M16) + u_sh,
             t[N_LIMBS:] + (u[N_LIMBS - 1 :] >> _16)], axis=0)
        m = ((c[0] & _M16) * qp) & _M16
        v = m * qb                                    # [16,...] exact
        v_sh = jnp.concatenate([zero_row, v[:-1] >> _16], axis=0)
        c = jnp.concatenate(
            [c[:N_LIMBS] + (v & _M16) + v_sh,
             c[N_LIMBS:] + (v[N_LIMBS - 1 :] >> _16)], axis=0)
        # carry-normalize and shift one limb down (c[0] ≡ 0 mod 2^16)
        limbs, top = _carry_pass_n([c[j] for j in range(N_LIMBS + 1)])
        t = jnp.stack(limbs[1:] + [top])
        return t, None

    t0 = jnp.zeros((N_LIMBS + 1,) + shape, jnp.uint32)
    t, _ = jax.lax.scan(body, t0, aa)
    return _cond_sub_q(t[:N_LIMBS])


def to_mont(a):
    return mont_mul(a, jnp.reshape(jnp.asarray(_int_to_limbs(R2, N_LIMBS)),
                                   (N_LIMBS,) + (1,) * (a.ndim - 1)))


def from_mont(a):
    one = jnp.zeros_like(a).at[0].set(1)
    return mont_mul(a, one)


def _sbox5(x):
    x2 = mont_mul(x, x)
    x4 = mont_mul(x2, x2)
    return mont_mul(x4, x)


def _mds_layer(state):
    """state [16, T, ...] -> M @ state, via one batched Montgomery multiply
    of all T*T (constant, lane) pairs then 4 Fr adds per output lane."""
    shape = state.shape[2:]
    mds = jnp.asarray(_MDS_M.T).reshape((N_LIMBS, T * T) + (1,) * len(shape))
    tiled = jnp.tile(state, (1, T) + (1,) * len(shape))  # row-major (i,j)
    prod = mont_mul(mds, tiled)  # [16, T*T, ...]
    prod = prod.reshape((N_LIMBS, T, T) + shape)
    acc = prod[:, :, 0]
    for j in range(1, T):
        acc = add(acc, prod[:, :, j])
    return acc


def permute_fr_mont(state):
    """Full bridge permutation on Montgomery-domain state [16, T, ...]
    (reference schedule: bn245_poseidon/native.rs:43-60).

    The 68 rounds run as three lax.scans (full/partial/full) so the trace
    holds each round body once (~10k eqns) instead of 68 unrolled copies."""
    shape = state.shape[2:]
    rc = np.asarray(_RC_M).reshape(R_F + R_P, T, N_LIMBS)
    rc = np.moveaxis(rc, -1, 1).reshape(
        (R_F + R_P, N_LIMBS, T) + (1,) * len(shape))
    rc = jnp.asarray(rc)

    half = R_F // 2

    def full_body(st, rc_r):
        st = add(st, rc_r)
        st = _sbox5(st)
        return _mds_layer(st), None

    def partial_body(st, rc_r):
        st = add(st, rc_r)
        lane0 = _sbox5(st[:, :1])
        st = jnp.concatenate([lane0, st[:, 1:]], axis=1)
        return _mds_layer(st), None

    state, _ = jax.lax.scan(full_body, state, rc[:half])
    state, _ = jax.lax.scan(partial_body, state, rc[half : half + R_P])
    state, _ = jax.lax.scan(full_body, state, rc[half + R_P :])
    return state


# ------------------------------------------------- Goldilocks pack / unpack
def encode_gl3(x0: gj.GF, x1: gj.GF, x2: gj.GF) -> jnp.ndarray:
    """3 canonical Goldilocks -> Fr (NOT Montgomery): x0 + x1 p + x2 p^2.

    The value is < p^3 < 2^192 < q, so no reduction is needed
    (reference: bn245_poseidon/native.rs:62-67)."""
    x0 = gj.canonical(x0)
    x1 = gj.canonical(x1)
    x2 = gj.canonical(x2)
    shape = x0.l0.shape
    cols = [jnp.zeros(shape, jnp.uint32) for _ in range(N_LIMBS)]
    for j in range(4):
        cols[j] = cols[j] + x0[j]
    # x1 * p (4x4 limbs) and x2 * p^2 (4x8 limbs), exact lo/hi accumulation
    for (xs, plimbs) in ((x1, _P_LIMBS4), (x2, _P2_LIMBS8)):
        for i in range(4):
            for j, pl in enumerate(plimbs):
                if pl == 0:
                    continue
                prod = xs[i] * np.uint32(pl)
                cols[i + j] = cols[i + j] + (prod & _M16)
                cols[i + j + 1] = cols[i + j + 1] + (prod >> _16)
    limbs, top = _carry_pass_n(cols)
    # value < p^3: top carry is 0
    return jnp.stack(limbs)


def _gf_from_limbs(limbs4):
    return gj.GF(limbs4[0], limbs4[1], limbs4[2], limbs4[3])


def _mod_glp(limb_list) -> gj.GF:
    """Value (16-bit limbs, any count <= 16) mod p, as canonical GF."""
    n64 = (len(limb_list) + 3) // 4
    groups = []
    for k in range(n64):
        g = limb_list[4 * k : 4 * k + 4]
        g = g + [jnp.zeros_like(limb_list[0])] * (4 - len(g))
        groups.append(_gf_from_limbs(g))
    acc = groups[0]
    for k in range(1, n64):
        acc = gj.add(acc, gj.mul(groups[k], gj.const(_C64[k], groups[k].l0.shape)))
    return gj.canonical(acc)


def _exact_div_p(limb_list, quot_limbs: int):
    """(value - (value mod p)) / p via Hensel: multiply by p^-1 mod 2^(16*q).

    Returns (digit = value mod p as GF, quotient limbs list)."""
    d = _mod_glp(limb_list)
    dl = [d.l0, d.l1, d.l2, d.l3] + [jnp.zeros_like(d.l0)] * (len(limb_list) - 4)
    diff, _ = _sub_limbs(limb_list, dl)
    # truncated schoolbook: (diff * pinv) mod 2^(16*quot_limbs)
    cols = [jnp.zeros_like(limb_list[0]) for _ in range(quot_limbs)]
    for i in range(min(len(diff), quot_limbs)):
        for j in range(min(12, quot_limbs - i)):
            pl = int(_PINV192[j])
            if pl == 0:
                continue
            prod = diff[i] * np.uint32(pl)
            cols[i + j] = cols[i + j] + (prod & _M16)
            if i + j + 1 < quot_limbs:
                cols[i + j + 1] = cols[i + j + 1] + (prod >> _16)
    limbs, _ = _carry_pass_n(cols)
    return d, limbs


def decode_gl3(fr_limbs) -> list:
    """Canonical Fr [16, ...] -> 3 base-p Goldilocks digits (the 4th digit is
    dropped, like the reference's goldilocks_decompose; native.rs:70-77)."""
    v = [fr_limbs[j] for j in range(N_LIMBS)]
    d0, w = _exact_div_p(v, 12)       # quotient < 2^190 / p... < 2^192
    d1, w2 = _exact_div_p(w, 8)       # quotient < 2^128
    d2 = _mod_glp(w2)
    return [d0, d1, d2]


def permute12_bridge(state: gj.GF) -> gj.GF:
    """The width-12 Goldilocks bridge permutation: pack 3 GL per Fr (4 Fr +
    zero pad to t=5), BN254-permute, unpack the first 4 Fr -> 12 GL
    (reference: plonky2_config.rs:38-51).

    The 4 pack/unpack lanes ride one stacked [4, ...] axis, so the (static,
    unrolled) limb schoolbook loops in encode_gl3/decode_gl3 are traced once
    instead of four times — this permutation body appears inline at every
    sequential sponge step of a bn254-config transcript, so its trace size
    directly multiplies into the wrapped-verifier compile time."""
    x0 = gj.take(state, np.array([0, 3, 6, 9]))    # [4, ...]
    x1 = gj.take(state, np.array([1, 4, 7, 10]))
    x2 = gj.take(state, np.array([2, 5, 8, 11]))
    fr = encode_gl3(x0, x1, x2)                     # [16, 4, ...]
    packed = jnp.concatenate([fr, jnp.zeros_like(fr[:, :1])], axis=1)
    packed = to_mont(packed)
    out = permute_fr_mont(packed)
    out = from_mont(out)
    d0, d1, d2 = decode_gl3(out[:, :4])             # each GF [4, ...]
    # interleave to [12, ...]: row 3*i + j = digit_j of Fr lane i
    return gj.gmap(
        lambda a0, a1, a2: jnp.stack([a0, a1, a2], axis=1).reshape(
            (12,) + a0.shape[1:]),
        d0, d1, d2)
