"""Fused Poseidon-over-Goldilocks permutation as a Pallas TPU kernel.

The whole 30-round permutation (8 full + 22 partial rounds, alpha=7, dense
12x12 MDS) runs as ONE kernel on the VPU, with the batch in the lane
dimension: state layout is u32[12, B] x2 (lo/hi planes). Goldilocks
arithmetic uses exact 16x16->32 partial products and the p = 2^64-2^32+1
fold (identical math to ops/gl64_jax.py, which is the golden model here).

This single kernel replaces hundreds of XLA-graph permutations in the
verifier's transcript and Merkle stages — it is the framework's hottest op
(reference workload analogy: chip/hasher_chip.rs + merkle_proof_chip.rs are
the row-count hot spots of the reference circuit).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .._poseidon_gl_constants import (
    ALL_ROUND_CONSTANTS,
    HALF_N_FULL_ROUNDS,
    MDS_MATRIX_CIRC,
    MDS_MATRIX_DIAG,
    N_PARTIAL_ROUNDS,
    WIDTH,
)

_LO16 = np.uint32(0xFFFF)
_16 = np.uint32(16)
_U32MAX = np.uint32(0xFFFFFFFF)
_0 = np.uint32(0)
_1 = np.uint32(1)

_RC = np.asarray(ALL_ROUND_CONSTANTS, np.uint64).reshape(30, WIDTH)
_RC_LO = (_RC & np.uint64(0xFFFFFFFF)).astype(np.uint32)
_RC_HI = (_RC >> np.uint64(32)).astype(np.uint32)

_MDS = np.zeros((WIDTH, WIDTH), np.uint32)
for _r in range(WIDTH):
    for _j in range(WIDTH):
        _MDS[_r, _j] = MDS_MATRIX_CIRC[(_j - _r) % WIDTH]
    _MDS[_r, _r] += MDS_MATRIX_DIAG[_r]


def _mul_gl(alo, ahi, blo, bhi):
    """Goldilocks mul on u32 lanes (same algorithm as gl64_jax.mul)."""

    def mul32(a, b):
        a0, a1 = a & _LO16, a >> _16
        b0, b1 = b & _LO16, b >> _16
        p00 = a0 * b0
        p01 = a0 * b1
        p10 = a1 * b0
        p11 = a1 * b1
        mid = (p00 >> _16) + (p01 & _LO16) + (p10 & _LO16)
        lo = (p00 & _LO16) + ((mid & _LO16) << _16)
        hi = p11 + (p01 >> _16) + (p10 >> _16) + (mid >> _16)
        return lo, hi

    l0, l1 = mul32(alo, blo)
    m0, m1 = mul32(alo, bhi)
    n0, n1 = mul32(ahi, blo)
    h0, h1 = mul32(ahi, bhi)
    x1 = l1 + m0
    c1 = (x1 < l1).astype(jnp.uint32)
    x1b = x1 + n0
    c1b = (x1b < x1).astype(jnp.uint32)
    x2 = h0 + m1
    c2 = (x2 < h0).astype(jnp.uint32)
    x2b = x2 + n1
    c2b = (x2b < x2).astype(jnp.uint32)
    x2c = x2b + c1 + c1b
    c2c = (x2c < x2b).astype(jnp.uint32)
    x3 = h1 + c2 + c2b + c2c
    return _reduce128(l0, x1b, x2c, x3, canon=False)


def _add64(alo, ahi, blo, bhi):
    lo = alo + blo
    c = (lo < alo).astype(jnp.uint32)
    h1 = ahi + bhi
    c1 = (h1 < ahi).astype(jnp.uint32)
    hi = h1 + c
    c2 = (hi < h1).astype(jnp.uint32)
    return lo, hi, c1 | c2


def _sub64(alo, ahi, blo, bhi):
    lo = alo - blo
    b0 = (alo < blo).astype(jnp.uint32)
    h1 = ahi - bhi
    b1 = (ahi < bhi).astype(jnp.uint32)
    hi = h1 - b0
    b2 = (h1 < b0).astype(jnp.uint32)
    return lo, hi, b1 | b2


def _canonical(lo, hi):
    ge = ((hi == _U32MAX) & (lo >= _1)).astype(jnp.uint32)
    return lo - ge, hi + ge


def _reduce128(x0, x1, x2, x3, canon=True):
    """(x0..x3 columns) mod p as a u64 (lo, hi). canon=False keeps the
    representative in [0, 2^64) without the final p-subtraction — valid
    input to every round op (mul/add handle any u64 rep); the kernel
    canonicalizes once at its output instead of ~500 times per permutation."""
    lo, hi, bo = _sub64(x0, x1, x3, jnp.zeros_like(x3))
    lo, hi, _ = _sub64(lo, hi, bo * _U32MAX, jnp.zeros_like(bo))
    t1lo = _0 - x2
    t1bo = (x2 != _0).astype(jnp.uint32)
    t1hi = x2 - t1bo
    lo, hi, of = _add64(lo, hi, t1lo, t1hi)
    lo, hi, _ = _add64(lo, hi, of * _U32MAX, jnp.zeros_like(of))
    if not canon:
        return lo, hi
    return _canonical(lo, hi)


def _add_gl(alo, ahi, blo, bhi):
    """a + b mod p on possibly NON-canonical u64 reps: the 2^64 wrap folds
    as +EPSILON, and with reps up to 2^64-1 the fold itself can wrap once
    more (gl64_jax.add does the same double correction)."""
    lo, hi, of = _add64(alo, ahi, blo, bhi)
    z = jnp.zeros_like(of)
    lo, hi, of2 = _add64(lo, hi, of * _U32MAX, z)
    lo, hi, _ = _add64(lo, hi, of2 * _U32MAX, z)
    return lo, hi


_CIRC = np.asarray(MDS_MATRIX_CIRC, np.uint32)
_DIAG0 = np.uint32(MDS_MATRIX_DIAG[0])
_MDS_F32 = _MDS.astype(np.float32)
_255 = np.uint32(0xFF)
_8 = np.uint32(8)
_24 = np.uint32(24)


def _mds_mxu(state_lo, state_hi, mds_f32):
    """MDS multiply on [12, B] planes via ONE f32 MXU matmul.

    The 12x12 MDS entries are <= 49 (6 bits); splitting the state into
    eight 8-bit limb planes keeps every dot-product term exact in f32:
    6 + 8 bits per product, x12 terms -> < 2^18 << 2^24 mantissa. All 8
    limb planes ride one [12,12] @ [12, 8B] matmul (the limbs don't mix),
    then recombine on the VPU with the same 16-bit-column carry walk as
    the pure-VPU path."""
    # Mosaic has no direct u32<->f32 cast; hop through i32 (limbs are 8-bit,
    # matmul outputs < 2^18 — both exact in i32 and f32)
    def _f32(u):
        return u.astype(jnp.int32).astype(jnp.float32)

    limbs = [
        _f32(state_lo & _255),
        _f32((state_lo >> _8) & _255),
        _f32((state_lo >> _16) & _255),
        _f32(state_lo >> _24),
        _f32(state_hi & _255),
        _f32((state_hi >> _8) & _255),
        _f32((state_hi >> _16) & _255),
        _f32(state_hi >> _24),
    ]
    x = jnp.concatenate(limbs, axis=1)  # [12, 8B]
    y = jax.lax.dot_general(
        mds_f32, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    B = state_lo.shape[1]
    ys = [y[:, k * B:(k + 1) * B].astype(jnp.int32).astype(jnp.uint32)
          for k in range(8)]
    # pair 8-bit-spaced columns into the 16-bit-spaced c0..c3 (< 2^26) the
    # VPU recombiner expects
    c0 = ys[0] + (ys[1] << _8)
    c1 = ys[2] + (ys[3] << _8)
    c2 = ys[4] + (ys[5] << _8)
    c3 = ys[6] + (ys[7] << _8)
    t01 = (c0 >> _16) + c1
    x0 = (c0 & _LO16) + ((t01 & _LO16) << _16)
    t2 = (t01 >> _16) + c2
    t3 = (t2 >> _16) + c3
    x1 = (t2 & _LO16) + ((t3 & _LO16) << _16)
    x2 = t3 >> _16
    return _reduce128(x0, x1, x2, jnp.zeros_like(x2), canon=False)


def _mds_limb(state_lo, state_hi, roll=jnp.roll):
    """MDS multiply on [12, B] planes via the circulant roll-mac form
    (Mosaic's MXU has no i32 matmul; this is pure VPU: 16-bit limb columns
    stay exact in uint32, sums < 2^26)."""
    limbs = [
        state_lo & _LO16,
        state_lo >> _16,
        state_hi & _LO16,
        state_hi >> _16,
    ]
    cols = []
    for l in limbs:
        # out[r] = sum_t CIRC[t] * l[(r+t) % 12]  (+ DIAG[0]*l[0] at row 0)
        acc = l * _CIRC[0]
        for t in range(1, 12):
            acc = acc + roll(l, -t, 0) * _CIRC[t]
        row0 = acc[0:1] + l[0:1] * _DIAG0
        acc = jnp.concatenate([row0, acc[1:]], axis=0)
        cols.append(acc)
    c0, c1, c2, c3 = cols
    t01 = (c0 >> _16) + c1
    x0 = (c0 & _LO16) + ((t01 & _LO16) << _16)
    t2 = (t01 >> _16) + c2
    t3 = (t2 >> _16) + c3
    x1 = (t2 & _LO16) + ((t3 & _LO16) << _16)
    x2 = t3 >> _16
    return _reduce128(x0, x1, x2, jnp.zeros_like(x2), canon=False)


def _sbox7(lo, hi):
    l2, h2 = _mul_gl(lo, hi, lo, hi)
    l3, h3 = _mul_gl(l2, h2, lo, hi)
    l4, h4 = _mul_gl(l2, h2, l2, h2)
    return _mul_gl(l3, h3, l4, h4)


def _permute_planes(lo, hi, rc_lo=None, rc_hi=None, roll=jnp.roll,
                    mds=None):
    """The full permutation on [12, B] u32 planes (pure jnp; usable both
    inside the Pallas kernel and as an XLA fallback)."""
    if rc_lo is None:
        rc_lo = jnp.asarray(_RC_LO)
        rc_hi = jnp.asarray(_RC_HI)
    if mds is None:
        mds = lambda l, h: _mds_limb(l, h, roll)
    r = 0
    for _ in range(HALF_N_FULL_ROUNDS):
        lo, hi = _add_gl(lo, hi, rc_lo[r][:, None], rc_hi[r][:, None])
        lo, hi = _sbox7(lo, hi)
        lo, hi = mds(lo, hi)
        r += 1
    for _ in range(N_PARTIAL_ROUNDS):
        lo, hi = _add_gl(lo, hi, rc_lo[r][:, None], rc_hi[r][:, None])
        s0l, s0h = _sbox7(lo[:1], hi[:1])
        lo = jnp.concatenate([s0l, lo[1:]], axis=0)
        hi = jnp.concatenate([s0h, hi[1:]], axis=0)
        lo, hi = mds(lo, hi)
        r += 1
    for _ in range(HALF_N_FULL_ROUNDS):
        lo, hi = _add_gl(lo, hi, rc_lo[r][:, None], rc_hi[r][:, None])
        lo, hi = _sbox7(lo, hi)
        lo, hi = mds(lo, hi)
        r += 1
    # rounds run on non-canonical reps; canonicalize once at the output so
    # digests/challenges match the golden model bit-for-bit
    return _canonical(lo, hi)


def _kernel(lo_ref, hi_ref, rc_lo_ref, rc_hi_ref, out_lo_ref, out_hi_ref):
    from jax.experimental.pallas import tpu as pltpu

    def roll(x, shift, axis):
        return pltpu.roll(x, shift % 12, axis)

    lo, hi = _permute_planes(
        lo_ref[...], hi_ref[...], rc_lo_ref[...], rc_hi_ref[...], roll
    )
    out_lo_ref[...] = lo
    out_hi_ref[...] = hi


def _kernel_mxu(lo_ref, hi_ref, rc_lo_ref, rc_hi_ref, mds_ref,
                out_lo_ref, out_hi_ref):
    mds = lambda l, h: _mds_mxu(l, h, mds_ref[...])
    lo, hi = _permute_planes(
        lo_ref[...], hi_ref[...], rc_lo_ref[...], rc_hi_ref[...], mds=mds
    )
    out_lo_ref[...] = lo
    out_hi_ref[...] = hi


def _permute_planes_2stream(lo, hi, rc_lo, rc_hi, mds):
    """Two independent half-tiles interleaved round by round so the
    scheduler can overlap one stream's MXU MDS matmul with the other's
    VPU sbox chain (the dependence graph permits it; same math)."""
    B = lo.shape[1]
    h = B // 2
    A = (lo[:, :h], hi[:, :h])
    C = (lo[:, h:], hi[:, h:])

    def rc_sbox(st, r, partial):
        l, hh = _add_gl(st[0], st[1], rc_lo[r][:, None], rc_hi[r][:, None])
        if partial:
            s0l, s0h = _sbox7(l[:1], hh[:1])
            l = jnp.concatenate([s0l, l[1:]], axis=0)
            hh = jnp.concatenate([s0h, hh[1:]], axis=0)
        else:
            l, hh = _sbox7(l, hh)
        return l, hh

    for r in range(2 * HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS):
        partial = HALF_N_FULL_ROUNDS <= r < HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS
        A = rc_sbox(A, r, partial)
        A_m = mds(*A)          # MXU for stream A ...
        C = rc_sbox(C, r, partial)  # ... while the VPU works on stream C
        A = A_m
        C = mds(*C)
    A = _canonical(*A)
    C = _canonical(*C)
    return (jnp.concatenate([A[0], C[0]], axis=1),
            jnp.concatenate([A[1], C[1]], axis=1))


def _kernel_mxu2(lo_ref, hi_ref, rc_lo_ref, rc_hi_ref, mds_ref,
                 out_lo_ref, out_hi_ref):
    mds = lambda l, h: _mds_mxu(l, h, mds_ref[...])
    lo, hi = _permute_planes_2stream(
        lo_ref[...], hi_ref[...], rc_lo_ref[...], rc_hi_ref[...], mds)
    out_lo_ref[...] = lo
    out_hi_ref[...] = hi


def _use_mxu() -> int:
    """0 = pure-VPU MDS, 1 = MXU MDS, 2 = MXU MDS + two interleaved streams.

    Default 2: validated bit-exact on a real v5e chip and measured fastest
    there (chained x32, B=32768: 20.7 M perms/s vs 16.8 v1 / 13.8 v0 —
    tools/bench_poseidon_kernels.py). SVT_PALLAS_MXU overrides."""
    import os

    return int(os.environ.get("SVT_PALLAS_MXU", "2") or 0)


@functools.partial(jax.jit, static_argnames=("interpret", "block_b", "mxu"))
def poseidon_permute_batch(lo, hi, interpret=False, block_b=1024, mxu=None):
    """Batched permutation: lo/hi u32[12, B] -> (u32[12, B], u32[12, B]).

    One fused Pallas kernel per `block_b` batch tile. mxu=True routes the
    per-round MDS multiply through the MXU (8-bit-limb f32 matmul, exact);
    default reads SVT_PALLAS_MXU (on unless set to 0).
    """
    from jax.experimental import pallas as pl

    if mxu is None:
        mxu = _use_mxu()
    B = lo.shape[1]
    if B < 128:
        # small batches: plain XLA path (kernel wants full lanes)
        return _permute_planes(lo, hi)
    bb = min(block_b, B)
    if B % bb:
        return _permute_planes(lo, hi)
    grid = (B // bb,)
    spec = pl.BlockSpec((WIDTH, bb), lambda i: (0, i))
    const_spec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))
    out_shape = [
        jax.ShapeDtypeStruct((WIDTH, B), jnp.uint32),
        jax.ShapeDtypeStruct((WIDTH, B), jnp.uint32),
    ]
    if mxu:
        kernel = _kernel_mxu2 if (int(mxu) >= 2 and bb % 256 == 0) \
            else _kernel_mxu
        return tuple(
            pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[spec, spec, const_spec((30, WIDTH)),
                          const_spec((30, WIDTH)),
                          const_spec((WIDTH, WIDTH))],
                out_specs=[spec, spec],
                out_shape=out_shape,
                interpret=interpret,
            )(lo, hi, jnp.asarray(_RC_LO), jnp.asarray(_RC_HI),
              jnp.asarray(_MDS_F32))
        )
    return tuple(
        pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[spec, spec, const_spec((30, WIDTH)),
                      const_spec((30, WIDTH))],
            out_specs=[spec, spec],
            out_shape=out_shape,
            interpret=interpret,
        )(lo, hi, jnp.asarray(_RC_LO), jnp.asarray(_RC_HI))
    )


def permute_gf(state):
    """GF-typed entry: state GF[12, ...] -> GF[12, ...] via the fused kernel
    (batch = flattened trailing dims in the lane dimension; XLA planes path
    for small/ragged batches)."""
    import os

    from ..gl64_jax import GF

    trailing = state.l0.shape[1:]
    L = 1
    for d in trailing:
        L *= d
    lo = (state.l0 + (state.l1 << _16)).reshape(12, L)
    hi = (state.l2 + (state.l3 << _16)).reshape(12, L)
    interpret = os.environ.get("SVT_PALLAS_INTERPRET") == "1"
    if L >= 128 and L % 128 == 0:
        out_lo, out_hi = poseidon_permute_batch(lo, hi, interpret=interpret)
    else:
        out_lo, out_hi = _permute_planes(lo, hi)
    out_lo = out_lo.reshape((12,) + trailing)
    out_hi = out_hi.reshape((12,) + trailing)
    return GF(out_lo & _LO16, out_lo >> _16, out_hi & _LO16, out_hi >> _16)
