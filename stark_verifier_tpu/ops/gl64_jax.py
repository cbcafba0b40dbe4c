"""Goldilocks field GF(p), p = 2^64 - 2^32 + 1 — JAX/TPU backend.

TPUs have no native 64-bit integer datapath, so field elements are carried as
pairs of uint32 lanes (lo, hi) in a `GF` pytree; 32x32->64 products are built
from exact 16x16->32 partial products on the VPU. All ops are elementwise,
branch-free and shape-polymorphic, so the whole verifier vmaps over a proof
batch and shards over a device mesh.

Mathematical semantics are identical to `gl64_np` (the numpy golden model)
and to what the reference circuit constrains (reference:
chip/native_chip/arithmetic_chip.rs:19,98-133 — canonical r < p after every
mul-add, quadratic extension with x^2 = 7).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

P = 0xFFFFFFFF00000001
EPSILON = 0xFFFFFFFF

_LO16 = np.uint32(0xFFFF)
_16 = np.uint32(16)
_U32MAX = np.uint32(0xFFFFFFFF)
_0 = np.uint32(0)
_1 = np.uint32(1)


class GF(NamedTuple):
    """A Goldilocks element as two uint32 lanes: value = lo + hi * 2^32."""

    lo: jnp.ndarray
    hi: jnp.ndarray

    @property
    def shape(self):
        return jnp.shape(self.lo)


def _u32(x):
    return jnp.asarray(x, dtype=jnp.uint32)


# ---------------------------------------------------------------- conversions
def from_u64(x) -> GF:
    """numpy uint64 array (or python int) -> GF."""
    a = np.asarray(x, dtype=np.uint64)
    return GF(_u32(a & np.uint64(0xFFFFFFFF)), _u32(a >> np.uint64(32)))


def to_u64(x: GF) -> np.ndarray:
    lo = np.asarray(x.lo, dtype=np.uint64)
    hi = np.asarray(x.hi, dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def const(v: int, shape=()) -> GF:
    v = v % P
    return GF(
        jnp.full(shape, np.uint32(v & 0xFFFFFFFF), dtype=jnp.uint32),
        jnp.full(shape, np.uint32(v >> 32), dtype=jnp.uint32),
    )


def zeros(shape=()) -> GF:
    return GF(jnp.zeros(shape, jnp.uint32), jnp.zeros(shape, jnp.uint32))


def ones(shape=()) -> GF:
    return GF(jnp.ones(shape, jnp.uint32), jnp.zeros(shape, jnp.uint32))


# ---------------------------------------------------------------- u64 helpers
def _add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 with carry-out."""
    lo = alo + blo
    c = (lo < alo).astype(jnp.uint32)
    h1 = ahi + bhi
    c1 = (h1 < ahi).astype(jnp.uint32)
    hi = h1 + c
    c2 = (hi < h1).astype(jnp.uint32)
    return lo, hi, c1 | c2


def _sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 with borrow-out."""
    lo = alo - blo
    b0 = (alo < blo).astype(jnp.uint32)
    h1 = ahi - bhi
    b1 = (ahi < bhi).astype(jnp.uint32)
    hi = h1 - b0
    b2 = (h1 < b0).astype(jnp.uint32)
    return lo, hi, b1 | b2


def _mul32_wide(a, b):
    """Exact 32x32 -> 64 product as (lo, hi) uint32, via 16-bit partials."""
    a0 = a & _LO16
    a1 = a >> _16
    b0 = b & _LO16
    b1 = b >> _16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> _16) + (p01 & _LO16) + (p10 & _LO16)  # < 2^18, exact
    lo = (p00 & _LO16) | ((mid & _LO16) << _16)
    hi = p11 + (p01 >> _16) + (p10 >> _16) + (mid >> _16)
    return lo, hi


# ---------------------------------------------------------------- field ops
def _canonical(lo, hi):
    """One conditional subtract of p; input must be < p + 2^63-ish."""
    ge = ((hi == _U32MAX) & (lo >= _1)).astype(jnp.uint32)
    return GF(lo - ge, hi + ge)  # (lo-1, hi+1 == 0) when subtracting p


def add(a: GF, b: GF) -> GF:
    lo, hi, of = _add64(a.lo, a.hi, b.lo, b.hi)
    # + of * EPSILON  (2^64 === EPSILON mod p); cannot re-overflow for
    # canonical inputs (a+b-2^64 <= 2^64 - 2^33).
    lo, hi, _ = _add64(lo, hi, of * _U32MAX, jnp.zeros_like(of))
    return _canonical(lo, hi)


def sub(a: GF, b: GF) -> GF:
    lo, hi, bo = _sub64(a.lo, a.hi, b.lo, b.hi)
    # - bo * EPSILON
    lo, hi, _ = _sub64(lo, hi, bo * _U32MAX, jnp.zeros_like(bo))
    return _canonical(lo, hi)


def neg(a: GF) -> GF:
    return sub(GF(jnp.zeros_like(a.lo), jnp.zeros_like(a.hi)), a)


def mul128(a: GF, b: GF):
    """Full 64x64 -> 128 product as four uint32 limbs (x0..x3, LE)."""
    l0, l1 = _mul32_wide(a.lo, b.lo)
    m0, m1 = _mul32_wide(a.lo, b.hi)
    n0, n1 = _mul32_wide(a.hi, b.lo)
    h0, h1 = _mul32_wide(a.hi, b.hi)
    x0 = l0
    x1 = l1 + m0
    c1 = (x1 < l1).astype(jnp.uint32)
    x1b = x1 + n0
    c1b = (x1b < x1).astype(jnp.uint32)
    x2 = h0 + m1
    c2 = (x2 < h0).astype(jnp.uint32)
    x2b = x2 + n1
    c2b = (x2b < x2).astype(jnp.uint32)
    x2c = x2b + c1 + c1b  # carries are tiny; cannot overflow past 1 extra
    c2c = (x2c < x2b).astype(jnp.uint32)
    x3 = h1 + c2 + c2b + c2c
    return x0, x1b, x2c, x3


def reduce128(x0, x1, x2, x3) -> GF:
    """(x0 + x1 2^32 + x2 2^64 + x3 2^96) mod p, canonical.

    2^64 === 2^32 - 1 and 2^96 === -1 (mod p).
    """
    # t0 = lo64 - x3
    lo, hi, bo = _sub64(x0, x1, x3, jnp.zeros_like(x3))
    lo, hi, _ = _sub64(lo, hi, bo * _U32MAX, jnp.zeros_like(bo))
    # t1 = x2 * EPSILON = (x2 << 32) - x2
    t1lo = _0 - x2
    t1bo = (x2 != _0).astype(jnp.uint32)
    t1hi = x2 - t1bo
    # t2 = t0 + t1 (+ EPSILON on carry)
    lo, hi, of = _add64(lo, hi, t1lo, t1hi)
    lo, hi, _ = _add64(lo, hi, of * _U32MAX, jnp.zeros_like(of))
    return _canonical(lo, hi)


def mul(a: GF, b: GF) -> GF:
    return reduce128(*mul128(a, b))


def mul_add(a: GF, b: GF, c: GF) -> GF:
    return add(mul(a, b), c)


def square(a: GF) -> GF:
    return mul(a, a)


def pow_const(a: GF, e: int) -> GF:
    """a**e for a static python-int exponent."""
    result = ones(a.shape)
    base = a
    first = True
    while e > 0:
        if e & 1:
            result = base if first else mul(result, base)
            first = False
        e >>= 1
        if e:
            base = square(base)
    return result if not first else ones(a.shape)


def inv(a: GF) -> GF:
    """Fermat inverse a^(p-2); inv(0) = 0."""
    return pow_const(a, P - 2)


def is_zero(a: GF):
    return (a.lo == _0) & (a.hi == _0)


def equal(a: GF, b: GF):
    return (a.lo == b.lo) & (a.hi == b.hi)


def select(mask, a: GF, b: GF) -> GF:
    """mask ? a : b (mask: bool array broadcastable to element shape)."""
    return GF(jnp.where(mask, a.lo, b.lo), jnp.where(mask, a.hi, b.hi))


def stack(elems, axis=0) -> GF:
    return GF(
        jnp.stack([e.lo for e in elems], axis=axis),
        jnp.stack([e.hi for e in elems], axis=axis),
    )


def concat(elems, axis=0) -> GF:
    return GF(
        jnp.concatenate([e.lo for e in elems], axis=axis),
        jnp.concatenate([e.hi for e in elems], axis=axis),
    )


def take(a: GF, idx, axis=0) -> GF:
    return GF(
        jnp.take(a.lo, idx, axis=axis),
        jnp.take(a.hi, idx, axis=axis),
    )


def dynamic_index(a: GF, idx) -> GF:
    """a[idx] along axis 0 for a traced scalar idx."""
    return GF(
        jnp.take(a.lo, idx, axis=0),
        jnp.take(a.hi, idx, axis=0),
    )


def reshape(a: GF, shape) -> GF:
    return GF(jnp.reshape(a.lo, shape), jnp.reshape(a.hi, shape))


def bit(a: GF, i: int):
    """The i-th little-endian bit of the canonical value, as uint32 0/1."""
    if i < 32:
        return (a.lo >> np.uint32(i)) & _1
    return (a.hi >> np.uint32(i - 32)) & _1


def mod_pow2(a: GF, bits: int) -> jnp.ndarray:
    """Canonical value mod 2^bits (bits <= 32), as uint32."""
    assert bits <= 32
    if bits == 32:
        return a.lo
    return a.lo & np.uint32((1 << bits) - 1)


def unstack(a: GF):
    return [GF(a.lo[i], a.hi[i]) for i in range(a.lo.shape[0])]


def _mds12_matrix():
    from ._poseidon_gl_constants import MDS_MATRIX_CIRC, MDS_MATRIX_DIAG

    m = np.zeros((12, 12), dtype=np.uint32)
    for r in range(12):
        for j in range(12):
            m[r, j] = MDS_MATRIX_CIRC[(j - r) % 12]
        m[r, r] += MDS_MATRIX_DIAG[r]
    return m


_MDS12 = _mds12_matrix()


def mds12(state: GF) -> GF:
    """Poseidon width-12 MDS multiply on stacked state (leading dim 12).

    MDS entries are <= 49 (6 bits): split each element into four exact 16-bit
    limbs, take integer limb x matrix products on uint32 lanes (column sums
    < 2^26, no overflow), renormalize, and reduce mod p once per output.
    """
    m = jnp.asarray(_MDS12)
    limbs = jnp.stack(
        [
            state.lo & _LO16,
            state.lo >> _16,
            state.hi & _LO16,
            state.hi >> _16,
        ]
    )  # [4, 12, ...]
    cols = jnp.einsum("rj,kj...->kr...", m, limbs)  # exact in uint32
    c0, c1, c2, c3 = cols[0], cols[1], cols[2], cols[3]
    # value = c0 + c1*2^16 + c2*2^32 + c3*2^48, each c < 2^26
    t01 = (c0 >> _16) + c1                    # < 2^27
    x0 = (c0 & _LO16) | ((t01 & _LO16) << _16)
    t2 = (t01 >> _16) + c2                    # < 2^27
    t3 = (t2 >> _16) + c3                     # < 2^27
    x1 = (t2 & _LO16) | ((t3 & _LO16) << _16)
    x2 = t3 >> _16                            # < 2^11
    return reduce128(x0, x1, x2, jnp.zeros_like(x2))


# ------------------------------------------------- scan-based Poseidon core
# A compact-trace Poseidon permutation: three lax.scans (full/partial/full)
# whose bodies are traced once, keeping the XLA graph small even though the
# transcript replays hundreds of sequential permutations.
def _rc_table():
    from ._poseidon_gl_constants import ALL_ROUND_CONSTANTS

    rc = np.asarray(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(30, 12)
    return (
        jnp.asarray(rc & np.uint64(0xFFFFFFFF), dtype=jnp.uint32),
        jnp.asarray(rc >> np.uint64(32), dtype=jnp.uint32),
    )


def _sbox7(x: GF) -> GF:
    x2 = mul(x, x)
    x3 = mul(x2, x)
    x4 = mul(x2, x2)
    return mul(x3, x4)


def permute12(state: GF) -> GF:
    """Poseidon permutation on stacked state GF[12, ...] via lax.scan."""
    import jax

    rc_lo, rc_hi = _rc_table()
    extra = (1,) * (state.lo.ndim - 1)

    def add_rc(s: GF, rc_l, rc_h) -> GF:
        return add(s, GF(rc_l.reshape((12,) + extra), rc_h.reshape((12,) + extra)))

    def full_round(s, rc):
        s = add_rc(s, rc[0], rc[1])
        s = _sbox7(s)
        return mds12(s), None

    def partial_round(s, rc):
        s = add_rc(s, rc[0], rc[1])
        lane0 = _sbox7(GF(s.lo[0], s.hi[0]))
        s = GF(s.lo.at[0].set(lane0.lo), s.hi.at[0].set(lane0.hi))
        return mds12(s), None

    state, _ = jax.lax.scan(full_round, state, (rc_lo[:4], rc_hi[:4]))
    state, _ = jax.lax.scan(partial_round, state, (rc_lo[4:26], rc_hi[4:26]))
    state, _ = jax.lax.scan(full_round, state, (rc_lo[26:], rc_hi[26:]))
    return state


IS_JAX = True


def _pminus2_bits():
    e = P - 2
    return np.array([(e >> i) & 1 for i in range(64)], dtype=np.uint32)


_PM2_BITS = None


def inv_scan(a: GF) -> GF:
    """Fermat inverse via fori_loop (compact trace); inv(0) = 0."""
    import jax

    global _PM2_BITS
    if _PM2_BITS is None:
        _PM2_BITS = jnp.asarray(_pminus2_bits())
    bits = _PM2_BITS

    def body(i, carry):
        result, base = carry
        b = bits[i]
        result = select(b == 1, mul(result, base), result)
        return (result, square(base))

    result, _ = jax.lax.fori_loop(0, 64, body, (ones(a.shape), a))
    return result


inv = inv_scan  # override the unrolled square-and-multiply


def sum_axis0(a: GF) -> GF:
    """Tree-sum of a stacked GF array along axis 0 (mod p)."""
    n = a.lo.shape[0]
    while n > 1:
        half = n // 2
        lo_part = GF(a.lo[:half], a.hi[:half])
        hi_part = GF(a.lo[half : 2 * half], a.hi[half : 2 * half])
        s = add(lo_part, hi_part)
        if n % 2:
            s = GF(
                jnp.concatenate([s.lo, a.lo[2 * half :]]),
                jnp.concatenate([s.hi, a.hi[2 * half :]]),
            )
            n = half + 1
        else:
            n = half
        a = s
    return GF(a.lo[0], a.hi[0])
