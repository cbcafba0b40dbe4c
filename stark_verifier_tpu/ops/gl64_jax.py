"""Goldilocks field GF(p), p = 2^64 - 2^32 + 1 — JAX/TPU backend.

TPUs have no native 64-bit integer datapath, and XLA compiles long chains of
compare-based carry flags poorly, so field elements are carried as FOUR
16-bit limb planes held in uint32 lanes: value = sum l_i * 2^(16 i) with
each limb < 2^16 ("normalized"). In radix-2^16 every carry propagation is a
shift/add (no compares), limb products are exact in uint32, and the
p = 2^64 - 2^32 + 1 fold is a handful of additions against pre-borrowed
constants.

Elements at rest are normalized but may be NON-CANONICAL (a value in
[p, 2^64) represents value - p). All ring ops are representative-
independent; the places that need the canonical u64 form (equality, bit
extraction, exports) canonicalize explicitly.

Mathematical semantics are identical to `gl64_np` (the numpy golden model)
and to what the reference circuit constrains (reference:
chip/native_chip/arithmetic_chip.rs:19,98-133 — Goldilocks mul-add, with the
quadratic extension x^2 = 7 layered above in ops/ext2.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

P = 0xFFFFFFFF00000001
EPSILON = 0xFFFFFFFF

_M16 = np.uint32(0xFFFF)
_16 = np.uint32(16)
_0 = np.uint32(0)
_1 = np.uint32(1)

IS_JAX = True
PALLAS_OK = True  # the Pallas Poseidon kernel consumes these limb planes


class GF(NamedTuple):
    """A Goldilocks element as four 16-bit limbs in uint32 lanes."""

    l0: jnp.ndarray
    l1: jnp.ndarray
    l2: jnp.ndarray
    l3: jnp.ndarray

    @property
    def shape(self):
        return jnp.shape(self.l0)


def gmap(f, *gs) -> GF:
    """Apply f across corresponding limb planes."""
    return GF(*(f(*xs) for xs in zip(*gs)))


def _u32(x):
    return jnp.asarray(x, dtype=jnp.uint32)


# ----------------------------------------------------------------- constants
def _preborrowed(value: int, mins):
    """(l0..l3, fold) such that value === sum l_i 2^(16 i) + fold (mod p),
    l_i >= mins[i], fold the EPSILON-folded image of the >=2^64 part.
    Subtracting per-limb quantities <= mins[i] then needs no borrows."""
    limbs = []
    rem = value
    for m in mins:
        li = rem & 0xFFFF
        rem >>= 16
        while li < m:
            li += 1 << 16
            rem -= 1
        limbs.append(li)
    assert rem >= 0
    fold = rem * EPSILON  # rem * 2^64 === rem * EPSILON (mod p)
    assert fold < 1 << 52
    out = [limbs[i] + ((fold >> (16 * i)) & 0xFFFF) for i in range(4)]
    return [np.uint32(x) for x in out]


# 2p with limbs >= 0xffff: for neg/sub (operand limbs are < 2^16)
_D_NEG = _preborrowed(2 * P, [0xFFFF, 0xFFFF, 0xFFFF, 0xFFFF])
# 2p with limbs 0,1 >= 2*0xffff: for the mul fold (subtracts m+h per limb)
_D_MUL = _preborrowed(2 * P, [2 * 0xFFFF, 2 * 0xFFFF, 0, 0])


# --------------------------------------------------------------- conversions
def from_u64(x) -> GF:
    """numpy uint64 array (or python int) -> GF."""
    a = np.asarray(x, dtype=np.uint64)
    return GF(
        _u32(a & np.uint64(0xFFFF)),
        _u32((a >> np.uint64(16)) & np.uint64(0xFFFF)),
        _u32((a >> np.uint64(32)) & np.uint64(0xFFFF)),
        _u32((a >> np.uint64(48)) & np.uint64(0xFFFF)),
    )


def to_u64(x: GF) -> np.ndarray:
    x = canonical(x)
    out = np.zeros(np.shape(np.asarray(x.l0)), dtype=np.uint64)
    for i in range(4):
        out |= np.asarray(x[i], dtype=np.uint64) << np.uint64(16 * i)
    return out


def const(v: int, shape=()) -> GF:
    v = v % P
    return GF(*(jnp.full(shape, np.uint32((v >> (16 * i)) & 0xFFFF), jnp.uint32)
                for i in range(4)))


def zeros(shape=()) -> GF:
    z = jnp.zeros(shape, jnp.uint32)
    return GF(z, z, z, z)


def ones(shape=()) -> GF:
    z = jnp.zeros(shape, jnp.uint32)
    return GF(jnp.ones(shape, jnp.uint32), z, z, z)


# ------------------------------------------------------------ normalization
def _carry_pass(c0, c1, c2, c3):
    r = c0
    o0 = r & _M16
    r = (r >> _16) + c1
    o1 = r & _M16
    r = (r >> _16) + c2
    o2 = r & _M16
    r = (r >> _16) + c3
    o3 = r & _M16
    return o0, o1, o2, o3, r >> _16


def _renorm4(c0, c1, c2, c3):
    """Columns (each < 2^31, value < 2^80) -> normalized GF, mod-p folded.

    Three carry passes with t*2^64 === t*EPSILON folds between them; bounds:
    after pass 1 the value is < 2^64 + 2^48, after pass 2 it is < 2^64, so
    pass 3 cannot overflow."""
    for _ in range(2):
        c0, c1, c2, c3, t = _carry_pass(c0, c1, c2, c3)
        # t * EPSILON: EPSILON = 0xffff + 0xffff * 2^16
        tm = t * _M16
        c0 = c0 + tm
        c1 = c1 + tm
    c0, c1, c2, c3, _t = _carry_pass(c0, c1, c2, c3)
    return GF(c0, c1, c2, c3)


# ----------------------------------------------------------------- field ops
def add(a: GF, b: GF) -> GF:
    return _renorm4(a.l0 + b.l0, a.l1 + b.l1, a.l2 + b.l2, a.l3 + b.l3)


def sub(a: GF, b: GF) -> GF:
    d = _D_NEG
    return _renorm4(
        a.l0 + (d[0] - b.l0),
        a.l1 + (d[1] - b.l1),
        a.l2 + (d[2] - b.l2),
        a.l3 + (d[3] - b.l3),
    )


def neg(a: GF) -> GF:
    d = _D_NEG
    return _renorm4(d[0] - a.l0, d[1] - a.l1, d[2] - a.l2, d[3] - a.l3)


def mul(a: GF, b: GF) -> GF:
    # schoolbook 4x4 limb products, accumulated as split lo/hi 16-bit parts
    # (sums of <= 4 terms < 2^18: exact, compare-free)
    al = list(a)[:4]
    bl = list(b)[:4]
    colL = [None] * 7
    colH = [None] * 7
    for i in range(4):
        for j in range(4):
            prod = al[i] * bl[j]
            k = i + j
            lo = prod & _M16
            hi = prod >> _16
            colL[k] = lo if colL[k] is None else colL[k] + lo
            colH[k] = hi if colH[k] is None else colH[k] + hi
    C = [colL[0]]
    for k in range(1, 7):
        C.append(colL[k] + colH[k - 1])
    C.append(colH[6])
    # carry-normalize to eight 16-bit columns (product < 2^128: no overflow)
    e = []
    r = C[0]
    for k in range(8):
        e.append(r & _M16)
        r = (r >> _16) + (C[k + 1] if k + 1 < 8 else _0)
    # fold: E + M*2^64 + H*2^96 === E + (M<<32) - M - H (mod p), with
    # M = e4..e5, H = e6..e7; kept positive via pre-borrowed 2p.
    d = _D_MUL
    return _renorm4(
        e[0] + (d[0] - (e[4] + e[6])),
        e[1] + (d[1] - (e[5] + e[7])),
        e[2] + d[2] + e[4],
        e[3] + d[3] + e[5],
    )


def mul_add(a: GF, b: GF, c: GF) -> GF:
    return add(mul(a, b), c)


def mul_small(a: GF, k: int) -> GF:
    """a * k for a small static python-int constant (0 <= k < 2^15).

    One scalar multiply per limb plane plus a renorm — far cheaper than the
    full 4x4 schoolbook `mul` (columns stay < 2^31, within _renorm4 bounds)."""
    assert 0 <= k < (1 << 15)
    if k == 0:
        return zeros(a.shape)
    if k == 1:
        return a
    ku = np.uint32(k)
    return _renorm4(a.l0 * ku, a.l1 * ku, a.l2 * ku, a.l3 * ku)


def square(a: GF) -> GF:
    return mul(a, a)


def pow_const(a: GF, e: int) -> GF:
    """a**e for a static python-int exponent (unrolled square&multiply)."""
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    return result if result is not None else ones(a.shape)


def _pminus2_bits():
    e = P - 2
    return np.array([(e >> i) & 1 for i in range(64)], dtype=np.uint32)


_PM2_BITS = None


def inv(a: GF) -> GF:
    """Fermat inverse a^(p-2) via fori_loop (compact trace); inv(0) = 0."""
    import jax

    global _PM2_BITS
    if _PM2_BITS is None:
        _PM2_BITS = _pminus2_bits()  # numpy: traces as a constant
    bits = jnp.asarray(_PM2_BITS)

    def body(i, carry):
        result, base = carry
        b = bits[i]
        result = select(b == 1, mul(result, base), result)
        return (result, square(base))

    one = GF(jnp.ones_like(a.l0), jnp.zeros_like(a.l1),
             jnp.zeros_like(a.l2), jnp.zeros_like(a.l3))
    result, _ = jax.lax.fori_loop(0, 64, body, (one, a))
    return result


# -------------------------------------------------------------- canonicalize
def canonical(a: GF) -> GF:
    """Reduce the representative into [0, p)."""
    ge = (a.l3 == _M16) & (a.l2 == _M16) & ((a.l1 | a.l0) != _0)
    # v - p == (v + EPSILON) mod 2^64 when v >= p
    r0, r1, r2, r3, _t = _carry_pass(a.l0 + _M16, a.l1 + _M16, a.l2, a.l3)
    return select(ge, GF(r0, r1, r2, r3), a)


def is_zero(a: GF):
    c = canonical(a)
    return (c.l0 | c.l1 | c.l2 | c.l3) == _0


def equal(a: GF, b: GF):
    ca = canonical(a)
    cb = canonical(b)
    return (
        (ca.l0 == cb.l0) & (ca.l1 == cb.l1) & (ca.l2 == cb.l2) & (ca.l3 == cb.l3)
    )


def bit(a: GF, i: int):
    """The i-th little-endian bit of the canonical value, as uint32 0/1."""
    c = canonical(a)
    return (c[i // 16] >> np.uint32(i % 16)) & _1


def mod_pow2(a: GF, bits: int) -> jnp.ndarray:
    """Canonical value mod 2^bits (bits <= 32), as uint32."""
    assert bits <= 32
    c = canonical(a)
    v = c.l0 + (c.l1 << _16)
    if bits == 32:
        return v
    return v & np.uint32((1 << bits) - 1)


# ------------------------------------------------------------- structure ops
def select(mask, a: GF, b: GF) -> GF:
    return gmap(lambda x, y: jnp.where(mask, x, y), a, b)


def stack(elems, axis=0) -> GF:
    return GF(*(jnp.stack([e[i] for e in elems], axis=axis) for i in range(4)))


def concat(elems, axis=0) -> GF:
    return GF(*(jnp.concatenate([e[i] for e in elems], axis=axis) for i in range(4)))


def take(a: GF, idx, axis=0) -> GF:
    return gmap(lambda x: jnp.take(x, idx, axis=axis), a)


def dynamic_index(a: GF, idx) -> GF:
    return take(a, idx, axis=0)


def reshape(a: GF, shape) -> GF:
    return gmap(lambda x: jnp.reshape(x, shape), a)


def unstack(a: GF):
    return [index(a, i) for i in range(a.l0.shape[0])]


def index(a: GF, sl) -> GF:
    """a[sl] on every plane (sl may be any numpy-style index)."""
    return gmap(lambda x: x[sl], a)


def sum_axis0(a: GF) -> GF:
    """Sum of a stacked GF along axis 0 (mod p): one vector sum per plane
    plus a renorm (n <= 2^14 keeps columns < 2^30)."""
    n = a.l0.shape[0]
    assert n < (1 << 14)
    c = [jnp.sum(x, axis=0, dtype=jnp.uint32) for x in a]
    return _renorm4(c[0], c[1], c[2], c[3])


# -------------------------------------------------------------------- Poseidon
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

    MDS entries are <= 49: per-limb-plane integer matmul stays exact in
    uint32 (column sums < 2^26), one renorm for the whole layer."""
    m = jnp.asarray(_MDS12)
    cols = [jnp.einsum("rj,j...->r...", m, plane) for plane in a_tuple(state)]
    return _renorm4(cols[0], cols[1], cols[2], cols[3])


def a_tuple(g: GF):
    return (g.l0, g.l1, g.l2, g.l3)


def _rc_table():
    from ._poseidon_gl_constants import ALL_ROUND_CONSTANTS

    rc = np.asarray(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(30, 12)
    return tuple(
        ((rc >> np.uint64(16 * i)) & np.uint64(0xFFFF)).astype(np.uint32)
        for i in range(4)
    )


_RC_PLANES = None


def _sbox7(x: GF) -> GF:
    x2 = mul(x, x)
    x3 = mul(x2, x)
    x4 = mul(x2, x2)
    return mul(x3, x4)


def permute12(state: GF) -> GF:
    """Poseidon permutation on stacked state GF[12, ...] via lax.scan."""
    import jax

    global _RC_PLANES
    if _RC_PLANES is None:
        _RC_PLANES = _rc_table()
    rc = _RC_PLANES
    extra = (1,) * (state.l0.ndim - 1)

    def add_rc(s: GF, rcs) -> GF:
        return add(s, GF(*(r.reshape((12,) + extra) for r in rcs)))

    def full_round(s, rcs):
        s = add_rc(s, rcs)
        s = _sbox7(s)
        return mds12(s), None

    def partial_round(s, rcs):
        s = add_rc(s, rcs)
        lane0 = _sbox7(index(s, 0))
        s = GF(*(p.at[0].set(l) for p, l in zip(s, lane0)))
        return mds12(s), None

    state, _ = jax.lax.scan(full_round, state, tuple(r[:4] for r in rc))
    state, _ = jax.lax.scan(partial_round, state, tuple(r[4:26] for r in rc))
    state, _ = jax.lax.scan(full_round, state, tuple(r[26:] for r in rc))
    return state
