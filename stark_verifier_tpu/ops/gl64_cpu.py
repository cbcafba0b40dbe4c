"""Goldilocks field GF(p), p = 2^64 - 2^32 + 1 — JAX *CPU* backend (u64).

The TPU backend (`gl64_jax`) carries elements as four 16-bit limb planes
because TPUs have no 64-bit integer datapath. On XLA:CPU that representation
is pathological the other way: every field op explodes into dozens of
mask/shift/carry HLOs (the multichip dryrun's tiny verifier graph lowered to
216k StableHLO ops, ~16 min compiles and unusably slow execution on the
4-core host). XLA:CPU *does* have native u64, so this backend stores the
value directly as uint64 and uses the classic branch-free Goldilocks
add/sub/reduce128 sequences (the same math the reference range-check gate
enforces per-row; reference: chip/native_chip/arithmetic_chip.rs:19,98-107 —
`a*b + c = q*p + r`), cutting the per-op HLO count roughly 10x.

Drop-in compatibility: elements reuse `gl64_jax.GF` with the SAME value in
all four planes, so every structural `gmap` call site (stack/take/select in
core/*) works unchanged and XLA CSEs the duplicate planes away. Semantics
match `gl64_np`/`gl64_jax` exactly: representatives live in [0, 2^64) and
may be non-canonical; equality/bits canonicalize explicitly.

Requires jax_enable_x64 (enabled at import). Intended for XLA:CPU paths
(the multichip dryrun, host-side checks) — the TPU path stays on gl64_jax.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

# Shared container + structural ops: identical representation contract
# (4 planes), so gl64_jax's gmap-built helpers work verbatim on our GFs.
from .gl64_jax import (  # noqa: E402,F401
    GF,
    a_tuple,
    concat,
    dynamic_index,
    gmap,
    index,
    reshape,
    select,
    stack,
    take,
    unstack,
)

P = 0xFFFFFFFF00000001
EPSILON = 0xFFFFFFFF

IS_JAX = True
PALLAS_OK = False  # Pallas Poseidon kernel expects 16-bit limb planes
U64_PLANES = True  # planes carry the full u64 (hashers.py bridge adapter)

_P = np.uint64(P)
_EPS = np.uint64(EPSILON)
_M32 = np.uint64(0xFFFFFFFF)
_32 = np.uint64(32)
_0 = np.uint64(0)


def _dup(v) -> GF:
    return GF(v, v, v, v)


def _u64(x):
    return jnp.asarray(x, dtype=jnp.uint64)


# --------------------------------------------------------------- conversions
def from_u64(x) -> GF:
    return _dup(_u64(np.asarray(x, dtype=np.uint64)))


def to_u64(x: GF) -> np.ndarray:
    return np.asarray(canonical(x).l0, dtype=np.uint64)


def const(v: int, shape=()) -> GF:
    return _dup(jnp.full(shape, np.uint64(v % P), jnp.uint64))


def zeros(shape=()) -> GF:
    return _dup(jnp.zeros(shape, jnp.uint64))


def ones(shape=()) -> GF:
    return _dup(jnp.ones(shape, jnp.uint64))


# ----------------------------------------------------------------- field ops
def _add_v(x, y):
    """x + y mod p on raw u64 values in [0, 2^64); branch-free double
    EPSILON correction (overflow by 2^64 === + EPSILON mod p)."""
    s1 = x + y
    o1 = s1 < x
    s2 = s1 + jnp.where(o1, _EPS, _0)
    o2 = o1 & (s2 < s1)
    return s2 + jnp.where(o2, _EPS, _0)


def _sub_v(x, y):
    d1 = x - y
    b1 = x < y
    d2 = d1 - jnp.where(b1, _EPS, _0)
    b2 = b1 & (d1 < _EPS)
    return d2 - jnp.where(b2, _EPS, _0)


def _reduce128(hi, lo):
    """(hi*2^64 + lo) mod p: hi*2^64 === hi_lo*EPSILON - hi_hi (mod p)."""
    hi_hi = hi >> _32
    t0 = lo - hi_hi
    t0 = t0 - jnp.where(lo < hi_hi, _EPS, _0)  # borrow cannot cascade
    t1 = (hi & _M32) * _EPS
    r = t0 + t1
    return r + jnp.where(r < t1, _EPS, _0)  # carry cannot cascade


def _mul_v(x, y):
    x0 = x & _M32
    x1 = x >> _32
    y0 = y & _M32
    y1 = y >> _32
    t00 = x0 * y0
    mid1 = x0 * y1 + (t00 >> _32)
    mid2 = x1 * y0 + (mid1 & _M32)
    hi = x1 * y1 + (mid1 >> _32) + (mid2 >> _32)
    lo = (mid2 << _32) | (t00 & _M32)
    return _reduce128(hi, lo)


def add(a: GF, b: GF) -> GF:
    return _dup(_add_v(a.l0, b.l0))


def sub(a: GF, b: GF) -> GF:
    return _dup(_sub_v(a.l0, b.l0))


def neg(a: GF) -> GF:
    return _dup(_sub_v(jnp.zeros_like(a.l0), a.l0))


def mul(a: GF, b: GF) -> GF:
    return _dup(_mul_v(a.l0, b.l0))


def mul_add(a: GF, b: GF, c: GF) -> GF:
    return _dup(_add_v(_mul_v(a.l0, b.l0), c.l0))


def mul_small(a: GF, k: int) -> GF:
    """a * k for a small static constant (0 <= k < 2^15)."""
    assert 0 <= k < (1 << 15)
    if k == 0:
        return zeros(a.shape)
    if k == 1:
        return a
    x = a.l0
    ku = np.uint64(k)
    lo_p = (x & _M32) * ku  # < 2^47
    hi_p = (x >> _32) * ku  # < 2^47
    lo = lo_p + ((hi_p & _M32) << _32)
    carry = lo < lo_p
    hi = (hi_p >> _32) + jnp.where(carry, np.uint64(1), _0)
    return _dup(_reduce128(hi, lo))


def square(a: GF) -> GF:
    return mul(a, a)


def pow_const(a: GF, e: int) -> GF:
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    return result if result is not None else ones(a.shape)


def inv(a: GF) -> GF:
    """Fermat inverse a^(p-2) via fori_loop; inv(0) = 0."""
    e = P - 2
    bits = jnp.asarray(
        np.array([(e >> i) & 1 for i in range(64)], dtype=np.uint64))

    def body(i, carry):
        result, base = carry
        result = jnp.where(bits[i] == 1, _mul_v(result, base), result)
        return (result, _mul_v(base, base))

    one = jnp.ones_like(a.l0)
    result, _ = jax.lax.fori_loop(0, 64, body, (one, a.l0))
    return _dup(result)


# -------------------------------------------------------------- canonicalize
def canonical(a: GF) -> GF:
    v = a.l0
    return _dup(jnp.where(v >= _P, v + _EPS, v))


def is_zero(a: GF):
    return canonical(a).l0 == _0


def equal(a: GF, b: GF):
    return canonical(a).l0 == canonical(b).l0


def bit(a: GF, i: int):
    """The i-th little-endian bit of the canonical value, as uint32 0/1."""
    return ((canonical(a).l0 >> np.uint64(i)) & np.uint64(1)).astype(jnp.uint32)


def mod_pow2(a: GF, bits: int) -> jnp.ndarray:
    assert bits <= 32
    v = canonical(a).l0 & np.uint64((1 << bits) - 1)
    return v.astype(jnp.uint32)


# --------------------------------------------------------------- reductions
def sum_axis0(a: GF) -> GF:
    """Sum along axis 0 (mod p): split 32/32 so partial sums stay exact."""
    x = a.l0
    n = x.shape[0]
    assert n < (1 << 14)
    s_lo = jnp.sum(x & _M32, axis=0)  # < 2^46
    s_hi = jnp.sum(x >> _32, axis=0)  # < 2^46
    lo = s_lo + ((s_hi & _M32) << _32)
    carry = lo < s_lo
    hi = (s_hi >> _32) + jnp.where(carry, np.uint64(1), _0)
    return _dup(_reduce128(hi, lo))


# ----------------------------------------------------------------- Poseidon
def _mds12_u64():
    from ._poseidon_gl_constants import MDS_MATRIX_CIRC, MDS_MATRIX_DIAG

    m = np.zeros((12, 12), dtype=np.uint64)
    for r in range(12):
        for j in range(12):
            m[r, j] = MDS_MATRIX_CIRC[(j - r) % 12]
        m[r, r] += MDS_MATRIX_DIAG[r]
    return m


_MDS12 = _mds12_u64()


def mds12(state: GF) -> GF:
    """Width-12 Poseidon MDS multiply (leading dim 12). Entries <= 49: the
    32/32-split integer matmuls stay exact in u64 (column sums < 2^42)."""
    m = jnp.asarray(_MDS12)
    x = state.l0
    s_lo = jnp.einsum("rj,j...->r...", m, x & _M32)
    s_hi = jnp.einsum("rj,j...->r...", m, x >> _32)
    lo = s_lo + ((s_hi & _M32) << _32)
    carry = lo < s_lo
    hi = (s_hi >> _32) + jnp.where(carry, np.uint64(1), _0)
    return _dup(_reduce128(hi, lo))


_RC = None


def _sbox7_v(x):
    x2 = _mul_v(x, x)
    x3 = _mul_v(x2, x)
    x4 = _mul_v(x2, x2)
    return _mul_v(x3, x4)


def permute12(state: GF) -> GF:
    """Poseidon permutation on stacked state GF[12, ...] via lax.scan."""
    global _RC
    if _RC is None:
        from ._poseidon_gl_constants import ALL_ROUND_CONSTANTS

        _RC = np.asarray(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(30, 12)
    rc = jnp.asarray(_RC)
    extra = (1,) * (state.l0.ndim - 1)

    def full_round(s, rcs):
        s = _add_v(s, rcs.reshape((12,) + extra))
        s = _sbox7_v(s)
        return mds12(_dup(s)).l0, None

    def partial_round(s, rcs):
        s = _add_v(s, rcs.reshape((12,) + extra))
        s = s.at[0].set(_sbox7_v(s[0]))
        return mds12(_dup(s)).l0, None

    v = state.l0
    v, _ = jax.lax.scan(full_round, v, rc[:4])
    v, _ = jax.lax.scan(partial_round, v, rc[4:26])
    v, _ = jax.lax.scan(full_round, v, rc[26:])
    return _dup(v)
