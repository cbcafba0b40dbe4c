"""Goldilocks field GF(p), p = 2^64 - 2^32 + 1 — numpy uint64 backend.

This is the host-side golden model: it runs the identical mathematics as the
TPU backend (`gl64_jax`) but on numpy uint64 arrays, and is used by the
prover/fixture pipeline and as the reference in bit-exactness tests.

Semantics mirror what the reference circuit constrains: every op returns the
canonical representative 0 <= r < p (reference: chip/native_chip/
arithmetic_chip.rs:19,98-107 range-checks r < p after each mul-add).

Elements are represented as np.uint64 arrays (any shape); all ops are
elementwise and vectorized.
"""
from __future__ import annotations

import numpy as np

# uint64 wraparound is intentional throughout (carry-free modular tricks)
np.seterr(over="ignore")

P = 0xFFFFFFFF00000001
EPSILON = 0xFFFFFFFF  # 2^64 mod p
_P = np.uint64(P)
_EPS = np.uint64(EPSILON)
_U32 = np.uint64(0xFFFFFFFF)
_32 = np.uint64(32)

# Multiplicative group generator of GF(p)* (order p-1), same as plonky2.
GENERATOR = 7
# 2 is a primitive 2^32-th root of unity? plonky2 uses POWER_OF_TWO_GENERATOR
# = 7^((p-1) / 2^32) = 0x185629dcda58878c with TWO_ADICITY = 32.
TWO_ADICITY = 32


def asfield(x) -> np.ndarray:
    """Coerce python ints / arrays into canonical uint64 field elements."""
    a = np.asarray(x, dtype=np.object_) if isinstance(x, (list, tuple)) else x
    a = np.asarray(np.mod(np.asarray(a, dtype=np.object_), P)).astype(np.uint64)
    return a


def add(a, b):
    if getattr(a, "size", 1) >= 8192 or getattr(b, "size", 1) >= 8192:
        nm = _get_native_addsub()
        if nm is not False:
            if np.shape(a) != np.shape(b):
                a, b = np.broadcast_arrays(a, b)
            return nm[0](a, b)
    s = a + b  # wraps mod 2^64
    of = s < a
    s = s + of.astype(np.uint64) * _EPS
    # single conditional subtract brings into canonical range
    ge = s >= _P
    return s - ge.astype(np.uint64) * _P


def sub(a, b):
    if getattr(a, "size", 1) >= 8192 or getattr(b, "size", 1) >= 8192:
        nm = _get_native_addsub()
        if nm is not False:
            if np.shape(a) != np.shape(b):
                a, b = np.broadcast_arrays(a, b)
            return nm[1](a, b)
    d = a - b
    uf = a < b
    # -2^64 === -EPSILON (mod p)
    d = d - uf.astype(np.uint64) * _EPS
    ge = d >= _P
    return d - ge.astype(np.uint64) * _P


_native_addsub = None


def _get_native_addsub():
    global _native_addsub
    if _native_addsub is None:
        from .. import native

        ok = (native.lib() is not None
              and hasattr(native.lib(), "svt_gl_add_arr"))
        _native_addsub = (native.gl_add_np, native.gl_sub_np) if ok else False
    return _native_addsub


def neg(a):
    z = a == 0
    return np.where(z, np.uint64(0), _P - a)


def mul128(a, b):
    """Full 64x64 -> 128 product as (lo, hi) uint64 pair."""
    a0 = a & _U32
    a1 = a >> _32
    b0 = b & _U32
    b1 = b >> _32
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> _32) + (p01 & _U32) + (p10 & _U32)  # <= ~2^33, exact
    lo = (p00 & _U32) | ((mid & _U32) << _32)
    hi = p11 + (p01 >> _32) + (p10 >> _32) + (mid >> _32)
    return lo, hi


def reduce128(lo, hi):
    """Reduce a 128-bit value (lo + hi*2^64) to canonical GF(p).

    Uses 2^64 === 2^32 - 1 and 2^96 === -1 (mod p).
    """
    x2 = hi & _U32   # bits 64..95
    x3 = hi >> _32   # bits 96..127
    borrow = lo < x3
    t0 = lo - x3
    t0 = t0 - borrow.astype(np.uint64) * _EPS
    t1 = (x2 << _32) - x2
    t2 = t0 + t1
    carry = t2 < t1
    t2 = t2 + carry.astype(np.uint64) * _EPS
    ge = t2 >= _P
    return t2 - ge.astype(np.uint64) * _P


_native_mul = None


def _get_native_mul():
    global _native_mul
    if _native_mul is None:
        from .. import native

        _native_mul = native.gl_mul_np if native.lib() is not None else False
    return _native_mul


def mul(a, b):
    # large arrays: one fused C pass (native plane) beats the ~12-pass
    # limb decomposition below
    if getattr(a, "size", 1) >= 8192 or getattr(b, "size", 1) >= 8192:
        nm = _get_native_mul()
        if nm is not False:
            if np.shape(a) != np.shape(b):
                a, b = np.broadcast_arrays(a, b)
            return nm(a, b)
    lo, hi = mul128(a, b)
    return reduce128(lo, hi)


def mul_add(a, b, c):
    return add(mul(a, b), c)


def mul_small(a, k: int):
    """a * k for a small static python-int constant (0 <= k < 2^31).

    Avoids the full 64x64 product: two 32x32 partial products suffice."""
    assert 0 <= k < (1 << 31)
    if k == 0:
        return np.zeros_like(np.asarray(a, dtype=np.uint64))
    if k == 1:
        return np.asarray(a, dtype=np.uint64)
    ku = np.uint64(k)
    a = np.asarray(a, dtype=np.uint64)
    lo32 = (a & _U32) * ku          # < 2^63
    hi32 = (a >> _32) * ku          # < 2^63
    t = (lo32 >> _32) + hi32        # < 2^63: exact
    lo = (lo32 & _U32) | ((t & _U32) << _32)
    hi = t >> _32
    return reduce128(lo, hi)


def square(a):
    return mul(a, a)


def pow_const(a, e: int):
    """a**e for a python-int exponent (vectorized over a)."""
    result = np.ones_like(np.asarray(a, dtype=np.uint64))
    base = a
    while e > 0:
        if e & 1:
            result = mul(result, base)
        base = mul(base, base)
        e >>= 1
    return result


def inv(a):
    """Fermat inverse a^(p-2); inv(0) = 0."""
    return pow_const(a, P - 2)


def exp_u64_scalar(base: int, e: int) -> int:
    """Scalar modpow on python ints (for roots of unity etc.)."""
    return pow(base, e, P)


def primitive_root_of_unity(n_bits: int) -> int:
    assert 0 <= n_bits <= TWO_ADICITY
    g = pow(GENERATOR, (P - 1) >> TWO_ADICITY, P)
    for _ in range(TWO_ADICITY - n_bits):
        g = (g * g) % P
    return g


def select(mask, a, b):
    """mask ? a : b, elementwise (mask is bool array)."""
    return np.where(mask, a, b)


def zeros(shape):
    return np.zeros(shape, dtype=np.uint64)


def full(shape, v: int):
    return np.full(shape, np.uint64(v % P), dtype=np.uint64)


# ------------------------------------------------------------ backend parity
# (uniform API shared with gl64_jax so protocol code is backend-generic)
def const(v: int, shape=()):
    return np.full(shape, np.uint64(v % P), dtype=np.uint64)


def ones(shape=()):
    return np.ones(shape, dtype=np.uint64)


def from_u64(x):
    return np.asarray(x, dtype=np.uint64)


def to_u64(x):
    return np.asarray(x, dtype=np.uint64)


def is_zero(a):
    return a == 0


def equal(a, b):
    return a == b


def stack(elems, axis=0):
    return np.stack(elems, axis=axis)


def concat(elems, axis=0):
    return np.concatenate(elems, axis=axis)


def take(a, idx, axis=0):
    return np.take(a, idx, axis=axis)


def dynamic_index(a, idx):
    return np.take(a, idx, axis=0)


def reshape(a, shape):
    return np.reshape(a, shape)


def bit(a, i: int):
    return (a >> np.uint64(i)) & np.uint64(1)


def mod_pow2(a, bits: int):
    return (a & np.uint64((1 << bits) - 1)).astype(np.uint32)


def unstack(a):
    return [a[i] for i in range(a.shape[0])]


def _mds12_matrix():
    from ._poseidon_gl_constants import MDS_MATRIX_CIRC, MDS_MATRIX_DIAG

    m = np.zeros((12, 12), dtype=np.uint64)
    for r in range(12):
        for j in range(12):
            m[r, j] = MDS_MATRIX_CIRC[(j - r) % 12]
        m[r, r] += MDS_MATRIX_DIAG[r]
    return m


_MDS12 = None


def mds12(state):
    """Poseidon width-12 MDS multiply on stacked state [12, ...].

    Entries of the MDS matrix are tiny (<=49) so we accumulate exact 32-bit
    limb columns and reduce once per output element.
    """
    global _MDS12
    if _MDS12 is None:
        _MDS12 = _mds12_matrix()
    m = _MDS12
    lo = state & np.uint64(0xFFFFFFFF)
    hi = state >> np.uint64(32)
    col0 = np.einsum("rj,j...->r...", m, lo)   # < 2^38 * 12 < 2^42
    col1 = np.einsum("rj,j...->r...", m, hi)
    t = (col0 >> np.uint64(32)) + col1         # < 2^43
    lo128 = (col0 & np.uint64(0xFFFFFFFF)) | ((t & np.uint64(0xFFFFFFFF)) << np.uint64(32))
    hi128 = t >> np.uint64(32)                 # < 2^11
    return reduce128(lo128, hi128)


IS_JAX = False


def unstack_gf(a):
    return unstack(a)


def sum_axis0(a):
    out = a[0]
    for i in range(1, a.shape[0]):
        out = add(out, a[i])
    return out


def index(a, sl):
    return a[sl]


# ------------------------------------------------------------------ Poseidon
_RC30 = None


def permute12(state):
    """Poseidon permutation on stacked state uint64[12, ...].

    Routes to the native C hash plane (stark_verifier_tpu/native.py) when
    available — the host-side hot loop of the prover/fixture pipeline —
    with a vectorized numpy fallback (identical canonical semantics)."""
    from .. import native

    if native.lib() is not None:
        return native.permute12_np(np.asarray(state, dtype=np.uint64))
    global _RC30
    if _RC30 is None:
        from ._poseidon_gl_constants import ALL_ROUND_CONSTANTS

        _RC30 = np.asarray(ALL_ROUND_CONSTANTS, np.uint64).reshape(30, 12)
    s = np.asarray(state, dtype=np.uint64)
    extra = (slice(None),) + (None,) * (s.ndim - 1)

    def sbox7(x):
        x2 = mul(x, x)
        x3 = mul(x2, x)
        return mul(x3, mul(x2, x2))

    for r in range(30):
        s = add(s, _RC30[r][extra])
        if 4 <= r < 26:
            s = np.concatenate([sbox7(s[:1]), s[1:]], axis=0)
        else:
            s = sbox7(s)
        s = mds12(s)
    return s
