"""Radix-2 NTT / coset-LDE over Goldilocks — numpy (host / prover side).

plonky2 conventions: `fft` maps coefficients -> evaluations over the size-n
subgroup H (natural order, evals[j] = p(w^j)); `coset_fft(shift)` evaluates
over shift*H; `lde` zero-pads coefficients by the blowup factor.

The TPU-side batched NTT lives in ops/ntt_jax.py; this module is the golden
model and the fixture-producing path.
"""
from __future__ import annotations

import numpy as np

from . import gl64_np as gl
from ..utils.bits import log2_strict, reverse_index_bits_perm

_twiddle_cache: dict[int, np.ndarray] = {}


def _twiddles(n_bits: int) -> np.ndarray:
    """Per-stage twiddle tables: stage s (butterfly half-size m=2^s) uses
    w_{2m}^k for k < m; returned as one array of length n/2 per stage list."""
    key = n_bits
    if key not in _twiddle_cache:
        stages = []
        for s in range(n_bits):
            m = 1 << s
            w = gl.primitive_root_of_unity(s + 1)
            tw = np.empty(m, dtype=np.uint64)
            acc = 1
            for k in range(m):
                tw[k] = acc
                acc = (acc * w) % gl.P
            stages.append(tw)
        _twiddle_cache[key] = stages
    return _twiddle_cache[key]


def _native_lib(n: int):
    """The native C NTT plane, when available and worth the copy (the
    per-row python overhead dominates below ~2^6 points)."""
    if n < 64:
        return None
    from .. import native

    L = native.lib()
    return L if (L is not None and hasattr(L, "svt_ntt_batch")) else None


def ntt(coeffs: np.ndarray) -> np.ndarray:
    """Batched NTT along the last axis: [..., n] coeffs -> [..., n] evals."""
    n = coeffs.shape[-1]
    bits = log2_strict(n)
    if _native_lib(n) is not None:
        from .. import native

        flat = np.array(coeffs.reshape(-1, n), dtype=np.uint64, copy=True,
                        order="C")
        native.ntt_np_inplace(flat, gl.primitive_root_of_unity(bits))
        return flat.reshape(coeffs.shape)
    perm = reverse_index_bits_perm(n)
    v = np.take(coeffs, perm, axis=-1).copy()
    stages = _twiddles(bits)
    for s in range(bits):
        m = 1 << s
        tw = stages[s]
        v = v.reshape(coeffs.shape[:-1] + (n // (2 * m), 2, m))
        a = v[..., 0, :]
        b = gl.mul(v[..., 1, :], tw)
        v = np.concatenate(
            [gl.add(a, b)[..., None, :], gl.sub(a, b)[..., None, :]], axis=-2
        )
    return v.reshape(coeffs.shape)


def intt(evals: np.ndarray) -> np.ndarray:
    n = evals.shape[-1]
    coeffs = ntt(evals)
    # inverse: reverse order of outputs 1..n-1 and scale by n^{-1}
    idx = np.concatenate([[0], np.arange(n - 1, 0, -1)]).astype(np.int64)
    coeffs = np.take(coeffs, idx, axis=-1)
    n_inv = pow(n, gl.P - 2, gl.P)
    return gl.mul(coeffs, gl.const(n_inv, coeffs.shape[-1:]))


def coset_fft(coeffs: np.ndarray, shift: int) -> np.ndarray:
    """Evaluate p(shift * x) over H, i.e. p over the coset shift*H."""
    n = coeffs.shape[-1]
    powers = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        powers[i] = acc
        acc = (acc * shift) % gl.P
    return ntt(gl.mul(coeffs, powers))


def coset_ifft(evals: np.ndarray, shift: int) -> np.ndarray:
    coeffs = intt(evals)
    n = coeffs.shape[-1]
    sinv = pow(shift, gl.P - 2, gl.P)
    powers = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        powers[i] = acc
        acc = (acc * sinv) % gl.P
    return gl.mul(coeffs, powers)


def lde(coeffs: np.ndarray, rate_bits: int) -> np.ndarray:
    n = coeffs.shape[-1]
    out = np.zeros(coeffs.shape[:-1] + (n << rate_bits,), dtype=np.uint64)
    out[..., :n] = coeffs
    return out


def coset_lde(coeffs: np.ndarray, rate_bits: int, shift: int) -> np.ndarray:
    n = coeffs.shape[-1]
    n_lde = n << rate_bits
    if _native_lib(n_lde) is not None:
        from .. import native

        out = native.coset_lde_np(
            coeffs.reshape(-1, n), rate_bits, shift,
            gl.primitive_root_of_unity(log2_strict(n_lde)))
        return out.reshape(coeffs.shape[:-1] + (n_lde,))
    return coset_fft(lde(coeffs, rate_bits), shift)
