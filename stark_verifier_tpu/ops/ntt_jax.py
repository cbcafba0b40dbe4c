"""Radix-2 NTT / coset-LDE over Goldilocks — JAX/TPU path.

`ntt` is the local batched transform (batch axes lead, transform axis last,
fully vectorized butterflies per stage). `ntt_4step` partitions the
transform axis over the device mesh with an all_to_all "transpose" between
the two local half-transforms — the multi-chip butterfly-partitioned NTT the
aggregation path scales with (SURVEY §2.3, BASELINE config 5).

Twiddle tables are numpy constants; bit-exact with ops/ntt_np.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import gl64_jax as gj
from . import gl64_np as gl
from .gl64_jax import GF
from ..utils.bits import log2_strict, reverse_index_bits_perm

_tw_cache = {}


def _stage_twiddles_np(n_bits: int):
    key = n_bits
    if key not in _tw_cache:
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
        _tw_cache[key] = stages
    return _tw_cache[key]


def ntt(x: GF) -> GF:
    """Batched NTT along the last axis: coeffs -> evals over H (natural
    order), identical to ntt_np.ntt."""
    n = x.l0.shape[-1]
    bits = log2_strict(n)
    perm = reverse_index_bits_perm(n)
    v = gj.take(x, perm, axis=-1)
    lead = x.l0.shape[:-1]
    stages = _stage_twiddles_np(bits)
    for s in range(bits):
        m = 1 << s
        tw = gj.from_u64(stages[s])  # [m]
        v = gj.reshape(v, lead + (n // (2 * m), 2, m))
        a = gj.index(v, (Ellipsis, 0, slice(None)))
        b = gj.mul(gj.index(v, (Ellipsis, 1, slice(None))), tw)
        apb = gj.add(a, b)
        amb = gj.sub(a, b)
        v = gj.concat(
            [gj.reshape(apb, lead + (n // (2 * m), 1, m)),
             gj.reshape(amb, lead + (n // (2 * m), 1, m))],
            axis=-2,
        )
    return gj.reshape(v, lead + (n,))


def intt(x: GF) -> GF:
    n = x.l0.shape[-1]
    c = ntt(x)
    idx = np.concatenate([[0], np.arange(n - 1, 0, -1)]).astype(np.int32)
    c = gj.take(c, idx, axis=-1)
    n_inv = pow(n, gl.P - 2, gl.P)
    return gj.mul(c, gj.const(n_inv))


def coset_fft(x: GF, shift: int) -> GF:
    n = x.l0.shape[-1]
    powers = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        powers[i] = acc
        acc = (acc * shift) % gl.P
    return ntt(gj.mul(x, gj.from_u64(powers)))


def coset_lde(x: GF, rate_bits: int, shift: int) -> GF:
    n = x.l0.shape[-1]
    pad = [(0, 0)] * (x.l0.ndim - 1) + [(0, (n << rate_bits) - n)]
    padded = gj.gmap(lambda a: jnp.pad(a, pad), x)
    return coset_fft(padded, shift)


# ------------------------------------------------------------- distributed
def ntt_4step(x: GF, mesh, axis: str = "ntt") -> GF:
    """Distributed NTT of length n = n1*n2 over `mesh[axis]` (D devices).

    Four-step algorithm: local column NTT (length n1), twiddle scaling,
    all_to_all transpose over ICI, local row NTT (length n2). Input/output
    are sharded on the transform axis; output is in natural order.

    x: GF [..., n] sharded along the last axis.
    """
    try:
        from jax import shard_map as _shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map as _shard_map
    from jax.sharding import PartitionSpec as P
    from functools import partial

    D = mesh.shape[axis]
    n = x.l0.shape[-1]
    n1 = D
    n2 = n // D
    w = gl.primitive_root_of_unity(log2_strict(n))
    # twiddle factors w^(k1*j2) for the local shard's k1 = device index
    tw_all = np.empty((n1, n2), dtype=np.uint64)
    for k1 in range(n1):
        acc = 1
        step = pow(w, k1, gl.P)
        for j2 in range(n2):
            tw_all[k1, j2] = acc
            acc = (acc * step) % gl.P
    # small DFT matrix for the length-n1 column transform
    wn1 = pow(w, n2, gl.P)  # primitive n1-th root
    dft1 = np.empty((n1, n1), dtype=np.uint64)
    for a in range(n1):
        for b in range(n1):
            dft1[a, b] = pow(wn1, a * b, gl.P)

    @jax.jit  # one compile: eager shard_map dispatches each op to the mesh
    @partial(_shard_map, mesh=mesh, in_specs=P(*([None] * (x.l0.ndim - 1) + [axis])),
             out_specs=P(*([None] * (x.l0.ndim - 1) + [axis])))
    def _run(xs: GF) -> GF:
        # xs: local shard [..., n2] = columns j2 of X[j1][j2] for j1 = my row?
        # Layout: x[j] with j = j1*n2 + j2; the shard over last axis gives
        # device d the slice j in [d*n2, (d+1)*n2) == row j1 = d. For the
        # column transform we need all j1 for fixed j2: all_to_all first.
        lead = xs.l0.shape[:-1]
        # split local row into D column-chunks and exchange -> device d2 gets
        # columns [d2*n2/D, ...) of every row
        c = n2 // D
        xs2 = gj.gmap(lambda a: a.reshape(lead + (1, D, c)), xs)
        ex = gj.gmap(
            lambda a: jax.lax.all_to_all(a, axis, split_axis=a.ndim - 2,
                                          concat_axis=a.ndim - 3), xs2)
        # ex: [..., D(j1), 1, c] -> [..., D(j1), c]
        ex = gj.gmap(lambda a: a.reshape(lead + (D, c)), ex)
        # column NTT over j1 via the small DFT matrix (exact Goldilocks
        # matmul: sum over n1 of dft1[k1, j1] * X[j1, j2])
        col = _dft_matmul(dft1, ex)  # [..., D(k1), c]
        # twiddle: w^(k1 * j2), j2 = my_col_offset + local index
        d = jax.lax.axis_index(axis)
        j2_base = d * c
        tw = gj.from_u64(tw_all)  # [n1, n2]
        tw_loc = gj.gmap(lambda a: jax.lax.dynamic_slice_in_dim(a, j2_base, c, 1), tw)
        col = gj.mul(col, tw_loc)
        # transpose back: device k1 collects its row (all j2) -> all_to_all
        col2 = gj.gmap(lambda a: a.reshape(lead + (D, 1, c)), col)
        back = gj.gmap(
            lambda a: jax.lax.all_to_all(a, axis, split_axis=a.ndim - 3,
                                          concat_axis=a.ndim - 2), col2)
        back = gj.gmap(lambda a: a.reshape(lead + (n2,)), back)
        # row NTT of length n2 (local, full)
        y = ntt(back)
        return y

    y = _run(x)
    # output index: Y[k1][k2] lives at position k1*n2 + k2 but the true NTT
    # output index is k2*n1 + k1 — emit a gather to natural order.
    k = np.arange(n)
    src = (k % n1) * n2 + (k // n1)
    return gj.take(y, src.astype(np.int32), axis=-1)


def _dft_matmul(dft_np: np.ndarray, x: GF) -> GF:
    """out[..., a, c] = sum_b dft[a, b] * x[..., b, c] (mod p), small a,b."""
    n1 = dft_np.shape[0]
    rows = []
    for a in range(n1):
        acc = None
        for b in range(n1):
            term = gj.mul(gj.index(x, (Ellipsis, b, slice(None))), gj.const(int(dft_np[a, b])))
            acc = term if acc is None else gj.add(acc, term)
        rows.append(acc)
    return gj.gmap(lambda *rs: jnp.stack(rs, axis=-2), *rows)
