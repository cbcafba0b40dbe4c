"""MXU-resident sbox experiment (VERDICT r3 weak #2 / next-step #4).

Question: can the Poseidon x^7 sbox ride the MXU the way the MDS does?

The MDS rides the MXU because it is a LINEAR map with a constant matrix:
8-bit limb planes of the state contract against the constant 12x12 MDS in
one f32 matmul. The sbox is different in kind: x^7 needs MODULAR MULTIPLIES
of data BY data. On the MXU a data*data elementwise product can only be
expressed as a batched outer product / contraction of length 1 — zero
reuse, so the systolic array runs at ~1/128 utilization; the alternative
8-bit-limb schoolbook square (64 partial products + a 15-column carry walk)
is strictly more VPU work than the current 16-bit mul32 path (16 partial
products + one 128-bit fold).

This tool measures three sbox-layer formulations on [12, B] u32 planes,
chained x ROUNDS to amortize dispatch, on the real chip:

  v0  current 16-bit-limb mul chain (_sbox7; the kernel's datapath)
  v1  8-bit-limb schoolbook square for x^2/x^4 via broadcast VPU products
      (36 unique products + carry recombine), muls stay 16-bit
  v2  squares via lax.dot_general batched outer product in f32 (the only
      MXU mapping that exists for data*data), recombine on VPU

Result (2026-08-19, v5e chip, B=32768, 64 chained sbox layers, all three
bit-exact; .bank/sbox_mxu.log):

    v0_mul16          7.56 ms/chain   3327 M sbox/s
    v1_sq8_vpu        7.49 ms/chain   3360 M sbox/s   (+1%, a wash)
    v2_sq8_mxu_outer  233.3 ms/chain   108 M sbox/s   (31x SLOWER)

CONCLUSION (measured, closing BENCH_SUMMARY's open assertion): the sbox
datapath cannot ride the MXU — the only MXU mapping for data*data is a
contraction of length 1, which runs the systolic array at ~1/128
utilization and pays f32<->i32 casts per element (31x slower than the VPU
path). Re-arithmetizing the square at 8-bit limbs on the VPU is also a
dead end (within 1% of the 16-bit path — the VPU is saturated either way).
The full-preset throughput is genuinely VPU-roofline-bound; >10k/s on the
FULL synthetic preset would need a different field representation, not
scheduling.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from stark_verifier_tpu.ops.pallas.poseidon_kernel import (
    _16,
    _LO16,
    _mul_gl,
    _reduce128,
    _sbox7,
)

ROUNDS = 64
B = int(os.environ.get("SVT_SBOX_B", 32768))
_255 = np.uint32(0xFF)
_8 = np.uint32(8)
_24 = np.uint32(24)


def _limbs8(lo, hi):
    return [lo & _255, (lo >> _8) & _255, (lo >> _16) & _255, lo >> _24,
            hi & _255, (hi >> _8) & _255, (hi >> _16) & _255, hi >> _24]


def _recombine8(cols):
    """15 8-bit-spaced u32 columns -> mod-p (lo, hi) planes."""
    # fold pairs into 16-bit spacing: d_k = cols[2k] + (cols[2k+1] << 8)
    cols = cols + [jnp.zeros_like(cols[0])] * (16 - len(cols))
    d = [cols[2 * k] + (cols[2 * k + 1] << _8) for k in range(8)]
    # carry-walk 16-bit columns into x0..x3 (each < 2^32)
    acc = d[0]
    x = []
    for k in range(1, 8):
        nxt = (acc >> _16) + d[k]
        x.append(acc & _LO16)
        acc = nxt
    x.append(acc)  # holds remaining high bits
    x0 = x[0] + (x[1] << _16)
    x1 = x[2] + (x[3] << _16)
    x2 = x[4] + (x[5] << _16)
    x3 = x[6] + (x[7] << _16) if len(x) > 7 else x[6]
    return _reduce128(x0, x1, x2, x3, canon=False)


def _sq_schoolbook8(lo, hi):
    """x^2 via 8-bit-limb schoolbook products on the VPU."""
    a = _limbs8(lo, hi)
    cols = [jnp.zeros_like(lo) for _ in range(15)]
    for i in range(8):
        for j in range(i, 8):
            p = a[i] * a[j]
            if j > i:
                p = p + p
            cols[i + j] = cols[i + j] + p
    return _recombine8(cols)


def _sq_mxu_outer(lo, hi):
    """x^2 via f32 batched outer product — the only MXU mapping for
    data*data (contraction dim 1)."""
    a = _limbs8(lo, hi)
    W, Bn = lo.shape
    x = jnp.stack([l.astype(jnp.int32).astype(jnp.float32) for l in a],
                  axis=-1).reshape(W * Bn, 8)
    outer = jax.lax.dot_general(
        x[:, :, None], x[:, None, :],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [W*Bn, 8, 8]
    outer = outer.astype(jnp.int32).astype(jnp.uint32).reshape(W, Bn, 8, 8)
    cols = [jnp.zeros_like(lo) for _ in range(15)]
    for i in range(8):
        for j in range(8):
            cols[i + j] = cols[i + j] + outer[:, :, i, j]
    return _recombine8(cols)


def _sbox7_sq(lo, hi, sq):
    l2, h2 = sq(lo, hi)
    l3, h3 = _mul_gl(l2, h2, lo, hi)
    l4, h4 = sq(l2, h2)
    return _mul_gl(l3, h3, l4, h4)


def _chain(fn):
    def run(lo, hi):
        for _ in range(ROUNDS):
            lo, hi = fn(lo, hi)
        return lo, hi

    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    x = rng.integers(0, (1 << 64) - (1 << 32) + 1, size=(12, B),
                     dtype=np.uint64)
    lo = jnp.asarray((x & 0xFFFFFFFF).astype(np.uint32))
    hi = jnp.asarray((x >> 32).astype(np.uint32))

    variants = {
        "v0_mul16": _chain(_sbox7),
        "v1_sq8_vpu": _chain(lambda l, h: _sbox7_sq(l, h, _sq_schoolbook8)),
        "v2_sq8_mxu_outer": _chain(lambda l, h: _sbox7_sq(l, h, _sq_mxu_outer)),
    }
    # correctness vs v0 first (canonicalize both sides for comparison)
    from stark_verifier_tpu.ops.pallas.poseidon_kernel import _canonical

    ref = None
    for name, fn in variants.items():
        olo, ohi = fn(lo, hi)
        olo, ohi = _canonical(olo, ohi)
        got = (np.asarray(olo), np.asarray(ohi))
        if ref is None:
            ref = got
        else:
            ok = (got[0] == ref[0]).all() and (got[1] == ref[1]).all()
            print(f"{name} bit-exact vs v0: {ok}", flush=True)
            assert ok, name
    # timing
    for name, fn in variants.items():
        fn(lo, hi)[0].block_until_ready()
        t0 = time.time()
        n_it = 8
        for _ in range(n_it):
            out = fn(lo, hi)
        out[0].block_until_ready()
        dt = (time.time() - t0) / n_it
        sbox_el = 12 * B * ROUNDS
        print(f"{name}: {dt*1e3:.2f} ms/chain -> "
              f"{sbox_el/dt/1e6:.1f} M sbox/s", flush=True)


if __name__ == "__main__":
    main()
