"""Field-arithmetic roofline measurement (BASELINE.json asks for a
per-chip field-kernel roofline).

Measures sustained Goldilocks multiplies/s and Poseidon permutations/s on
the local default device, with arithmetic-intensity context: one GF mul is
16 uint32 multiplies + ~60 uint32 ALU ops over 32 bytes of operand traffic,
so large batches are ALU-bound on the VPU (not HBM-bound).
"""
from __future__ import annotations

import time

import numpy as np


def measure(batch=1 << 16, iters=64, reps=5):
    import jax
    import jax.numpy as jnp

    from ..ops import gl64_jax as gj
    from ..ops import gl64_np as gl
    from ..ops import poseidon_gl as pg

    rng = np.random.default_rng(0)
    a = gj.from_u64(rng.integers(0, gl.P, batch, dtype=np.uint64))
    b = gj.from_u64(rng.integers(0, gl.P, batch, dtype=np.uint64))

    @jax.jit
    def mul_chain(x, y):
        for _ in range(iters):
            x = gj.mul(x, y)
        return x

    out = mul_chain(a, b)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = mul_chain(a, b)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    muls_per_s = batch * iters / dt

    state = gj.from_u64(rng.integers(0, gl.P, (12, batch), dtype=np.uint64))

    @jax.jit
    def perm(s):
        return pg.permute(gj, s)

    jax.block_until_ready(perm(state))
    t0 = time.time()
    for _ in range(reps):
        s = perm(state)
    jax.block_until_ready(s)
    dt_p = (time.time() - t0) / reps
    perms_per_s = batch / dt_p

    return {
        "gl_mul_per_s": muls_per_s,
        "poseidon_perm_per_s": perms_per_s,
        "batch": batch,
        "device": str(jax.devices()[0]),
        # one GF mul ~= 16 u32 MULs + ~60 u32 ALU ops
        "u32_mul_per_s": muls_per_s * 16,
    }


if __name__ == "__main__":
    import json
    import sys

    sys.path.insert(0, ".")
    print(json.dumps(measure(), indent=1))
