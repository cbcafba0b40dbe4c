"""VPU/MXU microbenchmarks on the real chip: relative throughput of the ops
the Poseidon kernel is built from. Decides the kernel-v2 design (MXU MDS,
f32-FMA limb products, squaring chains).

Each kernel runs CHAIN dependent ops over a [8, 512] u32/f32 tile per grid
step so we measure ALU throughput, not memory.
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

CHAIN = 512
ROWS, COLS = 8, 512
GRID = 64


def _bench(name, fn, *args, flop_per_elem):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    reps = 30
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    elems = ROWS * COLS * GRID
    ops = elems * CHAIN * flop_per_elem
    print(f"{name:28s} {dt*1e6:9.1f} us  {ops/dt/1e9:9.1f} Gop/s")


def _mk(kernel_body, dtype):
    def kernel(x_ref, o_ref):
        o_ref[...] = kernel_body(x_ref[...])

    @functools.partial(jax.jit)
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((ROWS, COLS), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((ROWS, COLS), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((ROWS, COLS), dtype),
        )(x)

    return run


def main():
    print("devices:", jax.devices())
    xu = jnp.asarray(
        np.random.randint(1, 1 << 16, (ROWS, COLS)).astype(np.uint32))
    xf = jnp.asarray(np.random.rand(ROWS, COLS).astype(np.float32) + 1.0)
    xi8 = jnp.asarray(np.random.randint(1, 100, (128, 128)).astype(np.int8))

    def chain_mul_u32(x):
        y = x
        for _ in range(CHAIN):
            y = y * x
        return y

    def chain_add_u32(x):
        y = x
        for _ in range(CHAIN):
            y = y + x
        return y

    def chain_shift_u32(x):
        y = x
        for _ in range(CHAIN):
            y = (y >> np.uint32(1)) + x
        return y

    def chain_fma_f32(x):
        y = x
        for _ in range(CHAIN):
            y = y * x + x
        return y

    def chain_cmp_u32(x):
        y = x
        for _ in range(CHAIN):
            y = y + (y < x).astype(jnp.uint32)
        return y

    def chain_cvt(x):
        y = x
        for _ in range(CHAIN // 2):
            y = y.astype(jnp.float32).astype(jnp.uint32) + x
        return y

    _bench("u32 multiply chain", _mk(chain_mul_u32, jnp.uint32), xu,
           flop_per_elem=1)
    _bench("u32 add chain", _mk(chain_add_u32, jnp.uint32), xu,
           flop_per_elem=1)
    _bench("u32 shift+add chain", _mk(chain_shift_u32, jnp.uint32), xu,
           flop_per_elem=2)
    _bench("u32 compare+add chain", _mk(chain_cmp_u32, jnp.uint32), xu,
           flop_per_elem=2)
    _bench("f32 fma chain", _mk(chain_fma_f32, jnp.float32), xf,
           flop_per_elem=2)
    _bench("u32<->f32 convert chain", _mk(chain_cvt, jnp.uint32), xu,
           flop_per_elem=1)

    # MXU: f32 [12,12]@[12,8192] dot, 30x chained (one per Poseidon round)
    m = jnp.asarray(np.random.rand(12, 12).astype(np.float32))

    def mxu_kernel(x_ref, m_ref, o_ref):
        y = x_ref[...]
        for _ in range(30):
            y = jax.lax.dot_general(
                m_ref[...], y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[...] = y

    xb = jnp.asarray(np.random.rand(12, 8192).astype(np.float32))

    @jax.jit
    def run_mxu(x, m):
        return pl.pallas_call(
            mxu_kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((12, 8192), lambda i: (0, 0)),
                      pl.BlockSpec((12, 12), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((12, 8192), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((12, 8192), jnp.float32),
        )(x, m)

    out = run_mxu(xb, m)
    jax.block_until_ready(out)
    reps = 30
    t0 = time.time()
    for _ in range(reps):
        out = run_mxu(xb, m)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    n_dots = 30 * GRID
    print(f"{'MXU f32 12x12@12x8192 dot':28s} {dt*1e6:9.1f} us  "
          f"{n_dots/dt/1e3:9.1f} Kdots/s "
          f"({dt/n_dots*1e6:.2f} us/dot)")


if __name__ == "__main__":
    main()
