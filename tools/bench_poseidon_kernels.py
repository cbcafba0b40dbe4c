"""On-chip A/B of the Pallas Poseidon kernel variants:

  v1 (mxu=0): pure-VPU MDS (16-bit limb roll-mac)
  v2 (mxu=1): MXU MDS ([12,12]@[12,8B] f32 matmul over 8-bit limbs)
  v2b (mxu=2): MXU MDS + two interleaved half-streams (MXU/VPU overlap)

Prints perms/s for each variant at several batch sizes, plus a jit-chained
variant (CH dependent permutations in one jit) that removes per-call glue —
the upper bound the verifier's scan-chained call sites can approach.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.ops.pallas import poseidon_kernel as pk


def _bench(fn, lo, hi, reps=20):
    out = fn(lo, hi)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(lo, hi)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(5)
    golden_checked = False
    for B in (4096, 32768, 131072):
        state = rng.integers(0, gl.P, (12, B), dtype=np.uint64)
        lo = np.asarray(state & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = np.asarray(state >> np.uint64(32)).astype(np.uint32)
        import jax.numpy as jnp

        lo, hi = jnp.asarray(lo), jnp.asarray(hi)
        row = f"B={B:7d}:"
        for mxu, name in ((0, "v1-vpu"), (1, "v2-mxu"), (2, "v2b-2s")):
            try:
                fn = lambda l, h: pk.poseidon_permute_batch(l, h, mxu=mxu)
                dt = _bench(fn, lo, hi)
                row += f"  {name} {B/dt/1e6:7.2f} M/s"
                if not golden_checked:
                    out = fn(lo, hi)
                    got = (np.asarray(out[0], np.uint64)
                           | (np.asarray(out[1], np.uint64) << np.uint64(32)))
                    from stark_verifier_tpu.ops import poseidon_gl as pg

                    exp = pg.permute(gl, state)
                    assert (got == exp).all(), f"{name} MISMATCH on chip"
            except Exception as e:
                row += f"  {name} FAIL({type(e).__name__})"
        golden_checked = True
        print(row, flush=True)

    # chained upper bound: 32 dependent permutations inside one jit
    B = 32768
    state = rng.integers(0, gl.P, (12, B), dtype=np.uint64)
    import jax.numpy as jnp

    lo = jnp.asarray((state & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((state >> np.uint64(32)).astype(np.uint32))
    for mxu in (0, 1, 2):
        @jax.jit
        def chained(l, h):
            for _ in range(32):
                l, h = pk.poseidon_permute_batch(l, h, mxu=mxu)
            return l, h

        try:
            dt = _bench(chained, lo, hi, reps=5)
            print(f"chainedx32 B={B} mxu={mxu}: {32*B/dt/1e6:7.2f} M perms/s",
                  flush=True)
        except Exception as e:
            print(f"chainedx32 mxu={mxu}: FAIL {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
