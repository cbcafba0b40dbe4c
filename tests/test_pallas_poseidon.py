"""Pallas Poseidon kernel: the planes formulation must be bit-exact with the
golden model (interpret/XLA fallback path on CPU)."""
import numpy as np

from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.ops import poseidon_gl as pg
from stark_verifier_tpu.ops.pallas import poseidon_kernel as pk

rng = np.random.default_rng(13)


def test_planes_permutation_matches_golden():
    import jax.numpy as jnp

    B = 16
    state = rng.integers(0, gl.P, (12, B), dtype=np.uint64)
    lo = jnp.asarray((state & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((state >> np.uint64(32)).astype(np.uint32))
    out_lo, out_hi = pk._permute_planes(lo, hi)
    got = np.asarray(out_lo, dtype=np.uint64) | (
        np.asarray(out_hi, dtype=np.uint64) << np.uint64(32)
    )
    expect = pg.permute(gl, state)
    assert (got == expect).all()
