"""Pallas Poseidon kernel: the planes formulation must be bit-exact with the
golden model (interpret/XLA fallback path on CPU)."""
import numpy as np

from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.ops import poseidon_gl as pg
from stark_verifier_tpu.ops.pallas import poseidon_kernel as pk

rng = np.random.default_rng(13)


def _planes(state):
    import jax.numpy as jnp

    lo = jnp.asarray((state & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((state >> np.uint64(32)).astype(np.uint32))
    return lo, hi


def _join(out_lo, out_hi):
    return np.asarray(out_lo, dtype=np.uint64) | (
        np.asarray(out_hi, dtype=np.uint64) << np.uint64(32)
    )


def test_planes_permutation_matches_golden():
    B = 16
    state = rng.integers(0, gl.P, (12, B), dtype=np.uint64)
    out_lo, out_hi = pk._permute_planes(*_planes(state))
    assert (_join(out_lo, out_hi) == pg.permute(gl, state)).all()


def test_mxu_mds_matches_golden():
    """The f32-matmul MDS (8-bit limb planes on the MXU) is bit-exact with
    the golden model for full-range field elements."""
    import jax.numpy as jnp

    B = 64
    state = rng.integers(0, gl.P, (12, B), dtype=np.uint64)
    lo, hi = _planes(state)
    out_lo, out_hi = pk._mds_mxu(lo, hi, jnp.asarray(pk._MDS_F32))
    expect = np.stack([
        gl.mds12(state[:, b]) for b in range(B)], axis=1)
    assert (_join(out_lo, out_hi) == expect).all()


def test_mxu_permutation_matches_golden_interpret():
    """Whole kernel-v2 permutation (MXU MDS) in Pallas interpret mode."""
    B = 256
    state = rng.integers(0, gl.P, (12, B), dtype=np.uint64)
    lo, hi = _planes(state)
    out_lo, out_hi = pk.poseidon_permute_batch(
        lo, hi, interpret=True, block_b=128, mxu=1)
    assert (_join(out_lo, out_hi) == pg.permute(gl, state)).all()


def test_mxu2_two_stream_matches_golden_interpret():
    """Kernel v2b: two interleaved half-streams (MXU/VPU overlap)."""
    B = 256
    state = rng.integers(0, gl.P, (12, B), dtype=np.uint64)
    lo, hi = _planes(state)
    out_lo, out_hi = pk.poseidon_permute_batch(
        lo, hi, interpret=True, block_b=256, mxu=2)
    assert (_join(out_lo, out_hi) == pg.permute(gl, state)).all()
