"""Prover LDE backends (prover/lde.py): numpy vs single-device JAX vs
mesh-partitioned ntt_4step must be bit-equal, and the batched prover must
roundtrip with the mesh backend selected — the multi-chip LDE consumer of
the distributed NTT (SURVEY §2.3, BASELINE config 5)."""
import numpy as np
import pytest

from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.prover import lde

rng = np.random.default_rng(11)


def test_backends_bit_equal():
    coeffs = rng.integers(0, gl.P, (3, 2, 16), dtype=np.uint64)
    expect = lde.coset_lde(coeffs, 3, 7, backend="np")
    got_jax = lde.coset_lde(coeffs, 3, 7, backend="jax")
    assert (got_jax == expect).all()
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    got_mesh = lde.coset_lde(coeffs, 3, 7, backend="mesh")
    assert (got_mesh == expect).all()


def test_prover_roundtrips_with_mesh_lde(monkeypatch):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    monkeypatch.setenv("SVT_PROVER_LDE", "mesh")
    from stark_verifier_tpu.core.verifier import verify_proof
    from stark_verifier_tpu.models import flagship as FS

    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=4, batch=2, config=FS.small_config(),
        cache_tag=None)
    for p in proofs:
        assert verify_proof(gl, common, vk, p)
