"""End-to-end Bn254PoseidonGoldilocksConfig proofs: the prover commits its
oracles and runs its transcript with the BN254 bridge sponge, and the
verifier (numpy golden AND JAX backend) accepts — the TPU-native analogue of
the reference's wrapper-proof hash config (reference:
bn245_poseidon/plonky2_config.rs:53-104, native.rs:43-77)."""
import numpy as np
import pytest

from stark_verifier_tpu.core.types import CircuitConfig, FriConfig
from stark_verifier_tpu.core.verifier import verify_proof
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.prover.builder import CircuitBuilder
from stark_verifier_tpu.prover.prove import prove_batch

pytestmark = pytest.mark.quick


def bn254_tiny_config():
    return CircuitConfig(
        hasher="bn254",
        fri_config=FriConfig(rate_bits=3, cap_height=1, proof_of_work_bits=4,
                             num_query_rounds=2),
    )


@pytest.fixture(scope="module")
def bn254_proofs():
    b = CircuitBuilder(bn254_tiny_config())
    b.min_degree = 64  # force one FRI fold layer (deg 2^6, lde 2^9)
    xs = b.add_virtual_targets(3)
    acc = b.mul(xs[0], xs[1])
    acc = b.arithmetic(2, 9, acc, xs[2], xs[0])
    b.register_public_inputs(xs)
    b.register_public_input(acc)
    data = b.build()
    rng = np.random.default_rng(21)
    inputs = {t: rng.integers(0, gl.P, size=2, dtype=np.uint64) for t in xs}
    return prove_batch(data, inputs, 2), data


def test_bn254_config_proof_golden_verify(bn254_proofs):
    proofs, data = bn254_proofs
    assert data.common.config.hasher == "bn254"
    for p in proofs:
        assert verify_proof(gl, data.common, data.vk, p)


def test_bn254_config_rejects_corruption(bn254_proofs):
    from copy import deepcopy

    proofs, data = bn254_proofs
    bad = deepcopy(proofs[0])
    bad.openings.quotient_polys[0, 0] ^= 1
    assert not verify_proof(gl, data.common, data.vk, bad)
    bad2 = deepcopy(proofs[0])
    bad2.wires_cap[0, 0] ^= 1
    assert not verify_proof(gl, data.common, data.vk, bad2)


def test_bn254_config_jax_verify(bn254_proofs):
    """Full JAX-backend verify under the bridge config. The bridge-config
    verifier graph embeds the 68-round Fr permutation at every transcript/
    Merkle step — XLA:CPU compiles it at hour scale, so this runs gated
    (the golden path above already exercises the jitted bridge kernel via
    ops/hashers._bridge_permute_np; the TPU drive covers this path)."""
    import os

    if not os.environ.get("SVT_SLOW"):
        pytest.skip("hour-scale XLA:CPU compile; set SVT_SLOW=1 (TPU: fast)")
    import jax

    from stark_verifier_tpu.core import verifier as V
    from stark_verifier_tpu.ops import gl64_jax as gj

    proofs, data = bn254_proofs
    pa = V.arrays_to_backend(gj, V.proof_to_arrays(proofs[0]))
    ok = V.verify(gj, data.common, gj.from_u64(data.vk.constants_sigmas_cap),
                  gj.from_u64(data.vk.circuit_digest), pa)
    assert bool(np.asarray(ok))


def test_digest_differs_from_poseidon_config():
    """The vk digest is hashed with the config hasher, so the two configs
    commit to different digests for the same circuit."""
    def build(hasher):
        cfg = bn254_tiny_config()
        cfg.hasher = hasher
        b = CircuitBuilder(cfg)
        xs = b.add_virtual_targets(2)
        b.register_public_input(b.mul(xs[0], xs[1]))
        return b.build()

    d_pos = build("poseidon")
    d_bn = build("bn254")
    assert not (d_pos.vk.circuit_digest == d_bn.vk.circuit_digest).all()
