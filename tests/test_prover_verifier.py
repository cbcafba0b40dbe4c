"""End-to-end prover -> verifier roundtrips (numpy golden path) with
negative tests. Mirrors the reference's integration strategy
(reference: verifier_api.rs:121-161) with self-produced fixtures."""
import numpy as np
import pytest

from stark_verifier_tpu.core.types import CircuitConfig, FriConfig
from stark_verifier_tpu.core.verifier import verify_proof
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.prover.builder import CircuitBuilder
from stark_verifier_tpu.prover.prove import prove_batch

rng = np.random.default_rng(21)


@pytest.fixture(scope="module")
def small_proofs():
    cfg = CircuitConfig(fri_config=FriConfig(rate_bits=3, cap_height=2,
                                             proof_of_work_bits=8,
                                             num_query_rounds=8))
    b = CircuitBuilder(cfg)
    sk = b.add_virtual_targets(8)
    state = sk
    for _ in range(10):
        state = b.hash_n_to_hash_no_pad(state) + state[:4]
    b.register_public_inputs(state[:4])
    b.min_degree = 64  # ensure at least one FRI fold layer
    data = b.build()
    inputs = {t: rng.integers(0, gl.P, size=2, dtype=np.uint64) for t in sk}
    proofs = prove_batch(data, inputs, 2)
    return data, proofs


def test_roundtrip_accepts(small_proofs):
    data, proofs = small_proofs
    assert data.common.fri_params.reduction_arity_bits, "want >=1 fold layer"
    for p in proofs:
        assert verify_proof(gl, data.common, data.vk, p)


@pytest.mark.parametrize("what", [
    "opening", "pow", "cap", "final_poly", "pi", "step_eval", "init_eval"])
def test_corruptions_rejected(small_proofs, what):
    import copy

    data, proofs = small_proofs
    p = copy.deepcopy(proofs[0])
    one = np.uint64(1)
    if what == "opening":
        p.openings.wires[3, 0] ^= one
    elif what == "pow":
        p.opening_proof.pow_witness = np.uint64(int(p.opening_proof.pow_witness) ^ 1)
    elif what == "cap":
        p.wires_cap[0, 0] ^= one
    elif what == "final_poly":
        p.opening_proof.final_poly[0, 0] ^= one
    elif what == "pi":
        p.public_inputs[0] ^= one
    elif what == "step_eval":
        p.opening_proof.query_rounds.step_evals[0][1, 0, 0] ^= one
    elif what == "init_eval":
        p.opening_proof.query_rounds.initial_evals[1][2, 5] ^= one
    assert not verify_proof(gl, data.common, data.vk, p), what
