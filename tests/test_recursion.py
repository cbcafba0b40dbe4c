"""Recursive aggregation + wrapper tests (reference:
plonky2_semaphore/recursion.rs:348-365, wrapper.rs).

The inner fixture is a small arithmetic circuit with a 4-element digest-style
leading public input (standing in for the Semaphore root) padded to a degree
that exercises FRI fold layers. The aggregation circuit verifies two child
proofs IN-CIRCUIT (prover/recursion.py) — proving it attests the children —
and the final aggregated proof is checked by the native verifier.
"""
import numpy as np
import pytest

from stark_verifier_tpu.core.types import CircuitConfig, FriConfig
from stark_verifier_tpu.core.verifier import verify_proof
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.prover.builder import CircuitBuilder
from stark_verifier_tpu.prover.prove import prove_batch
from stark_verifier_tpu.semaphore.recursion import (
    aggregate_proofs,
    build_aggregation_circuit,
    build_wrapper_circuit,
)


def tiny_inner_config():
    return CircuitConfig(
        fri_config=FriConfig(rate_bits=3, cap_height=1, proof_of_work_bits=4,
                             num_query_rounds=2)
    )


def build_tiny_inner(batch, min_degree=128):
    """Arithmetic circuit with PIs root(4) ‖ out(1); min_degree 128 forces
    degree 2^7 so FRI has two arity-2 fold layers (lde 2^10 -> final 2^5)."""
    b = CircuitBuilder(tiny_inner_config())
    b.min_degree = min_degree
    root = b.add_virtual_hash()
    b.register_public_inputs(root)
    xs = b.add_virtual_targets(2)
    acc = b.mul(xs[0], xs[1])
    acc = b.arithmetic(3, 5, acc, xs[0], xs[1])
    b.register_public_input(acc)
    data = b.build()
    rng = np.random.default_rng(11)
    inputs = {t: rng.integers(0, gl.P, size=batch, dtype=np.uint64) for t in xs}
    shared_root = rng.integers(0, gl.P, size=4, dtype=np.uint64)
    for i in range(4):
        inputs[root[i]] = np.broadcast_to(shared_root[i], (batch,))
    proofs = prove_batch(data, inputs, batch)
    return proofs, data, shared_root


@pytest.fixture(scope="module")
def inner():
    proofs, data, root = build_tiny_inner(batch=4)
    # sanity: children verify natively
    for p in proofs:
        assert verify_proof(gl, data.common, data.vk, p)
    return proofs, data, root


def test_aggregate_pair(inner):
    proofs, data, root = inner
    agg = build_aggregation_circuit(data.common)
    from stark_verifier_tpu.semaphore.recursion import prove_aggregation_level

    out = prove_aggregation_level(agg, proofs[:2], data.vk)
    assert len(out) == 1
    p = out[0]
    # exposed PIs: root(4) ‖ rest(child0) ‖ rest(child1)
    npi = data.common.num_public_inputs
    assert p.public_inputs.shape == (4 + 2 * (npi - 4),)
    assert (p.public_inputs[:4] == root).all()
    assert (p.public_inputs[4] == proofs[0].public_inputs[4])
    assert (p.public_inputs[5] == proofs[1].public_inputs[4])
    assert verify_proof(gl, agg.data.common, agg.data.vk, p)


def test_aggregate_tree_4(inner):
    proofs, data, root = inner
    final, final_data, levels = aggregate_proofs(proofs, data.common, data.vk)
    assert len(levels) == 2
    assert (final.public_inputs[:4] == root).all()
    # the 4 leaf outputs all survive in the final public inputs
    leaf_outs = {int(p.public_inputs[4]) for p in proofs}
    assert leaf_outs <= {int(x) for x in final.public_inputs[4:]}
    assert verify_proof(gl, final_data.common, final_data.vk, final)


def test_aggregate_forked_and_chunked(inner):
    """The parallel production path (SVT_AGG_PROCS forked workers with
    team-of-1 OMP + SVT_AGG_CHUNK sub-batches) produces proofs that verify
    and expose the same public inputs as the in-process path."""
    import os

    from stark_verifier_tpu.semaphore.recursion import prove_aggregation_level

    proofs, data, root = inner
    agg = build_aggregation_circuit(data.common)
    old = {k: os.environ.get(k) for k in ("SVT_AGG_PROCS", "SVT_AGG_CHUNK")}
    try:
        os.environ["SVT_AGG_PROCS"] = "2"
        os.environ["SVT_AGG_CHUNK"] = "1"
        out = prove_aggregation_level(agg, proofs[:4], data.vk)
    finally:
        for k, v in old.items():
            os.environ.pop(k, None) if v is None else os.environ.update({k: v})
    assert len(out) == 2
    for i, p in enumerate(out):
        assert (p.public_inputs[:4] == root).all()
        assert p.public_inputs[4] == proofs[2 * i].public_inputs[4]
        assert p.public_inputs[5] == proofs[2 * i + 1].public_inputs[4]
        assert verify_proof(gl, agg.data.common, agg.data.vk, p)


def test_aggregation_rejects_corrupt_child(inner):
    proofs, data, root = inner
    agg = build_aggregation_circuit(data.common)
    from copy import deepcopy

    from stark_verifier_tpu.semaphore.recursion import prove_aggregation_level

    bad = deepcopy(proofs[1])
    bad.openings.wires[0, 0] ^= 1
    with pytest.raises(AssertionError):
        prove_aggregation_level(agg, [proofs[0], bad], data.vk)


def test_aggregate_semaphore_signals():
    """Reference shape e2e (recursion.rs:187-247): 4 Semaphore signals over
    a 2^3-member set folded into ONE recursive proof whose public inputs
    re-expose root + every nullifier/topic, natively verified."""
    import numpy as np

    from stark_verifier_tpu.core.types import CircuitConfig, FriConfig
    from stark_verifier_tpu.semaphore.access_set import AccessSet
    from stark_verifier_tpu.semaphore.recursion import (
        aggregate_signals,
        verify_aggregated,
    )

    cfg = CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=1, proof_of_work_bits=4, num_query_rounds=2))
    rng = np.random.default_rng(9)
    n = 1 << 3
    sks = rng.integers(0, gl.P, size=(n, 4), dtype=np.uint64)
    aset = AccessSet(AccessSet.public_key(sks), cfg)
    idx = np.array([0, 3, 5, 6])
    topics = rng.integers(0, gl.P, size=(4, 4), dtype=np.uint64)
    signals = aset.make_signals(sks[idx], topics, idx)
    agg = aggregate_signals(aset, signals, config=cfg)
    assert verify_aggregated(agg, aset.merkle_root)
    # nullifier binding: flipping a recorded nullifier must fail
    agg.nullifiers[2, 0] ^= 1
    assert not verify_aggregated(agg, aset.merkle_root)


def test_wrapper_circuit(inner):
    proofs, data, root = inner
    wrap = build_wrapper_circuit(data.common)
    out = wrap.prove(proofs[:1], data.vk)[0]
    assert (out.public_inputs == proofs[0].public_inputs).all()
    assert wrap.data.common.config.fri_config.cap_height == 0
    assert verify_proof(gl, wrap.data.common, wrap.data.vk, out)
