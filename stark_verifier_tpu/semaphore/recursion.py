"""Recursive aggregation of Semaphore signals (reference:
plonky2_semaphore/recursion.rs) and the config-switch wrapper (reference:
plonky2_semaphore/wrapper.rs:16-57).

`build_aggregation_circuit` verifies TWO child proofs in-circuit with a
shared verifier-data target and re-exposes root ‖ child0-rest ‖ child1-rest
as public inputs (reference: recursion.rs:25-185). `aggregate_proofs` folds
N proofs level-by-level; where the reference fans each level out over rayon
threads (recursion.rs:214-227), we prove ALL pairs of a level as one batch
through the vectorized prover — the whole level is one `prove_batch` call.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from ..core.types import CircuitConfig, CommonData, FriConfig, Proof, VerifierOnlyData
from ..prover.builder import CircuitBuilder, CircuitData
from ..prover.prove import prove_batch
from ..prover.recursion import (
    ProofTargets,
    VerifierTargets,
    add_virtual_proof,
    add_virtual_verifier_data,
    fill_proof_targets,
    fill_verifier_targets,
    recursion_config,
    verify_proof_targets,
)


@dataclass
class AggregationCircuit:
    data: CircuitData
    pt0: ProofTargets
    pt1: ProofTargets
    vt: VerifierTargets
    inner_common: CommonData


def build_aggregation_circuit(inner_common: CommonData,
                              config: CircuitConfig = None) -> AggregationCircuit:
    """Circuit verifying two child proofs (same inner circuit) and exposing
    root(4) ‖ rest(child0) ‖ rest(child1). Child public-input layout is
    assumed to start with a shared 4-element digest (the Semaphore Merkle
    root; reference: recursion.rs:106-165)."""
    b = CircuitBuilder(config or recursion_config(inner_common.config.fri_config))
    npi = inner_common.num_public_inputs
    assert npi >= 4, "children must expose a leading 4-element root digest"

    vt = add_virtual_verifier_data(b, inner_common)
    pt0 = add_virtual_proof(b, inner_common)
    pt1 = add_virtual_proof(b, inner_common)

    # exposed public inputs: shared root, then each child's remaining PIs
    b.register_public_inputs(pt0.public_inputs[:4])
    b.register_public_inputs(pt0.public_inputs[4:])
    b.register_public_inputs(pt1.public_inputs[4:])
    for i in range(4):
        b.connect(pt0.public_inputs[i], pt1.public_inputs[i])

    verify_proof_targets(b, pt0, vt, inner_common)
    verify_proof_targets(b, pt1, vt, inner_common)

    return AggregationCircuit(
        data=b.build(), pt0=pt0, pt1=pt1, vt=vt, inner_common=inner_common)


def prove_aggregation_level(agg: AggregationCircuit, proofs: List[Proof],
                            inner_vk: VerifierOnlyData) -> List[Proof]:
    """One tree level: proofs[2k], proofs[2k+1] -> aggregated proof k, all
    pairs proved as one batch."""
    assert len(proofs) % 2 == 0 and proofs
    left, right = proofs[0::2], proofs[1::2]
    B = len(left)
    inputs: Dict = {}
    inputs.update(fill_proof_targets(agg.pt0, left))
    inputs.update(fill_proof_targets(agg.pt1, right))
    inputs.update(fill_verifier_targets(agg.vt, inner_vk, B))
    return prove_batch(agg.data, inputs, B)


def aggregate_proofs(proofs: List[Proof], common: CommonData,
                     vk: VerifierOnlyData, config: CircuitConfig = None,
                     _cache: Dict = None) -> Tuple[Proof, CircuitData, List[AggregationCircuit]]:
    """Fold 2^k proofs into one (reference: recursion.rs:187-247). Returns
    (final proof, final circuit data, per-level circuits). Each level's
    inner circuit differs (its children are the previous level), so one
    aggregation circuit is built per level, as in the reference."""
    n = len(proofs)
    assert n and (n & (n - 1)) == 0, "aggregate a power-of-two batch"
    levels: List[AggregationCircuit] = []
    level_proofs = list(proofs)
    level_common, level_vk, level_data = common, vk, None
    while len(level_proofs) > 1:
        key = id(level_common)
        if _cache is not None and key in _cache:
            agg = _cache[key]
        else:
            agg = build_aggregation_circuit(level_common, config)
            if _cache is not None:
                _cache[key] = agg
        level_proofs = prove_aggregation_level(agg, level_proofs, level_vk)
        levels.append(agg)
        level_data = agg.data
        level_common, level_vk = agg.data.common, agg.data.vk
    return level_proofs[0], level_data, levels


# ------------------------------------------------- semaphore-level driver
@dataclass
class AggregatedSignals:
    """The reference's aggregated Signal shape (recursion.rs:187-247): one
    proof attesting all children, with the shared root and every child's
    nullifier/topics re-exposed in its public inputs."""

    nullifiers: np.ndarray  # [N, 4]
    topics: np.ndarray      # [N, 4]
    proof: Proof
    common: CommonData
    vk: VerifierOnlyData


def aggregate_signals(aset, signals, config: CircuitConfig = None) -> AggregatedSignals:
    """Fold 2^k Semaphore signals into one recursive proof
    (reference: recursion.rs:187-247 `aggregate`). Child PI layout is
    root(4) ‖ nullifier(4) ‖ topics(4); each level re-exposes
    root ‖ children-rest, so the final proof's PIs carry every nullifier
    and topic in tree order."""
    data = aset.circuit()
    proofs = [s.proof for s in signals]
    final, final_data, _ = aggregate_proofs(
        proofs, data.common, data.vk, config)
    return AggregatedSignals(
        nullifiers=np.stack([s.nullifier for s in signals]),
        topics=np.stack([s.topics for s in signals]),
        proof=final,
        common=final_data.common,
        vk=final_data.vk,
    )


def verify_aggregated(agg: AggregatedSignals, merkle_root) -> bool:
    """Native verification of the aggregate + PI consistency with the
    claimed root/nullifiers/topics."""
    from ..core.verifier import verify_proof
    from ..ops import gl64_np as gl

    pis = agg.proof.public_inputs
    if not (pis[:4] == np.asarray(merkle_root, np.uint64)).all():
        return False
    # each level interleaves (rest0, rest1); for N=2^k leaves the leaf
    # order is preserved left-to-right: rest blocks of 8 (nullifier+topics)
    rest = pis[4:]
    n = agg.nullifiers.shape[0]
    if rest.shape[0] != 8 * n:
        return False
    for i in range(n):
        blk = rest[8 * i : 8 * i + 8]
        if not (blk[:4] == agg.nullifiers[i]).all():
            return False
        if not (blk[4:] == agg.topics[i]).all():
            return False
    return bool(verify_proof(gl, agg.common, agg.vk, agg.proof))


# ------------------------------------------------------------------ wrapper
@dataclass
class WrapperCircuit:
    """Verify one inner proof and re-expose its public inputs under a new
    outer config (reference: wrapper.rs:16-57). The reference uses this to
    switch the transcript/Merkle hash to BN254 Poseidon before the Halo2
    stage; pass `hasher="bn254"` for the same switch (the outer proof's
    oracles/transcript then use the bridge sponge; reference:
    bn245_poseidon/plonky2_config.rs:53-104)."""

    data: CircuitData
    pt: ProofTargets
    vt: VerifierTargets
    inner_common: CommonData
    hasher: str = "poseidon"

    def prove(self, proofs: List[Proof], inner_vk: VerifierOnlyData) -> List[Proof]:
        B = len(proofs)
        inputs: Dict = {}
        inputs.update(fill_proof_targets(self.pt, proofs))
        inputs.update(fill_verifier_targets(self.vt, inner_vk, B))
        return prove_batch(self.data, inputs, B)


def build_wrapper_circuit(inner_common: CommonData,
                          config: CircuitConfig = None,
                          hasher: str = "poseidon") -> WrapperCircuit:
    if config is None:
        # standard_stark_verifier_config shape: cap_height 0 outer oracle
        # caps (reference: plonky2_config.rs:90-104)
        config = recursion_config(FriConfig(
            rate_bits=3, cap_height=0,
            proof_of_work_bits=inner_common.config.fri_config.proof_of_work_bits,
            num_query_rounds=inner_common.config.fri_config.num_query_rounds,
        ))
    config.hasher = hasher
    b = CircuitBuilder(config)
    vt = add_virtual_verifier_data(b, inner_common)
    pt = add_virtual_proof(b, inner_common)
    b.register_public_inputs(pt.public_inputs)
    verify_proof_targets(b, pt, vt, inner_common)
    return WrapperCircuit(data=b.build(), pt=pt, vt=vt,
                          inner_common=inner_common, hasher=hasher)
