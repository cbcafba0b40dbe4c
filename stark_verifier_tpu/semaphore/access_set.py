"""Semaphore anonymous-signaling application (reference: plonky2_semaphore/).

AccessSet wraps a Poseidon Merkle tree of public keys; `make_signals` proves
set-membership + nullifier correctness for a batch of identities with the
plonky2-compatible prover; `verify_signals` checks a batch of signals with
the TPU verifier.

Mirrors the reference circuit exactly (reference: plonky2_semaphore/
circuit.rs:25-65): public inputs = merkle_root(4) ‖ nullifier(4) ‖ topic(4);
the circuit verifies membership of H(sk ‖ 0^4) at split_le(index) and
nullifier = H(sk ‖ topic).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import numpy as np

from ..core.merkle import MerkleTree
from ..core.types import CircuitConfig, FriConfig
from ..ops import gl64_np as gl
from ..ops import poseidon_gl as pg
from ..prover.builder import CircuitBuilder, CircuitData
from ..prover.prove import prove_batch
from ..utils.bits import log2_strict


@dataclass
class Signal:
    """reference: plonky2_semaphore/signal.rs:11-15."""

    topics: np.ndarray      # [4]
    nullifier: np.ndarray   # [4]
    proof: "Proof"          # core.types.Proof


def semaphore_config() -> CircuitConfig:
    """The Semaphore proving preset (reference: access_set.rs:68-84):
    zk on, blowup 8, 28 queries, 16 PoW bits."""
    return CircuitConfig(
        num_wires=135,
        num_routed_wires=80,
        num_constants=2,
        num_challenges=2,
        zero_knowledge=True,
        max_quotient_degree_factor=8,
        fri_config=FriConfig(
            rate_bits=3, cap_height=4, proof_of_work_bits=16, num_query_rounds=28
        ),
    )


def build_semaphore_circuit(config: CircuitConfig, tree_height: int,
                            min_degree: int = 0):
    """Build the Semaphore membership circuit for a 2^tree_height-member
    set (reference: plonky2_semaphore/circuit.rs:25-65). The circuit shape
    depends only on tree_height, not on the access-set contents, so KAT
    tests can pin the plonky2-exact build accounting (degree after
    blind-and-pad, selector groups, k_is, digest) without materializing a
    2^20-leaf tree. Returns (CircuitData, targets dict)."""
    b = CircuitBuilder(config)
    b.min_degree = min_degree
    merkle_root = b.add_virtual_hash()
    b.register_public_inputs(merkle_root)
    nullifier = b.add_virtual_hash()
    b.register_public_inputs(nullifier)
    topic = b.add_virtual_targets(4)
    b.register_public_inputs(topic)

    private_key = b.add_virtual_targets(4)
    index = b.add_virtual_target()
    index_bits = b.split_le(index, tree_height)
    zero = b.zero()
    siblings = [b.add_virtual_hash() for _ in range(tree_height)]
    b.verify_merkle_proof_to_cap_root(
        private_key + [zero] * 4, index_bits, merkle_root, siblings
    )
    should_be_nullifier = b.hash_n_to_hash_no_pad(private_key + topic)
    for i in range(4):
        b.connect(nullifier[i], should_be_nullifier[i])

    targets = dict(
        merkle_root=merkle_root,
        nullifier=nullifier,
        topic=topic,
        private_key=private_key,
        index=index,
        siblings=siblings,
    )
    return b.build(), targets


class AccessSet:
    def __init__(self, public_keys: np.ndarray, config: CircuitConfig = None,
                 min_degree: int = 0):
        """public_keys: [n, 4] uint64 (n a power of two). `min_degree` pads
        the circuit with noops to a minimum row count (e.g. to emulate the
        row count a zk-blinded plonky2 build would have)."""
        self.tree = MerkleTree(public_keys, cap_height=0)
        self.tree_height = log2_strict(public_keys.shape[0])
        self.config = config or semaphore_config()
        self.min_degree = min_degree
        self._circuit: CircuitData = None
        self._wrapper = None

    @staticmethod
    def public_key(private_key: np.ndarray) -> np.ndarray:
        """H(sk ‖ 0^4) (reference: plonky2_semaphore/signal.rs tests)."""
        sk = [private_key[..., i] for i in range(4)]
        zeros = [gl.zeros(private_key.shape[:-1]) for _ in range(4)]
        return np.stack(pg.hash_no_pad(gl, sk + zeros, shape=private_key.shape[:-1]), axis=-1)

    @staticmethod
    def nullifier(private_key: np.ndarray, topic: np.ndarray) -> np.ndarray:
        ins = [private_key[..., i] for i in range(4)] + [topic[..., i] for i in range(4)]
        return np.stack(pg.hash_no_pad(gl, ins, shape=private_key.shape[:-1]), axis=-1)

    @property
    def merkle_root(self) -> np.ndarray:
        return self.tree.cap[0]

    # -------------------------------------------------------------- circuit
    def circuit(self) -> CircuitData:
        if self._circuit is not None:
            return self._circuit
        self._circuit, self._targets = build_semaphore_circuit(
            self.config, self.tree_height, min_degree=self.min_degree
        )
        return self._circuit

    # --------------------------------------------------------------- prove
    def make_signals(self, private_keys: np.ndarray, topics: np.ndarray,
                     indices: np.ndarray, check_witness: bool = True) -> List[Signal]:
        """Prove a batch: private_keys [B,4], topics [B,4], indices [B].

        check_witness=True (default) raises at prove time if the witness
        violates a copy constraint — e.g. a non-member key, whose Merkle
        path can't hash to the root (plonky2's PartitionWitness panics the
        same way); False emits the unsound proof for verifier-side
        negative tests."""
        data = self.circuit()
        t = self._targets
        B = private_keys.shape[0]
        nullifiers = self.nullifier(private_keys, topics)
        sibs = self.tree.prove_batch(indices)  # [B, height, 4]
        inputs: Dict = {}
        for i in range(4):
            inputs[t["merkle_root"][i]] = np.broadcast_to(self.merkle_root[i], (B,))
            inputs[t["nullifier"][i]] = nullifiers[:, i]
            inputs[t["topic"][i]] = topics[:, i]
            inputs[t["private_key"][i]] = private_keys[:, i]
        inputs[t["index"]] = indices.astype(np.uint64)
        for lvl in range(self.tree_height):
            for i in range(4):
                inputs[t["siblings"][lvl][i]] = sibs[:, lvl, i]
        proofs = prove_batch(data, inputs, B, check_witness=check_witness)
        return [
            Signal(topics=topics[b], nullifier=nullifiers[b], proof=proofs[b])
            for b in range(B)
        ]

    # -------------------------------------------------------------- verify
    def expected_public_inputs(self, signal: Signal) -> np.ndarray:
        return np.concatenate([self.merkle_root, signal.nullifier, signal.topics])

    def verify_signals_np(self, signals: List[Signal]) -> List[bool]:
        """Host-side golden verification."""
        from ..core.verifier import verify_proof

        data = self.circuit()
        out = []
        for s in signals:
            if not (s.proof.public_inputs == self.expected_public_inputs(s)).all():
                out.append(False)
                continue
            out.append(bool(verify_proof(gl, data.common, data.vk, s.proof)))
        return out

    def verify_signal(self, signal: Signal) -> bool:
        """The reference's full `verify_signal` composition (reference:
        access_set.rs:28-59): re-derive the expected public inputs, wrap the
        proof into an outer circuit under the BN254 hash config — the
        reference's standard_stark_verifier_config switch
        (wrapper.rs:16-57, plonky2_config.rs:78-104) — prove the wrapper,
        and verify the wrapped (bridge-hashed) proof. Where the reference
        then feeds the wrapped proof to Halo2/KZG/EVM, our terminal step is
        native verification of the bridge-config proof (the Halo2 stage is
        out of scope per BASELINE.json).

        Returns False instead of raising on an invalid signal: the wrapper
        prover surfaces an unsatisfiable child as a WitnessConflict
        (plonky2 PartitionWitness parity; a dedicated exception raised
        explicitly, so the reject path survives `python -O`)."""
        from ..core.verifier import verify_proof
        from ..prover.builder import WitnessConflict
        from .recursion import build_wrapper_circuit

        data = self.circuit()
        if not (
            signal.proof.public_inputs == self.expected_public_inputs(signal)
        ).all():
            return False
        if self._wrapper is None:
            self._wrapper = build_wrapper_circuit(data.common, hasher="bn254")
        try:
            wrapped = self._wrapper.prove([signal.proof], data.vk)[0]
        except WitnessConflict:
            return False
        if not (wrapped.public_inputs == signal.proof.public_inputs).all():
            return False
        w = self._wrapper.data
        assert w.common.config.hasher == "bn254"
        return bool(verify_proof(gl, w.common, w.vk, wrapped))
