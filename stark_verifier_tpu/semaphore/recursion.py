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
                            inner_vk: VerifierOnlyData,
                            max_pairs: int = None) -> List[Proof]:
    """One tree level: proofs[2k], proofs[2k+1] -> aggregated proof k, all
    pairs proved as one batch.

    max_pairs chunks a wide level into sequential prove_batch calls of at
    most that many pairs (SVT_AGG_CHUNK overrides; 0 = monolithic). At
    deg 2^14 each pair's witness+LDE working set is ~350 MB of streamed
    planes; chunking keeps the level's peak footprint flat as N grows."""
    assert len(proofs) % 2 == 0 and proofs
    import os

    if max_pairs is None:
        max_pairs = int(os.environ.get("SVT_AGG_CHUNK", "0"))
    procs = int(os.environ.get("SVT_AGG_PROCS", "1"))
    left, right = proofs[0::2], proofs[1::2]
    B = len(left)
    procs = min(procs, B)  # small tail levels still fork one pair/worker
    if procs > 1:
        # Fork-parallel pair chunks: the prover's witness-generation and
        # polynomial bookkeeping are single-threaded Python/numpy (the
        # C/AVX-512 planes already use all cores, but they are only part of
        # the time); P forked workers each prove B/P pairs with
        # OMP_NUM_THREADS divided accordingly — the process-level analogue
        # of the reference's rayon fan-out (recursion.rs:214-227).
        return _prove_level_forked(agg, left, right, inner_vk, procs)
    if max_pairs and B > max_pairs:
        out: List[Proof] = []
        for s in range(0, B, max_pairs):
            out.extend(prove_aggregation_level(
                agg, [p for lr in zip(left[s:s + max_pairs],
                                      right[s:s + max_pairs]) for p in lr],
                inner_vk, max_pairs=0))
        return out
    inputs: Dict = {}
    inputs.update(fill_proof_targets(agg.pt0, left))
    inputs.update(fill_proof_targets(agg.pt1, right))
    inputs.update(fill_verifier_targets(agg.vt, inner_vk, B))
    return prove_batch(agg.data, inputs, B)


def _prove_level_forked(agg, left, right, inner_vk, procs):
    """Prove a level's pairs across forked worker processes.

    os.fork (not multiprocessing spawn) so workers inherit the built
    circuit (LDE tables, trees — ~100s of MB) copy-on-write for free
    (spawn could not: CircuitData carries generator closures). Each worker
    re-enters the plain single-process path on its chunk and streams the
    resulting proofs back through a pipe.

    libgomp is NOT fork-safe for multi-thread teams (a child entering a
    parallel region deadlocks on the parent's dead thread pool — measured
    on this box), but a team of ONE executes inline and is safe (also
    measured). So every worker pins omp_set_num_threads(1): the C planes
    run serial per worker, and the process fan-out supplies the
    parallelism for C and Python phases alike."""
    import ctypes
    import gc
    import os
    import pickle
    import struct

    B = len(left)
    bounds = [(i * B) // procs for i in range(procs + 1)]
    chunks = [(bounds[i], bounds[i + 1]) for i in range(procs)]

    # Freeze the parent heap across the forks: without this, the children's
    # refcount writes and cyclic-GC passes touch every inherited object
    # header, faulting copy-on-write copies of much of the parent heap
    # (the parent holds per-level circuits with ~10k generator closures
    # each); freeze + per-child gc.disable keeps the shared pages shared.
    gc.collect()
    gc.freeze()
    pipes = []
    pids = []
    for (s, e) in chunks:
        r_fd, w_fd = os.pipe()
        pid = os.fork()
        if pid == 0:
            # child: prove [s, e) and stream the pickled proofs back
            os.close(r_fd)
            status = 1
            try:
                gc.disable()
                try:
                    ctypes.CDLL("libgomp.so.1").omp_set_num_threads(1)
                except OSError:
                    os.environ["SVT_NATIVE"] = "0"  # no libgomp: skip C
                os.environ["SVT_AGG_PROCS"] = "1"
                sub = [p for lr in zip(left[s:e], right[s:e]) for p in lr]
                # max_pairs=None: SVT_AGG_CHUNK still applies inside the
                # worker (procs is pinned to 1 above, so no re-fork)
                out = prove_aggregation_level(agg, sub, inner_vk)
                payload = pickle.dumps(out, protocol=pickle.HIGHEST_PROTOCOL)
                with os.fdopen(w_fd, "wb") as w:
                    w.write(struct.pack("<Q", len(payload)))
                    w.write(payload)
                status = 0
            finally:
                # do NOT run parent atexit/cleanup handlers in the child
                os._exit(status)
        os.close(w_fd)
        pipes.append(r_fd)
        pids.append(pid)
    gc.unfreeze()

    out: List[Proof] = []
    failed = False
    for r_fd, pid in zip(pipes, pids):
        with os.fdopen(r_fd, "rb") as r:
            hdr = r.read(8)
            if len(hdr) != 8:
                failed = True
                continue
            (ln,) = struct.unpack("<Q", hdr)
            buf = r.read(ln)
            if len(buf) != ln:
                failed = True
                continue
            out.extend(pickle.loads(buf))
    for pid in pids:
        _, st = os.waitpid(pid, 0)
        failed = failed or (os.waitstatus_to_exitcode(st) != 0)
    if failed:
        raise RuntimeError(
            "forked aggregation worker failed (set SVT_AGG_PROCS=1 to "
            "run in-process and see the traceback)")
    return out


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
