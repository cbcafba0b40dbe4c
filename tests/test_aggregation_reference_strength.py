"""One aggregation pair at the REFERENCE's aggregation strength
(reference: plonky2_semaphore/recursion.rs:32-48 — zero-knowledge ON,
135 wires / 80 routed, cap 4, 16 PoW bits, 28 query rounds), over two of
the real zk20 Semaphore signals (fixtures/sem_zk20.npz: 2^20-member set,
hiding, blowup 8). The full 2^4..2^7 timing table is produced by
tools/bench_aggregation.py (BENCH_SUMMARY.md).

~2-4 min: deg-2^13 recursion circuit built + proved + natively verified.
"""
import numpy as np

from stark_verifier_tpu.core.types import load_proofs
from stark_verifier_tpu.core.verifier import verify_proof
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.prover.recursion import recursion_config
from stark_verifier_tpu.semaphore.recursion import (
    build_aggregation_circuit,
    prove_aggregation_level,
)


def _zk20_fixture():
    from pathlib import Path

    fixdir = Path(__file__).resolve().parent.parent / "fixtures"
    cands = sorted(fixdir.glob("sem_zk20*.npz"),
                   key=lambda p: p.stat().st_size, reverse=True)
    assert cands, "no zk20 fixture (tools/gen_zk20_fixture.py)"
    return load_proofs(cands[0])


def test_aggregate_pair_at_reference_strength():
    proofs, common, vk = _zk20_fixture()
    assert common.config.fri_config.num_query_rounds == 28
    assert common.fri_params.hiding

    cfg = recursion_config(common.config.fri_config, zero_knowledge=True)
    agg = build_aggregation_circuit(common, cfg)
    acfg = agg.data.common.config
    assert acfg.fri_config.num_query_rounds == 28
    assert acfg.fri_config.proof_of_work_bits == 16
    assert acfg.fri_config.cap_height == 4
    assert acfg.zero_knowledge and agg.data.common.fri_params.hiding
    assert acfg.num_wires == 135 and acfg.num_routed_wires == 80

    out = prove_aggregation_level(agg, proofs[:2], vk)
    assert len(out) == 1
    p = out[0]
    # root(4) shared, then each child's nullifier(4)+topics(4)
    npi = common.num_public_inputs
    assert p.public_inputs.shape == (4 + 2 * (npi - 4),)
    assert (p.public_inputs[:4] == proofs[0].public_inputs[:4]).all()
    assert (p.public_inputs[4:12] == proofs[0].public_inputs[4:]).all()
    assert (p.public_inputs[12:] == proofs[1].public_inputs[4:]).all()
    assert verify_proof(gl, agg.data.common, agg.data.vk, p)
