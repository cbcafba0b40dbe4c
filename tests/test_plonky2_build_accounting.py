"""plonky2-exact circuit-build accounting KATs.

Pins what plonky2's `CircuitBuilder::build` would produce for the reference
Semaphore circuit (reference: plonky2_semaphore/circuit.rs:25-65 built under
access_set.rs:68-84): the blind-and-pad degree accounting
(circuit_builder.rs `num_blinding_gates`/`blind`), FRI reduction schedule
(FriReductionStrategy::ConstantArityBits incl. the cap_height stop
condition), selector grouping, k_is coset shifts, and the circuit digest.

These values are this repo's own plonky2-semantics computation, pinned so a
regression in any part of the build accounting (gate census, blinding
counts, padding, selector assignment, sigma construction, digest schedule)
is caught field-by-field. The blinding-count formula itself is additionally
asserted against hand-computed values at several heights.
"""
import numpy as np
import pytest

from stark_verifier_tpu.core.types import CircuitConfig, FriConfig, constant_arity_bits
from stark_verifier_tpu.prover.builder import CircuitBuilder
from stark_verifier_tpu.semaphore.access_set import build_semaphore_circuit, semaphore_config

pytestmark = pytest.mark.quick


def _blinding_counts(pre_blind_rows: int, fc: FriConfig):
    b = CircuitBuilder(CircuitConfig(zero_knowledge=True, fri_config=fc))
    b.gate_rows = [None] * pre_blind_rows  # only the count matters
    return b.num_blinding_gates()


def test_num_blinding_gates_formula():
    # Semaphore preset: 28 queries, rate 3, cap 4, ConstantArityBits(1, 5).
    fc = FriConfig(rate_bits=3, cap_height=4, proof_of_work_bits=16,
                   num_query_rounds=28)
    # 27 pre-blind rows -> degree_bits = 5 -> no reductions, final poly 2^5:
    # fri_openings = 28*(1 + 2*0) + 2*32 = 92 -> (92+2, 92+4).
    assert _blinding_counts(27, fc) == (94, 96)
    # degree_bits = 13 (aggregation levels): 8 arity-1 folds, final 2^5:
    # fri_openings = 28*(1 + 2*8) + 2*32 = 540 -> (542, 544).
    assert _blinding_counts(1 << 13, fc) == (542, 544)
    # degree_bits = 9: 4 folds -> 28*9 + 64 = 316 -> (318, 320).
    assert _blinding_counts(400, fc) == (318, 320)


def test_constant_arity_bits_cap_height_stop():
    # Folding stops when the next layer's Merkle tree would be shorter than
    # cap_height: degree 8, rate 0, cap 6 -> fold 8->7->6, then 6+0-1 < 6.
    assert constant_arity_bits(1, 0, 8, 0, cap_height=6) == [1, 1]
    # The reference presets never trigger the cap condition:
    assert constant_arity_bits(1, 5, 9, 3, cap_height=4) == [1, 1, 1, 1]
    assert constant_arity_bits(1, 5, 5, 3, cap_height=4) == []


def test_semaphore_circuit_build_kats():
    """Field-by-field pin of the built Semaphore circuit (2^20-member set)."""
    data, _ = build_semaphore_circuit(semaphore_config(), tree_height=20)
    c = data.common
    b = data.builder

    # Gate census before blinding: 24 PoseidonGate (1 leaf hash + 20 Merkle
    # levels + 1 nullifier hash + 2 public-input-hash permutations),
    # 1 BaseSumGate(20), 1 ConstantGate, 1 PublicInputGate = 27 rows.
    n_blind = len(b.blind_rows) + 2 * len(b.blind_pairs)
    non_noop = sum(1 for g, _ in b.gate_rows if g.id != "NoopGate")
    assert non_noop == 27  # all blinding and padding rows are NoopGate
    assert (len(b.blind_rows), len(b.blind_pairs)) == (94, 96)
    assert n_blind == 94 + 2 * 96 == 286

    # blind_and_pad lands on 2^9 (27 + 286 = 313 -> padded to 512).
    assert c.degree_bits == 9
    assert len(b.gate_rows) == 512

    # FRI schedule at the final height: fold 9 -> 5, final poly 2^5.
    assert c.fri_params.reduction_arity_bits == [1, 1, 1, 1]
    assert c.fri_params.final_poly_len == 32
    assert c.fri_params.hiding is True

    # Gate set (sorted by (degree, id)) and selector grouping: NoopGate(0),
    # ConstantGate(1), PublicInputGate(1), BaseSumGate(2) fit one group
    # (4 gates + max degree 2 <= 8); PoseidonGate(7) needs its own.
    assert c.gate_ids == [
        "NoopGate",
        "ConstantGate { num_consts: 2 }",
        "PublicInputGate",
        "BaseSumGate { num_limbs: 20 } + Base: 2",
        "PoseidonGate(PhantomData<plonky2_field::goldilocks_field::GoldilocksField>)<WIDTH=12>",
    ]
    assert c.selectors_info.groups == [(0, 4), (4, 5)]
    assert c.selectors_info.selector_indices == [0, 0, 0, 0, 1]

    # 80 routed wires / qdf 8 -> 10 chunks -> 9 partial products per
    # challenge; constants polys = 2 selectors + 2 gate constants.
    assert c.num_partial_products == 9
    assert c.num_constants == 4
    assert c.num_public_inputs == 12

    # k_is: plonky2 get_unique_coset_shifts = powers of the multiplicative
    # group generator g = 7.
    P = 0xFFFFFFFF00000001
    assert [int(k) for k in c.k_is] == [pow(7, i, P) for i in range(80)]

    # Circuit digest: H(constants_sigmas_cap.flatten() ++ [degree_bits]).
    # Deterministic given the accounting above; pinned as the repo's
    # plonky2-semantics KAT.
    assert [hex(int(x)) for x in data.vk.circuit_digest] == [
        "0x4a54faab434f8804",
        "0xccbe287519c380d1",
        "0xbf48181359bb6de0",
        "0xb4b0543c9bc29c42",
    ]
    assert data.vk.constants_sigmas_cap.shape == (16, 4)
