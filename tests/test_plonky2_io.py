"""plonky2 proof interchange round-trips: serde-JSON (reference ships serde /
serde_json for exactly this format; reference: Cargo.toml:28-29) and the
compact binary Buffer layout (plonky2 util/serialization —
`ProofWithPublicInputs::{to_bytes, from_bytes}`)."""
import numpy as np
import pytest

from stark_verifier_tpu.core.plonky2_io import (
    proof_from_bytes, proof_from_json, proof_to_bytes, proof_to_json)
from stark_verifier_tpu.core.verifier import verify_proof
from stark_verifier_tpu.models import flagship as FS
from stark_verifier_tpu.ops import gl64_np as gl

pytestmark = pytest.mark.quick


def test_json_roundtrip_and_verify():
    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=4, batch=8, config=FS.small_config(), cache_tag="entry8")
    p = proofs[0]
    s = proof_to_json(p)
    q = proof_from_json(s)
    # bit-exact array equality across the whole structure
    assert (q.wires_cap == p.wires_cap).all()
    assert (q.plonk_zs_partial_products_cap == p.plonk_zs_partial_products_cap).all()
    assert (q.quotient_polys_cap == p.quotient_polys_cap).all()
    for f in ("constants", "plonk_sigmas", "wires", "plonk_zs", "plonk_zs_next",
              "partial_products", "quotient_polys"):
        assert (getattr(q.openings, f) == getattr(p.openings, f)).all(), f
    assert (q.opening_proof.commit_phase_caps == p.opening_proof.commit_phase_caps).all()
    assert (q.opening_proof.final_poly == p.opening_proof.final_poly).all()
    assert q.opening_proof.pow_witness == p.opening_proof.pow_witness
    for o in range(4):
        assert (q.opening_proof.query_rounds.initial_evals[o]
                == p.opening_proof.query_rounds.initial_evals[o]).all()
        assert (q.opening_proof.query_rounds.initial_siblings[o]
                == p.opening_proof.query_rounds.initial_siblings[o]).all()
    for li in range(len(p.opening_proof.query_rounds.step_evals)):
        assert (q.opening_proof.query_rounds.step_evals[li]
                == p.opening_proof.query_rounds.step_evals[li]).all()
        assert (q.opening_proof.query_rounds.step_siblings[li]
                == p.opening_proof.query_rounds.step_siblings[li]).all()
    assert (q.public_inputs == p.public_inputs).all()
    # and the reloaded proof still verifies
    assert verify_proof(gl, common, vk, q)


def _assert_proofs_equal(p, q):
    assert (q.wires_cap == p.wires_cap).all()
    assert (q.plonk_zs_partial_products_cap
            == p.plonk_zs_partial_products_cap).all()
    assert (q.quotient_polys_cap == p.quotient_polys_cap).all()
    for f in ("constants", "plonk_sigmas", "wires", "plonk_zs",
              "plonk_zs_next", "partial_products", "quotient_polys"):
        assert (getattr(q.openings, f) == getattr(p.openings, f)).all(), f
    assert (q.opening_proof.commit_phase_caps
            == p.opening_proof.commit_phase_caps).all()
    assert (q.opening_proof.final_poly == p.opening_proof.final_poly).all()
    assert q.opening_proof.pow_witness == p.opening_proof.pow_witness
    for o in range(4):
        assert (q.opening_proof.query_rounds.initial_evals[o]
                == p.opening_proof.query_rounds.initial_evals[o]).all()
        assert (q.opening_proof.query_rounds.initial_siblings[o]
                == p.opening_proof.query_rounds.initial_siblings[o]).all()
    for li in range(len(p.opening_proof.query_rounds.step_evals)):
        assert (q.opening_proof.query_rounds.step_evals[li]
                == p.opening_proof.query_rounds.step_evals[li]).all()
        assert (q.opening_proof.query_rounds.step_siblings[li]
                == p.opening_proof.query_rounds.step_siblings[li]).all()
    assert (q.public_inputs == p.public_inputs).all()


def test_binary_roundtrip_and_verify():
    """bytes -> Proof -> bytes is the identity, the decoded proof verifies,
    and the layout is byte-deterministic."""
    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=4, batch=8, config=FS.small_config(), cache_tag="entry8")
    for p in proofs[:2]:
        raw = proof_to_bytes(p)
        q = proof_from_bytes(raw, common)
        _assert_proofs_equal(p, q)
        assert proof_to_bytes(q) == raw
        assert verify_proof(gl, common, vk, q)


def test_binary_layout_structure():
    """The byte count matches the closed-form plonky2 layout size — a
    drift in any section (a length prefix added/dropped, salt missed)
    shifts the total."""
    proofs, common, _ = FS.build_semaphore_batch(
        n_members_bits=4, batch=8, config=FS.small_config(), cache_tag="entry8")
    p = proofs[0]
    raw = proof_to_bytes(p)
    cfg = common.config
    cap = (1 << cfg.fri_config.cap_height) * 4 * 8
    n_open = (common.num_constants + cfg.num_routed_wires + cfg.num_wires
              + 2 * cfg.num_challenges
              + cfg.num_challenges * common.num_partial_products
              + cfg.num_challenges * common.quotient_degree_factor)
    arities = common.fri_params.reduction_arity_bits
    leaf_bytes = sum(
        8 * (n + common.salt_size(bl)) for n, bl in common.fri_oracles())
    init_sib_bytes = sum(
        1 + 32 * p.opening_proof.query_rounds.initial_siblings[o].shape[1]
        for o in range(4))
    step_bytes = sum(
        16 * (1 << a) + 1
        + 32 * p.opening_proof.query_rounds.step_siblings[i].shape[1]
        for i, a in enumerate(arities))
    expect = (3 * cap + 16 * n_open + len(arities) * cap
              + cfg.fri_config.num_query_rounds
              * (leaf_bytes + init_sib_bytes + step_bytes)
              + 16 * common.fri_params.final_poly_len + 8
              + 8 * common.num_public_inputs)
    assert len(raw) == expect


def test_binary_rejects_mismatched_common_data():
    """Decoding with the wrong CommonData must fail loudly, not produce a
    silently-misparsed proof."""
    import copy

    proofs, common, _ = FS.build_semaphore_batch(
        n_members_bits=4, batch=8, config=FS.small_config(), cache_tag="entry8")
    raw = proof_to_bytes(proofs[0])
    wrong = copy.deepcopy(common)
    wrong.num_public_inputs += 2
    with pytest.raises(Exception):
        proof_from_bytes(raw, wrong)
    with pytest.raises(Exception):
        proof_from_bytes(raw[:-8], common)


def test_json_field_names_match_plonky2_serde():
    """Spot-check the wire format against plonky2's serde field names."""
    import json

    proofs, _, _ = FS.build_semaphore_batch(
        n_members_bits=4, batch=8, config=FS.small_config(), cache_tag="entry8")
    d = json.loads(proof_to_json(proofs[0]))
    assert set(d) == {"proof", "public_inputs"}
    pr = d["proof"]
    assert set(pr) == {"wires_cap", "plonk_zs_partial_products_cap",
                       "quotient_polys_cap", "openings", "opening_proof"}
    assert set(pr["openings"]) == {"constants", "plonk_sigmas", "wires",
                                   "plonk_zs", "plonk_zs_next",
                                   "partial_products", "quotient_polys"}
    assert set(pr["opening_proof"]) == {"commit_phase_merkle_caps",
                                        "query_round_proofs", "final_poly",
                                        "pow_witness"}
    assert "elements" in pr["wires_cap"][0]
    rnd = pr["opening_proof"]["query_round_proofs"][0]
    assert set(rnd) == {"initial_trees_proof", "steps"}
    assert "evals_proofs" in rnd["initial_trees_proof"]
