"""plonky2 serde-JSON proof interchange round-trip (reference ships serde /
serde_json for exactly this format; reference: Cargo.toml:28-29)."""
import numpy as np
import pytest

from stark_verifier_tpu.core.plonky2_io import proof_from_json, proof_to_json
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
