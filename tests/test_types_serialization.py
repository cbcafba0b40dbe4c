"""Proof fixture (de)serialization roundtrip — the reference leaves serde
unused (SURVEY §5 checkpoint/resume: none); here it is first-class."""
import numpy as np
import pytest

from stark_verifier_tpu.core.types import load_proofs, save_proofs
from stark_verifier_tpu.core.verifier import verify_proof
from stark_verifier_tpu.ops import gl64_np as gl

pytestmark = pytest.mark.quick


def test_save_load_roundtrip(tmp_path):
    from stark_verifier_tpu.models import flagship as FS

    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=4, batch=2, config=FS.small_config())
    p = tmp_path / "proofs.npz"
    save_proofs(p, proofs, common, vk)
    proofs2, common2, vk2 = load_proofs(p)
    assert common2.to_json() == common.to_json()
    assert (vk2.constants_sigmas_cap == vk.constants_sigmas_cap).all()
    assert (vk2.circuit_digest == vk.circuit_digest).all()
    for a, b in zip(proofs, proofs2):
        assert (a.public_inputs == b.public_inputs).all()
        assert (a.openings.wires == b.openings.wires).all()
        assert verify_proof(gl, common2, vk2, b)
