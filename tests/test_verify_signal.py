"""The reference's full `verify_signal` composition (reference:
plonky2_semaphore/access_set.rs:28-59): a REAL Semaphore membership proof is
wrapped by `build_wrapper_circuit(..., hasher="bn254")` — the
standard_stark_verifier_config hash-config switch (wrapper.rs:16-57,
plonky2_config.rs:78-104) — and the wrapped BRIDGE-hashed proof is verified.
Covers the honest accept, a corrupted-proof reject, and a forged-nullifier
reject. The wrapper prover's bridge hashing runs on the native C plane
(native/svt_bn254.c), keeping this CI-fast."""
from copy import deepcopy

import numpy as np
import pytest

from stark_verifier_tpu.core.types import CircuitConfig, FriConfig
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.semaphore.access_set import AccessSet


@pytest.fixture(scope="module")
def aset_and_signal():
    cfg = CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=1, proof_of_work_bits=4, num_query_rounds=2))
    rng = np.random.default_rng(7)
    sks = rng.integers(0, gl.P, size=(8, 4), dtype=np.uint64)
    aset = AccessSet(AccessSet.public_key(sks), cfg)
    sig = aset.make_signals(
        sks[2:3], rng.integers(0, gl.P, size=(1, 4), dtype=np.uint64),
        np.array([2]))[0]
    return aset, sig


def test_verify_signal_accepts(aset_and_signal):
    aset, sig = aset_and_signal
    assert aset.verify_signal(sig)
    # the wrapper circuit really is the bridge config with cap_height 0
    w = aset._wrapper.data.common
    assert w.config.hasher == "bn254"
    assert w.config.fri_config.cap_height == 0


def test_verify_signal_rejects_corrupt_proof(aset_and_signal):
    aset, sig = aset_and_signal
    bad = deepcopy(sig)
    bad.proof.openings.wires[0, 0] ^= 1
    assert not aset.verify_signal(bad)


def test_verify_signal_rejects_forged_nullifier(aset_and_signal):
    aset, sig = aset_and_signal
    bad = deepcopy(sig)
    bad.nullifier = bad.nullifier.copy()
    bad.nullifier[0] ^= 1
    assert not aset.verify_signal(bad)
