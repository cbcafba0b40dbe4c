"""Aggregate-attestation artifact: serialize, third-party recheck, tamper
rejection (the exportable terminal artifact standing in for the reference's
on-chain finalization; reference: verifier_api.rs:57-96)."""
import json

import numpy as np

from stark_verifier_tpu.models import flagship as FS
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.semaphore.access_set import AccessSet, Signal
from stark_verifier_tpu.semaphore.attestation import (
    make_attestation,
    recheck_attestation,
)


def _setup():
    # reuse the cached entry8 fixture proofs as signals for speed; the
    # fixture's access set was built by build_semaphore_batch with seed 0
    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=4, batch=8, config=FS.small_config(), cache_tag="entry8")
    signals = [
        Signal(topics=p.public_inputs[8:12], nullifier=p.public_inputs[4:8],
               proof=p)
        for p in proofs
    ]
    rng0 = np.random.default_rng(0)
    sks0 = rng0.integers(0, gl.P, size=(1 << 4, 4), dtype=np.uint64)
    aset0 = AccessSet(AccessSet.public_key(sks0), FS.small_config())
    assert (aset0.merkle_root == proofs[0].public_inputs[:4]).all()
    return aset0, signals


def test_attestation_roundtrip_and_tamper():
    aset, signals = _setup()
    att = make_attestation(aset, signals)
    obj = json.loads(att)
    assert obj["count"] == len(signals)
    assert all(s["accept"] for s in obj["signals"])
    assert recheck_attestation(att, aset, signals)

    # tampering with any field breaks the recheck
    bad = dict(obj)
    bad["count"] = obj["count"] - 1
    assert not recheck_attestation(json.dumps(bad), aset, signals)
    bad = json.loads(att)
    bad["aggregation_digest"][0] ^= 1
    assert not recheck_attestation(json.dumps(bad), aset, signals)
    bad = json.loads(att)
    bad["signals"][2]["nullifier"][0] ^= 1
    assert not recheck_attestation(json.dumps(bad), aset, signals)


def test_attestation_records_invalid_lane():
    from copy import deepcopy

    aset, signals = _setup()
    signals = [deepcopy(s) for s in signals[:4]]
    signals[1].proof.openings.wires[0, 0] ^= 1
    att = make_attestation(aset, signals)
    obj = json.loads(att)
    assert [s["accept"] for s in obj["signals"]] == [True, False, True, True]
    assert obj["count"] == 3
    assert recheck_attestation(att, aset, signals)
