"""Semaphore application end-to-end: make_signals (prove) -> verify_signals
(reference: plonky2_semaphore/signal.rs tests, scaled down for CI)."""
import numpy as np
import pytest

from stark_verifier_tpu.core.types import CircuitConfig, FriConfig
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.semaphore.access_set import AccessSet


@pytest.fixture(scope="module")
def access_set():
    rng = np.random.default_rng(11)
    n = 1 << 6
    sks = rng.integers(0, gl.P, size=(n, 4), dtype=np.uint64)
    pks = AccessSet.public_key(sks)
    cfg = CircuitConfig(
        fri_config=FriConfig(rate_bits=3, cap_height=2, proof_of_work_bits=8,
                             num_query_rounds=10)
    )
    aset = AccessSet(pks, cfg)
    aset._sks = sks
    return aset


def test_make_and_verify_signals(access_set):
    rng = np.random.default_rng(5)
    B = 3
    idx = np.array([3, 17, 40])
    topics = rng.integers(0, gl.P, size=(B, 4), dtype=np.uint64)
    signals = access_set.make_signals(access_set._sks[idx], topics, idx)
    assert len(signals) == B
    oks = access_set.verify_signals_np(signals)
    assert oks == [True] * B

    # nullifier must be H(sk ‖ topic)
    expect = AccessSet.nullifier(access_set._sks[idx], topics)
    for b in range(B):
        assert (signals[b].nullifier == expect[b]).all()


def test_wrong_nullifier_rejected(access_set):
    rng = np.random.default_rng(7)
    idx = np.array([12])
    topics = rng.integers(0, gl.P, size=(1, 4), dtype=np.uint64)
    [sig] = access_set.make_signals(access_set._sks[idx], topics, idx)
    # tamper with the claimed nullifier (public input)
    sig.nullifier = sig.nullifier.copy()
    sig.nullifier[0] ^= np.uint64(1)
    sig.proof.public_inputs = sig.proof.public_inputs.copy()
    sig.proof.public_inputs[4] ^= np.uint64(1)
    assert access_set.verify_signals_np([sig]) == [False]


def test_non_member_cannot_sign(access_set):
    """A key outside the set breaks the merkle copy constraints. Default
    proving raises at witness time (plonky2 PartitionWitness parity:
    conflicting values in one copy partition); with check_witness=False
    the prover emits the unsound proof and the VERIFIER must reject it."""
    rng = np.random.default_rng(9)
    bad_sk = rng.integers(0, gl.P, size=(1, 4), dtype=np.uint64)
    topics = rng.integers(0, gl.P, size=(1, 4), dtype=np.uint64)
    with pytest.raises(AssertionError):
        access_set.make_signals(bad_sk, topics, np.array([5]))
    signals = access_set.make_signals(bad_sk, topics, np.array([5]),
                                      check_witness=False)
    assert access_set.verify_signals_np(signals) == [False]


def test_zero_knowledge_signals_verify():
    """zk mode: salted oracles + blinding rows; proofs still verify and the
    salt columns are present/stripped (reference semantics:
    fri_params.hiding + SALT_SIZE=4)."""
    rng = np.random.default_rng(31)
    n = 1 << 5
    sks = rng.integers(0, gl.P, size=(n, 4), dtype=np.uint64)
    cfg = CircuitConfig(
        zero_knowledge=True,
        fri_config=FriConfig(rate_bits=3, cap_height=1, proof_of_work_bits=6,
                             num_query_rounds=6),
    )
    aset = AccessSet(AccessSet.public_key(sks), cfg)
    idx = np.array([4, 9])
    topics = rng.integers(0, gl.P, size=(2, 4), dtype=np.uint64)
    signals = aset.make_signals(sks[idx], topics, idx)
    data = aset.circuit()
    assert data.common.fri_params.hiding
    # wires oracle leaf includes 4 salt columns
    leaf_w = signals[0].proof.opening_proof.query_rounds.initial_evals[1].shape[1]
    assert leaf_w == cfg.num_wires + 4
    assert aset.verify_signals_np(signals) == [True, True]
    # two proofs of the same statement differ (randomized)
    sig_a = aset.make_signals(sks[idx[:1]], topics[:1], idx[:1])[0]
    sig_b = aset.make_signals(sks[idx[:1]], topics[:1], idx[:1])[0]
    assert not (sig_a.proof.wires_cap == sig_b.proof.wires_cap).all()
