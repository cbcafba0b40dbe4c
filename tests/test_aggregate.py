"""Aggregation digest over a verified signal batch."""
import numpy as np
import pytest

from stark_verifier_tpu.core.types import CircuitConfig, FriConfig
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.semaphore.access_set import AccessSet
from stark_verifier_tpu.semaphore.aggregate import aggregate_signals_np

pytestmark = pytest.mark.quick


def test_aggregate_digest():
    rng = np.random.default_rng(2)
    n = 1 << 5
    sks = rng.integers(0, gl.P, size=(n, 4), dtype=np.uint64)
    aset = AccessSet(
        AccessSet.public_key(sks),
        CircuitConfig(fri_config=FriConfig(rate_bits=3, cap_height=1,
                                           proof_of_work_bits=6,
                                           num_query_rounds=6)),
    )
    idx = np.array([1, 7])
    topics = rng.integers(0, gl.P, size=(2, 4), dtype=np.uint64)
    signals = aset.make_signals(sks[idx], topics, idx)
    out = aggregate_signals_np(aset, signals)
    assert out["accept"] == [True, True]
    assert out["count"] == 2
    d1 = out["digest"]
    # digest binds the accept bits: corrupting a proof changes it
    signals[0].proof.openings.wires[0, 0] ^= np.uint64(1)
    out2 = aggregate_signals_np(aset, signals)
    assert out2["count"] == 1
    assert not (out2["digest"] == d1).all()
