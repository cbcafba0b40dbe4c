"""The batch-in-lanes verifier (core/verifier_batched.py) vs the golden
scalar verifier on a ZERO-KNOWLEDGE workload: salted oracles widen every
blinded leaf by 4 (reference: types/assigned.rs:57-72 strips the salt on
the verify side), which the on-chip validation of round 2 never exercised.

Runs on the u64 CPU field backend (ops/gl64_cpu) — same verifier code as
the TPU limb backend, XLA:CPU-friendly graph."""
import numpy as np
import pytest

from stark_verifier_tpu.core.types import CircuitConfig, FriConfig
from stark_verifier_tpu.core.verifier import verify_proof
from stark_verifier_tpu.models import flagship as FS
from stark_verifier_tpu.ops import gl64_np as gl


def _zk_small_config():
    return CircuitConfig(
        zero_knowledge=True,
        fri_config=FriConfig(rate_bits=3, cap_height=1,
                             proof_of_work_bits=8, num_query_rounds=4),
    )


def test_batched_matches_golden_on_zk_proofs():
    import jax

    from stark_verifier_tpu.core.verifier_batched import verify_batched
    from stark_verifier_tpu.ops import gl64_cpu as gc

    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=4, batch=8, config=_zk_small_config(),
        cache_tag="zk_small8")
    assert common.fri_params.hiding
    assert common.salt_size(True) == 4
    for p in proofs[:2]:
        assert verify_proof(gl, common, vk, p)

    batched = FS.batched_arrays(proofs)
    # corrupt one lane's wires opening: the batched path must reject
    # exactly that lane
    bad = {k: v.copy() for k, v in batched.items()}
    bad["open_wires"][3, 0, 0] ^= 1

    vk_cap = gc.from_u64(vk.constants_sigmas_cap)
    digest = gc.from_u64(vk.circuit_digest)
    fn = jax.jit(lambda pa: verify_batched(gc, common, vk_cap, digest, pa))
    ok = np.asarray(fn({k: gc.from_u64(v) for k, v in batched.items()}))
    assert ok.all()
    ok_bad = np.asarray(fn({k: gc.from_u64(v) for k, v in bad.items()}))
    expect = np.ones(8, dtype=bool)
    expect[3] = False
    assert (ok_bad == expect).all()


def test_batched_verifies_bn254_config_proofs():
    """The batched fast path honors common.config.hasher: bn254-config
    proofs verify through verify_batched on the u64 backend (round 2
    hardcoded Goldilocks Poseidon and silently rejected them). Gated: the
    bridge graph costs ~15 min of XLA:CPU compile cold (~10 s exec) —
    evidence from the ungated drive is banked in
    .bank/bn254_batched_u64_verify.log (ok: [True x4])."""
    import os

    if not os.environ.get("SVT_SLOW"):
        pytest.skip("~15 min XLA:CPU compile; set SVT_SLOW=1")
    import jax

    from stark_verifier_tpu.core.types import CircuitConfig, FriConfig
    from stark_verifier_tpu.core.verifier_batched import verify_batched
    from stark_verifier_tpu.ops import gl64_cpu as gc
    from stark_verifier_tpu.prover.builder import CircuitBuilder
    from stark_verifier_tpu.prover.prove import prove_batch

    cfg = CircuitConfig(hasher="bn254", fri_config=FriConfig(
        rate_bits=3, cap_height=1, proof_of_work_bits=4, num_query_rounds=2))
    b = CircuitBuilder(cfg)
    b.min_degree = 64
    xs = b.add_virtual_targets(3)
    acc = b.mul(xs[0], xs[1])
    acc = b.arithmetic(2, 9, acc, xs[2], xs[0])
    b.register_public_inputs(xs)
    b.register_public_input(acc)
    data = b.build()
    rng = np.random.default_rng(21)
    inputs = {t: rng.integers(0, gl.P, size=4, dtype=np.uint64) for t in xs}
    proofs = prove_batch(data, inputs, 4)
    batched = FS.batched_arrays(proofs)
    bad = {k: v.copy() for k, v in batched.items()}
    bad["open_wires"][1, 0, 0] ^= 1
    vk_cap = gc.from_u64(data.vk.constants_sigmas_cap)
    digest = gc.from_u64(data.vk.circuit_digest)
    fn = jax.jit(lambda pa: verify_batched(gc, data.common, vk_cap, digest, pa))
    ok = np.asarray(fn({k: gc.from_u64(v) for k, v in batched.items()}))
    assert ok.all()
    ok_bad = np.asarray(fn({k: gc.from_u64(v) for k, v in bad.items()}))
    expect = np.ones(4, dtype=bool)
    expect[1] = False
    assert (ok_bad == expect).all()
