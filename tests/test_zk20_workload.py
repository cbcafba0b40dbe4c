"""The headline workload end-to-end in CI: REAL reference-preset
zero-knowledge Semaphore proofs (2^20-member access set, blowup 8, 28
queries, 16 PoW bits; reference: plonky2_semaphore/access_set.rs:68-84)
verified through the jitted batch path on the u64 CPU backend — the same
verifier code the TPU bench runs, minus the limb representation."""
from pathlib import Path

import numpy as np
import pytest

FIXDIR = Path(__file__).resolve().parent.parent / "fixtures"


def _zk20_fixture():
    cands = sorted(FIXDIR.glob("sem_zk20*.npz"),
                   key=lambda p: p.stat().st_size, reverse=True)
    if not cands:
        pytest.skip("no zk20 fixture (tools/gen_zk20_fixture.py)")
    return cands[0]


def test_zk20_fixture_verifies_jitted():
    import jax

    from stark_verifier_tpu.core import verifier as V
    from stark_verifier_tpu.core.types import load_proofs
    from stark_verifier_tpu.models import flagship as FS
    from stark_verifier_tpu.ops import gl64_cpu as gc

    proofs, common, vk = load_proofs(_zk20_fixture())
    assert common.fri_params.hiding
    assert common.config.fri_config.num_query_rounds == 28
    proofs = proofs[:4]
    batched = FS.batched_arrays(proofs)
    # corrupt lane 2's FRI pow witness: the transcript replay must diverge
    bad = {k: v.copy() for k, v in batched.items()}
    bad["pow_witness"][2] ^= 1

    vk_cap = gc.from_u64(vk.constants_sigmas_cap)
    digest = gc.from_u64(vk.circuit_digest)
    fn = jax.jit(jax.vmap(
        lambda p: V.verify(gc, common, vk_cap, digest, p)))
    ok = np.asarray(fn({k: gc.from_u64(v) for k, v in batched.items()}))
    assert ok.all()
    ok_bad = np.asarray(fn({k: gc.from_u64(v) for k, v in bad.items()}))
    assert (ok_bad == np.array([True, True, False, True])).all()
