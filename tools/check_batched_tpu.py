"""Validate core/verifier_batched.py against the jit(vmap) path ON THE TPU.

Compiles both paths for the small-config entry8 fixture (minutes on the
chip vs hours on XLA:CPU) and asserts bit-identical accept vectors for an
honest batch and a corrupted lane. Run detached:
  setsid nohup python tools/check_batched_tpu.py > .bank/r2_check_tpu.log 2>&1 &
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from stark_verifier_tpu.core import verifier as V
from stark_verifier_tpu.core import verifier_batched as VB
from stark_verifier_tpu.models import flagship as FS
from stark_verifier_tpu.ops import gl64_jax as gj


def main():
    print("devices:", jax.devices(), flush=True)
    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=4, batch=8, config=FS.small_config(),
        cache_tag="entry8")
    batched = FS.batched_arrays(proofs)
    bad = {k: v.copy() for k, v in batched.items()}
    bad["open_wires"][3, 0] = (bad["open_wires"][3, 0] + 1) % (2**64 - 2**32 + 1)

    vk_cap = gj.from_u64(vk.constants_sigmas_cap)
    digest = gj.from_u64(vk.circuit_digest)

    t0 = time.time()
    fn_vmap = jax.jit(jax.vmap(
        lambda pa: V.verify(gj, common, vk_cap, digest, pa)))
    fn_batched = jax.jit(
        lambda pa: VB.verify_batched(gj, common, vk_cap, digest, pa))

    for name, arrs in (("honest", batched), ("corrupt", bad)):
        pa_gf = {k: gj.from_u64(v) for k, v in arrs.items()}
        t0 = time.time()
        ok_ref = np.asarray(fn_vmap(pa_gf))
        t1 = time.time()
        ok_b = np.asarray(fn_batched(pa_gf))
        t2 = time.time()
        print(f"[{name}] vmap={ok_ref.tolist()} ({t1-t0:.1f}s) "
              f"batched={ok_b.tolist()} ({t2-t1:.1f}s)", flush=True)
        assert (ok_ref == ok_b).all(), f"{name}: paths disagree"
        if name == "honest":
            assert ok_ref.all(), "honest batch rejected"
        else:
            expected = np.ones(8, bool)
            expected[3] = False
            assert (ok_ref == expected).all(), ok_ref

    print("CHECK_BATCHED_TPU: PASS", flush=True)


if __name__ == "__main__":
    main()
