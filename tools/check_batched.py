"""Numerically validate core/verifier_batched.py against the vmap verifier.

Runs on CPU (forced) with the tiny entry fixture: both paths must accept
the honest batch, and both must reject the same corrupted proof.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np

from stark_verifier_tpu.core import verifier_batched as VB
from stark_verifier_tpu.models import flagship as FS
from stark_verifier_tpu.ops import gl64_jax as gj


def main():
    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=4, batch=8, config=FS.small_config(),
        cache_tag="entry8")
    batched = FS.batched_arrays(proofs)
    # Corrupt one lane so both paths must reject exactly that lane.
    bad = {k: v.copy() for k, v in batched.items()}
    bad["open_wires"][3, 0] = (bad["open_wires"][3, 0] + 1) % (2**64 - 2**32 + 1)

    fn, to_gf = FS.make_verifier_fn(common, vk)
    vk_cap = gj.from_u64(vk.constants_sigmas_cap)
    digest = gj.from_u64(vk.circuit_digest)

    fnb = jax.jit(lambda pa: VB.verify_batched(gj, common, vk_cap, digest, pa))

    for name, arrs in (("honest", batched), ("corrupt", bad)):
        pa_gf = to_gf(arrs)
        t0 = time.time()
        ok_vmap = np.asarray(fn(pa_gf))
        t1 = time.time()
        ok_b = np.asarray(fnb(pa_gf))
        t2 = time.time()
        print(f"[{name}] vmap={ok_vmap.tolist()} ({t1-t0:.1f}s) "
              f"batched={ok_b.tolist()} ({t2-t1:.1f}s)", flush=True)
        assert (ok_vmap == ok_b).all(), f"{name}: paths disagree"
        if name == "honest":
            assert ok_vmap.all(), "honest batch rejected"
        else:
            expected = np.ones(8, bool)
            expected[3] = False
            assert (ok_vmap == expected).all(), ok_vmap

    print("check_batched: PASS — verifier_batched matches the vmap path",
          flush=True)


if __name__ == "__main__":
    main()
