"""Numerically validate core/verifier_batched.py against the vmap verifier
WITHOUT the giant XLA compile: runs op-by-op (eager) on CPU.

The round-1 jitted checker (tools/check_batched.py) spent hours inside
XLA:CPU's algebraic simplifier; eager execution dispatches the same ~300k
ops in minutes and compiles only the small scan bodies.
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

from stark_verifier_tpu.core import verifier as V
from stark_verifier_tpu.core import verifier_batched as VB
from stark_verifier_tpu.models import flagship as FS
from stark_verifier_tpu.ops import gl64_jax as gj


def main():
    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=4, batch=8, config=FS.small_config(),
        cache_tag="entry8")
    batched = FS.batched_arrays(proofs)
    bad = {k: v.copy() for k, v in batched.items()}
    bad["open_wires"][3, 0] = (bad["open_wires"][3, 0] + 1) % (2**64 - 2**32 + 1)

    vk_cap = gj.from_u64(vk.constants_sigmas_cap)
    digest = gj.from_u64(vk.circuit_digest)

    for name, arrs in (("honest", batched), ("corrupt", bad)):
        pa_gf = {k: gj.from_u64(v) for k, v in arrs.items()}
        t0 = time.time()
        # vmap path, eager: one proof at a time
        oks = []
        for b in range(8):
            pa_b = {k: gj.gmap(lambda a: a[b], v) for k, v in pa_gf.items()}
            oks.append(np.asarray(V.verify(gj, common, vk_cap, digest, pa_b)))
        ok_ref = np.array(oks)
        t1 = time.time()
        ok_b = np.asarray(VB.verify_batched(gj, common, vk_cap, digest, pa_gf))
        t2 = time.time()
        print(f"[{name}] per-proof={ok_ref.tolist()} ({t1-t0:.1f}s) "
              f"batched={ok_b.tolist()} ({t2-t1:.1f}s)", flush=True)
        assert (ok_ref == ok_b).all(), f"{name}: paths disagree"
        if name == "honest":
            assert ok_ref.all(), "honest batch rejected"
        else:
            expected = np.ones(8, bool)
            expected[3] = False
            assert (ok_ref == expected).all(), ok_ref

    print("check_batched_eager: PASS — verifier_batched matches per-proof "
          "verify", flush=True)


if __name__ == "__main__":
    main()
