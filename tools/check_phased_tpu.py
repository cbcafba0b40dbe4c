"""Validate the 3-phase verifier (flagship.make_verifier_fn_phased) on the
TPU against known-good accept vectors (honest batch all-true; corrupted
lane rejected). Also reports per-phase compile+run time."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from stark_verifier_tpu.models import flagship as FS
from stark_verifier_tpu.ops import gl64_jax as gj


def main():
    print("devices:", jax.devices(), flush=True)
    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=4, batch=8, config=FS.small_config(), cache_tag="entry8")
    batched = FS.batched_arrays(proofs)
    bad = {k: v.copy() for k, v in batched.items()}
    bad["open_wires"][3, 0] = (bad["open_wires"][3, 0] + 1) % (2**64 - 2**32 + 1)

    fn, to_gf = FS.make_verifier_fn_phased(common, vk)
    for name, arrs in (("honest", batched), ("corrupt", bad)):
        pa_gf = to_gf(arrs)
        t0 = time.time()
        ok = np.asarray(fn(pa_gf))
        print(f"[{name}] phased={ok.tolist()} ({time.time()-t0:.1f}s)",
              flush=True)
        if name == "honest":
            assert ok.all(), ok
        else:
            expected = np.ones(8, bool)
            expected[3] = False
            assert (ok == expected).all(), ok
    print("CHECK_PHASED_TPU: PASS", flush=True)


if __name__ == "__main__":
    main()
