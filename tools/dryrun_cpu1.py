"""Single-CPU-device timing probe for the multichip-dryrun verifier graph.

Measures trace / compile / execute of jit(vmap(verify)) on the dryrun
config with a selectable field backend (SVT_DRYRUN_BACKEND=cpu|jax).
Round-2 baseline with the 16-bit limb backend (gl64_jax): trace 40 s,
compile 974 s, execution killed at >17 min (.bank/r2_cpu1_verify.log).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    backend = os.environ.get("SVT_DRYRUN_BACKEND", "cpu")
    if backend == "cpu":
        from stark_verifier_tpu.ops import gl64_cpu as F
    else:
        from stark_verifier_tpu.ops import gl64_jax as F

    from stark_verifier_tpu.core import verifier as V
    from stark_verifier_tpu.models import flagship as FS

    batch = int(os.environ.get("SVT_DRYRUN_BATCH", "16"))
    proofs, common, vk = FS.build_dryrun_batch(batch=batch)
    batched = FS.batched_arrays(proofs)
    pa_gf = {k: F.from_u64(v) for k, v in batched.items()}
    vk_cap = F.from_u64(vk.constants_sigmas_cap)
    digest = F.from_u64(vk.circuit_digest)

    def verify_one(pa):
        return V.verify(F, common, vk_cap, digest, pa)

    fn = jax.jit(jax.vmap(verify_one))
    t0 = time.time()
    lowered = fn.lower(pa_gf)
    t1 = time.time()
    print(f"backend={backend} traced {t1 - t0:.1f}s", flush=True)
    compiled = lowered.compile()
    t2 = time.time()
    print(f"compiled {t2 - t1:.1f}s", flush=True)
    ok = np.asarray(compiled(pa_gf))
    t3 = time.time()
    print(f"executed {t3 - t2:.1f}s ok={ok.all()} shape={ok.shape}", flush=True)
    ok2 = np.asarray(compiled(pa_gf))
    t4 = time.time()
    print(f"executed(warm) {t4 - t3:.2f}s ok={ok2.all()}", flush=True)


if __name__ == "__main__":
    main()
