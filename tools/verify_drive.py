"""End-to-end drive of the public API on the real TPU chip: prove a fresh
batch of Semaphore signals on host, verify them on device, then corrupt one
proof and observe rejection. Used by /verify sessions (fresh fixtures, no
caches) — the observable output is the accept bitmaps printed at the end.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax

from stark_verifier_tpu.models import flagship as FS
from stark_verifier_tpu.ops import gl64_np as gl

t0 = time.time()
print(f"devices: {jax.devices()}", flush=True)

# fresh build: no fixture cache tag -> runs the host prover (numpy backend,
# Karatsuba ext-mul in the quotient/ gate evaluation path)
proofs, common, vk = FS.build_semaphore_batch(
    n_members_bits=4, batch=8, config=FS.small_config(), cache_tag=None)
print(f"proved 8 signals in {time.time()-t0:.1f}s "
      f"(deg 2^{common.degree_bits})", flush=True)

# host golden verify (numpy Karatsuba path)
from stark_verifier_tpu.core.verifier import verify_proof
ok_host = [bool(verify_proof(gl, common, vk, p)) for p in proofs[:2]]
print(f"host golden verify: {ok_host}", flush=True)

# device verify (JAX/TPU Karatsuba path), fresh compile
fn, to_gf = FS.make_verifier_fn(common, vk)
batched = FS.batched_arrays(proofs)
pa_gf = to_gf(batched)
t1 = time.time()
ok_dev = np.asarray(fn(pa_gf))
print(f"device verify (compile {time.time()-t1:.1f}s): {ok_dev.tolist()}",
      flush=True)

# corrupt one opening -> that lane must be rejected
bad = {k: v.copy() for k, v in batched.items()}
bad["open_wires"][5, 3] = (bad["open_wires"][5, 3] + 1) % gl.P
ok_bad = np.asarray(fn(to_gf(bad)))
print(f"corrupted lane 5 verify: {ok_bad.tolist()}", flush=True)

assert all(ok_host) and ok_dev.all()
expected = np.ones(8, bool); expected[5] = False
assert (ok_bad == expected).all()
print("VERIFY_DRIVE: PASS", flush=True)
