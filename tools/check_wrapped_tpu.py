"""Drive the verify_signal composition's JAX path ON THE CHIP: wrap a real
Semaphore proof under the BN254 hash config (access_set.rs:28-59 shape) and
verify the wrapped bridge-hashed proof with the jitted JAX verifier on the
TPU (honest accept + corrupted-opening reject). Run detached:
  setsid nohup python tools/check_wrapped_tpu.py > .bank/r3_check_wrapped_tpu.log 2>&1 &
"""
import sys
import time
from copy import deepcopy
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from stark_verifier_tpu.core import verifier as V
from stark_verifier_tpu.core.types import CircuitConfig, FriConfig
from stark_verifier_tpu.core.verifier import verify_proof
from stark_verifier_tpu.ops import gl64_jax as gj
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.semaphore.access_set import AccessSet


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=1, proof_of_work_bits=4, num_query_rounds=2))
    rng = np.random.default_rng(7)
    sks = rng.integers(0, gl.P, size=(8, 4), dtype=np.uint64)
    aset = AccessSet(AccessSet.public_key(sks), cfg)
    sig = aset.make_signals(
        sks[2:3], rng.integers(0, gl.P, size=(1, 4), dtype=np.uint64),
        np.array([2]))[0]

    from stark_verifier_tpu.semaphore.recursion import build_wrapper_circuit

    t0 = time.time()
    wrap = build_wrapper_circuit(aset.circuit().common, hasher="bn254")
    wrapped = wrap.prove([sig.proof], aset.circuit().vk)[0]
    print(f"wrapped under bn254 (deg 2^{wrap.data.common.degree_bits}) "
          f"in {time.time()-t0:.1f}s", flush=True)
    wcommon, wvk = wrap.data.common, wrap.data.vk
    assert wcommon.config.hasher == "bn254"
    assert verify_proof(gl, wcommon, wvk, wrapped)
    print("host golden verify (bn254 wrapped): True", flush=True)

    bad = deepcopy(wrapped)
    bad.openings.wires[0, 0] ^= 1

    vk_cap = gj.from_u64(wvk.constants_sigmas_cap)
    digest = gj.from_u64(wvk.circuit_digest)
    fn = jax.jit(lambda pa: V.verify(gj, wcommon, vk_cap, digest, pa))

    def run(proof):
        pa = V.arrays_to_backend(gj, V.proof_to_arrays(proof))
        return bool(np.asarray(fn(pa)))

    t0 = time.time()
    ok = run(wrapped)
    print(f"TPU verify wrapped (compile {time.time()-t0:.1f}s): {ok}",
          flush=True)
    ok_bad = run(bad)
    print(f"TPU corrupt verify: {ok_bad}", flush=True)
    assert ok and not ok_bad
    print("CHECK_WRAPPED_TPU: PASS", flush=True)


if __name__ == "__main__":
    main()
