"""Verify a REFERENCE-STRENGTH aggregation proof on the TPU backend.

Builds the aggregation circuit at the reference's aggregation config
(recursion.rs:32-48: zk ON, 135 wires, cap 4, 16 PoW bits, 28 queries),
proves ONE pair of real zk20 signals, and verifies the resulting deg-2^13
recursion proof through the jitted JAX verifier on the chip (honest accept
+ corrupted-opening reject). Run detached:
  setsid nohup python tools/check_agg_tpu.py > .bank/r3_check_agg_tpu.log 2>&1 &
"""
import sys
import time
from copy import deepcopy
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from stark_verifier_tpu.core import verifier as V
from stark_verifier_tpu.core.types import load_proofs
from stark_verifier_tpu.core.verifier import verify_proof
from stark_verifier_tpu.ops import gl64_jax as gj
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.prover.recursion import recursion_config
from stark_verifier_tpu.semaphore.recursion import (
    build_aggregation_circuit,
    prove_aggregation_level,
)


def main():
    print("devices:", jax.devices(), flush=True)
    fixdir = Path(__file__).resolve().parent.parent / "fixtures"
    cands = sorted(fixdir.glob("sem_zk20*.npz"),
                   key=lambda p: p.stat().st_size, reverse=True)
    proofs, common, vk = load_proofs(cands[0])
    cfg = recursion_config(common.config.fri_config, zero_knowledge=True)
    t0 = time.time()
    agg = build_aggregation_circuit(common, cfg)
    p = prove_aggregation_level(agg, proofs[:2], vk)[0]
    print(f"agg pair proved (deg 2^{agg.data.common.degree_bits}) "
          f"in {time.time()-t0:.1f}s", flush=True)
    assert verify_proof(gl, agg.data.common, agg.data.vk, p)
    print("host golden verify: True", flush=True)

    bad = deepcopy(p)
    bad.openings.wires[0, 0] ^= 1

    acommon, avk = agg.data.common, agg.data.vk
    vk_cap = gj.from_u64(avk.constants_sigmas_cap)
    digest = gj.from_u64(avk.circuit_digest)

    fn = jax.jit(lambda pa: V.verify(gj, acommon, vk_cap, digest, pa))

    def run(proof):
        pa = V.arrays_to_backend(gj, V.proof_to_arrays(proof))
        return bool(np.asarray(fn(pa)))

    t0 = time.time()
    ok = run(p)
    print(f"TPU verify (compile {time.time()-t0:.1f}s): {ok}", flush=True)
    ok_bad = run(bad)
    print(f"TPU corrupt verify: {ok_bad}", flush=True)
    assert ok and not ok_bad
    print("CHECK_AGG_TPU: PASS", flush=True)


if __name__ == "__main__":
    main()
