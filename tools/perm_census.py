"""Trace-time census of Poseidon permutation shapes in the batched verifier.

Counts every `poseidon_gl.permute` call and its lane count while TRACING the
full-preset batched verifier (no compile/execute — shape info is platform
independent). Used to attribute the steady-state batch time to the Poseidon
kernel vs everything else.
"""
import os
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("SVT_PALLAS", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from stark_verifier_tpu.models import flagship as FS
from stark_verifier_tpu.ops import gl64_jax as gj
from stark_verifier_tpu.ops import poseidon_gl as pg

census = Counter()
scan_depth = []

_orig = pg.permute


def counted(F, state):
    lanes = 1
    for d in state.shape[1:]:
        lanes *= d
    census[state.shape] += 1
    return _orig(F, state)


pg.permute = counted


def main():
    batch = int(os.environ.get("SVT_BENCH_BATCH", "1024"))
    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=10, batch=32, config=FS.bench_config(),
        min_degree=1 << 12, cache_tag="bench10")
    while len(proofs) < batch:
        proofs = proofs + proofs
    proofs = proofs[:batch]
    from stark_verifier_tpu.core.verifier_batched import verify_batched

    vk_cap = gj.from_u64(vk.constants_sigmas_cap)
    digest = gj.from_u64(vk.circuit_digest)
    batched = FS.batched_arrays(proofs)
    pa_gf = {k: gj.from_u64(v) for k, v in batched.items()}

    jaxpr = jax.make_jaxpr(
        lambda pa: verify_batched(gj, common, vk_cap, digest, pa))(pa_gf)
    total_call_lanes = 0
    print("shape -> calls (trace-level; scan bodies count once per trace)")
    for shape, n in sorted(census.items(), key=lambda kv: -kv[1]):
        lanes = int(np.prod(shape[1:])) if len(shape) > 1 else 1
        total_call_lanes += lanes * n
        print(f"  {shape}: x{n}  ({lanes} lanes/call)")
    print(f"traced permute calls: {sum(census.values())}, "
          f"sum lanes: {total_call_lanes}")
    print(f"jaxpr eqns (top level): {len(jaxpr.jaxpr.eqns)}")
    # scans hide per-iteration counts; report scan shapes separately
    for e in jaxpr.jaxpr.eqns:
        if e.primitive.name == "scan":
            print("scan:", e.params.get("length"),
                  [v.aval.shape for v in e.invars][:3])


if __name__ == "__main__":
    main()
