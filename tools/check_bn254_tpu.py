"""Verify a Bn254PoseidonGoldilocksConfig proof with the full JAX verifier
on the TPU (the path gated out of the CPU suite; see
tests/test_bn254_config.py::test_bn254_config_jax_verify)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from stark_verifier_tpu.core import verifier as V
from stark_verifier_tpu.core.types import CircuitConfig, FriConfig
from stark_verifier_tpu.ops import gl64_jax as gj
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.prover.builder import CircuitBuilder
from stark_verifier_tpu.prover.prove import prove_batch


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = CircuitConfig(
        hasher="bn254",
        fri_config=FriConfig(rate_bits=3, cap_height=1, proof_of_work_bits=4,
                             num_query_rounds=2),
    )
    b = CircuitBuilder(cfg)
    b.min_degree = 64
    xs = b.add_virtual_targets(3)
    acc = b.mul(xs[0], xs[1])
    acc = b.arithmetic(2, 9, acc, xs[2], xs[0])
    b.register_public_inputs(xs)
    b.register_public_input(acc)
    data = b.build()
    rng = np.random.default_rng(21)
    inputs = {t: rng.integers(0, gl.P, size=2, dtype=np.uint64) for t in xs}
    proofs = prove_batch(data, inputs, 2)
    print("proved 2 bridge-config proofs", flush=True)

    t0 = time.time()
    pa = V.arrays_to_backend(gj, V.proof_to_arrays(proofs[0]))
    ok = V.verify(gj, data.common, gj.from_u64(data.vk.constants_sigmas_cap),
                  gj.from_u64(data.vk.circuit_digest), pa)
    ok = bool(np.asarray(ok))
    print(f"jax verify (bridge config): {ok} in {time.time()-t0:.1f}s", flush=True)
    assert ok
    # corruption must be rejected on the same path
    pa_bad = V.proof_to_arrays(proofs[0])
    pa_bad["wires_cap"] = pa_bad["wires_cap"].copy()
    pa_bad["wires_cap"][0, 0] ^= 1
    pa_bad = V.arrays_to_backend(gj, pa_bad)
    ok_bad = bool(np.asarray(V.verify(
        gj, data.common, gj.from_u64(data.vk.constants_sigmas_cap),
        gj.from_u64(data.vk.circuit_digest), pa_bad)))
    print(f"corrupted: {ok_bad}", flush=True)
    assert not ok_bad
    print("CHECK_BN254_TPU: PASS", flush=True)


if __name__ == "__main__":
    main()
