"""Validate the jitted JAX verifier (incl. fold-layer scan) vs numpy on CPU,
banking the compilation cache along the way."""
import os, sys, time
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from stark_verifier_tpu.core.types import CircuitConfig, FriConfig
from stark_verifier_tpu.prover.builder import CircuitBuilder
from stark_verifier_tpu.prover.prove import prove_batch
from stark_verifier_tpu.core import verifier as V
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.ops import gl64_jax as gj

cfg = CircuitConfig(fri_config=FriConfig(rate_bits=3, cap_height=2,
                                         proof_of_work_bits=8, num_query_rounds=6))
b = CircuitBuilder(cfg)
sk = b.add_virtual_targets(8)
state = sk
for _ in range(10):
    state = b.hash_n_to_hash_no_pad(state) + state[:4]
b.register_public_inputs(state[:4])
b.min_degree = 256  # 3 fold layers -> exercises _fold_layers_scan
data = b.build()
print("layers", data.common.fri_params.reduction_arity_bits, flush=True)
rng = np.random.default_rng(3)
inputs = {t: rng.integers(0, gl.P, size=2, dtype=np.uint64) for t in sk}
proofs = prove_batch(data, inputs, 2)
assert V.verify_proof(gl, data.common, data.vk, proofs[0])
print("numpy ok", flush=True)

vk_cap = gj.from_u64(data.vk.constants_sigmas_cap)
digest = gj.from_u64(data.vk.circuit_digest)
fn = jax.jit(lambda pa: V.verify(gj, data.common, vk_cap, digest, pa))
pa = {k: gj.from_u64(v) for k, v in V.proof_to_arrays(proofs[0]).items()}
t0 = time.time()
ok = bool(np.asarray(fn(pa)))
print(f"jax jit verify: {ok} (compile+run {time.time()-t0:.0f}s)", flush=True)
assert ok
# corrupt: must reject through the scan path
import copy
p2 = copy.deepcopy(proofs[0])
p2.opening_proof.query_rounds.step_evals[1][2, 0, 1] ^= np.uint64(1)
pa2 = {k: gj.from_u64(v) for k, v in V.proof_to_arrays(p2).items()}
ok2 = bool(np.asarray(fn(pa2)))
print("corrupted:", ok2, flush=True)
assert not ok2
print("FOLD-SCAN VALIDATED", flush=True)
