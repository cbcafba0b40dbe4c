"""Eager (no-jit) validation of the JAX fold-layer scan vs numpy."""
import os, sys, time
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["SVT_NO_CACHE"] = "1"
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
                                         proof_of_work_bits=6, num_query_rounds=4))
b = CircuitBuilder(cfg)
sk = b.add_virtual_targets(8)
h = b.hash_n_to_hash_no_pad(sk)
b.register_public_inputs(h)
b.min_degree = 256  # 3 fold layers
data = b.build()
print("layers", data.common.fri_params.reduction_arity_bits, flush=True)
rng = np.random.default_rng(3)
inputs = {t: rng.integers(0, gl.P, size=1, dtype=np.uint64) for t in sk}
proofs = prove_batch(data, inputs, 1)
assert V.verify_proof(gl, data.common, data.vk, proofs[0])
print("numpy ok", flush=True)
t0 = time.time()
ok = bool(np.asarray(V.verify_proof(gj, data.common, data.vk, proofs[0])))
print(f"jax eager fold-scan verify: {ok} in {time.time()-t0:.0f}s", flush=True)
assert ok
import copy
p2 = copy.deepcopy(proofs[0])
p2.opening_proof.query_rounds.step_evals[2][1, 1, 0] ^= np.uint64(1)
ok2 = bool(np.asarray(V.verify_proof(gj, data.common, data.vk, p2)))
print("corrupted:", ok2, flush=True)
assert not ok2
print("FOLD-SCAN EAGER VALIDATED", flush=True)
