"""Validate the fold-layer scan path by jitting the verifier on the TPU
with a 3-fold-layer fixture."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
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
b.min_degree = 256
data = b.build()
print("layers", data.common.fri_params.reduction_arity_bits, flush=True)
rng = np.random.default_rng(3)
inputs = {t: rng.integers(0, gl.P, size=2, dtype=np.uint64) for t in sk}
proofs = prove_batch(data, inputs, 2)
assert V.verify_proof(gl, data.common, data.vk, proofs[0])
print("numpy ok", flush=True)

vk_cap = gj.from_u64(data.vk.constants_sigmas_cap)
digest = gj.from_u64(data.vk.circuit_digest)
fn = jax.jit(jax.vmap(lambda pa: V.verify(gj, data.common, vk_cap, digest, pa)))
pas = [V.proof_to_arrays(p) for p in proofs]
batched = {k: np.stack([pa[k] for pa in pas]) for k in pas[0]}
pa_gf = {k: gj.from_u64(v) for k, v in batched.items()}
t0 = time.time()
ok = np.asarray(fn(pa_gf))
print(f"tpu jit verify (fold-scan): {ok} in {time.time()-t0:.0f}s", flush=True)
assert ok.all()
batched["step_evals_1"] = batched["step_evals_1"].copy()
batched["step_evals_1"][1, 2, 0, 1] ^= np.uint64(1)
pa_gf = {k: gj.from_u64(v) for k, v in batched.items()}
ok2 = np.asarray(fn(pa_gf))
print("with corruption:", ok2, flush=True)
assert ok2.tolist() == [True, False]
print("FOLD-SCAN TPU VALIDATED", flush=True)
