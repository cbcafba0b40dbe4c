import sys, time, os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
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
                                         proof_of_work_bits=10, num_query_rounds=12))
b = CircuitBuilder(cfg)
sk = b.add_virtual_targets(8)
state = sk
for _ in range(40):
    state = b.hash_n_to_hash_no_pad(state) + state[:4]
b.register_public_inputs(state[:4])
data = b.build()
B = 4
rng = np.random.default_rng(5)
inputs = {t: rng.integers(0, gl.P, size=B, dtype=np.uint64) for t in sk}
proofs = prove_batch(data, inputs, B)
print("proved", flush=True)

pas = [V.proof_to_arrays(p) for p in proofs]
batched = {k: np.stack([pa[k] for pa in pas]) for k in pas[0]}
vk_cap = gj.from_u64(data.vk.constants_sigmas_cap)
digest = gj.from_u64(data.vk.circuit_digest)


def verify_one(pa_gf):
    return V.verify(gj, data.common, vk_cap, digest, pa_gf)


t0 = time.time()
pa_gf = {k: gj.from_u64(v) for k, v in batched.items()}
f = jax.jit(jax.vmap(verify_one))
print("tracing/compiling...", flush=True)
ok = f(pa_gf)
print("jax verify batch:", np.asarray(ok), f"compile+run {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
ok = f(pa_gf)
ok.block_until_ready()
print(f"steady-state batch of {B}: {time.time()-t0:.3f}s")
assert np.asarray(ok).all()
batched["open_wires"][2, 0, 0] ^= np.uint64(1)
pa_gf = {k: gj.from_u64(v) for k, v in batched.items()}
ok = np.asarray(f(pa_gf))
print("with corruption:", ok)
assert ok.tolist() == [True, True, False, True]
print("JAX batched verifier OK")
