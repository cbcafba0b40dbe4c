"""Compile + run the batched verifier on the real TPU chip."""
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

print("devices:", jax.devices(), flush=True)
cfg = CircuitConfig(fri_config=FriConfig(rate_bits=3, cap_height=2,
                                         proof_of_work_bits=10, num_query_rounds=12))
b = CircuitBuilder(cfg)
sk = b.add_virtual_targets(8)
state = sk
for _ in range(40):
    state = b.hash_n_to_hash_no_pad(state) + state[:4]
b.register_public_inputs(state[:4])
data = b.build()
B = 16
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


pa_gf = {k: gj.from_u64(v) for k, v in batched.items()}
f = jax.jit(jax.vmap(verify_one))
t0 = time.time()
lowered = f.lower(pa_gf)
print(f"lower {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
comp = lowered.compile()
print(f"TPU compile {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
ok = np.asarray(comp(pa_gf))
print("run1:", ok.all(), f"{time.time()-t0:.3f}s", flush=True)
t0 = time.time()
for _ in range(5):
    ok = comp(pa_gf)
np.asarray(ok)
dt = (time.time() - t0) / 5
print(f"steady: {dt*1000:.1f} ms/batch of {B} -> {B/dt:.0f} proofs/s", flush=True)
assert np.asarray(ok).all()
print("TPU verify OK")
