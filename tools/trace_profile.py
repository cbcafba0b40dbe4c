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
B = 1
rng = np.random.default_rng(5)
inputs = {t: rng.integers(0, gl.P, size=B, dtype=np.uint64) for t in sk}
proofs = prove_batch(data, inputs, B)
print("proved", flush=True)
pa = V.proof_to_arrays(proofs[0])
vk_cap = gj.from_u64(data.vk.constants_sigmas_cap)
digest = gj.from_u64(data.vk.circuit_digest)

def count(jx):
    n = len(jx.eqns)
    for e in jx.eqns:
        for v in e.params.values():
            if hasattr(v, 'jaxpr'):
                n += count(v.jaxpr)
            if isinstance(v, (list, tuple)):
                for u in v:
                    if hasattr(u, 'jaxpr'):
                        n += count(u.jaxpr)
    return n

pa_gf = {k: gj.from_u64(v) for k, v in pa.items()}

which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "chal"):
    t0 = time.time()
    def just_challenges(pa_gf):
        from stark_verifier_tpu.ops import poseidon_gl as pg
        pi_hash = pg.hash_no_pad(gj, V._scalar_list(gj, pa_gf["public_inputs"]))
        ch = V.get_challenges(gj, data.common, pa_gf, pi_hash, digest)
        return ch.fri_pow_response
    jx = jax.make_jaxpr(just_challenges)(pa_gf)
    print(f"challenges: {count(jx.jaxpr)} eqns, trace {time.time()-t0:.1f}s", flush=True)

if which in ("all", "vanish"):
    t0 = time.time()
    def just_vanishing(pa_gf):
        from stark_verifier_tpu.ops import poseidon_gl as pg
        pi_hash = pg.hash_no_pad(gj, V._scalar_list(gj, pa_gf["public_inputs"]))
        ch = V.get_challenges(gj, data.common, pa_gf, pi_hash, digest)
        van, zpd = V.eval_vanishing_poly(gj, data.common, ch, pa_gf, pi_hash)
        return van[0][0]
    jx = jax.make_jaxpr(just_vanishing)(pa_gf)
    print(f"+vanishing: {count(jx.jaxpr)} eqns, trace {time.time()-t0:.1f}s", flush=True)

if which in ("all", "full"):
    t0 = time.time()
    def full(pa_gf):
        return V.verify(gj, data.common, vk_cap, digest, pa_gf)
    jx = jax.make_jaxpr(full)(pa_gf)
    print(f"full: {count(jx.jaxpr)} eqns, trace {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    f = jax.jit(full)
    lowered = f.lower(pa_gf)
    print(f"lower {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    comp = lowered.compile()
    print(f"compile {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    ok = comp(pa_gf)
    print("run:", np.asarray(ok), f"{time.time()-t0:.3f}s", flush=True)
