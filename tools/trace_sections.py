"""Trace each verifier phase separately (challenges computed host-side) to
find eqn hot spots quickly."""
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
from stark_verifier_tpu.ops import poseidon_gl as pg
from stark_verifier_tpu.ops import ext2


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
pa_np = V.proof_to_arrays(proofs[0])
print("proved", flush=True)

# host-side challenges (numpy golden)
pi_hash_np = pg.hash_no_pad(gl, V._scalar_list(gl, pa_np["public_inputs"]))
ch_np = V.get_challenges(gl, data.common, pa_np, pi_hash_np, data.vk.circuit_digest)

pa_gf = {k: gj.from_u64(v) for k, v in pa_np.items()}
vk_cap = gj.from_u64(data.vk.constants_sigmas_cap)
digest = gj.from_u64(data.vk.circuit_digest)


def mk_ch():
    ch = V.ProofChallenges()
    ch.plonk_betas = [gj.from_u64(x) for x in ch_np.plonk_betas]
    ch.plonk_gammas = [gj.from_u64(x) for x in ch_np.plonk_gammas]
    ch.plonk_alphas = [gj.from_u64(x) for x in ch_np.plonk_alphas]
    ch.plonk_zeta = tuple(gj.from_u64(x) for x in ch_np.plonk_zeta)
    ch.fri_alpha = tuple(gj.from_u64(x) for x in ch_np.fri_alpha)
    ch.fri_betas = [tuple(gj.from_u64(x) for x in bb) for bb in ch_np.fri_betas]
    ch.fri_pow_response = gj.from_u64(ch_np.fri_pow_response)
    ch.fri_query_indices = [gj.from_u64(x) for x in ch_np.fri_query_indices]
    return ch


def sec_vanish(pa_gf):
    ch = mk_ch()
    pi_hash = [gj.from_u64(h) for h in pi_hash_np]
    van, zpd = V.eval_vanishing_poly(gj, data.common, ch, pa_gf, pi_hash)
    return van[0][0].l0


def sec_fri(pa_gf):
    ch = mk_ch()
    alpha = ch.fri_alpha
    batches = V._opening_batches(gj, pa_gf)
    ro = [ext2.reduce_with_powers(gj, alpha, bb) for bb in batches]
    zeta_next = ext2.scalar_mul(gj, ch.plonk_zeta, gj.const(V._g_pow(V.ORDER >> data.common.degree_bits)))
    ok = V.verify_fri(gj, data.common, ch, pa_gf, vk_cap, ro, ch.plonk_zeta, zeta_next, True)
    return ok


for name, fn in [("vanishing", sec_vanish), ("fri", sec_fri)]:
    t0 = time.time()
    jx = jax.make_jaxpr(fn)(pa_gf)
    print(f"{name}: {count(jx.jaxpr)} eqns, trace {time.time()-t0:.1f}s", flush=True)
