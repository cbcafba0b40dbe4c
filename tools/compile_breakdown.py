"""Where does the zk20 cold compile go? Trace-size + compile-time breakdown.

Evidence tool for the cold-start story (round-4 headline cold compile was
812 s on-chip; BENCH_SUMMARY "Cold start"). Traces the production
batch-in-lanes verifier (core/verifier_batched) on the zk20 workload in
three nested prefixes and reports jaxpr equation counts (graph size) plus
optional XLA:CPU compile seconds per prefix:

  challenges   — transcript replay (sponge scans, observe/squeeze)
  + vanishing  — gate-constraint evaluation + quotient recombination
  + fri (full) — initial-tree Merkle walks + fold scans + final poly

Usage: python tools/compile_breakdown.py [B] [--compile]
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def eqn_count(jx):
    n = len(jx.eqns)
    for e in jx.eqns:
        for v in e.params.values():
            if hasattr(v, "jaxpr"):
                n += eqn_count(v.jaxpr)
            if isinstance(v, (list, tuple)):
                for u in v:
                    if hasattr(u, "jaxpr"):
                        n += eqn_count(u.jaxpr)
    return n


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 64
    do_compile = "--compile" in sys.argv
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from stark_verifier_tpu.core import verifier as V1
    from stark_verifier_tpu.core import verifier_batched as VB
    from stark_verifier_tpu.core.types import load_proofs
    from stark_verifier_tpu.models.flagship import batched_arrays
    from stark_verifier_tpu.ops import ext2
    from stark_verifier_tpu.ops import gl64_jax as gj
    from stark_verifier_tpu.ops import poseidon_gl as pg

    proofs, common, vk = load_proofs(REPO / "fixtures" / "sem_zk20b64.npz")
    while len(proofs) < B:
        proofs = proofs + proofs
    base = batched_arrays(proofs[:B])
    vk_cap = gj.from_u64(vk.constants_sigmas_cap)
    digest = gj.from_u64(vk.circuit_digest)
    args = {k: gj.from_u64(v) for k, v in base.items()}

    def challenges_only(pa):
        pi_hash = pg.hash_no_pad(
            gj, V1._scalar_list(gj, pa["public_inputs"]), shape=(B,))
        ch = VB._get_challenges_batched(gj, common, pa, pi_hash, digest, B)
        return ch.fri_pow_response, ch.plonk_zeta

    def through_vanishing(pa):
        pi_hash = pg.hash_no_pad(
            gj, V1._scalar_list(gj, pa["public_inputs"]), shape=(B,))
        ch = VB._get_challenges_batched(gj, common, pa, pi_hash, digest, B)
        vanishing, zpd = V1.eval_vanishing_poly(gj, common, ch, pa, pi_hash)
        return vanishing[0], zpd

    def full(pa):
        return VB.verify_batched(gj, common, vk_cap, digest, pa)

    rows = []
    for name, fn in (("challenges", challenges_only),
                     ("+vanishing", through_vanishing),
                     ("full", full)):
        t0 = time.time()
        jx = jax.make_jaxpr(fn)(args)
        t_trace = time.time() - t0
        n_eqn = eqn_count(jx.jaxpr)
        t_comp = None
        if do_compile:
            t0 = time.time()
            jax.jit(fn).lower(args).compile()
            t_comp = time.time() - t0
        rows.append((name, n_eqn, t_trace, t_comp))
        print(f"{name:12s} eqns={n_eqn:7d} trace={t_trace:6.1f}s"
              + (f" xla_cpu_compile={t_comp:7.1f}s" if t_comp is not None
                 else ""), flush=True)
    print("# deltas: vanishing adds "
          f"{rows[1][1]-rows[0][1]} eqns, fri adds {rows[2][1]-rows[1][1]}")


if __name__ == "__main__":
    main()
