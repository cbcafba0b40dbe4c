"""cProfile one recursive-aggregation level prove (B=1 pair) at reference
strength over the current zk20 fixture — locates the prover hot spots that
the aggregation table (tools/bench_aggregation.py) pays per level.

Usage: python tools/profile_agg_level.py [backend]   # SVT_PROVER_LDE value
"""
import cProfile
import io
import pstats
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    import os

    if len(sys.argv) > 1:
        os.environ["SVT_PROVER_LDE"] = sys.argv[1]
    from stark_verifier_tpu.core.types import load_proofs
    from stark_verifier_tpu.prover.recursion import recursion_config
    from stark_verifier_tpu.semaphore.recursion import (
        build_aggregation_circuit, prove_aggregation_level)

    cands = sorted((REPO / "fixtures").glob("sem_zk20*.npz"),
                   key=lambda p: p.stat().st_size, reverse=True)
    proofs, common, vk = load_proofs(cands[0])
    print(f"# inner: deg 2^{common.degree_bits}", flush=True)
    cfg = recursion_config(common.config.fri_config, zero_knowledge=True)
    t0 = time.time()
    agg = build_aggregation_circuit(common, cfg)
    print(f"# build: {time.time()-t0:.1f}s, agg deg "
          f"2^{agg.data.common.degree_bits}", flush=True)
    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    out = prove_aggregation_level(agg, proofs[:2], vk)
    pr.disable()
    print(f"# prove 1 pair: {time.time()-t0:.1f}s", flush=True)
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
    print(s.getvalue())
    from stark_verifier_tpu.core.verifier import verify_proof
    from stark_verifier_tpu.ops import gl64_np as gl

    assert verify_proof(gl, agg.data.common, agg.data.vk, out[0])
    print("# aggregated proof verifies: PASS")


if __name__ == "__main__":
    main()
