"""Recursive-aggregation timing at REFERENCE strength.

Aggregates 2^k of the real zk20 signals (fixtures/sem_zk20.npz: zero
knowledge on, 2^20-member access set, blowup 8, 28 queries, 16 PoW bits,
cap 4) under the reference's aggregation config (reference:
plonky2_semaphore/recursion.rs:32-48 — zk on, 135 wires / 80 routed, cap 4,
16 PoW bits, 28 query rounds), verifies the final proof natively, and
appends one JSON line per N to .bank/agg_bench.jsonl. The reference's
published table for the same tree is README.md:171-177 (2 proofs: 11 s ...
128 proofs: 930 s on r5.4xlarge).

Usage: python tools/bench_aggregation.py [N ...]   (defaults: 16 32 64 128)
"""
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def main(ns):
    import os

    # Production parallel-prover configuration (measured round 5,
    # .bank/chunk_exp*.log): fork 4 single-OMP-thread workers per level,
    # each proving its pairs in sub-batches of SVT_AGG_CHUNK — 16 pairs at
    # deg 2^14 went 380 s (monolithic) -> 75 s. Override via env.
    os.environ.setdefault("SVT_AGG_PROCS", str(os.cpu_count() or 4))
    os.environ.setdefault("SVT_AGG_CHUNK", "4")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from stark_verifier_tpu.core.types import load_proofs
    from stark_verifier_tpu.core.verifier import verify_proof
    from stark_verifier_tpu.ops import gl64_np as gl
    from stark_verifier_tpu.prover.recursion import recursion_config
    from stark_verifier_tpu.semaphore.recursion import (
        build_aggregation_circuit,
        prove_aggregation_level,
    )

    cands = sorted((REPO / "fixtures").glob("sem_zk20*.npz"),
                   key=lambda p: p.stat().st_size, reverse=True)
    proofs, common, vk = load_proofs(cands[0])
    print(f"# zk20 fixture: {len(proofs)} distinct proofs, "
          f"deg 2^{common.degree_bits}, hiding={common.fri_params.hiding}, "
          f"q={common.config.fri_config.num_query_rounds}", flush=True)
    cfg = recursion_config(common.config.fri_config, zero_knowledge=True)
    out_path = REPO / ".bank" / "agg_bench.jsonl"
    out_path.parent.mkdir(exist_ok=True)

    # circuits are reusable across N for the same level-common shape;
    # cache them by level index (level 0 always has the zk20 inner).
    circuits = {}

    for n in ns:
        level_proofs = list(proofs[:n])
        level_common, level_vk = common, vk
        t_total = time.time()
        level_times = []
        final_data = None
        li = 0
        while len(level_proofs) > 1:
            t0 = time.time()
            if li in circuits and circuits[li][0] is level_common:
                agg = circuits[li][1]
                t_build = 0.0
            else:
                agg = build_aggregation_circuit(level_common, cfg)
                circuits[li] = (level_common, agg)
                t_build = time.time() - t0
            t1 = time.time()
            level_proofs = prove_aggregation_level(agg, level_proofs, level_vk)
            t_prove = time.time() - t1
            level_times.append({
                "level": li, "pairs": len(level_proofs),
                "deg_bits": agg.data.common.degree_bits,
                "build_s": round(t_build, 2), "prove_s": round(t_prove, 2)})
            print(f"#   N={n} level {li}: {len(level_proofs)} proofs, "
                  f"deg 2^{agg.data.common.degree_bits}, build {t_build:.1f}s,"
                  f" prove {t_prove:.1f}s", flush=True)
            final_data = agg.data
            level_common, level_vk = agg.data.common, agg.data.vk
            li += 1
        total = time.time() - t_total
        t0 = time.time()
        ok = verify_proof(gl, final_data.common, final_data.vk, level_proofs[0])
        t_verify = time.time() - t0
        assert ok, f"final aggregated proof (N={n}) failed verification"
        row = {
            "n_proofs": n, "aggregate_s": round(total, 1),
            "final_deg_bits": final_data.common.degree_bits,
            "final_verify_native_s": round(t_verify, 2),
            "zk": True, "queries": 28, "pow_bits": 16, "cap_height": 4,
            "agg_procs": os.environ.get("SVT_AGG_PROCS"),
            "agg_chunk": os.environ.get("SVT_AGG_CHUNK"),
            "levels": level_times,
        }
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps({k: row[k] for k in
                          ("n_proofs", "aggregate_s", "final_deg_bits",
                           "final_verify_native_s")}), flush=True)
    return 0


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [16, 32, 64, 128]
    sys.exit(main(ns))
