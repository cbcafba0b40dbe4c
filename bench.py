"""Benchmark: plonky2 Semaphore proofs verified per second on one TPU chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference aggregates ~128 proofs in 930 s on an r5.4xlarge
(~0.14 proofs/s/machine; BASELINE.md) — each aggregation step re-proves two
verifications recursively, where this framework verifies the batch directly.

The workload is a batch of Semaphore membership proofs with the reference's
FRI preset where feasible; SVT_BENCH_PRESET picks the size (small|mid|full).
The first run on a machine pays a large XLA compile (cached persistently in
.jax_cache afterwards).
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def main():
    preset = os.environ.get("SVT_BENCH_PRESET", "small")
    from stark_verifier_tpu.core.types import CircuitConfig, FriConfig
    from stark_verifier_tpu.models import flagship as FS

    if preset == "full":
        cfg, tag, members = FS.bench_config(), "bench10", 10
        min_degree = 1 << 12
    elif preset == "mid":
        cfg = CircuitConfig(fri_config=FriConfig(rate_bits=3, cap_height=2,
                                                 proof_of_work_bits=12,
                                                 num_query_rounds=12))
        tag, members, min_degree = "mid8", 8, 0
    else:
        cfg, tag, members, min_degree = FS.small_config(), "small6", 6, 0

    batch = int(os.environ.get("SVT_BENCH_BATCH", "32"))
    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=members, batch=min(batch, 32), config=cfg,
        min_degree=min_degree, cache_tag=tag)
    # replicate proofs up to the requested batch size
    while len(proofs) < batch:
        proofs = proofs + proofs
    proofs = proofs[:batch]

    fn, to_gf = FS.make_verifier_fn(common, vk)
    pa_gf = to_gf(FS.batched_arrays(proofs))

    t0 = time.time()
    ok = np.asarray(fn(pa_gf))
    compile_and_first = time.time() - t0
    assert ok.all(), "benchmark proofs failed verification"

    reps = 10
    t0 = time.time()
    for _ in range(reps):
        ok = fn(pa_gf)
    np.asarray(ok)
    dt = (time.time() - t0) / reps
    pps = batch / dt

    baseline = 0.14  # proofs/s/machine, reference aggregation path
    print(json.dumps({
        "metric": f"semaphore_proofs_verified_per_sec_per_chip[{preset},deg=2^{common.degree_bits},q={common.config.fri_config.num_query_rounds}]",
        "value": round(pps, 2),
        "unit": "proofs/s",
        "vs_baseline": round(pps / baseline, 1),
    }))
    print(f"# batch={batch} steady={dt*1000:.2f}ms/batch "
          f"first(compile)={compile_and_first:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
