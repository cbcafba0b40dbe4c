"""Bench the REAL reference workload on the TPU: zero-knowledge Semaphore
proofs (salted oracles + blinding rows) over a 2^20-member access set with
the reference proving preset (reference: plonky2_semaphore/access_set.rs:
68-84, README.md:155).

Loads the largest available zk20 fixture (sem_zk20.npz from
tools/gen_zk20_fixture.py, else a partial sem_zk20b*.npz) and tiles the
distinct proofs to SVT_BENCH_BATCH lanes (throughput is per-lane, so lane
duplication is benign — reported honestly in the metric name).
"""
import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    os.environ.setdefault("SVT_PALLAS", "1")
    import jax

    from stark_verifier_tpu.core.types import load_proofs
    from stark_verifier_tpu.models import flagship as FS

    fixdir = REPO / "fixtures"
    candidates = sorted(fixdir.glob("sem_zk20*.npz"),
                        key=lambda p: p.stat().st_size, reverse=True)
    if not candidates:
        print("no zk20 fixture; run tools/gen_zk20_fixture.py first")
        return 1
    fix = candidates[0]
    proofs, common, vk = load_proofs(fix)
    distinct = len(proofs)
    batch = int(os.environ.get("SVT_BENCH_BATCH", "1024"))
    while len(proofs) < batch:
        proofs = proofs + proofs
    proofs = proofs[:batch]
    print(f"# fixture {fix.name}: {distinct} distinct zk proofs, "
          f"deg 2^{common.degree_bits}, hiding={common.fri_params.hiding}, "
          f"q={common.config.fri_config.num_query_rounds}, tiled to {batch}",
          file=sys.stderr)

    mode = os.environ.get("SVT_BENCH_MODE", "batched")
    _, to_gf = FS.make_verifier_fn(common, vk)
    pa_gf = to_gf(FS.batched_arrays(proofs))
    plat = jax.devices()[0].platform
    exec_path = fixdir / f"exec_zk20_{mode}_b{batch}_{plat}.jex"
    t0 = time.time()
    fn = FS.compiled_verifier(common, vk, pa_gf, cache_path=exec_path,
                              mode=mode)
    ok = np.asarray(fn(pa_gf))
    first = time.time() - t0
    assert ok.all(), "zk benchmark proofs failed verification"
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        ok = fn(pa_gf)
    np.asarray(ok)
    dt = (time.time() - t0) / reps
    pps = batch / dt
    print(json.dumps({
        "metric": (f"semaphore_proofs_verified_per_sec_per_chip"
                   f"[zk20-2^20members,{distinct}distinct,"
                   f"deg=2^{common.degree_bits},"
                   f"q={common.config.fri_config.num_query_rounds},{mode}]"),
        "value": round(pps, 3),
        "unit": "proofs/s",
        "vs_baseline": round(pps / 0.14, 1),
    }))
    print(f"# steady={dt*1000:.2f}ms/batch first(compile)={first:.1f}s",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
