"""Benchmark: plonky2 Semaphore proofs verified per second on one TPU chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference aggregates ~128 proofs in 930 s on an r5.4xlarge
(~0.14 proofs/s/machine; BASELINE.md) — each reference aggregation step
recursively re-proves two verifications, where this framework verifies the
batch directly.

The TPU attempt runs in a subprocess under SVT_BENCH_TIMEOUT seconds
(default 2400): verifier XLA graphs are large and the first compile on a
cold machine is slow (cached persistently in .jax_cache afterwards). If the
budget is exceeded, the benchmark falls back to the host golden verifier so
a result is always reported.
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import numpy as np


def _load_workload():
    from stark_verifier_tpu.core.types import CircuitConfig, FriConfig
    from stark_verifier_tpu.models import flagship as FS

    preset = os.environ.get("SVT_BENCH_PRESET", "auto")
    zk20_fixtures = sorted(
        (REPO / "fixtures").glob("sem_zk20*.npz"),
        key=lambda p: p.stat().st_size, reverse=True)
    if preset == "auto":
        # headline zk-2^20 workload only when a fixture has been generated
        # offline (tools/gen_zk20_fixture.py — host proving of 1024 distinct
        # zk proofs is hour-scale); otherwise the full non-zk preset, which
        # regenerates quickly from a cold fixture state.
        preset = "zk20" if zk20_fixtures else "full"
    if preset == "zk20":
        # THE reference workload (reference: plonky2_semaphore/access_set.rs:
        # 68-84 + README.md:155): 2^20-member access set, zero-knowledge on
        # (salted oracles + blinding rows), blowup 8, 28 queries, 16 PoW
        # bits. A partial fixture (sem_zk20bN.npz, N distinct proofs) is
        # tiled to the batch and labeled with its distinct count — lane
        # duplication is throughput-neutral (per-lane work is identical).
        from stark_verifier_tpu.core.types import load_proofs

        batch = int(os.environ.get("SVT_BENCH_BATCH", "1024"))
        proofs, common, vk = load_proofs(zk20_fixtures[0])
        distinct = len(proofs)
        while len(proofs) < batch:
            proofs = proofs + proofs
        if distinct < batch:
            preset = f"zk20,distinct={distinct}"
        return preset, proofs[:batch], common, vk
    if preset == "full":
        cfg, tag, members, min_degree = FS.bench_config(), "bench10", 10, 1 << 12
    elif preset == "mid":
        cfg = CircuitConfig(fri_config=FriConfig(rate_bits=3, cap_height=2,
                                                 proof_of_work_bits=12,
                                                 num_query_rounds=12))
        tag, members, min_degree = "mid8", 8, 0
    else:
        cfg, tag, members, min_degree = FS.small_config(), "small6", 6, 0
    batch = int(os.environ.get("SVT_BENCH_BATCH", "1024"))
    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=members, batch=min(batch, 32), config=cfg,
        min_degree=min_degree, cache_tag=tag)
    while len(proofs) < batch:
        proofs = proofs + proofs
    return preset, proofs[:batch], common, vk


def _emit(preset, common, pps, suffix=""):
    baseline = 0.14
    print(json.dumps({
        "metric": (f"semaphore_proofs_verified_per_sec_per_chip"
                   f"[{preset}{suffix},deg=2^{common.degree_bits},"
                   f"q={common.config.fri_config.num_query_rounds}]"),
        "value": round(pps, 3),
        "unit": "proofs/s",
        "vs_baseline": round(pps / baseline, 1),
    }))


def inner():
    """The real device benchmark (runs in a subprocess)."""
    # batched (batch-in-lanes + Pallas Poseidon) is the fast path: 3,710
    # proofs/s vs 2,314 vmap on the full preset (validated bit-exact vs the
    # vmap path incl. corrupted lanes — tools/check_batched_tpu.py).
    mode = os.environ.get("SVT_BENCH_MODE", "batched")
    if mode == "batched":
        # batch-in-lanes path: the Pallas Poseidon kernel sees full lanes
        os.environ.setdefault("SVT_PALLAS", "1")

    import jax

    from stark_verifier_tpu.models import flagship as FS

    preset, proofs, common, vk = _load_workload()
    _, to_gf = FS.make_verifier_fn(common, vk)
    pa_gf = to_gf(FS.batched_arrays(proofs))
    plat = jax.devices()[0].platform
    # AOT-exec cache key: graph shapes only (the distinct-proof count of a
    # partial zk20 fixture changes values, not shapes)
    exec_path = (REPO / "fixtures"
                 / f"exec_{preset.split(',')[0]}_{mode}_b{len(proofs)}_{plat}.jex")
    t0 = time.time()
    fn = FS.compiled_verifier(common, vk, pa_gf, cache_path=exec_path,
                              mode=mode)
    ok = np.asarray(fn(pa_gf))
    first = time.time() - t0
    assert ok.all(), "benchmark proofs failed verification"
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        ok = fn(pa_gf)
    np.asarray(ok)
    dt = (time.time() - t0) / reps
    _emit(preset, common, len(proofs) / dt)
    print(f"# batch={len(proofs)} steady={dt*1000:.2f}ms/batch "
          f"first(compile)={first:.1f}s", file=sys.stderr)


def fallback():
    """Host golden-verifier throughput (no XLA compile)."""
    from stark_verifier_tpu.core.verifier import verify_proof
    from stark_verifier_tpu.ops import gl64_np as gl

    preset, proofs, common, vk = _load_workload()
    sample = proofs[: min(4, len(proofs))]
    t0 = time.time()
    for p in sample:
        assert verify_proof(gl, common, vk, p)
    dt = (time.time() - t0) / len(sample)
    _emit(preset, common, 1.0 / dt, suffix=",host_fallback")
    print("# device compile exceeded budget; reporting host golden-verifier "
          "throughput", file=sys.stderr)


def main():
    if os.environ.get("SVT_BENCH_INNER"):
        inner()
        return
    budget = int(os.environ.get("SVT_BENCH_TIMEOUT", "2400"))
    env = dict(os.environ, SVT_BENCH_INNER="1")
    try:
        r = subprocess.run([sys.executable, str(REPO / "bench.py")],
                           env=env, timeout=budget, capture_output=True,
                           text=True)
        if r.returncode == 0 and '"metric"' in r.stdout:
            sys.stdout.write(r.stdout)
            sys.stderr.write(r.stderr[-2000:])
            return
        sys.stderr.write(f"# inner bench failed (rc={r.returncode}):\n")
        sys.stderr.write(r.stderr[-2000:] + "\n")
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"# inner bench exceeded {budget}s\n")
    fallback()


if __name__ == "__main__":
    main()
