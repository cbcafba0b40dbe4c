"""Measure the prover coset-LDE backends on the REAL aggregation shapes.

VERDICT r3 items 3+7: pick the aggregation prover's LDE default by data.
The recursive-aggregation levels (tools/bench_aggregation.py) prove at
deg 2^13/2^14 with blowup 8; per level the prover runs three coset_lde
calls (prove.py:117,191,204) whose row counts are wires (135*B),
zs+partial-products (~20*B) and quotient chunks (16*B), B = pairs in the
level. This tool times each backend on exactly those (rows, n) shapes:

  np   — host numpy riding the native C NTT plane (OpenMP, 4 cores here)
  jax  — ops/ntt_jax.coset_lde on the default device (the real TPU chip)
  mesh — ntt_4step: transform axis partitioned over the device mesh with
         all_to_all (run under JAX_PLATFORMS=cpu +
         --xla_force_host_platform_device_count=8: the virtual 8-device
         mesh this environment can actually build)

Each backend runs in a subprocess so platform env vars don't collide.
Appends one JSON line per (backend, shape) to .bank/lde_bench.jsonl.

Usage: python tools/bench_lde_backends.py            # all three backends
       SVT_LDE_BENCH_INNER=np python tools/bench_lde_backends.py  # one
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

RATE_BITS = 3
SHIFT = 7
# (tag, rows, n): the three prove.py LDE call shapes per aggregation level,
# B=8 pairs (N=16 tree, level 0/1), at both level degrees.
SHAPES = [
    ("wires_deg13", 135 * 8, 1 << 13),
    ("zs_pp_deg13", 20 * 8, 1 << 13),
    ("quot_deg13", 16 * 8, 1 << 13),
    ("wires_deg14", 135 * 8, 1 << 14),
    ("zs_pp_deg14", 20 * 8, 1 << 14),
    ("quot_deg14", 16 * 8, 1 << 14),
]


def run_backend(backend: str):
    from stark_verifier_tpu.prover import lde as _lde
    from stark_verifier_tpu.ops import gl64_np as gl

    import jax

    if backend == "mesh":
        # this environment pins jax_platforms to "axon,cpu" regardless of
        # JAX_PLATFORMS; the virtual 8-device mesh only exists on cpu
        jax.config.update("jax_platforms", "cpu")
    plat = jax.devices()[0].platform
    ndev = len(jax.devices())
    rng = np.random.default_rng(7)
    out_path = REPO / ".bank" / "lde_bench.jsonl"
    rows_out = []
    for tag, rows, n in SHAPES:
        coeffs = rng.integers(0, gl.P, size=(rows, n), dtype=np.uint64)
        # first call on the FULL shape = jit compile + run (axon's compile
        # cache does not persist, so this is a cost real aggregation runs
        # pay once per distinct shape)
        t0 = time.time()
        out = _lde.coset_lde(coeffs, RATE_BITS, SHIFT, backend=backend)
        first = time.time() - t0
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            out = _lde.coset_lde(coeffs, RATE_BITS, SHIFT, backend=backend)
        dt = (time.time() - t0) / reps
        # bit-exactness vs the golden np plane on a slice
        gold = _lde.coset_lde(coeffs[:2], RATE_BITS, SHIFT, backend="np")
        assert (np.asarray(out[:2]) == gold).all(), f"{backend} mismatch"
        row = {"backend": backend, "platform": plat, "n_devices": ndev,
               "shape": tag, "rows": rows, "n": n,
               "lde_n": n << RATE_BITS, "seconds": round(dt, 4),
               "first_call_s": round(first, 2),
               "mpoints_per_s": round(rows * (n << RATE_BITS) / dt / 1e6, 1)}
        rows_out.append(row)
        print(json.dumps(row), flush=True)
    with open(out_path, "a") as f:
        for row in rows_out:
            f.write(json.dumps(row) + "\n")


def main():
    inner = os.environ.get("SVT_LDE_BENCH_INNER")
    if inner:
        run_backend(inner)
        return
    for backend, env in [
        ("np", {}),
        ("jax", {}),
        ("mesh", {"JAX_PLATFORMS": "cpu",
                  "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}),
    ]:
        e = dict(os.environ, SVT_LDE_BENCH_INNER=backend, **env)
        print(f"# --- backend {backend} {env} ---", flush=True)
        r = subprocess.run([sys.executable, __file__], env=e)
        if r.returncode != 0:
            print(f"# backend {backend} FAILED rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()
