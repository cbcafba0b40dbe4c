"""Prover LDE backends: the coset low-degree extension is the prover's FFT
plane (wires / zs+partial-products / quotient oracles all commit to an LDE;
see prove.py). Three backends:

  np   — host numpy riding the native C NTT plane (native/svt_poseidon.c,
         OpenMP over rows) — the DEFAULT, chosen by measurement
  jax  — single-device `ops/ntt_jax.coset_lde` (TPU limb-plane NTT)
  mesh — transform axis partitioned over the device mesh with
         `ops/ntt_jax.ntt_4step` (all_to_all butterfly exchange over ICI)

Backend choice is data-driven (tools/bench_lde_backends.py,
.bank/lde_bench.jsonl, round 4): on the exact aggregation shapes
([1080, 2^14] wires etc.) the native C plane sustains 31-114 Mpoints/s on
a 4-core host (AVX-512 butterflies) while the TPU jax path manages
0.4-1.2 Mpoints/s — a radix-2
NTT is 14-17 sequential stages of element shuffles with no matmul for the
MXU, the 4x16-bit limb emulation multiplies the VPU op count, and every
call pays host<->device transfer of the full oracle plus a multi-minute
per-shape XLA compile (the axon compile cache does not persist). The TPU's
win on this workload is the VERIFIER (bench.py); proving stays
host-resident. `mesh` remains the multi-host scaling story for transforms
that exceed one host's memory (SURVEY §2.3 / BASELINE config 5), not a
single-host speedup.

Selected per-call or via SVT_PROVER_LDE.
"""
from __future__ import annotations

import os

import numpy as np

from ..ops import gl64_np as gl
from ..ops import ntt_np

_jit_coset_lde = None


def _scaled_pad(coeffs: np.ndarray, rate_bits: int, shift: int) -> np.ndarray:
    """Zero-pad to the LDE length and fold the coset shift into the
    coefficients: p(shift*x) has coefficients c_i * shift^i."""
    n = coeffs.shape[-1]
    n_lde = n << rate_bits
    powers = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        powers[i] = acc
        acc = (acc * shift) % gl.P
    scaled = gl.mul(coeffs, powers)
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, n_lde - n)]
    return np.pad(scaled, pad)


def coset_lde(coeffs: np.ndarray, rate_bits: int, shift: int,
              backend: str | None = None) -> np.ndarray:
    """coeffs uint64 [..., n] -> evals uint64 [..., n << rate_bits] on the
    coset shift*H. Bit-exact across backends."""
    backend = backend or os.environ.get("SVT_PROVER_LDE", "np")
    if backend == "np":
        return ntt_np.coset_lde(coeffs, rate_bits, shift)

    import jax

    from ..ops import gl64_jax as gj
    from ..ops import ntt_jax as ntj

    if backend == "jax":
        global _jit_coset_lde
        if _jit_coset_lde is None:
            _jit_coset_lde = jax.jit(ntj.coset_lde, static_argnums=(1, 2))
        x = gj.from_u64(coeffs)
        out = _jit_coset_lde(x, rate_bits, shift)
        return gj.to_u64(out)
    if backend == "mesh":
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import make_mesh

        mesh = make_mesh(axis="ntt")
        D = mesh.shape["ntt"]
        padded = _scaled_pad(coeffs, rate_bits, shift)
        n_lde = padded.shape[-1]
        if D < 2 or n_lde % (D * D):
            # mesh can't partition this transform; single-device fallback
            return coset_lde(coeffs, rate_bits, shift, backend="jax")
        spec = P(*([None] * (padded.ndim - 1) + ["ntt"]))
        x = jax.device_put(gj.from_u64(padded), NamedSharding(mesh, spec))
        out = ntj.ntt_4step(x, mesh, axis="ntt")
        return gj.to_u64(out)
    raise ValueError(f"unknown LDE backend {backend!r}")
