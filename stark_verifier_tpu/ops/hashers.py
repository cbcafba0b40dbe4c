"""Hash-config registry: the transcript/Merkle permutation is the single
switch point between `PoseidonGoldilocksConfig` and
`Bn254PoseidonGoldilocksConfig` (reference: bn245_poseidon/plonky2_config.rs:
53-104 — Hasher switches to the BN254 bridge sponge, InnerHasher stays
Goldilocks Poseidon, and the sponge protocol itself is unchanged width-12
rate-8 overwrite mode).

`get_permute(name, F)` returns a `permute(F, state12)` callable for the
backend: the plain Goldilocks Poseidon, or the 3-GL-per-Fr packed t=5 BN254
Poseidon (reference: bn245_poseidon/native.rs:43-77). For the numpy backend
the bridge permutation runs through the jitted JAX kernel (batched limb
Montgomery arithmetic; ops/fr_bn254_jax.py) — exact, and far faster than
python-int bigints for the prover's Merkle forests.
"""
from __future__ import annotations

import numpy as np

from . import poseidon_gl as pg

POSEIDON = "poseidon"
BN254 = "bn254"

_jit_bridge = None
# two pad tiers: tiny states (challenger, small batches) avoid 1024-lane
# waste; bulk Merkle hashing amortizes in 1024-wide chunks. Exactly two
# compiled shapes per process (XLA:CPU compiles of the Montgomery-limb
# graph cost ~50 s each).
_BRIDGE_CHUNK_SMALL = 32
_BRIDGE_CHUNK = 1024


def _bridge_permute_np(F, state):
    """Bridge permutation for the numpy backend: [12, ...] uint64 in/out.

    Prefers the native C plane (native/svt_bn254.c — 4x64-limb Montgomery
    CIOS, OpenMP over lanes; ~100x the jitted XLA:CPU chunk path, which
    made bn254-config proving/vk-building minute-to-hour scale); falls back
    to the jitted JAX kernel when the C plane is unavailable."""
    from .. import native

    if native.bn254_lib() is not None:
        return native.bridge_permute12_np(
            np.ascontiguousarray(np.asarray(state, np.uint64)))
    global _jit_bridge
    import jax

    from . import fr_bn254_jax as fr
    from . import gl64_jax as gj

    if _jit_bridge is None:
        _jit_bridge = jax.jit(fr.permute12_bridge)
    state = np.ascontiguousarray(np.asarray(state, np.uint64))
    shape = state.shape[1:]
    flat = state.reshape(12, -1)
    n = flat.shape[1]
    chunk = _BRIDGE_CHUNK_SMALL if n <= _BRIDGE_CHUNK_SMALL else _BRIDGE_CHUNK
    chunks = []
    for start in range(0, n, chunk):
        piece = flat[:, start : start + chunk]
        w = piece.shape[1]
        if w < chunk:
            piece = np.concatenate(
                [piece, np.zeros((12, chunk - w), np.uint64)], axis=1)
        out = gj.to_u64(_jit_bridge(gj.from_u64(piece)))
        chunks.append(out[:, :w])
    return np.concatenate(chunks, axis=1).reshape((12,) + shape)


def _bridge_permute_jax(F, state):
    from . import fr_bn254_jax as fr

    return fr.permute12_bridge(state)


def _bridge_permute_u64(F, state):
    """Bridge permutation for backends whose GF planes carry the full u64
    value (ops/gl64_cpu — XLA:CPU / multichip dryrun): rebuild the Fr
    kernel's 16-bit limb planes inside the trace and pack back."""
    import jax.numpy as jnp

    from . import fr_bn254_jax as fr
    from . import gl64_jax as gj

    v = state.l0  # all four planes carry the same u64 value
    limbs = gj.GF(*[
        jnp.asarray((v >> np.uint64(16 * i)) & np.uint64(0xFFFF), jnp.uint32)
        for i in range(4)
    ])
    out = fr.permute12_bridge(limbs)
    out64 = sum(
        jnp.asarray(out[i], jnp.uint64) << np.uint64(16 * i) for i in range(4)
    )
    return type(state)(out64, out64, out64, out64)


def get_permute(name: str, F):
    """Resolve a permutation callable for hash-config `name` and backend `F`."""
    if name in (None, POSEIDON):
        return pg.permute
    if name == BN254:
        if getattr(F, "U64_PLANES", False):
            return _bridge_permute_u64
        if getattr(F, "IS_JAX", False):
            return _bridge_permute_jax
        return _bridge_permute_np
    raise ValueError(f"unknown hasher config: {name}")
