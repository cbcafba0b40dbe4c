"""Poseidon permutation over Goldilocks (t=12, R_F=8, R_P=22, alpha=7) and
the plonky2 sponge constructions built on it.

Backend-generic (pass `gl64_np` or `gl64_jax` as `F`): the identical code is
the prover-side hash on host and the verifier-side hash on TPU, where the
batch dimension rides in the element arrays.

The schedule is the *naive* Poseidon schedule: constant layer over all 12
lanes, S-box over all lanes (full rounds) / lane 0 (partial rounds), dense
MDS. It is algebraically identical to plonky2's optimized sparse-MDS form
(which the PoseidonGate evaluator in core/gates.py replays constraint-exactly;
reference: chip/plonk/gates/poseidon.rs:593-697).

Sponge: width 12, rate 8, overwrite mode, no padding — matching plonky2's
`hash_n_to_m_no_pad` / `compress` as constrained by the reference hasher
(reference: chip/hasher_chip.rs:122-171, chip/merkle_proof_chip.rs:51-70).
"""
from __future__ import annotations

import numpy as np

from ._poseidon_gl_constants import (
    ALL_ROUND_CONSTANTS,
    HALF_N_FULL_ROUNDS,
    N_PARTIAL_ROUNDS,
    WIDTH,
)

RATE = 8
OUT = 4


def _sbox(F, x):
    x2 = F.mul(x, x)
    x3 = F.mul(x2, x)
    x4 = F.mul(x2, x2)
    return F.mul(x3, x4)


import os as _os

_USE_PALLAS = _os.environ.get("SVT_PALLAS") == "1"


def permute(F, state):
    """One Poseidon permutation; `state` is a stacked backend array with
    leading dimension 12 (use F.stack / F.unstack to build)."""
    assert state.shape[0] == WIDTH
    if hasattr(F, "permute12"):
        if _USE_PALLAS and getattr(F, "PALLAS_OK", False):
            # fused Pallas kernel (batch in the lane dim); falls back to the
            # XLA planes formulation for small/ragged batches
            from .pallas.poseidon_kernel import permute_gf

            return permute_gf(state)
        # backend-specialized compact-trace implementation (JAX lax.scan)
        return F.permute12(state)
    round_ctr = 0
    elems = F.unstack(state)

    def constant_layer(elems, rc):
        return [
            F.add(e, F.const(ALL_ROUND_CONSTANTS[i + WIDTH * rc]))
            for i, e in enumerate(elems)
        ]

    for _ in range(HALF_N_FULL_ROUNDS):
        elems = constant_layer(elems, round_ctr)
        elems = [_sbox(F, e) for e in elems]
        elems = F.unstack(F.mds12(F.stack(elems)))
        round_ctr += 1

    for _ in range(N_PARTIAL_ROUNDS):
        elems = constant_layer(elems, round_ctr)
        elems[0] = _sbox(F, elems[0])
        elems = F.unstack(F.mds12(F.stack(elems)))
        round_ctr += 1

    for _ in range(HALF_N_FULL_ROUNDS):
        elems = constant_layer(elems, round_ctr)
        elems = [_sbox(F, e) for e in elems]
        elems = F.unstack(F.mds12(F.stack(elems)))
        round_ctr += 1

    return F.stack(elems)


def absorb_chunks_scan(F, state, chunks, permute=permute):
    """Absorb `k` rate-8 chunks into `state` (list of 12) with ONE lax.scan
    (JAX backend): chunks is a list of k lists of <= 8 elements. A short
    chunk (overwrite-mode absorb of the sponge tail) is folded into the same
    scan with a per-position keep/overwrite mask, so every sponge call site
    carries exactly one inlined permutation body regardless of input length
    — the permutation body (especially the bn254 bridge's ~10k-eqn one)
    otherwise multiplies into the XLA compile time at every call site."""
    import jax
    import jax.numpy as jnp

    shape = state[0].shape
    k = len(chunks)
    full = all(len(ch) == RATE for ch in chunks)
    mask = np.zeros((k, RATE), bool)
    flat = []
    for ci, ch in enumerate(chunks):
        mask[ci, : len(ch)] = True
        flat.extend(F.add(e, F.zeros(shape)) for e in ch)
        flat.extend(F.zeros(shape) for _ in range(RATE - len(ch)))
    xs = F.reshape(F.stack(flat), (k, RATE) + shape)

    if full:
        def body(st, chunk):
            st = F.concat([chunk, F.index(st, slice(RATE, None))], axis=0)
            return permute(F, st), None

        st, _ = jax.lax.scan(body, F.stack(state), xs)
        return F.unstack(st)

    m = jnp.asarray(mask).reshape((k, RATE) + (1,) * len(shape))

    def body(st, x):
        chunk, mm = x
        front = F.select(mm, chunk, F.index(st, slice(0, RATE)))
        st = F.concat([front, F.index(st, slice(RATE, None))], axis=0)
        return permute(F, st), None

    st, _ = jax.lax.scan(body, F.stack(state), (xs, m))
    return F.unstack(st)


def hash_n_to_m_no_pad(F, inputs, num_outputs: int, shape=(), permute=permute):
    """plonky2 `hash_n_to_m_no_pad`: overwrite-mode absorb in chunks of 8
    (permute after every chunk, even a short final one), then squeeze from
    the front of the rate window. `permute` selects the hash config
    (reference: plonky2_config.rs:53-104 — the sponge protocol is identical
    for both configs, only the permutation differs)."""
    state = [F.zeros(shape) for _ in range(WIDTH)]
    n_chunks = (len(inputs) + RATE - 1) // RATE
    start0 = 0
    if getattr(F, "IS_JAX", False) and n_chunks >= 2:
        chunks = [inputs[i * RATE : (i + 1) * RATE] for i in range(n_chunks)]
        state = absorb_chunks_scan(F, state, chunks, permute=permute)
        start0 = n_chunks * RATE
    for start in range(start0, len(inputs), RATE):
        chunk = inputs[start : start + RATE]
        for i, e in enumerate(chunk):
            state[i] = e
        state = F.unstack(permute(F, F.stack(state)))
    outputs = []
    while True:
        for i in range(RATE):
            outputs.append(state[i])
            if len(outputs) == num_outputs:
                return outputs
        state = F.unstack(permute(F, F.stack(state)))


def hash_no_pad(F, inputs, shape=(), permute=permute):
    return hash_n_to_m_no_pad(F, inputs, OUT, shape, permute=permute)


def hash_or_noop(F, inputs, shape=(), permute=permute):
    """plonky2 `hash_or_noop`: <= 4 inputs are returned zero-padded raw,
    otherwise hash (reference: chip/merkle_proof_chip.rs:51-56)."""
    if len(inputs) <= OUT:
        return list(inputs) + [F.zeros(shape) for _ in range(OUT - len(inputs))]
    return hash_no_pad(F, inputs, shape, permute=permute)


def two_to_one(F, left, right, shape=(), permute=permute):
    """Merkle 8 -> 4 compression: permute [l0..l3, r0..r3, 0, 0, 0, 0] and
    take the first 4 lanes (reference: chip/merkle_proof_chip.rs:58-70)."""
    state = list(left) + list(right) + [F.zeros(shape) for _ in range(WIDTH - 2 * OUT)]
    state = F.unstack(permute(F, F.stack(state)))
    return state[:OUT]
