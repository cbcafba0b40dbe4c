"""Merkle trees with caps (plonky2 layout) — prover-side build (numpy) and
backend-generic path verification.

Digest = 4 Goldilocks elements. Leaf hashing is `hash_or_noop`, inner nodes
are the 8->4 Poseidon compression (reference: chip/merkle_proof_chip.rs:39-87).
"""
from __future__ import annotations

import numpy as np

from ..ops import gl64_np as gnp
from ..ops import poseidon_gl as pg
from ..utils.bits import log2_strict


class MerkleTree:
    """Prover-side Merkle tree over numpy leaves.

    leaves: uint64 array [n, leaf_len] (n a power of two).
    cap_height h: the top h levels are cut off; the cap is the 2^h roots.
    """

    def __init__(self, leaves: np.ndarray, cap_height: int = 0):
        n, _ = leaves.shape
        bits = log2_strict(n)
        assert cap_height <= bits
        self.leaves = leaves
        self.cap_height = cap_height
        self.depth = bits - cap_height

        level = self._hash_leaves(leaves)  # [n, 4]
        self.levels = [level]
        for _ in range(self.depth):
            left = level[0::2]
            right = level[1::2]
            out = pg.two_to_one(
                gnp,
                [left[:, i] for i in range(4)],
                [right[:, i] for i in range(4)],
                shape=(left.shape[0],),
            )
            level = np.stack(out, axis=1)
            self.levels.append(level)
        self.cap = level  # [2^cap_height, 4]

    @staticmethod
    def _hash_leaves(leaves: np.ndarray) -> np.ndarray:
        n, w = leaves.shape
        cols = [leaves[:, i] for i in range(w)]
        out = pg.hash_or_noop(gnp, cols, shape=(n,))
        return np.stack(out, axis=1)

    def prove(self, index: int) -> np.ndarray:
        """Sibling digests from leaf level up to (not including) the cap:
        [depth, 4] uint64."""
        sibs = []
        idx = index
        for lvl in range(self.depth):
            sibs.append(self.levels[lvl][idx ^ 1])
            idx >>= 1
        return np.stack(sibs, axis=0) if sibs else np.zeros((0, 4), np.uint64)


def verify_merkle_proof_to_cap(F, leaf_data, index_bits, siblings, cap, cap_index):
    """Backend-generic path verification.

    leaf_data: list of elements (each possibly batched over queries)
    index_bits: list (length depth) of uint 0/1 arrays, little-endian
    siblings: list (length depth) of 4-element digest lists
    cap: stacked backend array [cap_size, 4] (no batch dims)
    cap_index: integer array selecting the cap entry
    Returns a boolean accept mask.
    """
    state = pg.hash_or_noop(F, leaf_data, shape=_shape_of(leaf_data[0]))
    for bit, sib in zip(index_bits, siblings):
        mask = bit != 0 if not _is_bool(bit) else bit
        left = [F.select(mask, sib[i], state[i]) for i in range(4)]
        right = [F.select(mask, state[i], sib[i]) for i in range(4)]
        state = pg.two_to_one(F, left, right, shape=_shape_of(state[0]))
    expected = F.take(cap, cap_index, axis=0)  # [..., 4]
    ok = None
    for i in range(4):
        eq = F.equal(_index_last(F, expected, i), state[i])
        ok = eq if ok is None else (ok & eq)
    return ok


def _shape_of(x):
    return getattr(x, "shape", np.shape(x))


def _is_bool(x):
    dt = getattr(x, "dtype", None)
    return dt is not None and dt == bool


def _index_last(F, stacked, i):
    """stacked[..., i] for a backend stacked array."""
    if hasattr(stacked, "lo"):  # GF pytree
        from ..ops.gl64_jax import GF

        return GF(stacked.lo[..., i], stacked.hi[..., i])
    return stacked[..., i]
