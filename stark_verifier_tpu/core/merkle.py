"""Merkle trees with caps (plonky2 layout) — prover-side build (numpy, with
arbitrary leading batch dims) and backend-generic path verification.

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

    leaves: uint64 array [..., n, leaf_len] (n a power of two; leading dims
    are independent batch trees).
    cap_height h: the top h levels are cut off; the cap is the 2^h roots.
    """

    def __init__(self, leaves: np.ndarray, cap_height: int = 0, permute=None):
        """`permute` selects the hash config (None = Goldilocks Poseidon;
        the BN254 bridge permutation for Bn254PoseidonGoldilocksConfig
        oracles; reference: plonky2_config.rs:70-75)."""
        n = leaves.shape[-2]
        bits = log2_strict(n)
        assert cap_height <= bits
        self.batch_shape = leaves.shape[:-2]
        self.leaves = leaves
        self.cap_height = cap_height
        self.depth = bits - cap_height
        self.permute = permute or pg.permute

        level = self._hash_leaves(leaves)  # [..., n, 4]
        self.levels = [level]
        for _ in range(self.depth):
            level = self._compress_level(level)
            self.levels.append(level)
        self.cap = level  # [..., 2^cap_height, 4]

    def _native(self):
        """The C hash plane, when it applies to this tree's hash config."""
        if self.permute is not pg.permute:
            return None  # e.g. the BN254 bridge permutation
        from .. import native

        L = native.lib()
        return native if L is not None else None

    def _compress_level(self, level: np.ndarray) -> np.ndarray:
        """One 8->4 compression level: [..., 2m, 4] -> [..., m, 4]."""
        nat = self._native()
        if nat is not None:
            # adjacent digest pairs stay adjacent under the flatten (each
            # tree's row count is even), so one C pass covers all trees
            flat = np.ascontiguousarray(level.reshape(-1, 4))
            out = nat.merkle_level_np(flat)
            return out.reshape(level.shape[:-2] + (level.shape[-2] // 2, 4))
        left = level[..., 0::2, :]
        right = level[..., 1::2, :]
        out = pg.two_to_one(
            gnp,
            [left[..., i] for i in range(4)],
            [right[..., i] for i in range(4)],
            shape=left.shape[:-1],
            permute=self.permute,
        )
        return np.stack(out, axis=-1)

    def _hash_leaves(self, leaves: np.ndarray) -> np.ndarray:
        w = leaves.shape[-1]
        nat = self._native()
        if nat is not None and w > 4:
            # whole rate-8 overwrite sponge in one C pass — the chunked
            # permute path below pays 2 full-state transposition copies per
            # rate chunk (17 chunks for a 135-wire leaf)
            flat = np.ascontiguousarray(leaves.reshape(-1, w))
            out = nat.hash_no_pad_np(flat)
            return out.reshape(leaves.shape[:-1] + (4,))
        cols = [leaves[..., i] for i in range(w)]
        out = pg.hash_or_noop(gnp, cols, shape=leaves.shape[:-1],
                              permute=self.permute)
        return np.stack(out, axis=-1)

    def prove(self, index: int) -> np.ndarray:
        """Sibling digests for an unbatched tree: [depth, 4] uint64."""
        assert self.batch_shape == ()
        sibs = []
        idx = index
        for lvl in range(self.depth):
            sibs.append(self.levels[lvl][idx ^ 1])
            idx >>= 1
        return np.stack(sibs, axis=0) if sibs else np.zeros((0, 4), np.uint64)

    def prove_batch(self, idx: np.ndarray) -> np.ndarray:
        """Sibling digests for index array `idx`.

        Unbatched tree: idx any shape -> [*idx.shape, depth, 4].
        Batched tree [B, ...]: idx [B, Q] -> [B, Q, depth, 4].
        """
        idx = np.asarray(idx)
        sibs = []
        cur = idx
        for lvl in range(self.depth):
            level = self.levels[lvl]
            s = cur ^ 1
            if self.batch_shape == ():
                sibs.append(level[s])  # [..., 4] fancy-indexed
            else:
                sibs.append(
                    np.take_along_axis(level, s[..., None].astype(np.int64), axis=-2)
                )
            cur = cur >> 1
        if not sibs:
            return np.zeros(idx.shape + (0, 4), np.uint64)
        return np.stack(sibs, axis=-2)

    def leaves_at(self, idx: np.ndarray) -> np.ndarray:
        """Leaf rows at `idx` (same batching rules as prove_batch)."""
        idx = np.asarray(idx)
        if self.batch_shape == ():
            return self.leaves[idx]
        return np.take_along_axis(
            self.leaves, idx[..., None].astype(np.int64), axis=-2
        )

    # ------------------------------------------------------------- caching
    def save(self, path):
        """Serialize leaves + all hash levels (skip the rebuild cost)."""
        np.savez_compressed(
            path, leaves=self.leaves, cap_height=self.cap_height,
            **{f"level_{i}": lv for i, lv in enumerate(self.levels)})

    @staticmethod
    def load(path) -> "MerkleTree":
        z = np.load(path)
        t = MerkleTree.__new__(MerkleTree)
        t.leaves = z["leaves"]
        t.cap_height = int(z["cap_height"])
        n = t.leaves.shape[-2]
        t.batch_shape = t.leaves.shape[:-2]
        t.depth = log2_strict(n) - t.cap_height
        t.permute = pg.permute
        t.levels = [z[f"level_{i}"] for i in range(t.depth + 1)]
        t.cap = t.levels[-1]
        return t


def verify_merkle_proof_to_cap(F, leaf_data, index_bits, siblings, cap,
                               cap_index, permute=None):
    """Backend-generic path verification.

    leaf_data: list of elements (each possibly batched over queries)
    index_bits: list (length depth) of uint 0/1 arrays, little-endian
    siblings: list (length depth) of 4-element digest lists
    cap: stacked backend array [cap_size, 4] (no batch dims)
    cap_index: integer array selecting the cap entry
    Returns a boolean accept mask.
    """
    permute = permute or pg.permute
    state = pg.hash_or_noop(F, leaf_data, shape=_shape_of(leaf_data[0]),
                            permute=permute)
    if getattr(F, "IS_JAX", False) and len(index_bits) >= 2:
        state = _merkle_walk_scan(F, state, index_bits, siblings, permute=permute)
    else:
        for bit, sib in zip(index_bits, siblings):
            mask = bit != 0 if not _is_bool(bit) else bit
            left = [F.select(mask, sib[i], state[i]) for i in range(4)]
            right = [F.select(mask, state[i], sib[i]) for i in range(4)]
            state = pg.two_to_one(F, left, right, shape=_shape_of(state[0]),
                                  permute=permute)
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
    if hasattr(stacked, "l0"):  # GF pytree
        from ..ops.gl64_jax import gmap

        return gmap(lambda a: a[..., i], stacked)
    return stacked[..., i]


def _merkle_walk_scan(F, state4, index_bits, siblings, permute=None):
    """Scan-based path walk (JAX): one lax.scan over the tree depth with a
    single Poseidon compression in the body."""
    import jax
    import jax.numpy as jnp

    permute = permute or pg.permute
    shape = _shape_of(state4[0])
    depth = len(index_bits)
    masks = jnp.stack(
        [jnp.broadcast_to(jnp.asarray(b != 0), shape) for b in index_bits]
    )  # [depth, ...] bool
    sibs = F.stack([F.stack([F.add(s, F.zeros(shape)) for s in sib]) for sib in siblings])
    # sibs: GF [depth, 4, ...]
    cap_zeros = F.zeros((4,) + shape)

    def body(st, xs):
        mask, sib = xs  # st, sib: GF [4, ...]; mask [...] bool
        left = F.select(mask, sib, st)
        right = F.select(mask, st, sib)
        st12 = F.concat([left, right, cap_zeros], axis=0)
        out = permute(F, st12)
        return F.index(out, slice(0, 4)), None

    st, _ = jax.lax.scan(body, F.stack(state4), (masks, sibs))
    return F.unstack(st)


def merkle_walk_scan_masked(F, state4, bits_mat, sibs, valid, permute=None):
    """Masked scan path walk (JAX): bits_mat [d, ...] uint, sibs GF
    [d, 4, ...], valid [d] bool — padded levels pass the state through."""
    import jax
    import jax.numpy as jnp

    permute = permute or pg.permute
    shape = _shape_of(state4[0])
    masks = jnp.broadcast_to(jnp.asarray(bits_mat != 0), bits_mat.shape[:1] + shape)
    cap_zeros = F.zeros((4,) + shape)
    validb = jnp.asarray(valid, dtype=bool)

    def body(st, xs):
        mask, sib, v = xs
        left = F.select(mask, sib, st)
        right = F.select(mask, st, sib)
        st12 = F.concat([left, right, cap_zeros], axis=0)
        out = F.index(permute(F, st12), slice(0, 4))
        return F.select(v, out, st), None

    st, _ = jax.lax.scan(body, F.stack(state4), (masks, sibs, validb))
    return F.unstack(st)
