"""Merkle tree build + path-to-cap verification roundtrip (np and JAX)."""
import numpy as np
import pytest

from stark_verifier_tpu.core.merkle import MerkleTree, verify_merkle_proof_to_cap
from stark_verifier_tpu.ops import gl64_jax as gj
from stark_verifier_tpu.ops import gl64_np as gl

pytestmark = pytest.mark.quick

rng = np.random.default_rng(7)


def rand(shape):
    return rng.integers(0, gl.P, size=shape, dtype=np.uint64)


def _verify(F, conv, tree, index, leaf, ok_expected=True, corrupt=False):
    depth = tree.depth
    bits = [(index >> k) & 1 for k in range(depth)]
    sibs = tree.prove(index)
    leaf = leaf.copy()
    if corrupt:
        leaf[0] ^= np.uint64(1)
    leaf_data = [conv(leaf[i]) for i in range(len(leaf))]
    index_bits = [np.asarray(b, dtype=np.uint32) for b in bits]
    siblings = [[conv(sibs[d, i]) for i in range(4)] for d in range(depth)]
    cap = conv(tree.cap)
    cap_index = np.asarray(index >> depth, dtype=np.int32)
    ok = verify_merkle_proof_to_cap(F, leaf_data, index_bits, siblings, cap, cap_index)
    assert bool(np.asarray(ok)) == ok_expected


def test_roundtrip_various_shapes():
    for n, leaf_len, cap_h in [(8, 4, 0), (16, 7, 2), (32, 1, 0), (64, 12, 3)]:
        leaves = rand((n, leaf_len))
        tree = MerkleTree(leaves, cap_h)
        for index in (0, 1, n // 2, n - 1):
            _verify(gl, lambda x: np.asarray(x, np.uint64), tree, index, leaves[index])
            _verify(gj, gj.from_u64, tree, index, leaves[index])


def test_rejects_corrupt_leaf():
    leaves = rand((16, 6))
    tree = MerkleTree(leaves, 1)
    _verify(gl, lambda x: np.asarray(x, np.uint64), tree, 5, leaves[5], False, corrupt=True)
    _verify(gj, gj.from_u64, tree, 5, leaves[5], False, corrupt=True)


def test_batched_queries_jax():
    """Verify several query indices at once with batched element arrays."""
    n, leaf_len, cap_h = 32, 5, 2
    leaves = rand((n, leaf_len))
    tree = MerkleTree(leaves, cap_h)
    idxs = np.array([0, 3, 17, 31])
    depth = tree.depth
    leaf_data = [gj.from_u64(leaves[idxs, i]) for i in range(leaf_len)]
    index_bits = [np.asarray((idxs >> k) & 1, dtype=np.uint32) for k in range(depth)]
    sib_stack = np.stack([tree.prove(int(i)) for i in idxs])  # [Q, depth, 4]
    siblings = [[gj.from_u64(sib_stack[:, d, i]) for i in range(4)] for d in range(depth)]
    cap_index = (idxs >> depth).astype(np.int32)
    ok = verify_merkle_proof_to_cap(
        gj, leaf_data, index_bits, siblings, gj.from_u64(tree.cap), cap_index
    )
    assert np.asarray(ok).all()


def test_save_load_roundtrip(tmp_path):
    """MerkleTree.save/load (the access-set tree cache) preserves leaves,
    levels, cap, and proof behavior."""
    leaves = rand((64, 4))
    t = MerkleTree(leaves, cap_height=2)
    p = tmp_path / "tree.npz"
    t.save(p)
    t2 = MerkleTree.load(p)
    assert (t2.leaves == t.leaves).all()
    assert t2.cap_height == t.cap_height and t2.depth == t.depth
    assert (t2.cap == t.cap).all()
    assert (t2.prove(13) == t.prove(13)).all()
    _verify(gl, lambda x: x, t2, 13, leaves[13])
