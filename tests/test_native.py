"""Native C hash plane (native/svt_poseidon.c via stark_verifier_tpu/native)
vs the numpy golden model: permutation, sponge, Merkle compression, and the
Fiat-Shamir PoW grind must be bit-exact (reference semantics:
chip/hasher_chip.rs:61-171, chip/merkle_proof_chip.rs:58-70)."""
import numpy as np
import pytest

from stark_verifier_tpu import native
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.ops import poseidon_gl as pg

pytestmark = pytest.mark.quick

if native.lib() is None:
    pytest.skip("native hash plane unavailable (gcc build failed)",
                allow_module_level=True)

rng = np.random.default_rng(42)


def _numpy_permute12(state):
    """The pure-numpy fallback inside gl64_np.permute12, forced."""
    saved_lib, saved_tried = native._lib, native._tried
    native._lib, native._tried = None, True
    try:
        return gl.permute12(state)
    finally:
        native._lib, native._tried = saved_lib, saved_tried


def test_permute_matches_numpy_and_edge_values():
    s = rng.integers(0, gl.P, (12, 37), dtype=np.uint64)
    s[:, 0] = 0
    s[0, 1] = gl.P - 1  # canonical max
    got = native.permute12_np(s.copy())
    exp = _numpy_permute12(s.copy())
    assert (got == exp).all()
    # in-place safety: the caller's array must be untouched
    s2 = s.copy()
    native.permute12_np(s2)
    assert (s2 == s).all()


def test_hash_no_pad_matches_sponge():
    for w in (5, 8, 9, 139):
        rows = rng.integers(0, gl.P, (6, w), dtype=np.uint64)
        got = native.hash_no_pad_np(rows)
        exp = np.stack(
            pg.hash_no_pad(gl, [rows[:, i] for i in range(w)],
                           shape=(6,)), axis=-1)
        assert (got == exp).all(), w


def test_merkle_level_matches_two_to_one():
    level = rng.integers(0, gl.P, (16, 4), dtype=np.uint64)
    got = native.merkle_level_np(level)
    exp = np.stack(
        pg.two_to_one(gl,
                      [level[0::2, i] for i in range(4)],
                      [level[1::2, i] for i in range(4)],
                      shape=(8,)), axis=-1)
    assert (got == exp).all()


def test_grind_pow_matches_challenger_semantics():
    from stark_verifier_tpu.core.challenger import Challenger

    B, bits = 4, 8
    ch = Challenger(gl, shape=(B,))
    ch.observe_elements([rng.integers(0, gl.P, B, dtype=np.uint64)
                         for _ in range(11)])  # leaves 3 buffered inputs
    states = np.stack([np.broadcast_to(s, (B,)) for s in ch.state], axis=1)
    prefixes = np.stack(
        [np.broadcast_to(x, (B,)) for x in ch.input_buffer], axis=1)
    wit = native.grind_pow_np(states, prefixes, bits)
    for b in range(B):
        # replay: observing the witness then squeezing must clear pow_bits,
        # and no smaller witness may
        def response(w):
            c = Challenger(gl)
            c.state = [np.uint64(states[b, i]) for i in range(12)]
            c.input_buffer = [np.uint64(x) for x in prefixes[b]]
            c.observe_element(np.uint64(w))
            return int(c.get_challenge())

        assert response(wit[b]) >> (64 - bits) == 0
        for smaller in range(min(int(wit[b]), 50)):
            assert response(smaller) >> (64 - bits) != 0


# -------------------------------------------------- BN254 bridge C plane
def test_bn254_bridge_native_matches_golden():
    """native/svt_bn254.c (4x64-limb Montgomery CIOS) vs the python-int
    golden model (ops/poseidon_bn254.py), incl. non-canonical inputs
    (reference: bn245_poseidon/native.rs:43-77)."""
    from stark_verifier_tpu.ops import poseidon_bn254 as pb

    if native.bn254_lib() is None:
        pytest.skip("bn254 native plane unavailable")
    xs = rng.integers(0, 2**64, size=(8, 12), dtype=np.uint64)
    out = native.bridge_permute12_np(np.ascontiguousarray(xs.T))
    for k in range(8):
        ref = pb.permute_bn254_goldilocks([int(v) for v in xs[k]])
        assert [int(x) for x in out[:, k]] == [int(x) for x in ref]


def test_bn254_fr_permutation_native_matches_golden():
    from stark_verifier_tpu.ops import poseidon_bn254 as pb
    from stark_verifier_tpu.ops._poseidon_bn254_constants import FR_MODULUS

    if native.bn254_lib() is None:
        pytest.skip("bn254 native plane unavailable")
    vals = [int(rng.integers(0, 2**62)) for _ in range(5)]
    ref = [r % FR_MODULUS for r in pb.permute_fr(vals)]
    limbs = np.zeros((1, 5, 4), np.uint64)
    for i, v in enumerate(vals):
        for j in range(4):
            limbs[0, i, j] = (v >> (64 * j)) & 0xFFFFFFFFFFFFFFFF
    out = native.bn254_permute_fr_np(limbs)
    got = [sum(int(out[0, i, j]) << (64 * j) for j in range(4))
           for i in range(5)]
    assert got == ref


def test_bn254_bridge_native_matches_jax_kernel():
    """The C plane and the TPU limb kernel agree (both also pinned against
    the python golden elsewhere; this closes the triangle directly)."""
    import jax

    from stark_verifier_tpu.ops import fr_bn254_jax as fr
    from stark_verifier_tpu.ops import gl64_jax as gj

    if native.bn254_lib() is None:
        pytest.skip("bn254 native plane unavailable")
    xs = rng.integers(0, 2**64, size=(12, 4), dtype=np.uint64)
    want = gj.to_u64(jax.jit(fr.permute12_bridge)(gj.from_u64(xs)))
    got = native.bridge_permute12_np(xs)
    assert (got == want).all()


def test_merkle_tree_native_planes_bit_exact():
    """MerkleTree's native leaf-sponge + level-compression fast paths must
    reproduce the chunked python-permute build level by level (incl. the
    w<=4 hash_or_noop case and batched trees)."""
    from stark_verifier_tpu.core.merkle import MerkleTree

    for shape, cap in [((64, 135), 0), ((128, 7), 2), ((4, 256, 20), 3),
                       ((32, 4), 1), ((16, 3), 0)]:
        leaves = rng.integers(0, gl.P, shape, dtype=np.uint64)
        t_fast = MerkleTree(leaves, cap_height=cap)
        saved = MerkleTree._native
        try:
            MerkleTree._native = lambda self: None
            t_ref = MerkleTree(leaves, cap_height=cap)
        finally:
            MerkleTree._native = saved
        assert len(t_fast.levels) == len(t_ref.levels)
        for a, b in zip(t_fast.levels, t_ref.levels):
            assert np.array_equal(a, b), (shape, cap)
        assert np.array_equal(t_fast.cap, t_ref.cap)


def test_gl_add_sub_native_routes_bit_exact():
    """gl64_np.add/sub route big arrays through svt_gl_add_arr/sub_arr;
    must match the pure-numpy formulas for canonical AND non-canonical
    representatives (sub accepts any u64 reps)."""
    n = 20000  # above the 8192 routing threshold
    a = rng.integers(0, 2**64, n, dtype=np.uint64)
    b = rng.integers(0, 2**64, n, dtype=np.uint64)

    def ref_add(a, b):
        s = a + b
        s = s + (s < a).astype(np.uint64) * np.uint64(0xFFFFFFFF)
        return s - (s >= np.uint64(gl.P)).astype(np.uint64) * np.uint64(gl.P)

    def ref_sub(a, b):
        d = a - b
        d = d - (a < b).astype(np.uint64) * np.uint64(0xFFFFFFFF)
        return d - (d >= np.uint64(gl.P)).astype(np.uint64) * np.uint64(gl.P)

    assert np.array_equal(gl.add(a, b), ref_add(a, b))
    assert np.array_equal(gl.sub(a, b), ref_sub(a, b))
    ac = a % np.uint64(gl.P)
    bc = b % np.uint64(gl.P)
    assert np.array_equal(gl.add(ac, bc), ref_add(ac, bc))
    assert np.array_equal(gl.sub(ac, bc), ref_sub(ac, bc))
    # scalar-int second operand keeps working through the broadcast route
    assert np.array_equal(gl.add(ac, 7), ref_add(ac, np.uint64(7)))
