"""Differential tests: the u64 XLA:CPU field backend (`ops/gl64_cpu`)
against the numpy golden model (`ops/gl64_np`), including the edge cases the
reference's range-check gate pins down (reference:
chip/native_chip/arithmetic_chip.rs:19,98-107) and the Poseidon permutation
(reference: chip/plonk/gates/poseidon.rs — same constants/schedule)."""
import numpy as np
import pytest

from stark_verifier_tpu.ops import gl64_np as gl

pytestmark = pytest.mark.quick

gc = pytest.importorskip("stark_verifier_tpu.ops.gl64_cpu")

P = gl.P
EDGE = np.array(
    [0, 1, 2, P - 1, P - 2, (1 << 32) - 1, 1 << 32, P >> 1,
     0xFFFFFFFFFFFFFFFF, P, P + 1, 0xFFFFFFFF00000000],
    dtype=np.uint64,
)


def _rand(n, seed):
    rng = np.random.default_rng(seed)
    # full u64 range: representatives may be non-canonical
    return rng.integers(0, 1 << 64, size=n, dtype=np.uint64)


def _pairs():
    a = np.concatenate([EDGE, _rand(200, 1)])
    b = np.concatenate([EDGE[::-1], _rand(200, 2)])
    return a, b


def test_add_sub_mul_matches_golden():
    a, b = _pairs()
    ca, cb = a % P, b % P
    ga, gb = gc.from_u64(a), gc.from_u64(b)
    np.testing.assert_array_equal(gc.to_u64(gc.add(ga, gb)), gl.add(ca, cb))
    np.testing.assert_array_equal(gc.to_u64(gc.sub(ga, gb)), gl.sub(ca, cb))
    np.testing.assert_array_equal(gc.to_u64(gc.mul(ga, gb)), gl.mul(ca, cb))
    np.testing.assert_array_equal(gc.to_u64(gc.neg(ga)), gl.sub(0, ca))
    np.testing.assert_array_equal(
        gc.to_u64(gc.mul_add(ga, gb, ga)), gl.add(gl.mul(ca, cb), ca))


def test_mul_small_and_pow():
    a, _ = _pairs()
    ca = a % P
    ga = gc.from_u64(a)
    for k in (0, 1, 7, 49, 32767):
        np.testing.assert_array_equal(
            gc.to_u64(gc.mul_small(ga, k)), gl.mul(ca, k))
    np.testing.assert_array_equal(gc.to_u64(gc.pow_const(ga, 13)),
                                  gl.pow_const(ca, 13))


def test_inv_canonical_bits():
    a, _ = _pairs()
    ca = a % P
    ga = gc.from_u64(a)
    got = gc.to_u64(gc.inv(ga))
    want = np.where(ca == 0, 0, gl.inv(np.where(ca == 0, 1, ca)))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(np.asarray(gc.is_zero(ga)), ca == 0)
    np.testing.assert_array_equal(np.asarray(gc.equal(ga, gc.from_u64(ca))),
                                  np.ones_like(ca, bool))
    for i in (0, 1, 31, 32, 63):
        np.testing.assert_array_equal(
            np.asarray(gc.bit(ga, i), np.uint64), (ca >> np.uint64(i)) & 1)
    np.testing.assert_array_equal(
        np.asarray(gc.mod_pow2(ga, 12), np.uint64), ca & np.uint64(0xFFF))


def test_sum_axis0_golden():
    a = _rand(12 * 9, 3).reshape(12, 9)
    ca = a % P
    acc = np.zeros(9, np.uint64)
    for r in range(12):
        acc = gl.add(acc, ca[r])
    np.testing.assert_array_equal(gc.to_u64(gc.sum_axis0(gc.from_u64(a))), acc)


def test_mds12_golden():
    from stark_verifier_tpu.ops import gl64_jax as gj

    a = _rand(12 * 5, 4).reshape(12, 5)
    want = gj.to_u64(gj.mds12(gj.from_u64(a % P)))
    got = gc.to_u64(gc.mds12(gc.from_u64(a)))
    np.testing.assert_array_equal(got, want)


def test_permute12_matches_golden():
    from stark_verifier_tpu.ops import poseidon_gl as pg

    a = (_rand(12 * 7, 5) % P).reshape(12, 7)
    want = np.stack([pg.permute(gl, a[:, i]) for i in range(7)], axis=1)
    got = gc.to_u64(gc.permute12(gc.from_u64(a)))
    np.testing.assert_array_equal(got, want)


def test_structural_ops_roundtrip():
    a = _rand(10, 6) % P
    ga = gc.from_u64(a)
    st = gc.stack([gc.index(ga, i) for i in range(10)])
    np.testing.assert_array_equal(gc.to_u64(st), a)
    sel = gc.select(np.arange(10) % 2 == 0, ga, gc.zeros((10,)))
    np.testing.assert_array_equal(
        gc.to_u64(sel), np.where(np.arange(10) % 2 == 0, a, 0))
    tk = gc.take(ga, np.array([3, 1, 4]))
    np.testing.assert_array_equal(gc.to_u64(tk), a[[3, 1, 4]])
