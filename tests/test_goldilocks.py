"""Field arithmetic: numpy golden model vs python-int ground truth vs JAX
u32-pair backend (bit-exact)."""
import numpy as np
import pytest

from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.ops import gl64_jax as gj

pytestmark = pytest.mark.quick

P = gl.P
rng = np.random.default_rng(0)


def rand_u64(n):
    x = rng.integers(0, P, size=n, dtype=np.uint64)
    return x


EDGE = np.array(
    [0, 1, 2, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, P - 0xFFFFFFFF,
     0xFFFFFFFF00000000, 7, (P - 1) // 2],
    dtype=np.uint64,
)


def both(n=2048):
    return np.concatenate([EDGE, rand_u64(n)])


class TestNumpyGolden:
    def test_add(self):
        a, b = both(), both()[::-1].copy()
        expect = (a.astype(object) + b.astype(object)) % P
        got = gl.add(a, b).astype(object)
        assert (got == expect).all()

    def test_sub(self):
        a, b = both(), both()[::-1].copy()
        expect = (a.astype(object) - b.astype(object)) % P
        assert (gl.sub(a, b).astype(object) == expect).all()

    def test_mul(self):
        a, b = both(), both()[::-1].copy()
        expect = (a.astype(object) * b.astype(object)) % P
        assert (gl.mul(a, b).astype(object) == expect).all()

    def test_neg(self):
        a = both()
        expect = (-a.astype(object)) % P
        assert (gl.neg(a).astype(object) == expect).all()

    def test_inv(self):
        a = both()
        a = a[a != 0]
        got = gl.inv(a)
        assert (gl.mul(a, got) == 1).all()
        assert gl.inv(np.uint64(0)) == 0

    def test_pow(self):
        a = rand_u64(32)
        e = 0xDEADBEEF12345
        expect = np.array([pow(int(x), e, P) for x in a], dtype=object)
        assert (gl.pow_const(a, e).astype(object) == expect).all()

    def test_root_of_unity(self):
        for nb in (1, 2, 5, 20, 32):
            w = gl.primitive_root_of_unity(nb)
            assert pow(w, 1 << nb, P) == 1
            if nb > 0:
                assert pow(w, 1 << (nb - 1), P) == P - 1  # order exactly 2^nb


class TestJaxBackend:
    def test_roundtrip(self):
        a = both()
        assert (gj.to_u64(gj.from_u64(a)) == a).all()

    @pytest.mark.parametrize("op", ["add", "sub", "mul"])
    def test_binary_ops(self, op):
        a, b = both(), both()[::-1].copy()
        expect = getattr(gl, op)(a, b)
        got = gj.to_u64(getattr(gj, op)(gj.from_u64(a), gj.from_u64(b)))
        assert (got == expect).all(), op

    def test_neg(self):
        a = both()
        assert (gj.to_u64(gj.neg(gj.from_u64(a))) == gl.neg(a)).all()

    def test_inv(self):
        a = both()[:256]
        assert (gj.to_u64(gj.inv(gj.from_u64(a))) == gl.inv(a)).all()

    def test_pow_const(self):
        a = rand_u64(64)
        for e in (0, 1, 2, 7, P - 2):
            assert (
                gj.to_u64(gj.pow_const(gj.from_u64(a), e)) == gl.pow_const(a, e)
            ).all()

    def test_select_take_bits(self):
        a = both()[:64]
        g = gj.from_u64(a)
        mask = (a & 1).astype(bool)
        assert (
            gj.to_u64(gj.select(mask, g, gj.zeros(a.shape))) == np.where(mask, a, 0)
        ).all()
        idx = np.array([3, 1, 2], dtype=np.int32)
        assert (gj.to_u64(gj.take(g, idx)) == a[idx]).all()
        for i in (0, 5, 31, 32, 40, 63):
            assert (np.asarray(gj.bit(g, i)) == ((a >> np.uint64(i)) & np.uint64(1))).all()
        assert (np.asarray(gj.mod_pow2(g, 13)) == (a & np.uint64((1 << 13) - 1))).all()

    def test_jit_and_vmap(self):
        import jax

        a, b = rand_u64(128), rand_u64(128)
        f = jax.jit(lambda x, y: gj.mul_add(x, y, x))
        got = gj.to_u64(f(gj.from_u64(a), gj.from_u64(b)))
        assert (got == gl.mul_add(a, b, a)).all()
        vm = jax.vmap(gj.mul)(gj.from_u64(a.reshape(8, 16)), gj.from_u64(b.reshape(8, 16)))
        assert (gj.to_u64(vm) == gl.mul(a, b).reshape(8, 16)).all()


def test_mul_small_both_backends():
    """mul_small (small-constant multiply) matches the full mul, incl. edges.

    The JAX backend also accepts non-canonical representatives in [p, 2^64)."""
    edges = np.array([0, 1, P - 1, P - 2, 0xFFFFFFFF, P, 2**64 - 1],
                     dtype=np.uint64)
    a = np.concatenate([edges, rand_u64(64)])
    canon = a % np.uint64(P)
    for k in (0, 1, 2, 7, 49, 32767):
        want = gl.mul(canon, np.full_like(canon, np.uint64(k)))
        assert (gl.mul_small(canon, k) == want).all()
        got = gj.to_u64(gj.mul_small(gj.from_u64(a), k))
        assert (got == want).all()
