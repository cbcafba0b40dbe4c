"""The prover's log-doubling closed forms (power-table polynomial
evaluation, suffix-sum DEEP quotient, prefix-scan Z product) must be
bit-identical to the sequential Horner/synthetic-division golden forms they
replaced — these run at every aggregation level on [*, B, 2^13..2^14]
arrays where an O(n)-python loop was the prover's wall-clock."""
import numpy as np

from stark_verifier_tpu.ops import ext2
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.prover import prove as PR

rng = np.random.default_rng(23)


def _rand_ext(shape):
    return (rng.integers(0, gl.P, shape, dtype=np.uint64),
            rng.integers(0, gl.P, shape, dtype=np.uint64))


def _horner_eval_batched(coeffs, point):
    P_, B, n = coeffs.shape
    acc = (np.zeros((P_, B), np.uint64), np.zeros((P_, B), np.uint64))
    pt = (point[0][None, :], point[1][None, :])
    for k in range(n - 1, -1, -1):
        acc = ext2.mul(gl, acc, pt)
        acc = (gl.add(acc[0], coeffs[:, :, k]), acc[1])
    return acc


def test_ext_powers():
    z = _rand_ext((3,))
    zp = PR._ext_powers(z, 21)
    acc = ext2.one(gl, (3,))
    for k in range(21):
        assert (zp[0][:, k] == acc[0]).all() and (zp[1][:, k] == acc[1]).all()
        acc = ext2.mul(gl, acc, z)


def test_poly_eval_batched_matches_horner():
    for n in (1, 2, 16, 100, 256):
        coeffs = rng.integers(0, gl.P, (5, 3, n), dtype=np.uint64)
        z = _rand_ext((3,))
        got = PR._poly_eval_batched(coeffs, z)
        want = _horner_eval_batched(coeffs, z)
        assert (got[0] == want[0]).all() and (got[1] == want[1]).all()


def test_poly_eval_shared_matches_horner():
    coeffs = rng.integers(0, gl.P, (4, 64), dtype=np.uint64)
    z = _rand_ext((2,))
    got = PR._poly_eval_ext(coeffs, z)
    want = _horner_eval_batched(
        np.broadcast_to(coeffs[:, None, :], (4, 2, 64)), z)
    assert (got[0] == want[0]).all() and (got[1] == want[1]).all()


def test_deep_quotient_matches_synthetic_division():
    for n in (2, 16, 128, 500):
        comp = _rand_ext((3, n))
        z = _rand_ext((3,))
        got = PR._deep_quotient(comp, z)
        want = PR._deep_quotient_horner(comp, z)
        assert (got[0] == want[0]).all() and (got[1] == want[1]).all()


def test_deep_quotient_division_property():
    """q(X)*(X-z) + comp(z) == comp(X): the defining identity."""
    n = 64
    comp = _rand_ext((2, n))
    z = _rand_ext((2,))
    q = PR._deep_quotient(comp, z)
    # multiply q by (X - z): shift-up minus z*q
    prod0 = np.zeros((2, n + 1), np.uint64)
    prod1 = np.zeros((2, n + 1), np.uint64)
    prod0[:, 1:], prod1[:, 1:] = q[0], q[1]
    zq = ext2.mul(gl, q, (z[0][:, None], z[1][:, None]))
    prod0[:, :n] = gl.sub(prod0[:, :n], zq[0])
    prod1[:, :n] = gl.sub(prod1[:, :n], zq[1])
    # add comp(z) to the constant term (ext coeffs: term-wise ext products)
    zp = PR._ext_powers(z, n)
    t = ext2.mul(gl, comp, zp)
    c_at_z = (PR._gl_sum_last(t[0]), PR._gl_sum_last(t[1]))
    prod0[:, 0] = gl.add(prod0[:, 0], c_at_z[0])
    prod1[:, 0] = gl.add(prod1[:, 0], c_at_z[1])
    assert (prod0[:, :n] == comp[0]).all() and (prod1[:, :n] == comp[1]).all()
    assert (prod0[:, n] == 0).all() and (prod1[:, n] == 0).all()
