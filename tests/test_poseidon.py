"""Poseidon permutation / sponge / challenger: numpy golden vs JAX backend."""
import numpy as np
import pytest

from stark_verifier_tpu.ops import gl64_jax as gj
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.ops import poseidon_gl as pg
from stark_verifier_tpu.core.challenger import Challenger

pytestmark = pytest.mark.quick

rng = np.random.default_rng(42)


def rand(shape):
    return rng.integers(0, gl.P, size=shape, dtype=np.uint64)


def test_mds12_matches_naive():
    from stark_verifier_tpu.ops._poseidon_gl_constants import (
        MDS_MATRIX_CIRC,
        MDS_MATRIX_DIAG,
    )

    s = rand((12, 7))
    fast = gl.mds12(s)
    # naive: res_r = sum_i circ[i] * s[(i+r)%12] + diag[r] * s[r]
    for r in range(12):
        acc = np.zeros(7, dtype=np.uint64)
        for i in range(12):
            acc = gl.add(acc, gl.mul(gl.const(MDS_MATRIX_CIRC[i], (7,)), s[(i + r) % 12]))
        acc = gl.add(acc, gl.mul(gl.const(MDS_MATRIX_DIAG[r], (7,)), s[r]))
        assert (fast[r] == acc).all(), r


def test_permute_np_vs_jax():
    s = rand((12, 5))
    out_np = pg.permute(gl, s)
    out_jx = gj.to_u64(pg.permute(gj, gj.from_u64(s)))
    assert (out_np == out_jx).all()


def test_permute_changes_and_deterministic():
    s = rand((12,))
    o1 = pg.permute(gl, s)
    o2 = pg.permute(gl, s.copy())
    assert (o1 == o2).all()
    assert not (o1 == s).all()


def test_hash_no_pad_np_vs_jax():
    for n in (1, 4, 8, 9, 16, 23):
        inputs = [rand((3,)) for _ in range(n)]
        h_np = pg.hash_no_pad(gl, inputs, shape=(3,))
        h_jx = pg.hash_no_pad(gj, [gj.from_u64(x) for x in inputs], shape=(3,))
        for a, b in zip(h_np, h_jx):
            assert (a == gj.to_u64(b)).all(), n


def test_challenger_np_vs_jax_and_semantics():
    obs = [rand(()) for _ in range(23)]
    cn = Challenger(gl)
    cj = Challenger(gj)
    for o in obs[:11]:
        cn.observe_element(o)
        cj.observe_element(gj.from_u64(o))
    a = cn.get_n_challenges(3)
    b = cj.get_n_challenges(3)
    for x, y in zip(a, b):
        assert x == gj.to_u64(y)
    # observing invalidates the output buffer
    cn.observe_element(obs[12])
    cj.observe_element(gj.from_u64(obs[12]))
    assert cn.get_challenge() == gj.to_u64(cj.get_challenge())
    # long squeeze crosses a permutation boundary
    a = cn.get_n_challenges(17)
    b = cj.get_n_challenges(17)
    for x, y in zip(a, b):
        assert x == gj.to_u64(y)


def test_challenger_pop_from_end():
    """First challenge after one permutation must be state[RATE-1]."""
    c = Challenger(gl)
    c.observe_element(gl.const(123))
    state = np.zeros(12, dtype=np.uint64)
    state[0] = 123
    out = pg.permute(gl, state)
    assert c.get_challenge() == out[7]
    assert c.get_challenge() == out[6]
