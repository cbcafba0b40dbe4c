"""NTT: numpy golden vs JAX local transform vs distributed 4-step NTT."""
import numpy as np
import pytest

from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.ops import ntt_np as nt

pytestmark = pytest.mark.quick

rng = np.random.default_rng(3)


def naive_eval(coeffs):
    n = len(coeffs)
    import math

    w = gl.primitive_root_of_unity(int(math.log2(n)))
    out = []
    for j in range(n):
        acc = 0
        x = pow(w, j, gl.P)
        for c in reversed(coeffs.tolist()):
            acc = (acc * x + int(c)) % gl.P
        out.append(acc)
    return np.array(out, dtype=np.uint64)


def test_ntt_np_vs_naive():
    for n in (2, 8, 32):
        c = rng.integers(0, gl.P, n, dtype=np.uint64)
        assert (nt.ntt(c) == naive_eval(c)).all(), n


def test_intt_roundtrip_and_coset():
    c = rng.integers(0, gl.P, (5, 64), dtype=np.uint64)
    assert (nt.intt(nt.ntt(c)) == c).all()
    shift = 7
    ev = nt.coset_fft(c, shift)
    assert (nt.coset_ifft(ev, shift) == c).all()
    # coset evals == p(shift * w^j)
    w = gl.primitive_root_of_unity(6)
    x0 = shift % gl.P
    acc = 0
    for k in reversed(c[0].tolist()):
        acc = (acc * x0 + int(k)) % gl.P
    assert int(ev[0, 0]) == acc


def test_ntt_jax_matches_np():
    import jax

    from stark_verifier_tpu.ops import gl64_jax as gj
    from stark_verifier_tpu.ops import ntt_jax as ntj

    c = rng.integers(0, gl.P, (2, 32), dtype=np.uint64)
    out = gj.to_u64(jax.jit(ntj.ntt)(gj.from_u64(c)))
    assert (out == nt.ntt(c)).all()
    lde = gj.to_u64(ntj.coset_lde(gj.from_u64(c), 2, 7))
    assert (lde == nt.coset_lde(c, 2, 7)).all()


def _run_4step(n):
    import jax

    from stark_verifier_tpu.ops import gl64_jax as gj
    from stark_verifier_tpu.ops import ntt_jax as ntj
    from stark_verifier_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, axis="ntt")
    c = rng.integers(0, gl.P, n, dtype=np.uint64)
    expect = nt.ntt(c)
    with mesh:
        got = gj.to_u64(ntj.ntt_4step(gj.from_u64(c), mesh, axis="ntt"))
    assert (got == expect).all()


def test_ntt_4step_distributed():
    """CI-speed all_to_all butterfly check: n=64 over 8 devices keeps the
    shard_map graph small enough for a sub-minute XLA:CPU compile."""
    _run_4step(64)


def test_ntt_4step_distributed_large():
    _run_4step(256)
