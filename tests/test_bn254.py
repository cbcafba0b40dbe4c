"""BN254-Poseidon bridge hash (Bn254PoseidonGoldilocksConfig semantics)."""
import numpy as np
import pytest

from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.ops import poseidon_bn254 as pb

pytestmark = pytest.mark.quick


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(1)
    limbs = rng.integers(0, gl.P, 3, dtype=np.uint64)
    fe = pb.encode_fe(limbs)
    back = pb.decode_fe(fe)
    assert [int(x) for x in limbs] == back


def test_permutation_properties():
    s1 = pb.permute_bn254_goldilocks(list(range(12)))
    s2 = pb.permute_bn254_goldilocks(list(range(12)))
    assert (s1 == s2).all()
    s3 = pb.permute_bn254_goldilocks([1] + list(range(1, 12)))
    assert not (s1 == s3).all()
    assert (s1 < np.uint64(gl.P)).all()


def test_fr_permutation_invertibility_shape():
    out = pb.permute_fr([1, 2, 3, 4, 5])
    assert len(out) == 5
    assert all(0 <= x < pb.FR_MODULUS for x in out)


def test_hash_no_pad_bridge():
    h = pb.hash_no_pad_bn254(list(range(10)))
    assert h.shape == (4,)
    h2 = pb.hash_no_pad_bn254(list(range(10)))
    assert (h == h2).all()


# ---------------------------------------------------------------- TPU (JAX)
# Differential tests of the limbed Montgomery Fr backend and the batched
# bridge permutation against the python-int host model.
def test_fr_jax_mont_mul_matches_host():
    import stark_verifier_tpu.ops.fr_bn254_jax as fr

    rng = np.random.default_rng(2)
    n = 8
    avals = [int(x) for x in rng.integers(0, 2**63, n, dtype=np.uint64)]
    bvals = [int(x) for x in rng.integers(0, 2**63, n, dtype=np.uint64)]
    # stretch to full 254-bit range
    avals = [(a * 0x123456789ABCDEF0123456789) % fr.Q for a in avals]
    bvals = [(b * 0xFEDCBA987654321FEDCBA98765) % fr.Q for b in bvals]
    avals += [0, 1, fr.Q - 1]
    bvals += [fr.Q - 1, fr.Q - 1, fr.Q - 1]
    a = fr.from_ints(avals)
    b = fr.from_ints(bvals)
    am, bm = fr.to_mont(a), fr.to_mont(b)
    got = fr.to_ints(fr.from_mont(fr.mont_mul(am, bm)))
    want = [(x * y) % fr.Q for x, y in zip(avals, bvals)]
    assert got == want
    got_add = fr.to_ints(fr.add(a, b))
    assert got_add == [(x + y) % fr.Q for x, y in zip(avals, bvals)]
    # Montgomery roundtrip
    assert fr.to_ints(fr.from_mont(fr.to_mont(a))) == [v % fr.Q for v in avals]


def test_fr_jax_encode_decode_matches_host():
    import stark_verifier_tpu.ops.fr_bn254_jax as fr
    from stark_verifier_tpu.ops import gl64_jax as gj

    rng = np.random.default_rng(3)
    n = 6
    limbs = rng.integers(0, gl.P, (3, n), dtype=np.uint64)
    enc = fr.encode_gl3(*(gj.from_u64(limbs[i]) for i in range(3)))
    want = [pb.encode_fe(limbs[:, k]) for k in range(n)]
    assert fr.to_ints(enc) == want
    # decode random Fr values (incl. the encodes themselves)
    digits = fr.decode_gl3(enc)
    for k in range(n):
        want_d = pb.decode_fe(want[k])
        got_d = [int(gj.to_u64(d)[k]) for d in digits]
        assert got_d == want_d


def test_fr_jax_permutation_matches_host():
    import jax
    import jax.numpy as jnp

    import stark_verifier_tpu.ops.fr_bn254_jax as fr

    rng = np.random.default_rng(4)
    n = 4
    states = [
        [(int(x) * 0x9E3779B97F4A7C150000 + i) % fr.Q
         for i, x in enumerate(rng.integers(0, 2**62, fr.T, dtype=np.uint64))]
        for _ in range(n)
    ]
    packed = jnp.stack(
        [fr.from_ints([s[i] for s in states]) for i in range(fr.T)], axis=1
    )  # [16, T, n]
    # jit: eager dispatch of the 68-round Montgomery graph is minutes-slow
    run = jax.jit(lambda p: fr.from_mont(fr.permute_fr_mont(fr.to_mont(p))))
    out = run(packed)
    for k in range(n):
        want = pb.permute_fr(states[k])
        got = fr.to_ints(out[:, :, k])
        assert got == want


def test_bridge_permute12_matches_host():
    import jax

    from stark_verifier_tpu.ops import gl64_jax as gj
    import stark_verifier_tpu.ops.fr_bn254_jax as fr

    rng = np.random.default_rng(5)
    n = 3
    state = rng.integers(0, gl.P, (12, n), dtype=np.uint64)
    got = gj.to_u64(jax.jit(fr.permute12_bridge)(gj.from_u64(state)))
    for k in range(n):
        want = pb.permute_bn254_goldilocks(state[:, k])
        assert (got[:, k] == want).all()
