"""BN254-Poseidon bridge hash (Bn254PoseidonGoldilocksConfig semantics)."""
import numpy as np

from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.ops import poseidon_bn254 as pb


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
