"""Pinned known-answer tests for the hash/transcript primitives.

These literals were computed ONCE from the host golden models (whose
constants are extracted verbatim from the reference's tables:
poseidon_spec/constants.rs, bn245_poseidon/constants.rs via
tools/extract_constants.py) and are pinned so a regression cannot silently
re-derive both sides of a differential test. A transcript-order or constant
error anywhere in the stack changes every one of these values.
"""
import numpy as np
import pytest

from stark_verifier_tpu.core.challenger import Challenger
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.ops import poseidon_bn254 as pb
from stark_verifier_tpu.ops import poseidon_gl as pg

pytestmark = pytest.mark.quick

# Goldilocks Poseidon (t=12, R_F=8, R_P=22) permutation of [0, 1, ..., 11]
PERM12_0_11 = [
    15442313428170673822, 6009603122036124231, 15276919505380083749,
    7005999589691109842, 4703821519083557360, 14636568497518936639,
    7976624690322644239, 1802209762296193110, 17313479547752415775,
    16435059422334172133, 14537566946116046030, 6632157367509271963,
]

# hash_n_to_hash_no_pad([0..7]) (one absorb chunk, squeeze 4)
HASH8_0_7 = [
    17291601223193097753, 9133441755544524598, 17736579132324177718,
    14132891516240416332,
]

# Challenger: observe 1, 2, 3 then squeeze twice (pop-from-END semantics)
CHAL_123 = [12398646804117377360, 15781308336284228359]

# BN254 bridge: t=5 Poseidon permutation of [0..4], first two lanes
FR_PERM_0_4_LANES01 = [
    18821383157269793795438455681495246036402687001665670618754263018637548127333,
    7817711165059374331357136443537800893307845083525445872661165200086166013245,
]

# encode_fe([1, 2, 3]) = 1 + 2p + 3p^2
ENCODE_123 = 1020847100287446415507451981510486261766

# width-12 bridge permutation (pack 3GL/Fr -> t=5 permute -> unpack) of [0..11]
BRIDGE12_0_11 = [
    15673502368981435620, 6853850394430535188, 8095421145336214218,
    2466647745448974485, 10648081020231449483, 270704877705710796,
    13550077572597442179, 4983731579279891973, 3673761728876758652,
    11427651275083472224, 3091493248063384727, 7780042790156451771,
]


def test_kat_poseidon_permutation():
    st = pg.permute(gl, np.arange(12, dtype=np.uint64))
    assert [int(x) for x in st] == PERM12_0_11


def test_kat_hash_no_pad():
    h = pg.hash_no_pad(gl, [np.uint64(i) for i in range(8)])
    assert [int(x) for x in h] == HASH8_0_7


def test_kat_challenger():
    ch = Challenger(gl)
    for i in range(3):
        ch.observe_element(np.uint64(i + 1))
    assert [int(ch.get_challenge()) for _ in range(2)] == CHAL_123


def test_kat_bridge_fr_permutation():
    out = pb.permute_fr([0, 1, 2, 3, 4])
    assert out[:2] == FR_PERM_0_4_LANES01


def test_kat_encode_fe():
    assert pb.encode_fe([1, 2, 3]) == ENCODE_123


def test_kat_bridge_permute12():
    out = pb.permute_bn254_goldilocks(list(range(12)))
    assert [int(x) for x in out] == BRIDGE12_0_11


def test_kat_jax_backend_matches():
    """The JAX Poseidon path reproduces the pinned permutation literal."""
    from stark_verifier_tpu.ops import gl64_jax as gj

    st = pg.permute(gj, gj.from_u64(np.arange(12, dtype=np.uint64)[:, None]))
    assert [int(x) for x in gj.to_u64(st)[:, 0]] == PERM12_0_11
