"""EXTERNAL parity anchor: plonky2's published Poseidon-Goldilocks vectors.

Every other expected value in this repo (pinned KATs, golden verifier,
fixtures) descends from this repo's own code plus constant tables extracted
from the reference.  These two vectors do NOT: they are the `test_vectors`
literals published in the plonky2 repository itself
(`plonky2/src/hash/poseidon_goldilocks.rs`, test `test_vectors`,
`check_test_vectors::<F>(test_vectors12)`), where plonky2 documents them as
"expected output calculated with (modified) hadeshash reference
implementation" — i.e. they were produced by a third implementation that
shares no code or constant-extraction path with either this repo or the
reference crate.

The reference crate's whole differential-test model is agreement with
plonky2-native (reference `chip/plonk/gates/gate_test.rs:154-176`,
`chip/hasher_chip.rs:262-275`); these vectors are exactly what plonky2-native
itself is tested against.  Agreement here therefore transitively anchors:

  * the round-constant and MDS tables (`ops/_poseidon_gl_constants.py`) —
    any extraction error changes every output limb;
  * the permutation schedule (4 full / 22 partial / 4 full rounds, x^7 sbox,
    constant-then-sbox-then-MDS ordering) in all four implementations
    (numpy golden, JAX planes `gl64_jax.permute12`, the Pallas TPU kernel,
    and the native C host plane), each checked directly below;
  * transitively, the fast-partial ("optimized") schedule in `core/gates.py`
    and the challenger/Merkle stack, which are differential-tested against
    `poseidon_gl.permute` elsewhere (tests/test_poseidon.py, test_kats.py).

plonky2 publishes a third vector (all-`u64::MAX` input, fed via
`from_noncanonical_u64`); its expected output is not pinned here (only
these two literals were recorded), so noncanonical-input handling is
instead exercised self-consistently below: raw u64 representatives >= p are
fed to every backend that accepts them (JAX planes, Pallas kernel, native
C) and must agree with the golden model on the canonicalized input.
"""
import numpy as np
import pytest

from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.ops import poseidon_gl as pg

P = (1 << 64) - (1 << 32) + 1

# ([u64 input; 12], [u64 expected; 12]) — literals from the plonky2 repo,
# src/hash/poseidon_goldilocks.rs (test_vectors12). Provenance is EXTERNAL
# to this repository; do not regenerate these from in-repo code.
PLONKY2_TEST_VECTORS_12 = [
    (
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [0x3C18A9786CB0B359, 0xC4055E3364A246C3, 0x7953DB0AB48808F4,
         0xC71603F33A1144CA, 0xD7709673896996DC, 0x46A84E87642F44ED,
         0xD032648251EE0B3C, 0x1C687363B207DF62, 0xDF8565563E8045FE,
         0x40F5B37FF4254DAE, 0xD070F637B431067C, 0x1792B1C4342109D7],
    ),
    (
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11],
        [0xD64E1E3EFC5B8E9E, 0x53666633020AAA47, 0xD40285597C6A8825,
         0x613A4F81E81231D2, 0x414754BFEBD051F0, 0xCB1F8980294A023F,
         0x6EB2A9E4D54A9D0F, 0x1902BC3AF467E056, 0xF045D5EAFDC6021F,
         0xE4150F77CAAA3BE5, 0xC9BFD01D39B50CCE, 0x5C0A27FCB0E1459B],
    ),
]


def _canon(ins):
    return np.array([x % P for x in ins], dtype=np.uint64)


@pytest.mark.quick
@pytest.mark.parametrize("ins,expected", PLONKY2_TEST_VECTORS_12)
def test_external_anchor_numpy_golden(ins, expected):
    out = pg.permute(gl, gl.stack(list(_canon(ins))))
    assert [int(x) for x in np.asarray(gl.unstack(out)).ravel()] == expected


@pytest.mark.quick
@pytest.mark.parametrize("ins,expected", PLONKY2_TEST_VECTORS_12)
def test_external_anchor_naive_schedule(ins, expected):
    """Force the reference (non-permute12) schedule in poseidon_gl: a tiny
    backend shim without `permute12` exercises the naive full/partial round
    loop rather than the backend's fused path."""

    class _Shim:
        add = staticmethod(gl.add)
        mul = staticmethod(gl.mul)
        const = staticmethod(gl.const)
        stack = staticmethod(gl.stack)
        unstack = staticmethod(gl.unstack)
        mds12 = staticmethod(gl.mds12)

    out = pg.permute(_Shim, gl.stack(list(_canon(ins))))
    assert [int(x) for x in np.asarray(gl.unstack(out)).ravel()] == expected


@pytest.mark.quick
@pytest.mark.parametrize("ins,expected", PLONKY2_TEST_VECTORS_12)
def test_external_anchor_jax_planes(ins, expected):
    from stark_verifier_tpu.ops import gl64_jax as gj

    st = gj.from_u64(_canon(ins)[:, None])
    out = gj.to_u64(pg.permute(gj, st))
    assert [int(x) for x in np.asarray(out)[:, 0]] == expected


@pytest.mark.quick
@pytest.mark.parametrize("ins,expected", PLONKY2_TEST_VECTORS_12)
def test_external_anchor_pallas_kernel(ins, expected):
    """The Pallas TPU kernel (interpret mode on CPU) hits the same anchor."""
    from stark_verifier_tpu.ops.pallas.poseidon_kernel import (
        poseidon_permute_batch,
    )

    c = _canon(ins)[:, None]
    lo = (c & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (c >> np.uint64(32)).astype(np.uint32)
    olo, ohi = poseidon_permute_batch(lo, hi, interpret=True)
    out = np.asarray(olo).astype(np.uint64) | (
        np.asarray(ohi).astype(np.uint64) << np.uint64(32)
    )
    assert [int(x) for x in out[:, 0]] == expected


@pytest.mark.quick
@pytest.mark.parametrize("ins,expected", PLONKY2_TEST_VECTORS_12)
def test_external_anchor_native_c(ins, expected):
    from stark_verifier_tpu import native

    if native.lib() is None:
        pytest.skip("native C plane not built")
    out = native.permute12_np(_canon(ins)[:, None])
    assert [int(x) for x in out[:, 0]] == expected


NONCANONICAL_INPUTS = [
    [0xFFFFFFFFFFFFFFFF] * 12,          # u64::MAX (plonky2's third vector's input)
    [P + i for i in range(12)],         # just above p
    [0xFFFFFFFF00000001 + 7, 2**64 - 2, P, 0, 1, P + 5, 2**63, P - 1,
     0xDEADBEEFDEADBEEF, P + 0xFFFFFFFF, 3, 2**64 - 1],
]


@pytest.mark.quick
@pytest.mark.parametrize("raw", NONCANONICAL_INPUTS)
def test_noncanonical_inputs_all_backends(raw):
    """Backends that accept raw u64 representatives >= p must canonicalize:
    feeding the raw values gives the same permutation as feeding x mod p to
    the golden model (plonky2 from_noncanonical_u64 semantics)."""
    raw = np.array([x & 0xFFFFFFFFFFFFFFFF for x in raw], dtype=np.uint64)
    golden = np.asarray(
        gl.unstack(pg.permute(gl, gl.stack(list(_canon(raw)))))
    ).ravel()

    from stark_verifier_tpu.ops import gl64_jax as gj

    out_jax = gj.to_u64(pg.permute(gj, gj.from_u64(raw[:, None])))
    assert (np.asarray(out_jax)[:, 0] == golden).all()

    from stark_verifier_tpu.ops.pallas.poseidon_kernel import (
        poseidon_permute_batch,
    )

    c = raw[:, None]
    lo = (c & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (c >> np.uint64(32)).astype(np.uint32)
    olo, ohi = poseidon_permute_batch(lo, hi, interpret=True)
    out_pl = np.asarray(olo).astype(np.uint64) | (
        np.asarray(ohi).astype(np.uint64) << np.uint64(32)
    )
    assert (out_pl[:, 0] == golden).all()

    from stark_verifier_tpu import native

    if native.lib() is not None:
        out_c = native.permute12_np(raw[:, None].copy())
        assert (out_c[:, 0] == golden).all()
