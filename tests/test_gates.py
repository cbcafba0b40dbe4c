"""Gate evaluator differential tests.

The key one mirrors the reference's per-gate differential strategy
(reference: gates/gate_test.rs:154-176): the PoseidonGate's fast-partial-
round schedule (with the FAST_PARTIAL_* derived tables) must agree with the
naive Poseidon permutation — witness-fill the gate and check (a) outputs
equal the naive permutation and (b) every constraint evaluates to zero."""
import numpy as np
import pytest

from stark_verifier_tpu.core import gates as G
from stark_verifier_tpu.core.rings import BaseRing, ExtRing
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.ops import poseidon_gl as pg

pytestmark = pytest.mark.quick

rng = np.random.default_rng(77)


def test_poseidon_gate_fast_schedule_matches_naive():
    inputs = [rng.integers(0, gl.P, (), dtype=np.uint64) for _ in range(12)]
    swap = np.uint64(0)
    wires_map, outputs = G.poseidon_witness_fill(gl, inputs, swap)
    naive = pg.permute(gl, np.stack(inputs))
    for i in range(12):
        assert outputs[i] == naive[i], i


def test_poseidon_gate_swap_semantics():
    inputs = [rng.integers(0, gl.P, (), dtype=np.uint64) for _ in range(12)]
    _, out_swapped = G.poseidon_witness_fill(gl, inputs, np.uint64(1))
    swapped = inputs[4:8] + inputs[0:4] + inputs[8:]
    naive = pg.permute(gl, np.stack(swapped))
    for i in range(12):
        assert out_swapped[i] == naive[i], i


def test_poseidon_gate_constraints_vanish_on_valid_witness():
    gate = G.PoseidonGate()
    inputs = [rng.integers(0, gl.P, (), dtype=np.uint64) for _ in range(12)]
    swap = np.uint64(1)
    wires_map, _ = G.poseidon_witness_fill(gl, inputs, swap)
    n_wires = gate.num_wires_used()
    R = BaseRing(gl)
    W = [wires_map.get(i, gl.zeros(())) for i in range(n_wires)]
    cs = gate.eval_unfiltered(R, [], W, None)
    assert len(cs) == gate.num_constraints
    for j, c in enumerate(cs):
        assert c == 0, f"constraint {j} != 0"


def test_poseidon_gate_native_eval_bit_exact():
    """The native-C constraint evaluator (svt_poseidon_eval_batch) must be
    bit-exact with the generic-ring schedule on random points AND vanish on
    a valid witness trace (reference constraint set:
    chip/plonk/gates/poseidon.rs:173-276)."""
    from stark_verifier_tpu import native as nat

    if nat.lib() is None or not hasattr(nat.lib(), "svt_poseidon_eval_batch"):
        pytest.skip("native plane unavailable")
    gate = G.PoseidonGate()
    n = 2048  # >= the native-dispatch threshold in _poseidon_eval_native
    W = [rng.integers(0, gl.P, n, dtype=np.uint64) for _ in range(135)]
    R = BaseRing(gl, (n,))
    saved = G._poseidon_eval_native
    try:
        G._poseidon_eval_native = lambda R, W: None
        ref = gate.eval_unfiltered(R, [], W, None)
    finally:
        G._poseidon_eval_native = saved
    fast = gate.eval_unfiltered(R, [], W, None)
    assert len(ref) == len(fast) == gate.num_constraints
    for j, (a, b) in enumerate(zip(ref, fast)):
        assert np.array_equal(a, b), f"constraint {j} mismatch"

    ins = [rng.integers(0, gl.P, n, dtype=np.uint64) for _ in range(12)]
    swap = rng.integers(0, 2, n, dtype=np.uint64)
    wires_map, _ = G.poseidon_witness_fill(gl, ins, swap)
    W2 = [wires_map[i] for i in range(135)]
    for j, c in enumerate(gate.eval_unfiltered(R, [], W2, None)):
        assert not c.any(), f"constraint {j} nonzero on valid witness"


def test_gate_registry_reference_ids():
    """Every gate-id string the reference dispatches on must resolve
    (reference: gates/mod.rs:138-203)."""
    ids = [
        "ArithmeticGate { num_ops: 20 }",
        "PublicInputGate",
        "NoopGate",
        "ConstantGate { num_consts: 2 }",
        "BaseSumGate { num_limbs: 63 } + Base: 2",
        "PoseidonGate(PhantomData<plonky2_field::goldilocks_field::GoldilocksField>)<WIDTH=12>",
        "PoseidonMdsGate(PhantomData<plonky2_field::goldilocks_field::GoldilocksField>)<WIDTH=12>",
        "RandomAccessGate { bits: 1, num_copies: 20, num_extra_constants: 0, _phantom: PhantomData<plonky2_field::goldilocks_field::GoldilocksField> }<D=2>",
        "RandomAccessGate { bits: 4, num_copies: 4, num_extra_constants: 2, _phantom: PhantomData<plonky2_field::goldilocks_field::GoldilocksField> }<D=2>",
        "ReducingExtensionGate { num_coeffs: 32 }",
        "ReducingGate { num_coeffs: 43 }",
        "ArithmeticExtensionGate { num_ops: 10 }",
        "MulExtensionGate { num_ops: 13 }",
        "BaseSumGate { num_limbs: 4 } + Base: 2",
    ]
    for s in ids:
        g = G.gate_from_id(s)
        assert g.id == s, (g.id, s)


def test_simple_gate_evaluators_base_vs_ext_consistency():
    """Evaluating over GF(p) and over GF(p^2) with c1=0 must agree."""
    for gate in (G.ArithmeticGate(4), G.BaseSumGate(6), G.ConstantGate(2),
                 G.ReducingGate(3), G.PoseidonMdsGate()):
        nw = gate.num_wires_used()
        wires = [rng.integers(0, gl.P, (), dtype=np.uint64) for _ in range(nw)]
        consts = [rng.integers(0, gl.P, (), dtype=np.uint64) for _ in range(max(2, gate.num_constants))]
        pi = [rng.integers(0, gl.P, (), dtype=np.uint64) for _ in range(4)]
        Rb = BaseRing(gl)
        Rx = ExtRing(gl)
        base = gate.eval_unfiltered(Rb, consts, wires, pi)
        ext = gate.eval_unfiltered(
            Rx,
            [(c, gl.zeros(())) for c in consts],
            [(w, gl.zeros(())) for w in wires],
            [(h, gl.zeros(())) for h in pi],
        )
        assert len(base) == len(ext) == gate.num_constraints
        for b, e in zip(base, ext):
            assert b == e[0] and e[1] == 0, gate.id


def test_poseidon_witness_fill_vectorized_matches_ref():
    """The stacked witness fill (recursion-prover hot spot) is bit-identical
    to the scalar reference schedule, including all recorded sbox wires."""
    import numpy as np

    from stark_verifier_tpu.core import gates as G
    from stark_verifier_tpu.ops import gl64_np as gl

    rng = np.random.default_rng(21)
    B = 3
    ins = [rng.integers(0, gl.P, B, dtype=np.uint64) for _ in range(12)]
    for swap in (np.zeros(B, np.uint64), np.ones(B, np.uint64)):
        w_new, out_new = G.poseidon_witness_fill(gl, ins, swap)
        w_ref, out_ref = G._poseidon_witness_fill_ref(gl, ins, swap)
        assert set(w_new) == set(w_ref)
        for k in w_ref:
            assert (np.asarray(w_new[k]) == np.asarray(w_ref[k])).all(), k
        for a, b in zip(out_new, out_ref):
            assert (np.asarray(a) == np.asarray(b)).all()
