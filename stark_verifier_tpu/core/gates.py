"""plonky2 custom-gate constraint evaluators, ring-generic.

Each gate evaluates its unfiltered constraints over an abstract ring R
(core/rings.py): the verifier instantiates R = GF(p^2) at zeta, the prover
instantiates R = GF(p) vectorized over the LDE domain. This mirrors the
reference's CustomGateConstrainer registry (reference:
chip/plonk/gates/mod.rs:48-203) and plonky2's eval_unfiltered_ext/base split.

Wire layouts double as the witness layout used by the prover's builder.
"""
from __future__ import annotations

from .rings import (
    alg_add,
    alg_from_ring,
    alg_mul,
    alg_mul_add,
    alg_scalar_mul,
    alg_scalar_mul_add,
    alg_small_mul_add,
    alg_sub,
    alg_zero,
)
from ..ops._poseidon_gl_constants import (
    ALL_ROUND_CONSTANTS,
    FAST_PARTIAL_FIRST_ROUND_CONSTANT,
    FAST_PARTIAL_ROUND_CONSTANTS,
    FAST_PARTIAL_ROUND_INITIAL_MATRIX,
    FAST_PARTIAL_ROUND_VS,
    FAST_PARTIAL_ROUND_W_HATS,
    MDS_MATRIX_CIRC,
    MDS_MATRIX_DIAG,
)

T = 12
R_F_HALF = 4
R_P = 22

# Placeholder selector value for "no gate here" (reference: gates/mod.rs:30).
UNUSED_SELECTOR = (1 << 32) - 1


def _alg_wires(local_wires, start):
    """Two consecutive ext-algebra coefficients -> ((w0, w1)) pair."""
    return (local_wires[start], local_wires[start + 1])


class Gate:
    id: str = "?"
    degree: int = 0
    num_constraints: int = 0
    num_constants: int = 0  # gate-constant polynomials consumed

    def eval_unfiltered(self, R, local_constants, local_wires, pi_hash):
        raise NotImplementedError

    def num_wires_used(self) -> int:
        raise NotImplementedError

    def __repr__(self):
        return self.id


class ArithmeticGate(Gate):
    """out = c0 * m0 * m1 + c1 * addend, `num_ops` per row
    (reference: gates/arithmetic.rs)."""

    degree = 3
    num_constants = 2

    def __init__(self, num_ops=20):
        self.num_ops = num_ops
        self.id = f"ArithmeticGate {{ num_ops: {num_ops} }}"
        self.num_constraints = num_ops

    def wires(self, i):
        return (4 * i, 4 * i + 1, 4 * i + 2, 4 * i + 3)

    def num_wires_used(self):
        return 4 * self.num_ops

    def eval_unfiltered(self, R, C, W, pi):
        c0, c1 = C[0], C[1]
        if _is_jax_ext_ring(R):
            F = R.F
            from ..ops import ext2

            m0 = _se_stack(F, [W[4 * i] for i in range(self.num_ops)])
            m1 = _se_stack(F, [W[4 * i + 1] for i in range(self.num_ops)])
            ad = _se_stack(F, [W[4 * i + 2] for i in range(self.num_ops)])
            ou = _se_stack(F, [W[4 * i + 3] for i in range(self.num_ops)])
            computed = ext2.add(
                F, ext2.mul(F, ext2.mul(F, m0, m1), c0), ext2.mul(F, ad, c1)
            )
            return _se_unstack_1d(F, ext2.sub(F, ou, computed))
        out = []
        for i in range(self.num_ops):
            w0, w1, wa, wo = self.wires(i)
            computed = R.add(R.mul(R.mul(W[w0], W[w1]), c0), R.mul(W[wa], c1))
            out.append(R.sub(W[wo], computed))
        return out


class ArithmeticExtensionGate(Gate):
    """Same op over the D=2 extension algebra
    (reference: gates/arithmetic_extension.rs)."""

    degree = 3
    num_constants = 2

    def __init__(self, num_ops=10):
        self.num_ops = num_ops
        self.id = f"ArithmeticExtensionGate {{ num_ops: {num_ops} }}"
        self.num_constraints = 2 * num_ops

    def num_wires_used(self):
        return 8 * self.num_ops

    def eval_unfiltered(self, R, C, W, pi):
        c0, c1 = C[0], C[1]
        if _is_jax_ext_ring(R):
            # all ops on one stacked lane axis: each constraint only reads
            # wires, so the per-op loop is pure data parallelism
            m0 = _alg_stack(R, [_alg_wires(W, 8 * i) for i in range(self.num_ops)])
            m1 = _alg_stack(R, [_alg_wires(W, 8 * i + 2) for i in range(self.num_ops)])
            ad = _alg_stack(R, [_alg_wires(W, 8 * i + 4) for i in range(self.num_ops)])
            o = _alg_stack(R, [_alg_wires(W, 8 * i + 6) for i in range(self.num_ops)])
            computed = alg_scalar_mul_add(
                R, c1, ad, alg_scalar_mul(R, c0, alg_mul(R, m0, m1))
            )
            return _alg_unstack_pairs(R, alg_sub(R, o, computed))
        out = []
        for i in range(self.num_ops):
            b = 8 * i
            m0 = _alg_wires(W, b)
            m1 = _alg_wires(W, b + 2)
            ad = _alg_wires(W, b + 4)
            o = _alg_wires(W, b + 6)
            computed = alg_scalar_mul_add(
                R, c1, ad, alg_scalar_mul(R, c0, alg_mul(R, m0, m1))
            )
            d = alg_sub(R, o, computed)
            out.extend([d[0], d[1]])
        return out


class MulExtensionGate(Gate):
    """out = c0 * m0 * m1 over the extension algebra
    (reference: gates/multiplication_extension.rs)."""

    degree = 3
    num_constants = 1

    def __init__(self, num_ops=13):
        self.num_ops = num_ops
        self.id = f"MulExtensionGate {{ num_ops: {num_ops} }}"
        self.num_constraints = 2 * num_ops

    def num_wires_used(self):
        return 6 * self.num_ops

    def eval_unfiltered(self, R, C, W, pi):
        c0 = C[0]
        if _is_jax_ext_ring(R):
            m0 = _alg_stack(R, [_alg_wires(W, 6 * i) for i in range(self.num_ops)])
            m1 = _alg_stack(R, [_alg_wires(W, 6 * i + 2) for i in range(self.num_ops)])
            o = _alg_stack(R, [_alg_wires(W, 6 * i + 4) for i in range(self.num_ops)])
            computed = alg_scalar_mul(R, c0, alg_mul(R, m0, m1))
            return _alg_unstack_pairs(R, alg_sub(R, o, computed))
        out = []
        for i in range(self.num_ops):
            b = 6 * i
            m0 = _alg_wires(W, b)
            m1 = _alg_wires(W, b + 2)
            o = _alg_wires(W, b + 4)
            computed = alg_scalar_mul(R, c0, alg_mul(R, m0, m1))
            d = alg_sub(R, o, computed)
            out.extend([d[0], d[1]])
        return out


class BaseSumGate(Gate):
    """Base-2 decomposition: wire0 = sum of limb wires by powers of two,
    each limb boolean (reference: gates/base_sum.rs)."""

    degree = 2
    num_constants = 0
    WIRE_SUM = 0
    START_LIMBS = 1

    def __init__(self, num_limbs=63):
        self.num_limbs = num_limbs
        self.id = f"BaseSumGate {{ num_limbs: {num_limbs} }} + Base: 2"
        self.num_constraints = 1 + num_limbs

    def num_wires_used(self):
        return 1 + self.num_limbs

    def eval_unfiltered(self, R, C, W, pi):
        base = R.const(2)
        limbs = [W[self.START_LIMBS + i] for i in range(self.num_limbs)]
        computed = R.reduce_with_powers(base, limbs)
        out = [R.sub(computed, W[self.WIRE_SUM])]
        if _is_jax_ext_ring(R):
            F = R.F
            from ..ops import ext2

            st = _se_stack(F, limbs)
            boo = ext2.mul(F, st, ext2.sub(F, st, (F.ones(st[0].shape), F.zeros(st[0].shape))))
            out.extend(_se_unstack_1d(F, boo))
            return out
        for limb in limbs:
            # prod_{i<2} (limb - i) = limb * (limb - 1)
            out.append(R.mul(limb, R.sub(limb, R.one())))
        return out


class ConstantGate(Gate):
    """wire_i = const_i (reference: gates/constant.rs)."""

    degree = 1

    def __init__(self, num_consts=2):
        self.num_consts = num_consts
        self.num_constants = num_consts
        self.id = f"ConstantGate {{ num_consts: {num_consts} }}"
        self.num_constraints = num_consts

    def num_wires_used(self):
        return self.num_consts

    def eval_unfiltered(self, R, C, W, pi):
        return [R.sub(C[i], W[i]) for i in range(self.num_consts)]


class NoopGate(Gate):
    degree = 0
    id = "NoopGate"
    num_constraints = 0

    def num_wires_used(self):
        return 0

    def eval_unfiltered(self, R, C, W, pi):
        return []


class PublicInputGate(Gate):
    """wires 0..4 equal the public-inputs hash
    (reference: gates/public_input.rs)."""

    degree = 1
    id = "PublicInputGate"
    num_constraints = 4

    def num_wires_used(self):
        return 4

    def eval_unfiltered(self, R, C, W, pi):
        return [R.sub(W[i], pi[i]) for i in range(4)]


class RandomAccessGate(Gate):
    """Binary-indexed list access (reference: gates/random_access.rs)."""

    def __init__(self, bits, num_copies, num_extra_constants=0):
        self.bits = bits
        self.num_copies = num_copies
        self.num_extra_constants = num_extra_constants
        self.num_constants = num_extra_constants
        self.degree = bits + 1
        self.id = (
            f"RandomAccessGate {{ bits: {bits}, num_copies: {num_copies}, "
            f"num_extra_constants: {num_extra_constants}, _phantom: "
            f"PhantomData<plonky2_field::goldilocks_field::GoldilocksField> }}<D=2>"
        )
        self.num_constraints = num_copies * (2 + bits) + num_extra_constants

    def vec_size(self):
        return 1 << self.bits

    def wire_access_index(self, copy):
        return (2 + self.vec_size()) * copy

    def wire_claimed_element(self, copy):
        return (2 + self.vec_size()) * copy + 1

    def wire_list_item(self, i, copy):
        return (2 + self.vec_size()) * copy + 2 + i

    def start_extra_constants(self):
        return (2 + self.vec_size()) * self.num_copies

    def wire_extra_constant(self, i):
        return self.start_extra_constants() + i

    def num_routed_wires_used(self):
        return self.start_extra_constants() + self.num_extra_constants

    def wire_bit(self, i, copy):
        return self.num_routed_wires_used() + copy * self.bits + i

    def num_wires_used(self):
        return self.num_routed_wires_used() + self.num_copies * self.bits

    def eval_unfiltered(self, R, C, W, pi):
        if _is_jax_ext_ring(R):
            return self._eval_stacked(R, C, W)
        out = []
        for copy in range(self.num_copies):
            access_index = W[self.wire_access_index(copy)]
            items = [W[self.wire_list_item(i, copy)] for i in range(self.vec_size())]
            claimed = W[self.wire_claimed_element(copy)]
            bits = [W[self.wire_bit(i, copy)] for i in range(self.bits)]
            for b in bits:
                out.append(R.sub(R.mul(b, b), b))
            recon = R.reduce_with_powers(R.const(2), bits)
            out.append(R.sub(recon, access_index))
            for b in bits:
                items = [
                    # select(b, y, x) = b*(y-x) + x
                    R.mul_add(b, R.sub(items[2 * k + 1], items[2 * k]), items[2 * k])
                    for k in range(len(items) // 2)
                ]
            out.append(R.sub(items[0], claimed))
        for i in range(self.num_extra_constants):
            out.append(R.sub(C[i], W[self.wire_extra_constant(i)]))
        return out

    def _eval_stacked(self, R, C, W):
        """Identical math with the copies on a stacked lane axis (the copies
        are fully independent): one select-tree instead of num_copies."""
        F = R.F
        cn = self.num_copies
        bits_st = [
            _se_stack(F, [W[self.wire_bit(i, c)] for c in range(cn)])
            for i in range(self.bits)
        ]
        boo = [R.sub(R.mul(b, b), b) for b in bits_st]
        recon = R.reduce_with_powers(R.const(2), bits_st)
        ai = _se_stack(F, [W[self.wire_access_index(c)] for c in range(cn)])
        claimed = _se_stack(F, [W[self.wire_claimed_element(c)] for c in range(cn)])
        items = [
            _se_stack(F, [W[self.wire_list_item(i, c)] for c in range(cn)])
            for i in range(self.vec_size())
        ]
        for b in bits_st:
            items = [
                R.mul_add(b, R.sub(items[2 * k + 1], items[2 * k]), items[2 * k])
                for k in range(len(items) // 2)
            ]
        recon_d = R.sub(recon, ai)
        sel_d = R.sub(items[0], claimed)
        out = []
        for c in range(cn):
            for i in range(self.bits):
                out.append(_se_gate_row(F, boo[i], c))
            out.append(_se_gate_row(F, recon_d, c))
            out.append(_se_gate_row(F, sel_d, c))
        for i in range(self.num_extra_constants):
            out.append(R.sub(C[i], W[self.wire_extra_constant(i)]))
        return out


class ReducingGate(Gate):
    """Running Horner accumulator over base-field coefficients
    (reference: gates/reducing.rs)."""

    degree = 2
    num_constants = 0

    def __init__(self, num_coeffs=43):
        self.num_coeffs = num_coeffs
        self.id = f"ReducingGate {{ num_coeffs: {num_coeffs} }}"
        self.num_constraints = 2 * num_coeffs

    START_COEFFS = 6

    def wires_output(self):
        return 0

    def wires_alpha(self):
        return 2

    def wires_old_acc(self):
        return 4

    def wire_coeff(self, i):
        return self.START_COEFFS + i

    def start_accs(self):
        return self.START_COEFFS + self.num_coeffs

    def wires_acc(self, i):
        if i == self.num_coeffs - 1:
            return 0
        return self.start_accs() + 2 * i

    def num_wires_used(self):
        return self.start_accs() + 2 * (self.num_coeffs - 1)

    def eval_unfiltered(self, R, C, W, pi):
        alpha = _alg_wires(W, 2)
        acc = _alg_wires(W, 4)
        if _is_jax_ext_ring(R):
            # the Horner "chain" reads every accumulator from wires, so the
            # steps are independent constraints: stack them on a lane axis
            n = self.num_coeffs
            accs = [_alg_wires(W, self.wires_acc(i)) for i in range(n)]
            prevs = _alg_stack(R, [acc] + accs[:-1])
            coeffs = _alg_stack(R, [
                alg_from_ring(R, W[self.wire_coeff(i)]) for i in range(n)])
            accs_st = _alg_stack(R, accs)
            tmp = alg_sub(R, alg_mul_add(R, prevs, alpha, coeffs), accs_st)
            return _alg_unstack_pairs(R, tmp)
        out = []
        for i in range(self.num_coeffs):
            coeff = alg_from_ring(R, W[self.wire_coeff(i)])
            acc_i = _alg_wires(W, self.wires_acc(i))
            tmp = alg_sub(R, alg_mul_add(R, acc, alpha, coeff), acc_i)
            out.extend([tmp[0], tmp[1]])
            acc = acc_i
        return out


class ReducingExtensionGate(Gate):
    """Running Horner accumulator over extension coefficients
    (reference: gates/reducing_extension.rs)."""

    degree = 2
    num_constants = 0

    def __init__(self, num_coeffs=32):
        self.num_coeffs = num_coeffs
        self.id = f"ReducingExtensionGate {{ num_coeffs: {num_coeffs} }}"
        self.num_constraints = 2 * num_coeffs

    START_COEFFS = 6

    def wire_coeff(self, i):
        return self.START_COEFFS + 2 * i

    def start_accs(self):
        return self.START_COEFFS + 2 * self.num_coeffs

    def wires_acc(self, i):
        if i == self.num_coeffs - 1:
            return 0
        return self.start_accs() + 2 * i

    def num_wires_used(self):
        return self.start_accs() + 2 * (self.num_coeffs - 1)

    def eval_unfiltered(self, R, C, W, pi):
        alpha = _alg_wires(W, 2)
        acc = _alg_wires(W, 4)
        if _is_jax_ext_ring(R):
            n = self.num_coeffs
            accs = [_alg_wires(W, self.wires_acc(i)) for i in range(n)]
            prevs = _alg_stack(R, [acc] + accs[:-1])
            coeffs = _alg_stack(R, [
                _alg_wires(W, self.wire_coeff(i)) for i in range(n)])
            accs_st = _alg_stack(R, accs)
            tmp = alg_sub(R, alg_mul_add(R, prevs, alpha, coeffs), accs_st)
            return _alg_unstack_pairs(R, tmp)
        out = []
        for i in range(self.num_coeffs):
            coeff = _alg_wires(W, self.wire_coeff(i))
            acc_i = _alg_wires(W, self.wires_acc(i))
            tmp = alg_sub(R, alg_mul_add(R, acc, alpha, coeff), acc_i)
            out.extend([tmp[0], tmp[1]])
            acc = acc_i
        return out


class PoseidonMdsGate(Gate):
    """One width-12 MDS multiply over ext-algebra wires
    (reference: gates/poseidon_mds.rs)."""

    degree = 2
    num_constants = 0
    id = (
        "PoseidonMdsGate(PhantomData<plonky2_field::goldilocks_field::"
        "GoldilocksField>)<WIDTH=12>"
    )
    num_constraints = 2 * T

    def wires_input(self, i):
        return 2 * i

    def wires_output(self, i):
        return 2 * (T + i)

    def num_wires_used(self):
        return 4 * T

    def eval_unfiltered(self, R, C, W, pi):
        state = [_alg_wires(W, self.wires_input(i)) for i in range(T)]
        out = []
        for r in range(T):
            res = alg_zero(R)
            for i in range(T):
                res = alg_small_mul_add(R, MDS_MATRIX_CIRC[i], state[(i + r) % T], res)
            res = alg_small_mul_add(R, MDS_MATRIX_DIAG[r], state[r], res)
            d = alg_sub(R, _alg_wires(W, self.wires_output(r)), res)
            out.extend([d[0], d[1]])
        return out


class PoseidonGate(Gate):
    """Full width-12 Poseidon permutation, in plonky2's fast-partial-round
    wire layout (reference: gates/poseidon.rs:327-698). 123 constraints."""

    degree = 7
    num_constants = 0
    id = (
        "PoseidonGate(PhantomData<plonky2_field::goldilocks_field::"
        "GoldilocksField>)<WIDTH=12>"
    )
    num_constraints = 123

    WIRE_SWAP = 2 * T
    START_DELTA = 2 * T + 1
    START_FULL_0 = START_DELTA + 4
    START_PARTIAL = START_FULL_0 + T * (R_F_HALF - 1)
    START_FULL_1 = START_PARTIAL + R_P

    def wire_input(self, i):
        return i

    def wire_output(self, i):
        return T + i

    def wire_delta(self, i):
        return self.START_DELTA + i

    def wire_full_sbox_0(self, round, i):
        assert round != 0
        return self.START_FULL_0 + T * (round - 1) + i

    def wire_partial_sbox(self, round):
        return self.START_PARTIAL + round

    def wire_full_sbox_1(self, round, i):
        return self.START_FULL_1 + T * round + i

    def num_wires_used(self):
        return self.START_FULL_1 + T * R_F_HALF  # = 135

    @staticmethod
    def _sbox(R, x):
        x2 = R.square(x)
        x3 = R.mul(x2, x)
        x4 = R.square(x2)
        return R.mul(x3, x4)

    def _mds_row(self, R, state, r):
        res = R.zero()
        for i in range(T):
            res = R.add(R.small_mul(MDS_MATRIX_CIRC[i], state[(i + r) % T]), res)
        return R.add(R.small_mul(MDS_MATRIX_DIAG[r], state[r]), res)

    def _mds_layer(self, R, state):
        return [self._mds_row(R, state, r) for r in range(T)]

    def _constant_layer(self, R, state, round_ctr):
        return [
            R.add(s, R.const(ALL_ROUND_CONSTANTS[i + T * round_ctr]))
            for i, s in enumerate(state)
        ]

    def _partial_first_constant_layer(self, R, state):
        return [
            R.add(s, R.const(FAST_PARTIAL_FIRST_ROUND_CONSTANT[i]))
            for i, s in enumerate(state)
        ]

    def _mds_partial_layer_init(self, R, state):
        result = [R.zero() for _ in range(T)]
        result[0] = state[0]
        for r in range(1, T):
            for c in range(1, T):
                t = R.const(FAST_PARTIAL_ROUND_INITIAL_MATRIX[(r - 1) * (T - 1) + (c - 1)])
                result[c] = R.mul_add(t, state[r], result[c])
        return result

    def _mds_partial_layer_fast(self, R, state, r):
        d = R.small_mul(MDS_MATRIX_CIRC[0] + MDS_MATRIX_DIAG[0], state[0])
        for i in range(1, T):
            t = R.const(FAST_PARTIAL_ROUND_W_HATS[r * (T - 1) + (i - 1)])
            d = R.mul_add(t, state[i], d)
        result = [R.zero() for _ in range(T)]
        result[0] = d
        for i in range(1, T):
            t = R.const(FAST_PARTIAL_ROUND_VS[r * (T - 1) + (i - 1)])
            result[i] = R.mul_add(t, state[0], state[i])
        return result

    def eval_unfiltered(self, R, C, W, pi):
        if _is_jax_ext_ring(R):
            return _poseidon_eval_vectorized(self, R, W)
        native_out = _poseidon_eval_native(R, W)
        if native_out is not None:
            return native_out
        out = []
        swap = W[self.WIRE_SWAP]
        out.append(R.sub(R.mul(swap, swap), swap))
        for i in range(4):
            diff = R.sub(W[self.wire_input(i + 4)], W[self.wire_input(i)])
            out.append(R.sub(R.mul(swap, diff), W[self.wire_delta(i)]))

        state = [None] * T
        for i in range(4):
            state[i] = R.add(W[self.wire_input(i)], W[self.wire_delta(i)])
            state[i + 4] = R.sub(W[self.wire_input(i + 4)], W[self.wire_delta(i)])
        for i in range(8, T):
            state[i] = W[self.wire_input(i)]

        round_ctr = 0
        for r in range(R_F_HALF):
            state = self._constant_layer(R, state, round_ctr)
            if r != 0:
                for i in range(T):
                    sbox_in = W[self.wire_full_sbox_0(r, i)]
                    out.append(R.sub(state[i], sbox_in))
                    state[i] = sbox_in
            state = [self._sbox(R, s) for s in state]
            state = self._mds_layer(R, state)
            round_ctr += 1

        state = self._partial_first_constant_layer(R, state)
        state = self._mds_partial_layer_init(R, state)
        for r in range(R_P - 1):
            sbox_in = W[self.wire_partial_sbox(r)]
            out.append(R.sub(state[0], sbox_in))
            state[0] = self._sbox(R, sbox_in)
            state[0] = R.add(state[0], R.const(FAST_PARTIAL_ROUND_CONSTANTS[r]))
            state = self._mds_partial_layer_fast(R, state, r)
        sbox_in = W[self.wire_partial_sbox(R_P - 1)]
        out.append(R.sub(state[0], sbox_in))
        state[0] = self._sbox(R, sbox_in)
        state = self._mds_partial_layer_fast(R, state, R_P - 1)
        round_ctr += R_P

        for r in range(R_F_HALF):
            state = self._constant_layer(R, state, round_ctr)
            for i in range(T):
                sbox_in = W[self.wire_full_sbox_1(r, i)]
                out.append(R.sub(state[i], sbox_in))
                state[i] = sbox_in
            state = [self._sbox(R, s) for s in state]
            state = self._mds_layer(R, state)
            round_ctr += 1

        for i in range(T):
            out.append(R.sub(state[i], W[self.wire_output(i)]))
        return out


# ------------------------------------------------------------------ registry
def gate_from_id(gate_id: str) -> Gate:
    """Instantiate a gate from its plonky2 id string (reference:
    gates/mod.rs:138-203, extended to parameterized variants)."""
    import re

    s = gate_id.strip()
    if s == "PublicInputGate":
        return PublicInputGate()
    if s == "NoopGate":
        return NoopGate()
    m = re.match(r"ArithmeticGate \{ num_ops: (\d+) \}$", s)
    if m:
        return ArithmeticGate(int(m.group(1)))
    m = re.match(r"ArithmeticExtensionGate \{ num_ops: (\d+) \}$", s)
    if m:
        return ArithmeticExtensionGate(int(m.group(1)))
    m = re.match(r"MulExtensionGate \{ num_ops: (\d+) \}$", s)
    if m:
        return MulExtensionGate(int(m.group(1)))
    m = re.match(r"ConstantGate \{ num_consts: (\d+) \}$", s)
    if m:
        return ConstantGate(int(m.group(1)))
    m = re.match(r"BaseSumGate \{ num_limbs: (\d+) \} \+ Base: 2$", s)
    if m:
        return BaseSumGate(int(m.group(1)))
    m = re.match(r"ReducingGate \{ num_coeffs: (\d+) \}$", s)
    if m:
        return ReducingGate(int(m.group(1)))
    m = re.match(r"ReducingExtensionGate \{ num_coeffs: (\d+) \}$", s)
    if m:
        return ReducingExtensionGate(int(m.group(1)))
    if s.startswith("PoseidonGate"):
        return PoseidonGate()
    if s.startswith("PoseidonMdsGate"):
        return PoseidonMdsGate()
    m = re.match(
        r"RandomAccessGate \{ bits: (\d+), num_copies: (\d+), "
        r"num_extra_constants: (\d+), .*$",
        s,
    )
    if m:
        return RandomAccessGate(int(m.group(1)), int(m.group(2)), int(m.group(3)))
    raise ValueError(f"unknown gate id: {gate_id}")


def eval_filtered(R, gate, selector_index, group, num_selectors, row,
                  local_constants, local_wires, pi_hash, combined):
    """filter = prod_{k in group, k != row} (k - f(zeta)) [* (UNUSED - f)]
    then combined[j] += filter * constraint_j
    (reference: gates/mod.rs:87-132)."""
    f = local_constants[selector_index]
    ks = [k for k in group if k != row]
    if num_selectors > 1:
        ks.append(UNUSED_SELECTOR)
    filt = None
    for k in ks:
        term = R.sub(R.const(k), f)
        filt = term if filt is None else R.mul(filt, term)
    if filt is None:
        filt = R.one()
    constraints = gate.eval_unfiltered(
        R, local_constants[num_selectors:], local_wires, pi_hash
    )
    for j, c in enumerate(constraints):
        combined[j] = R.mul_add(filt, c, combined[j])
    return combined


def poseidon_witness_fill(F, inputs, swap):
    """Compute all PoseidonGate wire values (numpy backend) for given inputs.

    Vectorized over the stacked state [12, B] — the scalar reference
    schedule below (`_poseidon_witness_fill_ref`) made witness generation
    the recursion prover's hot spot (~1,350 tiny numpy calls per gate row).
    Bit-identical wires; differential-tested in tests/test_gates.py.
    """
    import numpy as np

    from ..ops import gl64_np as gl

    g = PoseidonGate()
    shape = np.broadcast_shapes(
        *[np.shape(x) for x in inputs], np.shape(swap))
    ins = np.stack([np.broadcast_to(np.asarray(x, np.uint64), shape)
                    for x in inputs])  # [12, *shape]
    sw = np.broadcast_to(np.asarray(swap, np.uint64), shape)

    # native C trace fill: one library call instead of ~220 numpy dispatches
    # on tiny [B] arrays (the recursion prover's hot spot — 3k chained gate
    # rows per aggregation circuit); bit-identical, differential-tested in
    # tests/test_gates.py against both python schedules
    from .. import native as _native

    if (_native.lib() is not None
            and hasattr(_native.lib(), "svt_poseidon_fill_batch")):
        flat = _native.poseidon_fill_np(
            np.ascontiguousarray(ins.reshape(12, -1)),
            np.ascontiguousarray(sw.reshape(-1)))
        wires = {wi: flat[wi].reshape(shape) for wi in range(135)}
        return wires, [wires[g.wire_output(i)] for i in range(T)]

    ex = (slice(None),) + (None,) * len(shape)

    wires = {}
    for i in range(T):
        wires[g.wire_input(i)] = ins[i]
    wires[g.WIRE_SWAP] = sw

    deltas = gl.mul(sw[None], gl.sub(ins[4:8], ins[0:4]))  # [4, *shape]
    for i in range(4):
        wires[g.wire_delta(i)] = deltas[i]
    state = ins.copy()
    state[0:4] = gl.add(ins[0:4], deltas)
    state[4:8] = gl.sub(ins[4:8], deltas)

    rc = np.asarray(ALL_ROUND_CONSTANTS, np.uint64).reshape(30, T)

    def sbox_all(s):
        s2 = gl.mul(s, s)
        return gl.mul(gl.mul(s2, s), gl.mul(s2, s2))

    round_ctr = 0
    for r in range(R_F_HALF):
        state = gl.add(state, rc[round_ctr][ex])
        if r != 0:
            for i in range(T):
                wires[g.wire_full_sbox_0(r, i)] = state[i]
        state = gl.mds12(sbox_all(state))
        round_ctr += 1

    state = gl.add(
        state, np.asarray(FAST_PARTIAL_FIRST_ROUND_CONSTANT, np.uint64)[ex])
    # partial-layer init: out[c] = sum_r IM[r-1, c-1] * state[r], out[0]=s0
    IM = np.asarray(
        FAST_PARTIAL_ROUND_INITIAL_MATRIX, np.uint64).reshape(T - 1, T - 1)
    prod = gl.mul(IM[(Ellipsis,) + (None,) * len(shape)], state[1:, None])
    init = np.empty_like(state)
    init[0] = state[0]
    init[1:] = gl.sum_axis0(prod)  # [11(c), *shape], summed over r
    state = init

    WH = np.asarray(FAST_PARTIAL_ROUND_W_HATS, np.uint64).reshape(R_P, T - 1)
    VS = np.asarray(FAST_PARTIAL_ROUND_VS, np.uint64).reshape(R_P, T - 1)
    M0 = MDS_MATRIX_CIRC[0] + MDS_MATRIX_DIAG[0]
    for r in range(R_P):
        wires[g.wire_partial_sbox(r)] = state[0]
        s0 = sbox_all(state[0])
        if r < R_P - 1:
            s0 = gl.add(s0, np.uint64(FAST_PARTIAL_ROUND_CONSTANTS[r]))
        d = gl.add(gl.mul_small(s0, M0),
                   gl.sum_axis0(gl.mul(WH[r][ex], state[1:])))
        rest = gl.add(gl.mul(VS[r][ex], s0[None]), state[1:])
        state = np.concatenate([d[None], rest], axis=0)
    round_ctr += R_P

    for r in range(R_F_HALF):
        state = gl.add(state, rc[round_ctr][ex])
        for i in range(T):
            wires[g.wire_full_sbox_1(r, i)] = state[i]
        state = gl.mds12(sbox_all(state))
        round_ctr += 1

    for i in range(T):
        wires[g.wire_output(i)] = state[i]
    return wires, list(state)


def _poseidon_witness_fill_ref(F, inputs, swap):
    """Scalar reference schedule (kept as the differential oracle for the
    vectorized fill above)."""
    from .rings import BaseRing

    g = PoseidonGate()
    shape = getattr(inputs[0], "shape", ())
    R = BaseRing(F, shape)
    wires = {}
    for i in range(T):
        wires[g.wire_input(i)] = inputs[i]
    wires[g.WIRE_SWAP] = swap

    deltas = []
    for i in range(4):
        d = F.mul(swap, F.sub(inputs[i + 4], inputs[i]))
        wires[g.wire_delta(i)] = d
        deltas.append(d)

    state = [None] * T
    for i in range(4):
        state[i] = F.add(inputs[i], deltas[i])
        state[i + 4] = F.sub(inputs[i + 4], deltas[i])
    for i in range(8, T):
        state[i] = inputs[i]

    round_ctr = 0
    for r in range(R_F_HALF):
        state = g._constant_layer(R, state, round_ctr)
        if r != 0:
            for i in range(T):
                wires[g.wire_full_sbox_0(r, i)] = state[i]
        state = [g._sbox(R, s) for s in state]
        state = g._mds_layer(R, state)
        round_ctr += 1

    state = g._partial_first_constant_layer(R, state)
    state = g._mds_partial_layer_init(R, state)
    for r in range(R_P - 1):
        wires[g.wire_partial_sbox(r)] = state[0]
        state[0] = g._sbox(R, state[0])
        state[0] = R.add(state[0], R.const(FAST_PARTIAL_ROUND_CONSTANTS[r]))
        state = g._mds_partial_layer_fast(R, state, r)
    wires[g.wire_partial_sbox(R_P - 1)] = state[0]
    state[0] = g._sbox(R, state[0])
    state = g._mds_partial_layer_fast(R, state, R_P - 1)
    round_ctr += R_P

    for r in range(R_F_HALF):
        state = g._constant_layer(R, state, round_ctr)
        for i in range(T):
            wires[g.wire_full_sbox_1(r, i)] = state[i]
        state = [g._sbox(R, s) for s in state]
        state = g._mds_layer(R, state)
        round_ctr += 1

    for i in range(T):
        wires[g.wire_output(i)] = state[i]
    return wires, state


# ------------------------------------------------ vectorized Poseidon eval
def _is_jax_ext_ring(R):
    from .rings import ExtRing

    return isinstance(R, ExtRing) and getattr(R.F, "IS_JAX", False)


def _poseidon_eval_native(R, W):
    """Native-C fast path for PoseidonGate.eval_unfiltered over the numpy
    BaseRing (the prover's quotient pass on the LDE coset): one library
    call instead of ~2,600 whole-array numpy ops. Returns None when the
    ring/backend doesn't qualify; bit-exactness vs the generic schedule is
    pinned in tests/test_gates.py."""
    import numpy as np

    from .rings import BaseRing

    if not (isinstance(R, BaseRing)
            and getattr(R.F, "__name__", "").endswith("gl64_np")):
        return None
    from .. import native as _native

    if _native.lib() is None or not hasattr(
            _native.lib(), "svt_poseidon_eval_batch"):
        return None
    shape = R.shape
    n = int(np.prod(shape)) if shape else 1
    if n < 1024:
        return None  # tiny evals: numpy dispatch is cheaper than the copy
    if hasattr(_native.lib(), "svt_poseidon_eval_batch_p"):
        out = _native.poseidon_eval_planes_np(
            [np.broadcast_to(np.asarray(w, np.uint64), shape)
             for w in W[:135]])
    else:
        wires = np.stack([
            np.broadcast_to(np.asarray(w, np.uint64), shape) for w in W[:135]
        ]).reshape(135, n)
        out = _native.poseidon_eval_np(wires)
    return [out[i].reshape(shape) for i in range(123)]


def _se_stack(F, ext_list):
    """list of (c0, c1) -> stacked ext pair (GF[k,...], GF[k,...])."""
    import jax.numpy as jnp

    shape = jnp.broadcast_shapes(*[e[0].shape for e in ext_list])
    z = F.zeros(shape)

    def b(x):
        from ..ops.gl64_jax import gmap

        return gmap(lambda a: jnp.broadcast_to(a, shape), x)

    return (
        F.stack([b(e[0]) for e in ext_list]),
        F.stack([b(e[1]) for e in ext_list]),
    )


def _se_unstack(F, se):
    return list(zip(F.unstack(se[0]), F.unstack(se[1])))


def _se_gate_row(F, se, k):
    """Row k of a stacked ext pair -> plain (c0, c1)."""
    return (F.index(se[0], k), F.index(se[1], k))


def _alg_stack(R, alg_list):
    """List of ext-algebra elements ((c0,c1),(d0,d1)) -> one algebra element
    whose two ext components carry a stacked leading lane axis. Both
    components are broadcast to one common trailing shape first (a component
    may be a scalar-shaped zero, e.g. from alg_from_ring)."""
    import jax.numpy as jnp

    from ..ops.gl64_jax import gmap

    F = R.F
    shape = jnp.broadcast_shapes(
        *[c[0].shape for a in alg_list for c in (a[0], a[1])])

    def b(e):
        return (
            gmap(lambda x: jnp.broadcast_to(x, shape), e[0]),
            gmap(lambda x: jnp.broadcast_to(x, shape), e[1]),
        )

    return (
        _se_stack(F, [b(a[0]) for a in alg_list]),
        _se_stack(F, [b(a[1]) for a in alg_list]),
    )


def _alg_unstack_pairs(R, alg):
    """Stacked algebra element -> flat constraint list [a0_row, a1_row, ...]
    in per-lane order (the order the unrolled loops emit)."""
    F = R.F
    k = alg[0][0].l0.shape[0]
    out = []
    for i in range(k):
        out.append(_se_gate_row(F, alg[0], i))
        out.append(_se_gate_row(F, alg[1], i))
    return out


def _se_const_u64(F, vals, ndim_extra):
    """u64 vector constants -> GF [k] broadcast over trailing dims."""
    import numpy as np

    arr = np.asarray(vals, dtype=np.uint64).reshape((len(vals),) + (1,) * ndim_extra)
    return F.from_u64(arr)


def _poseidon_eval_vectorized(gate, R, W):
    """PoseidonGate constraints with lanes stacked into GF arrays and round
    loops as lax.scans — identical math to eval_unfiltered, compact trace."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ops import ext2

    F = R.F
    out_scalar = []

    swap = W[gate.WIRE_SWAP]
    out_scalar.append(R.sub(R.mul(swap, swap), swap))
    for i in range(4):
        diff = R.sub(W[gate.wire_input(i + 4)], W[gate.wire_input(i)])
        out_scalar.append(R.sub(R.mul(swap, diff), W[gate.wire_delta(i)]))

    state_list = [None] * T
    for i in range(4):
        state_list[i] = R.add(W[gate.wire_input(i)], W[gate.wire_delta(i)])
        state_list[i + 4] = R.sub(W[gate.wire_input(i + 4)], W[gate.wire_delta(i)])
    for i in range(8, T):
        state_list[i] = W[gate.wire_input(i)]

    se = _se_stack(F, state_list)  # stacked ext: pair of GF [12, ...]
    nd = se[0].l0.ndim - 1
    shape = se[0].l0.shape[1:]

    def cvec(vals, width):
        return F.from_u64(np.asarray(vals, np.uint64).reshape((width,) + (1,) * nd))

    def sbox_all(x):
        x2 = ext2.mul(F, x, x)
        x3 = ext2.mul(F, x2, x)
        return ext2.mul(F, x3, ext2.mul(F, x2, x2))

    def mds_full(x):
        return (F.mds12(x[0]), F.mds12(x[1]))

    rc = np.asarray(ALL_ROUND_CONSTANTS, np.uint64).reshape(30, T)

    def full_rounds_scan(se, rounds, wire_rows, rcs):
        """rounds with sbox-input wire records; emits [k, 12, ...] diffs."""
        wires0 = _se_stack(F, [w for row in wire_rows for w in row])
        k = len(wire_rows)
        wires = (
            F.reshape(wires0[0], (k, T) + shape),
            F.reshape(wires0[1], (k, T) + shape),
        )
        rcs_gf = F.from_u64(np.asarray(rcs, np.uint64).reshape((k, T) + (1,) * nd))

        def body(st, xs):
            w0, w1, rcv = xs
            st = (F.add(st[0], rcv), st[1])
            d = ext2.sub(F, st, (w0, w1))
            st = (w0, w1)
            st = sbox_all(st)
            st = mds_full(st)
            return st, d

        st, diffs = jax.lax.scan(body, se, (wires[0], wires[1], rcs_gf))
        return st, diffs

    # ---- first full rounds: round 0 unrolled (no wires), rounds 1..3 scanned
    se = (F.add(se[0], cvec(rc[0], T)), se[1])
    se = sbox_all(se)
    se = mds_full(se)
    wire_rows = [[W[gate.wire_full_sbox_0(r, i)] for i in range(T)] for r in range(1, R_F_HALF)]
    se, diffs = full_rounds_scan(se, R_F_HALF - 1, wire_rows, rc[1:R_F_HALF])
    out_scalar.extend(_se_unstack_2d(F, diffs))

    # ---- partial rounds
    se = (F.add(se[0], cvec(FAST_PARTIAL_FIRST_ROUND_CONSTANT, T)), se[1])
    M = np.asarray(FAST_PARTIAL_ROUND_INITIAL_MATRIX, np.uint64).reshape(T - 1, T - 1)
    Mg = F.from_u64(M.reshape((T - 1, T - 1) + (1,) * nd))
    tail = (F.index(se[0], (slice(1, None), None)), F.index(se[1], (slice(1, None), None)))
    cols = (F.sum_axis0(F.mul(Mg, tail[0])), F.sum_axis0(F.mul(Mg, tail[1])))
    se = (
        F.concat([F.index(se[0], slice(0, 1)), cols[0]], axis=0),
        F.concat([F.index(se[1], slice(0, 1)), cols[1]], axis=0),
    )

    WHATS = np.asarray(FAST_PARTIAL_ROUND_W_HATS, np.uint64).reshape(R_P, T - 1)
    VS = np.asarray(FAST_PARTIAL_ROUND_VS, np.uint64).reshape(R_P, T - 1)
    # FAST_PARTIAL_ROUND_CONSTANTS[R_P-1] == 0, so adding it every round is
    # identical to the reference's skip-on-last-round schedule.
    PRC = np.asarray(FAST_PARTIAL_ROUND_CONSTANTS, np.uint64)
    assert PRC[R_P - 1] == 0
    pw = _se_stack(F, [W[gate.wire_partial_sbox(r)] for r in range(R_P)])
    whats_gf = F.from_u64(WHATS.reshape((R_P, T - 1) + (1,) * nd))
    vs_gf = F.from_u64(VS.reshape((R_P, T - 1) + (1,) * nd))
    prc_gf = F.from_u64(PRC.reshape((R_P,) + (1,) * nd))
    mds0to0 = MDS_MATRIX_CIRC[0] + MDS_MATRIX_DIAG[0]

    def partial_body(st, xs):
        w0, w1, wh, vsv, c = xs
        s0 = (F.index(st[0], 0), F.index(st[1], 0))
        d = ext2.sub(F, s0, (w0, w1))
        s0 = (w0, w1)
        x2 = ext2.mul(F, s0, s0)
        x3 = ext2.mul(F, x2, s0)
        s0 = ext2.mul(F, x3, ext2.mul(F, x2, x2))
        s0 = (F.add(s0[0], c), s0[1])
        tl = (F.index(st[0], slice(1, None)), F.index(st[1], slice(1, None)))
        d0 = F.add(F.mul(F.const(mds0to0), s0[0]), F.sum_axis0(F.mul(wh, tl[0])))
        d1 = F.add(F.mul(F.const(mds0to0), s0[1]), F.sum_axis0(F.mul(wh, tl[1])))
        r0 = F.add(F.mul(vsv, s0[0]), tl[0])
        r1 = F.add(F.mul(vsv, s0[1]), tl[1])
        st = (
            _concat_row(F, d0, r0),
            _concat_row(F, d1, r1),
        )
        return st, d

    se, pdiffs = jax.lax.scan(
        partial_body, se, (pw[0], pw[1], whats_gf, vs_gf, prc_gf)
    )
    out_scalar.extend(_se_unstack_1d(F, pdiffs))

    # ---- second full rounds (all scanned)
    wire_rows = [[W[gate.wire_full_sbox_1(r, i)] for i in range(T)] for r in range(R_F_HALF)]
    se, diffs = full_rounds_scan(se, R_F_HALF, wire_rows, rc[R_F_HALF + R_P :])
    out_scalar.extend(_se_unstack_2d(F, diffs))

    outs = _se_stack(F, [W[gate.wire_output(i)] for i in range(T)])
    out_scalar.extend(_se_unstack(F, ext2.sub(F, se, outs)))
    return out_scalar


def _se_unstack_1d(F, se):
    k = se[0].l0.shape[0]
    return [(F.index(se[0], i), F.index(se[1], i)) for i in range(k)]


def _se_unstack_2d(F, se):
    k, t = se[0].l0.shape[:2]
    return [
        (F.index(se[0], (i, j)), F.index(se[1], (i, j)))
        for i in range(k)
        for j in range(t)
    ]


def _gf_rows(F, a, lo, hi):
    return F.index(a, slice(lo, hi))


def _reshape_ins(F, a, lo, hi):
    """rows lo:hi with an inserted broadcast axis after axis0: [k,1,...]."""
    return F.index(a, (slice(lo, hi), None))


def _bcast_row(F, x, k):
    """scalar GF -> broadcast against leading axis k (implicit)."""
    return x


def _concat_row(F, head, tail):
    """GF scalar + GF [k,...] -> GF [k+1,...]."""
    from ..ops.gl64_jax import gmap
    import jax.numpy as jnp

    return gmap(lambda h, t: jnp.concatenate([h[None], t], axis=0), head, tail)
