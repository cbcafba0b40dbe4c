"""plonky2-compatible circuit builder (host side, numpy).

Builds the circuits the reference workload proves — Semaphore membership
(reference: plonky2_semaphore/circuit.rs) and generic hash circuits — and
produces (CommonData, VerifierOnlyData, ProverData) whose proofs our TPU
verifier checks. Gate wire layouts come from core/gates.py.

Witness generation is recorded as a replayable op-list: every gadget appends
a numpy-vectorized generator, so one build serves a whole *batch* of
witnesses (the batch dimension rides through every op).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

from ..core import gates as G
from ..core.merkle import MerkleTree
from ..core.types import (
    CircuitConfig,
    CommonData,
    FriParams,
    SelectorsInfo,
    VerifierOnlyData,
    constant_arity_bits,
)
from ..ops import gl64_np as gl
from ..ops import ntt_np as ntt
from ..ops import poseidon_gl as pg
from ..utils.bits import log2_strict, reverse_index_bits

# Targets: ("w", row, col) wire targets / ("v", idx) virtual targets.
Target = Tuple

_U64 = np.dtype(np.uint64)


class WitnessConflict(AssertionError):
    """Two copy-constrained targets received different witness values —
    the circuit is unsatisfiable for these inputs (plonky2's
    PartitionWitness panics the same way, e.g. when an invalid child proof
    is fed to an in-circuit verifier). Subclasses AssertionError for
    backward compatibility, but is raised explicitly (not via `assert`) so
    the documented reject-path behavior survives `python -O`."""


class WitnessStore:
    """target -> uint64 array [batch]; whole gate rows can be stored as one
    [num_wires_used, batch] block (a PoseidonGate row is 135 wires — per-wire
    dict traffic dominated witness generation)."""

    def __init__(self, batch: int):
        self.batch = batch
        self.vals: Dict[Target, np.ndarray] = {}
        self.blocks: Dict[int, np.ndarray] = {}  # row -> [nw_used, batch]

    def set(self, t: Target, v):
        # fast path: generators overwhelmingly store ready-made [batch]
        # uint64 arrays — skip the asarray/broadcast dispatch (~8 us each
        # across ~1M calls per aggregation witness)
        if (type(v) is np.ndarray and v.dtype == _U64
                and v.shape == (self.batch,)):
            if t[0] == "w" and t[1] in self.blocks:
                self._set_in_block(t, v)
            else:
                self.vals[t] = v
            return
        v = np.broadcast_to(np.asarray(v, dtype=np.uint64), (self.batch,))
        if t[0] == "w" and t[1] in self.blocks:
            self._set_in_block(t, v)
        else:
            self.vals[t] = v

    def _set_in_block(self, t: Target, v: np.ndarray):
        # get() gives row blocks precedence over vals, so a set() on a
        # block-covered wire must land in the block to keep last-write-wins
        # (wires past the block's coverage still go through vals)
        blk = self.blocks[t[1]]
        if t[2] < blk.shape[0]:
            blk[t[2]] = v
        else:
            self.vals[t] = v

    def set_block(self, row: int, wires2d: np.ndarray):
        """All wires of one gate row at once: wires2d uint64[nw, batch].

        Precedence is last-write-wins in both orders: get() prefers the
        block (correct when set_block came after a per-wire set()), and
        set() on a block-covered wire writes into the block (correct when
        the per-wire set() came after)."""
        self.blocks[row] = wires2d

    def get(self, t: Target) -> np.ndarray:
        if t[0] == "w":
            blk = self.blocks.get(t[1])
            if blk is not None and t[2] < blk.shape[0]:
                return blk[t[2]]
        return self.vals[t]

    def lookup(self, t: Target):
        """get() that returns None for unset targets (copy-check path)."""
        if t[0] == "w":
            blk = self.blocks.get(t[1])
            if blk is not None and t[2] < blk.shape[0]:
                return blk[t[2]]
        return self.vals.get(t)


class CircuitBuilder:
    def __init__(self, config: CircuitConfig = None):
        self.config = config or CircuitConfig()
        self.gate_rows: List[Tuple[G.Gate, List[int]]] = []  # (gate, constants)
        self.copy_constraints: List[Tuple[Target, Target]] = []
        self.public_inputs: List[Target] = []
        self.generators = []  # list of callables (store) -> None
        self._const_targets: Dict[int, Target] = {}
        self._const_gate_slot = None  # (row, next_slot)
        self._virtual_count = 0

    # ------------------------------------------------------------- targets
    def add_virtual_target(self) -> Target:
        t = ("v", self._virtual_count)
        self._virtual_count += 1
        return t

    def add_virtual_targets(self, n) -> List[Target]:
        return [self.add_virtual_target() for _ in range(n)]

    def add_virtual_hash(self) -> List[Target]:
        return self.add_virtual_targets(4)

    def connect(self, a: Target, b: Target):
        self.copy_constraints.append((a, b))

    def register_public_input(self, t: Target):
        self.public_inputs.append(t)

    def register_public_inputs(self, ts):
        for t in ts:
            self.register_public_input(t)

    def add_gate(self, gate: G.Gate, constants: List[int] = ()) -> int:
        assert gate.num_wires_used() <= self.config.num_wires, gate.id
        row = len(self.gate_rows)
        self.gate_rows.append((gate, list(constants)))
        return row

    # ----------------------------------------------------------- constants
    def constant(self, value: int) -> Target:
        value = value % gl.P
        if value in self._const_targets:
            return self._const_targets[value]
        nc = self.config.num_constants
        if self._const_gate_slot is None or self._const_gate_slot[1] >= nc:
            row = self.add_gate(G.ConstantGate(nc), [0] * nc)
            self._const_gate_slot = (row, 0)
        row, slot = self._const_gate_slot
        self.gate_rows[row][1][slot] = value
        self._const_gate_slot = (row, slot + 1)
        t = ("w", row, slot)
        self._const_targets[value] = t
        self.generators.append(lambda s, t=t, v=value: s.set(t, v))
        return t

    def zero(self) -> Target:
        return self.constant(0)

    def one(self) -> Target:
        return self.constant(1)

    # ------------------------------------------------------------- gadgets
    def arithmetic(self, c0: int, c1: int, x: Target, y: Target, z: Target) -> Target:
        """returns c0*x*y + c1*z via an ArithmeticGate slot. Open slots are
        kept per (c0, c1) pair so interleaved coefficient pairs (as the
        recursion gadgets emit) share rows."""
        c0, c1 = c0 % gl.P, c1 % gl.P
        slots = getattr(self, "_arith_slots", None)
        if slots is None:
            slots = self._arith_slots = {}
        gate = G.ArithmeticGate(num_ops=self._arith_ops())
        cur = slots.get((c0, c1))
        if cur is None or cur[1] >= gate.num_ops:
            row = self.add_gate(gate, [c0, c1])
            cur = slots[(c0, c1)] = [row, 0]
        row, i = cur
        w0, w1, wa, wo = G.ArithmeticGate(self._arith_ops()).wires(i)
        self.connect(x, ("w", row, w0))
        self.connect(y, ("w", row, w1))
        self.connect(z, ("w", row, wa))
        out = ("w", row, wo)
        cur[1] += 1

        def gen(s, x=x, y=y, z=z, row=row, ws=(w0, w1, wa, wo), c0=c0, c1=c1):
            vx, vy, vz = s.get(x), s.get(y), s.get(z)
            for t, v in zip(ws[:3], (vx, vy, vz)):
                s.set(("w", row, t), v)
            out_v = gl.add(
                gl.mul(gl.const(c0, vx.shape), gl.mul(vx, vy)),
                gl.mul(gl.const(c1, vx.shape), vz),
            )
            s.set(("w", row, ws[3]), out_v)

        self.generators.append(gen)
        return out

    def _arith_ops(self):
        return (self.config.num_routed_wires // 4) if self.config.num_routed_wires < 80 else 20

    def mul(self, x, y):
        return self.arithmetic(1, 0, x, y, x)

    def add(self, x, y):
        return self.arithmetic(1, 1, x, self.one(), y)

    def poseidon_permute(self, inputs: List[Target], swap: Target = None) -> List[Target]:
        """One PoseidonGate; returns the 12 output wire targets."""
        gate = G.PoseidonGate()
        row = self.add_gate(gate, [])
        if swap is None:
            swap = self.zero()
        for i in range(12):
            self.connect(inputs[i], ("w", row, gate.wire_input(i)))
        self.connect(swap, ("w", row, gate.WIRE_SWAP))

        def gen(s, inputs=tuple(inputs), swap=swap, row=row):
            ins = [s.get(t) for t in inputs]
            sw = s.get(swap)
            from .. import native as _native

            if (_native.lib() is not None
                    and hasattr(_native.lib(), "svt_poseidon_fill_batch")
                    and all(type(x) is np.ndarray and x.shape == (s.batch,)
                            for x in ins)):
                sw_arr = np.broadcast_to(
                    np.asarray(sw, np.uint64), (s.batch,))
                flat = _native.poseidon_fill_np(
                    np.ascontiguousarray(np.stack(ins)), sw_arr)
                s.set_block(row, flat)  # all 135 wires in one entry
                return
            wires, _ = G.poseidon_witness_fill(gl, ins, sw)
            for wi, v in wires.items():
                s.set(("w", row, wi), v)

        self.generators.append(gen)
        return [("w", row, gate.wire_output(i)) for i in range(12)]

    def hash_n_to_hash_no_pad(self, inputs: List[Target]) -> List[Target]:
        state = [self.zero()] * 12
        for start in range(0, len(inputs), 8):
            chunk = inputs[start : start + 8]
            state = list(chunk) + state[len(chunk) :]
            state = self.poseidon_permute(state)
        return state[:4]

    def hash_or_noop(self, inputs: List[Target]) -> List[Target]:
        if len(inputs) <= 4:
            return list(inputs) + [self.zero()] * (4 - len(inputs))
        return self.hash_n_to_hash_no_pad(inputs)

    def split_le(self, x: Target, num_bits: int) -> List[Target]:
        gate = G.BaseSumGate(num_bits)
        row = self.add_gate(gate, [])
        self.connect(x, ("w", row, gate.WIRE_SUM))
        bits = [("w", row, gate.START_LIMBS + i) for i in range(num_bits)]

        def gen(s, x=x, row=row, num_bits=num_bits):
            v = s.get(x)
            s.set(("w", row, G.BaseSumGate.WIRE_SUM), v)
            for i in range(num_bits):
                s.set(("w", row, G.BaseSumGate.START_LIMBS + i),
                      (v >> np.uint64(i)) & np.uint64(1))

        self.generators.append(gen)
        return bits

    def verify_merkle_proof_to_cap_root(self, leaf_data, index_bits, root4, siblings):
        """Merkle membership against a single root (cap_height 0); siblings:
        list of 4-target digests. Mirrors plonky2's gadget: one PoseidonGate
        per level with the index bit on the swap wire."""
        state = self.hash_or_noop(leaf_data)
        zero = self.zero()
        for bit, sib in zip(index_bits, siblings):
            inputs = state + list(sib) + [zero] * 4
            out = self.poseidon_permute(inputs, swap=bit)
            state = out[:4]
        for i in range(4):
            self.connect(state[i], root4[i])

    # ------------------------------------------------------------- blinding
    def num_blinding_gates(self) -> Tuple[int, int]:
        """plonky2 `CircuitBuilder::num_blinding_gates`: how many polynomial
        values each FRI proof reveals per wire polynomial (regular) and per
        Z polynomial — every revealed value must be masked by a random row
        for zero-knowledge. Computed, as plonky2 does, from the PRE-blinding
        gate count (single pass, no fixed point): per query one initial
        evaluation plus D base elements per fold coset point, plus the full
        final polynomial, plus the openings at zeta (D) resp. zeta and
        g*zeta (2D). D = 2 (the quadratic extension)."""
        D = 2
        fc = self.config.fri_config
        n = len(self.gate_rows)
        degree_bits = 0 if n <= 1 else (n - 1).bit_length()  # log2_ceil
        rbits = constant_arity_bits(fc.arity_bits, fc.final_poly_bits,
                                    degree_bits, fc.rate_bits, fc.cap_height)
        total_fri_folding_points = sum((1 << a) - 1 for a in rbits)
        final_poly_coeffs = (1 << degree_bits) >> sum(rbits)
        fri_openings = (fc.num_query_rounds * (1 + D * total_fri_folding_points)
                        + D * final_poly_coeffs)
        regular_poly_openings = fri_openings + D
        z_openings = fri_openings + 2 * D
        return regular_poly_openings, z_openings

    def _blind(self):
        """plonky2 `CircuitBuilder::blind`: one all-random NoopGate row per
        regular-poly opening; for each Z-poly opening a PAIR of rows whose
        routed wires carry the same random values and are copy-constrained
        together (the pair enters the permutation argument, blinding Z)."""
        regular_poly_openings, z_openings = self.num_blinding_gates()
        for _ in range(regular_poly_openings):
            self.blind_rows.append(self.add_gate(G.NoopGate(), []))
        for _ in range(z_openings):
            r1 = self.add_gate(G.NoopGate(), [])
            r2 = self.add_gate(G.NoopGate(), [])
            for w in range(self.config.num_routed_wires):
                self.connect(("w", r1, w), ("w", r2, w))
            self.blind_pairs.append((r1, r2))

    # --------------------------------------------------------------- build
    def build(self) -> "CircuitData":
        cfg = self.config
        # PublicInputGate wires 0..3 must equal H(public_inputs); the
        # verifier computes that hash natively and feeds it into the
        # vanishing polynomial (core/verifier, reference:
        # gates/public_input.rs:22-40), so the hash itself need not be
        # computed in-circuit. pi_hash_in_circuit=True additionally routes
        # it through an in-circuit PoseidonGate (hash preimage becomes part
        # of the copy-constraint graph); False fills the gate wires from a
        # native host hash — it keeps PoseidonGate (135 wires, the heaviest
        # vanishing-poly term) out of small circuits like the multichip
        # dryrun workload.
        pi_gate = G.PublicInputGate()
        if getattr(cfg, "pi_hash_in_circuit", True):
            pi_hash_targets = self.hash_n_to_hash_no_pad(list(self.public_inputs))
            pi_row = self.add_gate(pi_gate, [])
            for i in range(4):
                self.connect(pi_hash_targets[i], ("w", pi_row, i))

            def gen_pi(s, pi_row=pi_row, targets=tuple(pi_hash_targets)):
                for i, t in enumerate(targets):
                    s.set(("w", pi_row, i), s.get(t))

        else:
            pi_row = self.add_gate(pi_gate, [])

            def gen_pi(s, pi_row=pi_row, targets=tuple(self.public_inputs)):
                vals = [s.get(t) for t in targets]
                h = pg.hash_no_pad(gl, vals, shape=vals[0].shape if vals else (s.batch,))
                for i in range(4):
                    s.set(("w", pi_row, i), h[i])

        self.generators.append(gen_pi)

        # zero-knowledge: plonky2's exact `blind_and_pad` accounting —
        # `num_blinding_gates()` random rows (singles for the wire polys,
        # copy-constrained pairs for the Z polys), then pad to a power of
        # two. This is what sets the true circuit height of the reference's
        # zk workloads (reference: plonky2_semaphore/access_set.rs:68-84;
        # plonky2 circuit_builder.rs blind/blind_and_pad).
        self.blind_rows = []
        self.blind_pairs = []
        if cfg.zero_knowledge:
            self._blind()

        # pad rows to a power of two (and to any requested minimum degree,
        # e.g. to emulate the row count of a zk-blinded circuit)
        min_rows = getattr(self, "min_degree", 0)
        while len(self.gate_rows) < min_rows:
            self.add_gate(G.NoopGate(), [])
        while len(self.gate_rows) & (len(self.gate_rows) - 1):
            self.add_gate(G.NoopGate(), [])
        n = len(self.gate_rows)
        degree_bits = log2_strict(n)

        # ---- selector groups over the distinct gate types present
        gate_types: List[G.Gate] = []
        seen = {}
        for g, _ in self.gate_rows:
            if g.id not in seen:
                seen[g.id] = len(gate_types)
                gate_types.append(g)
        order = sorted(range(len(gate_types)),
                       key=lambda i: (gate_types[i].degree, gate_types[i].id))
        gate_types = [gate_types[i] for i in order]
        gate_index = {g.id: i for i, g in enumerate(gate_types)}

        max_deg = cfg.max_quotient_degree_factor
        groups = []
        start = 0
        while start < len(gate_types):
            end = start + 1
            while end < len(gate_types):
                size = end - start + 1
                gmax = max(g.degree for g in gate_types[start:end + 1])
                if size + gmax > max_deg:
                    break
                end += 1
            groups.append((start, end))
            start = end
        sel_indices = []
        for i in range(len(gate_types)):
            for si, (a, b) in enumerate(groups):
                if a <= i < b:
                    sel_indices.append(si)
                    break
        num_selectors = len(groups)

        # selector polynomial values
        selector_vals = np.full((num_selectors, n), G.UNUSED_SELECTOR, dtype=np.uint64)
        for row, (g, _) in enumerate(self.gate_rows):
            gi = gate_index[g.id]
            si = sel_indices[gi]
            selector_vals[si, row] = gi

        # gate-constant polynomial values
        num_const_cols = max(
            [cfg.num_constants] + [len(c) for _, c in self.gate_rows]
        )
        const_vals = np.zeros((num_const_cols, n), dtype=np.uint64)
        for row, (_, consts) in enumerate(self.gate_rows):
            for c, v in enumerate(consts):
                const_vals[c, row] = v % gl.P

        # ---- sigmas (copy-constraint permutation)
        nr = cfg.num_routed_wires
        parent: Dict[Target, Target] = {}

        def find(t):
            while parent.get(t, t) != t:
                parent[t] = parent.get(parent[t], parent[t])
                t = parent[t]
            return t

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb

        for a, b in self.copy_constraints:
            for t in (a, b):
                if t[0] == "w":
                    assert t[2] < nr, f"copy constraint on non-routed wire {t}"
            union(a, b)

        classes: Dict[Target, List[Tuple[int, int]]] = {}
        for row in range(n):
            for col in range(nr):
                t = ("w", row, col)
                classes.setdefault(find(t), []).append((row, col))

        # sigma = next-in-cycle permutation over wire positions
        sigma_pos = {}
        for members in classes.values():
            m = len(members)
            for i, pos in enumerate(members):
                sigma_pos[pos] = members[(i + 1) % m]

        g_sub = gl.primitive_root_of_unity(degree_bits)
        subgroup = np.empty(n, dtype=np.uint64)
        acc = 1
        for j in range(n):
            subgroup[j] = acc
            acc = (acc * g_sub) % gl.P
        k_is = np.array([pow(7, i, gl.P) for i in range(nr)], dtype=np.uint64)
        sigma_vals = np.zeros((nr, n), dtype=np.uint64)
        for (row, col), (row2, col2) in sigma_pos.items():
            sigma_vals[col, row] = (int(k_is[col2]) * int(subgroup[row2])) % gl.P

        # ---- quotient degree factor & partial products
        qdf = cfg.max_quotient_degree_factor
        num_partial_products = (nr + qdf - 1) // qdf - 1

        fri_cfg = cfg.fri_config
        fri_params = FriParams(
            config=fri_cfg,
            hiding=cfg.zero_knowledge,
            degree_bits=degree_bits,
            reduction_arity_bits=constant_arity_bits(
                fri_cfg.arity_bits, fri_cfg.final_poly_bits, degree_bits,
                fri_cfg.rate_bits, fri_cfg.cap_height),
        )

        common = CommonData(
            config=cfg,
            fri_params=fri_params,
            gate_ids=[g.id for g in gate_types],
            selectors_info=SelectorsInfo(sel_indices, groups),
            quotient_degree_factor=qdf,
            num_gate_constraints=max((g.num_constraints for g in gate_types), default=0),
            num_constants=num_selectors + num_const_cols,
            num_public_inputs=len(self.public_inputs),
            k_is=k_is,
            num_partial_products=num_partial_products,
        )

        # ---- constants-sigmas oracle commitment (with the config's hash;
        # reference: plonky2_config.rs:70-75 — Hasher hashes vk data too)
        from ..ops.hashers import get_permute

        perm = get_permute(getattr(cfg, "hasher", "poseidon"), gl)
        cs_values = np.concatenate([selector_vals, const_vals, sigma_vals], axis=0)
        cs_coeffs = ntt.intt(cs_values)
        shift = 7
        cs_lde = ntt.coset_lde(cs_coeffs, fri_cfg.rate_bits, shift)
        leaves = reverse_index_bits(np.ascontiguousarray(cs_lde.T))
        cs_tree = MerkleTree(leaves, fri_cfg.cap_height, permute=perm)

        digest_inputs = list(cs_tree.cap.reshape(-1)) + [np.uint64(degree_bits)]
        circuit_digest = np.stack(
            pg.hash_no_pad(gl, [np.asarray(x, np.uint64) for x in digest_inputs],
                           permute=perm)
        )

        vk = VerifierOnlyData(constants_sigmas_cap=cs_tree.cap, circuit_digest=circuit_digest)
        return CircuitData(
            builder=self,
            common=common,
            vk=vk,
            constants_sigmas_values=cs_values,
            constants_sigmas_coeffs=cs_coeffs,
            constants_sigmas_lde=cs_lde,
            constants_sigmas_tree=cs_tree,
            subgroup=subgroup,
            sigma_vals=sigma_vals,
        )


@dataclass
class CircuitData:
    builder: CircuitBuilder
    common: CommonData
    vk: VerifierOnlyData
    constants_sigmas_values: np.ndarray  # [num_constants+nr, n]
    constants_sigmas_coeffs: np.ndarray
    constants_sigmas_lde: np.ndarray     # [num_constants+nr, 8n]
    constants_sigmas_tree: MerkleTree
    subgroup: np.ndarray                 # [n]
    sigma_vals: np.ndarray               # [nr, n]

    def generate_witness(self, inputs: Dict[Target, np.ndarray], batch: int,
                         check: bool = True):
        """Run the recorded generators; returns wire matrix [num_wires, n, B]
        and the public-input values [num_pis, B]."""
        store = WitnessStore(batch)
        for t, v in inputs.items():
            store.set(t, v)
        for gen in self.builder.generators:
            gen(store)
        # Copy-constraint conflict check — plonky2's PartitionWitness panics
        # when two targets in one copy partition receive different values;
        # this is what makes proving an in-circuit verification of an
        # INVALID child proof fail at prove time (the quotient-tail check
        # below can't catch it: with qdf == 2^rate_bits the tail is empty).
        # check=False deliberately emits the unsound proof instead (used by
        # negative tests asserting the VERIFIER also rejects it).
        if check:
            for a, b in self.builder.copy_constraints:
                va = store.lookup(a)
                vb = store.lookup(b)
                if va is not None and vb is not None and not np.array_equal(va, vb):
                    raise WitnessConflict(
                        f"copy constraint violated in witness: {a} != {b} "
                        "(unsatisfiable circuit inputs — e.g. an invalid child "
                        "proof fed to an in-circuit verifier)")
        n = len(self.builder.gate_rows)
        W = np.zeros((self.common.config.num_wires, n, batch), dtype=np.uint64)
        for t, v in store.vals.items():
            if t[0] == "w":
                _, row, col = t
                W[col, row] = v
        for row, blk in store.blocks.items():
            W[: blk.shape[0], row] = blk
        # zk: randomize the blinding rows' wires (unconstrained noop rows).
        # Pair rows (Z-poly blinding) carry IDENTICAL random values on the
        # routed wires — they are copy-constrained together — and
        # independent randomness elsewhere (plonky2 circuit_builder.rs blind).
        rng = np.random.default_rng()
        nw = W.shape[0]
        nr_routed = self.common.config.num_routed_wires
        for row in getattr(self.builder, "blind_rows", []):
            W[:, row, :] = rng.integers(
                0, 0xFFFFFFFF00000001, size=(nw, batch), dtype=np.uint64)
        for r1, r2 in getattr(self.builder, "blind_pairs", []):
            routed = rng.integers(
                0, 0xFFFFFFFF00000001, size=(nr_routed, batch), dtype=np.uint64)
            W[:nr_routed, r1, :] = routed
            W[:nr_routed, r2, :] = routed
            W[nr_routed:, r1, :] = rng.integers(
                0, 0xFFFFFFFF00000001, size=(nw - nr_routed, batch), dtype=np.uint64)
            W[nr_routed:, r2, :] = rng.integers(
                0, 0xFFFFFFFF00000001, size=(nw - nr_routed, batch), dtype=np.uint64)
        pis = np.stack([store.get(t) for t in self.builder.public_inputs]) if self.builder.public_inputs else np.zeros((0, batch), np.uint64)
        return W, pis


def _ext_pair(ts):
    assert len(ts) == 2
    return ts


class _GadgetMixins:
    pass


def _attach_gadgets():
    """Builder gadgets for the remaining plonky2 gate types (random access,
    reducing, extension arithmetic) — the gate set the reference's recursion
    circuits exercise (reference: gates/mod.rs registry)."""

    def random_access(self, index: Target, items: List[Target]) -> Target:
        """List access: returns a target constrained to items[index]
        (reference: gates/random_access.rs wire layout)."""
        vlen = len(items)
        bits = log2_strict(vlen)
        # copies per gate bounded by routed wires: (2 + 2^bits) * copies <= nr
        copies = max(1, self.config.num_routed_wires // (2 + vlen))
        key = ("ra", bits)
        slots = getattr(self, "_ra_slots", {})
        self._ra_slots = slots
        if key not in slots or slots[key][1] >= copies:
            gate = G.RandomAccessGate(bits, copies, 0)
            row = self.add_gate(gate, [])
            slots[key] = [row, 0, gate]
        row, copy, gate = slots[key]
        slots[key][1] += 1
        self.connect(index, ("w", row, gate.wire_access_index(copy)))
        for i, t in enumerate(items):
            self.connect(t, ("w", row, gate.wire_list_item(i, copy)))
        claimed = ("w", row, gate.wire_claimed_element(copy))

        def gen(s, index=index, items=tuple(items), row=row, copy=copy, gate=gate):
            idx = s.get(index)
            vals = np.stack([s.get(t) for t in items])  # [vlen, B]
            s.set(("w", row, gate.wire_access_index(copy)), idx)
            for i, t in enumerate(items):
                s.set(("w", row, gate.wire_list_item(i, copy)), s.get(t))
            sel = np.take_along_axis(vals, idx[None, :].astype(np.int64), axis=0)[0]
            s.set(("w", row, gate.wire_claimed_element(copy)), sel)
            for b in range(gate.bits):
                s.set(("w", row, gate.wire_bit(b, copy)),
                      (idx >> np.uint64(b)) & np.uint64(1))

        self.generators.append(gen)
        return claimed

    def mul_extension(self, c0: int, x2, y2):
        """Extension mul via MulExtensionGate: returns ext pair of targets
        constrained to c0 * x * y (reference: gates/multiplication_extension.rs)."""
        c0 = c0 % 0xFFFFFFFF00000001
        slots = getattr(self, "_mulext_slots", None)
        if slots is None:
            slots = self._mulext_slots = {}
        gate = G.MulExtensionGate(13)
        cur = slots.get(c0)
        if cur is None or cur[1] >= gate.num_ops:
            row = self.add_gate(gate, [c0])
            cur = slots[c0] = [row, 0]
        row, i = cur
        cur[1] += 1
        b = 6 * i
        for k in range(2):
            self.connect(x2[k], ("w", row, b + k))
            self.connect(y2[k], ("w", row, b + 2 + k))
        out = [("w", row, b + 4), ("w", row, b + 5)]

        def gen(s, x2=tuple(x2), y2=tuple(y2), row=row, b=b, c0=c0):
            from ..ops import ext2

            xv = (s.get(x2[0]), s.get(x2[1]))
            yv = (s.get(y2[0]), s.get(y2[1]))
            for k in range(2):
                s.set(("w", row, b + k), xv[k])
                s.set(("w", row, b + 2 + k), yv[k])
            prod = ext2.mul(gl, xv, yv)
            c = gl.const(c0, xv[0].shape)
            s.set(("w", row, b + 4), gl.mul(c, prod[0]))
            s.set(("w", row, b + 5), gl.mul(c, prod[1]))

        self.generators.append(gen)
        return out

    def arithmetic_extension(self, c0: int, c1: int, x2, y2, z2):
        """c0*x*y + c1*z over the extension
        (reference: gates/arithmetic_extension.rs)."""
        c0, c1 = c0 % 0xFFFFFFFF00000001, c1 % 0xFFFFFFFF00000001
        gate = G.ArithmeticExtensionGate(10)
        slots = getattr(self, "_arithext_slots", None)
        if slots is None:
            slots = self._arithext_slots = {}
        cur = slots.get((c0, c1))
        if cur is None or cur[1] >= gate.num_ops:
            row = self.add_gate(gate, [c0, c1])
            cur = slots[(c0, c1)] = [row, 0]
        row, i = cur
        cur[1] += 1
        b = 8 * i
        for k in range(2):
            self.connect(x2[k], ("w", row, b + k))
            self.connect(y2[k], ("w", row, b + 2 + k))
            self.connect(z2[k], ("w", row, b + 4 + k))
        out = [("w", row, b + 6), ("w", row, b + 7)]

        def gen(s, x2=tuple(x2), y2=tuple(y2), z2=tuple(z2), row=row, b=b,
                c0=c0, c1=c1):
            xv = (s.get(x2[0]), s.get(x2[1]))
            yv = (s.get(y2[0]), s.get(y2[1]))
            zv = (s.get(z2[0]), s.get(z2[1]))
            for k in range(2):
                s.set(("w", row, b + k), xv[k])
                s.set(("w", row, b + 2 + k), yv[k])
                s.set(("w", row, b + 4 + k), zv[k])
            from .. import native as _native

            if _native.lib() is not None and hasattr(
                    _native.lib(), "svt_ext2_arith_batch"):
                r0, r1 = _native.ext2_arith_np(c0, c1, xv, yv, zv)
            else:
                from ..ops import ext2

                sh = xv[0].shape
                prod = ext2.mul(gl, xv, yv)
                r0 = gl.add(gl.mul(gl.const(c0, sh), prod[0]),
                            gl.mul(gl.const(c1, sh), zv[0]))
                r1 = gl.add(gl.mul(gl.const(c0, sh), prod[1]),
                            gl.mul(gl.const(c1, sh), zv[1]))
            s.set(("w", row, b + 6), r0)
            s.set(("w", row, b + 7), r1)

        self.generators.append(gen)
        return out

    def reduce_with_powers_ext(self, alpha2, old_acc2, coeffs: List[Target]):
        """Horner accumulator over base-field coeffs via ReducingGate
        (reference: gates/reducing.rs). Returns the output ext pair."""
        gate = G.ReducingGate(len(coeffs))
        assert gate.num_wires_used() <= self.config.num_wires
        row = self.add_gate(gate, [])
        for k in range(2):
            self.connect(alpha2[k], ("w", row, 2 + k))
            self.connect(old_acc2[k], ("w", row, 4 + k))
        for i, c in enumerate(coeffs):
            self.connect(c, ("w", row, gate.wire_coeff(i)))
        out = [("w", row, 0), ("w", row, 1)]

        def gen(s, alpha2=tuple(alpha2), old_acc2=tuple(old_acc2),
                coeffs=tuple(coeffs), row=row, gate=gate):
            from ..ops import ext2

            av = (s.get(alpha2[0]), s.get(alpha2[1]))
            acc = (s.get(old_acc2[0]), s.get(old_acc2[1]))
            for k in range(2):
                s.set(("w", row, 2 + k), av[k])
                s.set(("w", row, 4 + k), acc[k])
            for i, c in enumerate(coeffs):
                cv = s.get(c)
                s.set(("w", row, gate.wire_coeff(i)), cv)
                acc = ext2.add(gl, ext2.mul(gl, acc, av), (cv, gl.zeros(cv.shape)))
                w = gate.wires_acc(i)
                s.set(("w", row, w), acc[0])
                s.set(("w", row, w + 1), acc[1])

        self.generators.append(gen)
        return out

    CircuitBuilder.random_access = random_access
    CircuitBuilder.mul_extension = mul_extension
    CircuitBuilder.arithmetic_extension = arithmetic_extension
    CircuitBuilder.reduce_with_powers_ext = reduce_with_powers_ext


_attach_gadgets()
