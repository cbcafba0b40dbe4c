"""Independent re-derivation of the circuit-build accounting.

The build-accounting KATs in test_plonky2_build_accounting.py pin values
that originate from `prover/builder.py` itself — a shared misreading of
plonky2's `blind_and_pad` / selector / sigma / digest schedule would pin
the wrong value and go unnoticed. This file is the defense: a from-scratch,
test-local implementation of the whole accounting chain, written against
plonky2's documented semantics (circuit_builder.rs `blind_and_pad`,
`SelectorsInfo` grouping, `sigma_vecs`, `MerkleTree` with cap,
`hash_n_to_m_no_pad`), and asserted to reproduce the builder's CommonData
and verifier key field-by-field. Two independent implementations must now
agree — the same defense test_external_anchor gives the permutation.

Shared primitives (deliberately): the circuit DEFINITION (gate rows +
copy constraints — that is the input, not the accounting) and the
Goldilocks field ops / raw Poseidon permutation, both externally anchored
by tests/test_external_anchor.py. Everything schedule-shaped is re-derived
here with different code: recursive (not iterative) NTT, scale-then-pad
coset LDE, own bit-reversal, own sponge, own Merkle cap, own union-find.

Caveat (documented, not hidden): the within-cycle ordering of each sigma
cycle follows the (row, col) scan-order next-in-cycle convention both
implementations share; plonky2's Forest may order cycles differently,
which a future Rust-emitted vk cross-check (tools/cross_check.py) would
surface. All other layers are order-independent.

Reference: types/common_data.rs:68-122; plonky2 circuit_builder.rs.
"""
import os

import numpy as np
import pytest

from stark_verifier_tpu.core.types import CircuitConfig
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.ops import poseidon_gl as pg
from stark_verifier_tpu.semaphore.access_set import (
    build_semaphore_circuit, semaphore_config)

pytestmark = pytest.mark.quick

P = 0xFFFFFFFF00000001


# ---------------------------------------------------------------- field ops
# (externally anchored via the Poseidon permutation vectors; everything
# built ON them below is test-local)
def _mul(a, b):
    return gl.mul(np.asarray(a, np.uint64), np.asarray(b, np.uint64))

def _add(a, b):
    return gl.add(np.asarray(a, np.uint64), np.asarray(b, np.uint64))

def _sub(a, b):
    return gl.sub(np.asarray(a, np.uint64), np.asarray(b, np.uint64))


# ------------------------------------------------------- independent NTT/LDE
def _rec_ntt(a: np.ndarray, root: int) -> np.ndarray:
    """Recursive radix-2 Cooley-Tukey over the last axis (natural order in
    and out) — deliberately a different algorithm shape from
    ops/ntt_np.ntt's iterative bit-reversal butterflies."""
    n = a.shape[-1]
    if n == 1:
        return a.copy()
    even = _rec_ntt(a[..., 0::2], root * root % P)
    odd = _rec_ntt(a[..., 1::2], root * root % P)
    w = np.empty(n // 2, dtype=np.uint64)
    acc = 1
    for k in range(n // 2):
        w[k] = acc
        acc = acc * root % P
    t = _mul(w, odd)
    return np.concatenate([_add(even, t), _sub(even, t)], axis=-1)


def _indep_intt(evals: np.ndarray) -> np.ndarray:
    """coeffs from evals: NTT at the inverse root, scaled by n^-1."""
    n = evals.shape[-1]
    bits = n.bit_length() - 1
    root = _primitive_root(bits)
    inv_root = pow(root, P - 2, P)
    n_inv = pow(n, P - 2, P)
    return _mul(_rec_ntt(evals, inv_root), np.uint64(n_inv))


def _primitive_root(bits: int) -> int:
    # 7^((p-1)/2^32) generates the 2^32 subgroup; square down to 2^bits
    g = pow(7, (P - 1) >> 32, P)
    for _ in range(32 - bits):
        g = g * g % P
    return g


def _indep_coset_lde(coeffs: np.ndarray, rate_bits: int, shift: int):
    """Evaluate on shift*H_big: scale coeff i by shift^i, zero-pad to the
    LDE size, forward NTT."""
    n = coeffs.shape[-1]
    big = n << rate_bits
    sh = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        sh[i] = acc
        acc = acc * shift % P
    scaled = _mul(coeffs, sh)
    padded = np.zeros(coeffs.shape[:-1] + (big,), dtype=np.uint64)
    padded[..., :n] = scaled
    bits = big.bit_length() - 1
    return _rec_ntt(padded, _primitive_root(bits))


def _rev_bits(i: int, bits: int) -> int:
    return int(format(i, f"0{bits}b")[::-1], 2) if bits else 0


# --------------------------------------------------- independent hash plane
def _perm_batch(state: np.ndarray) -> np.ndarray:
    """Raw anchored permutation, batched: uint64[12, m] -> uint64[12, m]."""
    return np.asarray(pg.permute(gl, state), dtype=np.uint64)


def _sponge_hash(rows: np.ndarray) -> np.ndarray:
    """Test-local plonky2 hash_n_to_m_no_pad (m=4): uint64[m, k] -> [m, 4].
    Overwrite-mode absorb in chunks of 8, permute after EVERY chunk
    (including a short final one), squeeze the first 4."""
    m, k = rows.shape
    state = np.zeros((12, m), dtype=np.uint64)
    for start in range(0, k, 8):
        chunk = rows[:, start:start + 8]
        state[:chunk.shape[1]] = chunk.T
        state = _perm_batch(state)
    return state[:4].T


def _indep_merkle_cap(leaves: np.ndarray, cap_height: int) -> np.ndarray:
    """Test-local plonky2 MerkleTree cap: leaf digest = hash_or_noop(leaf),
    internal digest = hash(left||right), top cap_height levels kept."""
    n, leaf_len = leaves.shape
    if leaf_len <= 4:
        digests = np.zeros((n, 4), dtype=np.uint64)
        digests[:, :leaf_len] = leaves
    else:
        digests = _sponge_hash(leaves)
    levels = n.bit_length() - 1 - cap_height
    for _ in range(levels):
        pairs = digests.reshape(-1, 8)
        digests = _sponge_hash(pairs)
    return digests


# --------------------------------------------- independent sigma derivation
def _indep_sigmas(n_rows: int, num_routed: int, copy_constraints, k_is,
                  subgroup):
    """Equivalence classes via a test-local adjacency/BFS partition (the
    builder uses path-compressed union-find); members in (row, col) scan
    order, sigma(pos) = next member cyclically, encoded k_{col'} * g^{row'}."""
    adj = {}
    for a, b in copy_constraints:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    comp = {}
    n_comp = 0
    for start in adj:
        if start in comp:
            continue
        stack = [start]
        comp[start] = n_comp
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v not in comp:
                    comp[v] = n_comp
                    stack.append(v)
        n_comp += 1

    members = [[] for _ in range(n_comp)]
    sigma = np.zeros((num_routed, n_rows), dtype=np.uint64)
    for row in range(n_rows):
        for col in range(num_routed):
            c = comp.get(("w", row, col))
            if c is None:
                # singleton: sigma is the identity on this position
                sigma[col, row] = int(k_is[col]) * int(subgroup[row]) % P
            else:
                members[c].append((row, col))
    for mem in members:
        if not mem:
            continue  # component with no routed-wire positions (virtuals)
        for i, (row, col) in enumerate(mem):
            row2, col2 = mem[(i + 1) % len(mem)]
            sigma[col, row] = int(k_is[col2]) * int(subgroup[row2]) % P
    return sigma


# ------------------------------------------------- independent blind counts
def _indep_blind_counts(pre_blind_rows: int, fc) -> tuple:
    """plonky2 num_blinding_gates, re-derived: count every polynomial value
    a FRI proof reveals (initial eval + D per in-coset fold point per query,
    the final polynomial, and the zeta / {zeta, g*zeta} openings)."""
    D = 2
    db = 0 if pre_blind_rows <= 1 else (pre_blind_rows - 1).bit_length()
    arities = []
    d = db
    while d > fc.final_poly_bits and d + fc.rate_bits - fc.arity_bits >= fc.cap_height:
        arities.append(fc.arity_bits)
        d -= fc.arity_bits
    fold_pts = sum((1 << a) - 1 for a in arities)
    fri_open = fc.num_query_rounds * (1 + D * fold_pts) + D * (1 << d)
    return fri_open + D, fri_open + 2 * D


# ------------------------------------------------------------ the assertion
def _check_build(data, config: CircuitConfig):
    b = data.builder
    c = data.common
    cfg = config
    fc = cfg.fri_config

    # --- blind + pad accounting from the pre-blind row count
    if cfg.zero_knowledge:
        pre_blind = b.blind_rows[0]
        reg, z = _indep_blind_counts(pre_blind, fc)
        assert (len(b.blind_rows), len(b.blind_pairs)) == (reg, z)
        expect_rows = pre_blind + reg + 2 * z
    else:
        expect_rows = next(i for i in range(len(b.gate_rows), 0, -1)
                           if b.gate_rows[i - 1][0].id != "NoopGate")
        expect_rows = max(expect_rows, getattr(b, "min_degree", 0))
    n = 1 << (expect_rows - 1).bit_length()
    n = max(n, getattr(b, "min_degree", 0) or 1)
    assert len(b.gate_rows) == n
    db = n.bit_length() - 1
    assert c.degree_bits == db
    # every blinding/padding row is a NoopGate
    if cfg.zero_knowledge:
        for r in range(pre_blind, n):
            assert b.gate_rows[r][0].id == "NoopGate"

    # --- gate set order + selector grouping (test-local greedy grouping)
    gate_objs = {}
    for g, _ in b.gate_rows:
        gate_objs.setdefault(g.id, g)
    ids_sorted = sorted(gate_objs, key=lambda i: (gate_objs[i].degree, i))
    assert c.gate_ids == ids_sorted
    groups = []
    lo = 0
    while lo < len(ids_sorted):
        hi = lo
        while hi + 1 < len(ids_sorted):
            width = hi + 2 - lo
            deg = max(gate_objs[i].degree for i in ids_sorted[lo:hi + 2])
            if width + deg > cfg.max_quotient_degree_factor:
                break
            hi += 1
        groups.append((lo, hi + 1))
        lo = hi + 1
    assert list(map(tuple, c.selectors_info.groups)) == groups
    sel_of_gate = [next(si for si, (a, e) in enumerate(groups) if a <= gi < e)
                   for gi in range(len(ids_sorted))]
    assert list(c.selectors_info.selector_indices) == sel_of_gate

    # --- selector / constant polynomial values
    from stark_verifier_tpu.core.gates import UNUSED_SELECTOR
    gate_idx = {g: i for i, g in enumerate(ids_sorted)}
    num_sel = len(groups)
    sel_vals = np.full((num_sel, n), UNUSED_SELECTOR, dtype=np.uint64)
    ncc = max([cfg.num_constants] + [len(cs) for _, cs in b.gate_rows])
    const_vals = np.zeros((ncc, n), dtype=np.uint64)
    for row, (g, consts) in enumerate(b.gate_rows):
        gi = gate_idx[g.id]
        sel_vals[sel_of_gate[gi], row] = gi
        for ci, v in enumerate(consts):
            const_vals[ci, row] = v % P
    assert c.num_constants == num_sel + ncc

    # --- k_is and subgroup
    k_is = np.array([pow(7, i, P) for i in range(cfg.num_routed_wires)],
                    dtype=np.uint64)
    assert (c.k_is == k_is).all()
    root = _primitive_root(db)
    subgroup = np.empty(n, dtype=np.uint64)
    acc = 1
    for j in range(n):
        subgroup[j] = acc
        acc = acc * root % P

    # --- sigmas from the copy-constraint list
    sigma_vals = _indep_sigmas(n, cfg.num_routed_wires, b.copy_constraints,
                               k_is, subgroup)
    expect_cs = np.concatenate([sel_vals, const_vals, sigma_vals], axis=0)
    assert (data.constants_sigmas_values == expect_cs).all()

    # --- partial products / misc counts
    assert c.num_partial_products == (
        (cfg.num_routed_wires + c.quotient_degree_factor - 1)
        // c.quotient_degree_factor - 1)
    assert c.fri_params.hiding == cfg.zero_knowledge

    # --- commitment: INTT -> coset LDE -> bit-reversed leaves -> cap
    coeffs = _indep_intt(expect_cs)
    lde = _indep_coset_lde(coeffs, fc.rate_bits, 7)
    big = n << fc.rate_bits
    bits = big.bit_length() - 1
    order = np.array([_rev_bits(i, bits) for i in range(big)])
    leaves = lde.T[order]  # [big, num_polys]
    cap = _indep_merkle_cap(leaves, fc.cap_height)
    assert (data.vk.constants_sigmas_cap == cap).all()

    # --- circuit digest = H(cap || degree_bits)
    digest_in = np.concatenate([cap.reshape(-1),
                                np.array([db], np.uint64)])
    digest = _sponge_hash(digest_in[None, :])[0]
    assert (data.vk.circuit_digest == digest).all()


def test_semaphore_build_independent():
    """The flagship Semaphore circuit (2^20 members, zk): builder output ==
    test-local plonky2-semantics re-derivation, field by field."""
    data, _ = build_semaphore_circuit(semaphore_config(), tree_height=20)
    _check_build(data, data.common.config)


def test_aggregation_build_independent():
    """The aggregation circuit (in-circuit verifier of two small-config
    children) through the same independent accounting."""
    if not os.environ.get("SVT_SLOW"):
        # the small-config variant below runs always-on; the zk20-height
        # aggregation build is minutes of gadget construction
        from stark_verifier_tpu.models import flagship as FS
        from stark_verifier_tpu.semaphore.recursion import (
            build_aggregation_circuit)
        _, common, vk = FS.build_semaphore_batch(
            n_members_bits=4, batch=8, config=FS.small_config(),
            cache_tag="entry8")
        agg = build_aggregation_circuit(common)
        _check_build(agg.data, agg.data.common.config)
    else:
        from stark_verifier_tpu.semaphore.recursion import (
            build_aggregation_circuit)
        data, _ = build_semaphore_circuit(semaphore_config(), tree_height=20)
        agg = build_aggregation_circuit(data.common)
        _check_build(agg.data, agg.data.common.config)
