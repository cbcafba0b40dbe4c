"""Native batched plonky2 proof verifier.

Everything the reference *constrains* in its Halo2 circuit, this module
*computes* directly: Fiat–Shamir challenge replay (reference:
chip/plonk/plonk_verifier_chip.rs:55-154), the vanishing-polynomial identity
at zeta (reference: chip/plonk/vanishing_poly.rs), and full FRI verification
(reference: chip/fri_chip.rs).

Backend-generic and branch-free: with the JAX backend the single-proof
verifier jits, vmaps over a proof batch, and shards over a device mesh; all
control flow is static in the circuit shape (CommonData).
"""
from __future__ import annotations

import numpy as np

from ..ops import ext2
from ..ops import poseidon_gl as pg
from ..utils.bits import reverse_bits
from .challenger import Challenger
from .gates import eval_filtered
from .merkle import verify_merkle_proof_to_cap
from .rings import ExtRing
from .types import CommonData, Proof

GENERATOR = 7  # multiplicative group generator of Goldilocks
P = 0xFFFFFFFF00000001
ORDER = 0xFFFFFFFF00000000  # p - 1


def _g_pow(e: int) -> int:
    from ..ops.gl64_np import P

    return pow(GENERATOR, e % (P - 1), P)


def primitive_root(bits: int) -> int:
    return _g_pow(ORDER >> bits)


def _is_gf(x):
    return hasattr(x, "l0")


def _col(F, arr, i):
    """arr[..., i] for a stacked backend array."""
    if _is_gf(arr):
        from ..ops.gl64_jax import gmap

        return gmap(lambda a: a[..., i], arr)
    return arr[..., i]


def _ext_at(F, arr2, i):
    """Row i of an [n, 2] ext array -> (c0, c1)."""
    row = _col(F, _col(F, arr2, 0), i), _col(F, _col(F, arr2, 1), i)
    return row


def _ext_list(F, arr2):
    """[n, 2] ext array -> list of (c0, c1)."""
    n = arr2.l0.shape[-2] if _is_gf(arr2) else arr2.shape[-2]
    c0 = _col(F, arr2, 0)
    c1 = _col(F, arr2, 1)
    return [(_col(F, c0, i), _col(F, c1, i)) for i in range(n)]


def _scalar_list(F, arr):
    n = arr.l0.shape[-1] if _is_gf(arr) else arr.shape[-1]
    return [_col(F, arr, i) for i in range(n)]


def _digest_rows(F, cap):
    """[c, 4] -> list of 4-element digests."""
    c = cap.l0.shape[0] if _is_gf(cap) else cap.shape[0]
    return [[_col(F, _row(F, cap, r), i) for i in range(4)] for r in range(c)]


def _row(F, arr, r):
    if _is_gf(arr):
        from ..ops.gl64_jax import gmap

        return gmap(lambda a: a[r], arr)
    return arr[r]


class ProofChallenges:
    def __init__(self):
        self.plonk_betas = None
        self.plonk_gammas = None
        self.plonk_alphas = None
        self.plonk_zeta = None
        self.fri_alpha = None
        self.fri_betas = None
        self.fri_pow_response = None
        self.fri_query_indices = None


def _perm_for(F, common):
    """Transcript/Merkle permutation for the proof's hash config
    (reference: plonky2_config.rs:53-104)."""
    from ..ops.hashers import get_permute

    return get_permute(getattr(common.config, "hasher", "poseidon"), F)


def get_challenges(F, common: CommonData, pa: dict, pi_hash, circuit_digest):
    """Replay the exact challenger schedule (reference:
    plonk_verifier_chip.rs:55-154).

    On a JAX backend the schedule is recorded and every permutation runs in
    ONE lax.scan (TapeChallenger) — byte-exact, but the inlined permutation
    body appears once in the trace instead of once per duplex step."""
    from .challenger import TapeChallenger, resolve_challenges

    nc = common.config.num_challenges
    use_tape = getattr(F, "IS_JAX", False)
    cls = TapeChallenger if use_tape else Challenger
    ch = cls(F, permute=_perm_for(F, common))
    for e in _scalar_list(F, circuit_digest):
        ch.observe_element(e)
    for e in pi_hash:
        ch.observe_element(e)
    ch.observe_cap(_digest_rows(F, pa["wires_cap"]))
    out = ProofChallenges()
    out.plonk_betas = ch.get_n_challenges(nc)
    out.plonk_gammas = ch.get_n_challenges(nc)
    ch.observe_cap(_digest_rows(F, pa["zs_pp_cap"]))
    out.plonk_alphas = ch.get_n_challenges(nc)
    ch.observe_cap(_digest_rows(F, pa["quotient_cap"]))
    out.plonk_zeta = ch.get_extension_challenge()

    flat_openings = [
        c for batch in _opening_batches(F, pa) for e in batch for c in (e[0], e[1])
    ]
    ch.observe_elements(flat_openings)
    out.fri_alpha = ch.get_extension_challenge()
    out.fri_betas = []
    cpc = pa["commit_phase_caps"]
    ncaps = cpc.l0.shape[0] if _is_gf(cpc) else cpc.shape[0]
    for i in range(ncaps):
        ch.observe_cap(_digest_rows(F, _row(F, pa["commit_phase_caps"], i)))
        out.fri_betas.append(ch.get_extension_challenge())
    ch.observe_elements(
        [c for e in _ext_list(F, pa["final_poly"]) for c in (e[0], e[1])]
    )
    ch.observe_element(pa["pow_witness"])
    out.fri_pow_response = ch.get_challenge()
    out.fri_query_indices = ch.get_n_challenges(common.config.fri_config.num_query_rounds)
    if use_tape:
        vals = ch.finalize()
        for f in ("plonk_betas", "plonk_gammas", "plonk_alphas",
                  "plonk_zeta", "fri_alpha", "fri_betas",
                  "fri_pow_response", "fri_query_indices"):
            setattr(out, f, resolve_challenges(getattr(out, f), vals))
    return out


def _opening_batches(F, pa):
    """Openings in transcript order (reference: types/assigned.rs:26-45)."""
    zeta_batch = (
        _ext_list(F, pa["open_constants"])
        + _ext_list(F, pa["open_plonk_sigmas"])
        + _ext_list(F, pa["open_wires"])
        + _ext_list(F, pa["open_plonk_zs"])
        + _ext_list(F, pa["open_partial_products"])
        + _ext_list(F, pa["open_quotient_polys"])
    )
    zeta_next_batch = _ext_list(F, pa["open_plonk_zs_next"])
    return [zeta_batch, zeta_next_batch]


# --------------------------------------------------------------- vanishing
def eval_vanishing_poly(F, common: CommonData, ch, pa, pi_hash):
    """reference: chip/plonk/vanishing_poly.rs:18-124."""
    R = ExtRing(F)
    nc = common.config.num_challenges
    num_prods = common.num_partial_products
    qdf = common.quotient_degree_factor

    zeta = ch.plonk_zeta
    zeta_pow_deg = R.exp_power_of_2(zeta, common.degree_bits)

    local_constants = _ext_list(F, pa["open_constants"])
    local_wires = _ext_list(F, pa["open_wires"])
    local_zs = _ext_list(F, pa["open_plonk_zs"])
    next_zs = _ext_list(F, pa["open_plonk_zs_next"])
    s_sigmas = _ext_list(F, pa["open_plonk_sigmas"])
    partial_products = _ext_list(F, pa["open_partial_products"])

    pi_hash_ext = [R.from_base(h) for h in pi_hash]

    # gate constraints
    num_selectors = common.selectors_info.num_selectors
    if getattr(F, "IS_JAX", False):
        combined = _gate_constraints_stacked(
            F, R, common, local_constants, local_wires, pi_hash_ext)
    else:
        combined = [R.zero() for _ in range(common.num_gate_constraints)]
        for i, gate in enumerate(common.gates):
            si = common.selectors_info.selector_indices[i]
            group = range(*common.selectors_info.groups[si])
            eval_filtered(R, gate, si, group, num_selectors, i,
                          local_constants, local_wires, pi_hash_ext, combined)

    # L_0(zeta) = (zeta^n - 1) / (n (zeta - 1))
    one = R.one()
    zero_poly = R.sub(zeta_pow_deg, one)
    n_const = R.const(common.degree)
    denom = R.mul(n_const, R.sub(zeta, one))
    l_0 = R.div(zero_poly, denom)

    if getattr(F, "IS_JAX", False):
        # all k_i * zeta lanes with two stacked base muls
        kis = F.from_u64(np.asarray(common.k_is, np.uint64))
        shape = zeta[0].shape
        kis = F.reshape(kis, (len(common.k_is),) + (1,) * len(shape))
        s_ids_st = (F.mul(kis, zeta[0]), F.mul(kis, zeta[1]))
        from .gates import _se_unstack_1d

        s_ids = _se_unstack_1d(F, s_ids_st)
    else:
        s_ids = [ext2.scalar_mul(F, zeta, F.const(int(k))) for k in common.k_is]

    vanishing_z_1_terms = []
    vanishing_pp_terms = []
    nr = common.config.num_routed_wires
    use_stacked = getattr(F, "IS_JAX", False) and nr % qdf == 0
    if use_stacked:
        from .gates import _se_stack

        wires_st = _se_stack(F, local_wires[:nr])
        sids_st = _se_stack(F, s_ids)
        sigm_st = _se_stack(F, s_sigmas)
    for i in range(nc):
        z_x = local_zs[i]
        z_gx = next_zs[i]
        vanishing_z_1_terms.append(R.sub(R.mul(l_0, z_x), l_0))
        beta = R.from_base(ch.plonk_betas[i])
        gamma = R.from_base(ch.plonk_gammas[i])
        cur_partials = partial_products[i * num_prods : (i + 1) * num_prods]
        accs = [z_x] + cur_partials + [z_gx]
        if use_stacked:
            # wires/sigma/s_id lanes stacked: one ext op per formula step
            wpg = ext2.add(F, wires_st, gamma)
            nume = ext2.add(F, ext2.mul(F, _b(F, beta, nr), sids_st), wpg)
            deno = ext2.add(F, ext2.mul(F, _b(F, beta, nr), sigm_st), wpg)
            nume_p = _chunk_prod(F, nume, qdf)  # [nr/qdf, ...]
            deno_p = _chunk_prod(F, deno, qdf)
            for k in range(nr // qdf):
                np_k = _se_row(F, nume_p, k)
                dp_k = _se_row(F, deno_p, k)
                vanishing_pp_terms.append(
                    R.sub(R.mul(accs[k], np_k), R.mul(accs[k + 1], dp_k))
                )
        else:
            numerators, denominators = [], []
            for j in range(nr):
                wire_plus_gamma = R.add(local_wires[j], gamma)
                numerators.append(R.mul_add(beta, s_ids[j], wire_plus_gamma))
                denominators.append(R.mul_add(beta, s_sigmas[j], wire_plus_gamma))
            for c in range(0, nr, qdf):
                k = c // qdf
                nume_prod = _prod(R, numerators[c : c + qdf])
                denom_prod = _prod(R, denominators[c : c + qdf])
                # prev_acc * nume - next_acc * denom
                vanishing_pp_terms.append(
                    R.sub(R.mul(accs[k], nume_prod), R.mul(accs[k + 1], denom_prod))
                )

    all_terms = vanishing_z_1_terms + vanishing_pp_terms + combined
    out = []
    for alpha in ch.plonk_alphas:
        out.append(R.reduce_with_powers(R.from_base(alpha), all_terms))
    return out, zeta_pow_deg


def _prod(R, terms):
    acc = None
    for t in terms:
        acc = t if acc is None else R.mul(acc, t)
    return acc if acc is not None else R.one()


def _gate_constraints_stacked(F, R, common, local_constants, local_wires, pi_hash_ext):
    """filter * constraints accumulated on a stacked lane axis (JAX path):
    one ext mul_add per gate instead of one per constraint."""
    from .gates import UNUSED_SELECTOR, _se_stack, _se_unstack_1d

    num_selectors = common.selectors_info.num_selectors
    ngc = common.num_gate_constraints
    shape = local_wires[0][0].shape
    combined = (F.zeros((ngc,) + shape), F.zeros((ngc,) + shape))
    zero = (F.zeros(shape), F.zeros(shape))
    for i, gate in enumerate(common.gates):
        si = common.selectors_info.selector_indices[i]
        group = range(*common.selectors_info.groups[si])
        f = local_constants[si]
        ks = [k for k in group if k != i]
        if num_selectors > 1:
            ks.append(UNUSED_SELECTOR)
        filt = None
        for k in ks:
            term = R.sub(R.const(k), f)
            filt = term if filt is None else R.mul(filt, term)
        if filt is None:
            filt = R.one()
        cs = gate.eval_unfiltered(
            R, local_constants[num_selectors:], local_wires, pi_hash_ext)
        if not cs:
            continue
        cs = cs + [zero] * (ngc - len(cs))
        cst = _se_stack(F, cs)
        combined = ext2.add(F, ext2.mul(F, filt, cst), combined)
    return _se_unstack_1d(F, combined)


def _b(F, ext_scalar, k):
    """broadcast a scalar ext against a leading stacked axis (implicit)."""
    return ext_scalar


def _se_row(F, se, k):
    from ..ops.gl64_jax import gmap

    return (gmap(lambda a: a[k], se[0]), gmap(lambda a: a[k], se[1]))


def _chunk_prod(F, se, qdf):
    """Product along chunks of size qdf of a stacked ext array [n, ...]."""
    from ..ops.gl64_jax import gmap

    n = se[0].l0.shape[0]
    k = n // qdf
    sh = se[0].l0.shape[1:]
    c0 = gmap(lambda a: a.reshape((k, qdf) + sh), se[0])
    c1 = gmap(lambda a: a.reshape((k, qdf) + sh), se[1])
    acc = (gmap(lambda a: a[:, 0], c0), gmap(lambda a: a[:, 0], c1))
    for j in range(1, qdf):
        term = (gmap(lambda a, j=j: a[:, j], c0), gmap(lambda a, j=j: a[:, j], c1))
        acc = ext2.mul(F, acc, term)
    return acc


# --------------------------------------------------------------------- FRI
def _bits_of(F, x, n):
    return [F.bit(x, i) for i in range(n)]


def _uint_from_bits(bits_i32):
    """Assemble an int32 index array from 0/1 arrays (little-endian)."""
    acc = bits_i32[0] * 0
    for k, b in enumerate(bits_i32):
        acc = acc + b * np.int32(1 << k)
    return acc


def _exp_from_bits_rev(F, base: int, bits):
    """base ** (sum_i bits[i] * 2^(n-1-i)) — i.e. base^(bit-reversed index)."""
    n = len(bits)
    acc = F.ones(_shape(bits[0]) if hasattr(bits[0], "shape") else ())
    for i, b in enumerate(bits):
        factor = F.const(pow(base, 1 << (n - 1 - i), 0xFFFFFFFF00000001))
        mask = b != 0 if not _is_bool(b) else b
        acc = F.mul(acc, F.select(mask, factor, F.ones(_shape(b))))
    return acc


def _shape(x):
    return getattr(x, "shape", np.shape(x))


def _is_bool(x):
    dt = getattr(x, "dtype", None)
    return dt is not None and dt == bool


def verify_fri(F, common: CommonData, ch, pa, vk_cap, reduced_openings, zeta, zeta_next, ok):
    """reference: chip/fri_chip.rs:228-377."""
    R = ExtRing(F)
    fp = common.fri_params
    lde_bits = fp.lde_bits
    cap_height = fp.config.cap_height
    nq = fp.config.num_query_rounds
    pow_bits = fp.config.proof_of_work_bits

    # proof of work: top `pow_bits` bits of the canonical response are zero
    pw = ch.fri_pow_response
    for i in range(64 - pow_bits, 64):
        ok = ok & (F.bit(pw, i) == 0)

    omega = primitive_root(lde_bits)

    # stack the query indices: each is a scalar challenge; bits -> [Q] arrays
    xi = F.stack(ch.fri_query_indices)  # [Q]
    bits = _bits_of(F, xi, lde_bits)
    if cap_height == 0:
        cap_index = _as_i32(bits[0]) * 0  # zero index, keeps [Q] shape
    else:
        cap_index = _uint_from_bits([_as_i32(b) for b in bits[lde_bits - cap_height :]])

    # ---- initial tree proofs: leaf-hash each oracle, then ONE merged path
    # walk over 4*Q lanes (the 4 oracle trees share depth and index bits)
    oracles = common.fri_oracles()
    depth = lde_bits - cap_height
    perm = _perm_for(F, common)
    caps = [vk_cap, pa["wires_cap"], pa["zs_pp_cap"], pa["quotient_cap"]]
    states = []
    for o in range(4):
        leaf = _scalar_list(F, pa[f"init_evals_{o}"])
        states.append(pg.hash_or_noop(F, leaf, shape=_shape(leaf[0]), permute=perm))
    big_state = [F.concat([states[o][i] for o in range(4)], axis=0) for i in range(4)]
    big_bits = [
        _tile4(F, b) for b in bits[:depth]
    ]
    big_sibs = [
        [
            F.concat(
                [_col(F, _col_axis(F, pa[f"init_sibs_{o}"], d, axis=-2), i)
                 for o in range(4)],
                axis=0,
            )
            for i in range(4)
        ]
        for d in range(depth)
    ]
    from .merkle import _merkle_walk_scan

    if getattr(F, "IS_JAX", False) and depth >= 2:
        big_state = _merkle_walk_scan(F, big_state, big_bits, big_sibs, permute=perm)
    else:
        for b, sib in zip(big_bits, big_sibs):
            mask = b != 0
            left = [F.select(mask, sib[i], big_state[i]) for i in range(4)]
            right = [F.select(mask, big_state[i], sib[i]) for i in range(4)]
            big_state = pg.two_to_one(F, left, right, shape=_shape(left[0]),
                                      permute=perm)
    nq_lanes = _shape(bits[0])[0] if _shape(bits[0]) else 1
    for o in range(4):
        expected = F.take(caps[o], cap_index, axis=0)  # [Q, 4]
        for i in range(4):
            lane = F.index(big_state[i], slice(o * nq_lanes, (o + 1) * nq_lanes))
            eq = F.equal(_col(F, expected, i), lane)
            ok = ok & _all(eq)

    # ---- x = g * omega^rev(index)
    x = F.mul(F.const(GENERATOR, _shape(bits[0])), _exp_from_bits_rev(F, omega, bits))

    # ---- DEEP batching of initial polynomials
    x_ext = (x, F.zeros(_shape(x)))
    alpha = ch.fri_alpha
    alpha_b = _broadcast_ext(F, alpha, _shape(x))
    salt0 = common.salt_size(oracles[0][1])
    salt_w = common.salt_size(oracles[1][1])
    salt_z = common.salt_size(oracles[2][1])
    salt_q = common.salt_size(oracles[3][1])
    e0 = _scalar_list(F, pa["init_evals_0"])
    e1 = _scalar_list(F, pa["init_evals_1"])
    e2 = _scalar_list(F, pa["init_evals_2"])
    e3 = _scalar_list(F, pa["init_evals_3"])
    zeta_vals = (
        e0[: len(e0) - salt0]
        + e1[: len(e1) - salt_w]
        + e2[: len(e2) - salt_z]
        + e3[: len(e3) - salt_q]
    )
    zs_vals = e2[: common.config.num_challenges]

    summ = ext2.zero(F, _shape(x))
    for point, vals, ro in (
        (zeta, zeta_vals, reduced_openings[0]),
        (zeta_next, zs_vals, reduced_openings[1]),
    ):
        reduced_evals = ext2.reduce_base_terms(F, alpha_b, vals)
        point_b = _broadcast_ext(F, point, _shape(x))
        ro_b = _broadcast_ext(F, ro, _shape(x))
        numerator = ext2.sub(F, reduced_evals, ro_b)
        denominator = ext2.sub(F, x_ext, point_b)
        summ = ext2.mul(F, ext2.pow_const(F, alpha_b, len(vals), _shape(x)), summ)
        summ = ext2.add(F, ext2.div(F, numerator, denominator), summ)
    prev_eval = summ

    # ---- fold phase
    n_layers = len(fp.reduction_arity_bits)
    if (getattr(F, "IS_JAX", False) and n_layers >= 2
            and all(a == 1 for a in fp.reduction_arity_bits)):
        prev_eval, x, ok = _fold_layers_scan(
            F, common, ch, pa, bits, cap_index, prev_eval, x, ok)
        cur_bits = bits[n_layers:]
        return _fri_final(F, common, pa, prev_eval, x, ok)
    cur_bits = bits
    for li, arity_bits in enumerate(fp.reduction_arity_bits):
        arity = 1 << arity_bits
        evals = pa[f"step_evals_{li}"]  # [Q, arity, 2]
        e = [
            (_col(F, _col_axis(F, evals, j, axis=-2), 0),
             _col(F, _col_axis(F, evals, j, axis=-2), 1))
            for j in range(arity)
        ]
        idx_bits = cur_bits[:arity_bits]  # LE: x_index_within_coset
        masks = [b != 0 if not _is_bool(b) else b for b in idx_bits]

        # consistency: evals[x_index_within_coset] == prev_eval
        # (binary select tree over the LE index bits)
        sel = e
        for m in masks:
            sel = [ext2.select(F, m, sel[2 * k + 1], sel[2 * k])
                   for k in range(len(sel) // 2)]
        at_idx = sel[0]
        ok = ok & _all(ext2.equal(F, prev_eval, at_idx))

        beta = _broadcast_ext(F, ch.fri_betas[li], _shape(x))
        if arity_bits == 1:
            # 2-point interpolation at beta; g = -1
            e_0, e_1 = e
            coset_start = F.select(masks[0], F.neg(x), x)  # x * (-1)^b0
            a0 = (coset_start, F.zeros(_shape(x)))
            b0p = (F.neg(coset_start), F.zeros(_shape(x)))
            num = ext2.mul(F, ext2.sub(F, beta, a0), ext2.sub(F, e_1, e_0))
            den = ext2.sub(F, b0p, a0)
            prev_eval = ext2.add(F, ext2.div(F, num, den), e_0)
        else:
            # general arity (exceeds the reference — its fri_chip.rs:211
            # TODO): interpolate {(coset_start * g^i, eval_rev[i])} at beta,
            # plonky2 compute_evaluation semantics. coset_start =
            # x * g^{-rev(idx)}; evals reordered by in-coset bit reversal.
            g = primitive_root(arity_bits)
            g_inv = pow(g, P - 2, P)
            coset_start = x
            for j in range(arity_bits):
                # rev(idx) bit j is idx_bits[arity_bits - 1 - j]
                c = F.const(pow(g_inv, 1 << j, P), _shape(x))
                coset_start = F.select(masks[arity_bits - 1 - j],
                                       F.mul(coset_start, c), coset_start)
            ev = [e[int(f"{i:0{arity_bits}b}"[::-1], 2)] for i in range(arity)]
            # barycentric closed form on the multiplicative coset:
            #   prod_j (beta - cs*g^j)      = beta^arity - cs^arity
            #   prod_{j!=i} (cs*g^i - cs*g^j) = arity * cs^(arity-1) * g^{-i}
            # => I(beta) = (beta^arity - cs^arity) / (arity * cs^(arity-1))
            #              * sum_i ev[i] * g^i / (beta - cs*g^i)
            cs_ext = (coset_start, F.zeros(_shape(x)))
            cs_pow = ext2.pow_const(F, cs_ext, arity, _shape(x))
            beta_pow = ext2.pow_const(F, beta, arity, _shape(x))
            front = ext2.div(
                F,
                ext2.sub(F, beta_pow, cs_pow),
                ext2.mul(
                    F,
                    (F.const(arity, _shape(x)), F.zeros(_shape(x))),
                    ext2.pow_const(F, cs_ext, arity - 1, _shape(x)),
                ),
            )
            total = ext2.zero(F, _shape(x))
            for i in range(arity):
                gi = F.const(pow(g, i, P), _shape(x))
                x_i = (F.mul(coset_start, gi), F.zeros(_shape(x)))
                term = ext2.div(
                    F,
                    ext2.mul(F, ev[i], (gi, F.zeros(_shape(x)))),
                    ext2.sub(F, beta, x_i),
                )
                total = ext2.add(F, total, term)
            prev_eval = ext2.mul(F, front, total)

        # merkle proof of the coset leaf against commit-phase cap li
        coset_bits = cur_bits[arity_bits:]
        d_i = len(coset_bits) - cap_height
        sibs = pa[f"step_sibs_{li}"]  # [Q, d_i, 4]
        leaf = [c for ej in e for c in ej]  # flattened stored order
        siblings = [
            [_col(F, _col_axis(F, sibs, d, axis=-2), i) for i in range(4)]
            for d in range(d_i)
        ]
        cap_li = _row(F, pa["commit_phase_caps"], li)
        res = verify_merkle_proof_to_cap(F, leaf, coset_bits[:d_i], siblings,
                                         cap_li, cap_index, permute=perm)
        ok = ok & _all(res)

        for _ in range(arity_bits):
            x = F.mul(x, x)
        cur_bits = coset_bits

    return _fri_final(F, common, pa, prev_eval, x, ok)


def _fri_final(F, common, pa, prev_eval, x, ok):
    """Final FRI check: the folded evaluation equals the committed final
    polynomial at x (reference: chip/fri_chip.rs:317-325)."""
    final_coeffs = [
        _broadcast_ext(F, e, _shape(x)) for e in _ext_list(F, pa["final_poly"])
    ]
    final_eval = ext2.reduce_with_powers(F, (x, F.zeros(_shape(x))), final_coeffs)
    ok = ok & _all(ext2.equal(F, prev_eval, final_eval))
    return ok


def _fold_layers_scan(F, common, ch, pa, bits, cap_index, prev_eval, x, ok):
    """All arity-2 fold layers as one lax.scan; per-layer Merkle paths of
    decreasing depth are padded to the first layer's depth with pass-through
    masking (reference: chip/fri_chip.rs:275-316, vectorized)."""
    import jax
    import jax.numpy as jnp

    from .merkle import merkle_walk_scan_masked

    perm = _perm_for(F, common)
    fp = common.fri_params
    lde_bits = fp.lde_bits
    cap_height = fp.config.cap_height
    L = len(fp.reduction_arity_bits)
    d_max = lde_bits - 1 - cap_height
    qshape = _shape(x)

    # stacked per-layer inputs
    ev = [pa[f"step_evals_{li}"] for li in range(L)]
    e0c0 = F.stack([_col(F, _col_axis(F, e, 0, axis=-2), 0) for e in ev])  # [L, Q]
    e0c1 = F.stack([_col(F, _col_axis(F, e, 0, axis=-2), 1) for e in ev])
    e1c0 = F.stack([_col(F, _col_axis(F, e, 1, axis=-2), 0) for e in ev])
    e1c1 = F.stack([_col(F, _col_axis(F, e, 1, axis=-2), 1) for e in ev])
    beta0 = F.stack([b[0] for b in ch.fri_betas])  # [L]
    beta1 = F.stack([b[1] for b in ch.fri_betas])
    caps = pa["commit_phase_caps"]  # GF [L, cap, 4]

    # sibling tensors padded to d_max: [L, d_max, 4, Q]
    sib_layers = []
    for li in range(L):
        d_i = (lde_bits - li - 1) - cap_height
        s = pa[f"step_sibs_{li}"]  # [Q, d_i, 4]
        planes = F.stack(
            [F.stack([_col(F, _col_axis(F, s, d, axis=-2), i) for i in range(4)])
             for d in range(d_i)]
        ) if d_i > 0 else F.zeros((0, 4) + qshape)
        pad = F.zeros((d_max - d_i, 4) + qshape)
        sib_layers.append(F.concat([planes, pad], axis=0) if d_i < d_max else planes)
    sibs_all = F.stack(sib_layers)  # [L, d_max, 4, Q]
    valid = np.zeros((L, d_max), dtype=bool)
    for li in range(L):
        valid[li, : (lde_bits - li - 1) - cap_height] = True

    # bits matrices: layer li consumes bit li (coset parity) and walk bits
    # li+1 .. li+d_i (plus padding)
    bits_arr = jnp.stack([jnp.broadcast_to(jnp.asarray(b), qshape) for b in bits])
    pad_bits = jnp.zeros((d_max,) + qshape, dtype=bits_arr.dtype)
    bits_pad = jnp.concatenate([bits_arr, pad_bits], axis=0)
    b0_all = bits_arr[:L]  # [L, Q]
    walk_bits = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(bits_pad, li + 1, d_max, 0) for li in range(L)]
    )  # [L, d_max, Q]

    zero_q = F.zeros(qshape)

    def body(carry, xs):
        prev, xv, okc = carry
        b0, wb, sib, e00, e01, e10, e11, bt0, bt1, cap, vmask = xs
        mask = b0 != 0
        e_0 = (e00, e01)
        e_1 = (e10, e11)
        at_idx = ext2.select(F, mask, e_1, e_0)
        okc = okc & jnp.all(ext2.equal(F, prev, at_idx))

        coset_start = F.select(mask, F.neg(xv), xv)
        a0 = (coset_start, zero_q)
        b0p = (F.neg(coset_start), zero_q)
        beta = _broadcast_ext(F, (bt0, bt1), qshape)
        num = ext2.mul(F, ext2.sub(F, beta, a0), ext2.sub(F, e_1, e_0))
        den = ext2.sub(F, b0p, a0)
        prev = ext2.add(F, ext2.div(F, num, den), e_0)

        leaf = [e_0[0], e_0[1], e_1[0], e_1[1]]
        state = pg.hash_or_noop(F, leaf, shape=qshape, permute=perm)
        state = merkle_walk_scan_masked(F, state, wb, sib, vmask, permute=perm)
        expected = F.take(cap, cap_index, axis=0)  # [Q, 4]
        for i in range(4):
            okc = okc & jnp.all(F.equal(_col(F, expected, i), state[i]))

        xv = F.mul(xv, xv)
        return (prev, xv, okc), None

    okc0 = jnp.asarray(True)
    (prev_eval, x, okl), _ = jax.lax.scan(
        body,
        (prev_eval, x, okc0),
        (b0_all, walk_bits, sibs_all, e0c0, e0c1, e1c0, e1c1, beta0, beta1,
         caps, jnp.asarray(valid)),
    )
    return prev_eval, x, ok & okl


def _col_axis(F, arr, i, axis):
    if _is_gf(arr):
        from ..ops.gl64_jax import gmap

        return gmap(lambda a: jnp_take(a, i, axis), arr)
    return np.take(arr, i, axis=axis % arr.ndim)


def jnp_take(a, i, axis):
    import jax.numpy as jnp

    return jnp.take(a, i, axis=axis % a.ndim)


def _tile4(F, b):
    if isinstance(b, np.ndarray):
        return np.concatenate([b] * 4)
    import jax.numpy as jnp

    return jnp.concatenate([b] * 4)


def _as_i32(b):
    if isinstance(b, np.ndarray) or np.isscalar(b):
        return np.asarray(b, dtype=np.int32)
    return b.astype("int32")


def _all(mask):
    if isinstance(mask, (bool, np.bool_, np.ndarray, np.generic)):
        return np.all(mask)
    import jax.numpy as jnp

    return jnp.all(mask)


def _broadcast_ext(F, e, shape):
    """Broadcast a scalar ext element to `shape`."""
    if not shape:
        return e
    zero = F.zeros(shape)
    return (F.add(e[0], zero), F.add(e[1], zero))


# ---------------------------------------------------------------- top level
def proof_to_arrays(proof: Proof) -> dict:
    """Flatten a Proof into the named-array dict the verifier consumes."""
    pa = {
        "wires_cap": proof.wires_cap,
        "zs_pp_cap": proof.plonk_zs_partial_products_cap,
        "quotient_cap": proof.quotient_polys_cap,
        "open_constants": proof.openings.constants,
        "open_plonk_sigmas": proof.openings.plonk_sigmas,
        "open_wires": proof.openings.wires,
        "open_plonk_zs": proof.openings.plonk_zs,
        "open_plonk_zs_next": proof.openings.plonk_zs_next,
        "open_partial_products": proof.openings.partial_products,
        "open_quotient_polys": proof.openings.quotient_polys,
        "commit_phase_caps": proof.opening_proof.commit_phase_caps,
        "final_poly": proof.opening_proof.final_poly,
        "pow_witness": np.asarray(proof.opening_proof.pow_witness, dtype=np.uint64),
        "public_inputs": proof.public_inputs,
    }
    for o in range(4):
        pa[f"init_evals_{o}"] = proof.opening_proof.query_rounds.initial_evals[o]
        pa[f"init_sibs_{o}"] = proof.opening_proof.query_rounds.initial_siblings[o]
    for i in range(len(proof.opening_proof.query_rounds.step_evals)):
        pa[f"step_evals_{i}"] = proof.opening_proof.query_rounds.step_evals[i]
        pa[f"step_sibs_{i}"] = proof.opening_proof.query_rounds.step_siblings[i]
    return pa


def arrays_to_backend(F, pa: dict) -> dict:
    return {k: F.from_u64(v) for k, v in pa.items()}


def verify(F, common: CommonData, vk_cap, circuit_digest, pa: dict):
    """Verify one proof; returns a boolean accept (array-typed for JAX).

    `pa` values are backend elements (see arrays_to_backend); `vk_cap` is a
    [cap, 4] backend array, `circuit_digest` a [4] backend array.
    """
    R = ExtRing(F)

    pi_hash = pg.hash_no_pad(F, _scalar_list(F, pa["public_inputs"]))
    ch = get_challenges(F, common, pa, pi_hash, circuit_digest)

    vanishing, zeta_pow_deg = eval_vanishing_poly(F, common, ch, pa, pi_hash)

    ok = None
    one = R.one()
    z_h_zeta = R.sub(zeta_pow_deg, one)
    quotient_list = _ext_list(F, pa["open_quotient_polys"])
    qdf = common.quotient_degree_factor
    for i in range(common.config.num_challenges):
        chunk = quotient_list[i * qdf : (i + 1) * qdf]
        recombined = R.reduce_with_powers(zeta_pow_deg, chunk)
        computed = R.mul(z_h_zeta, recombined)
        eq = ext2.equal(F, vanishing[i], computed)
        ok = eq if ok is None else (ok & eq)
    ok = _all(ok)

    # FRI
    alpha = ch.fri_alpha
    batches = _opening_batches(F, pa)
    reduced_openings = [
        ext2.reduce_with_powers(F, alpha, b) for b in batches
    ]
    g_zeta_factor = F.const(_g_pow(ORDER >> common.degree_bits))
    zeta_next = ext2.scalar_mul(F, ch.plonk_zeta, g_zeta_factor)
    ok = verify_fri(F, common, ch, pa, vk_cap,
                    reduced_openings, ch.plonk_zeta, zeta_next, ok)
    return ok


def verify_proof(F, common: CommonData, vk, proof: Proof):
    """Convenience single-proof entry (host/golden-model use)."""
    pa = arrays_to_backend(F, proof_to_arrays(proof))
    return verify(F, common, F.from_u64(vk.constants_sigmas_cap),
                  F.from_u64(vk.circuit_digest), pa)


# ------------------------------------------------------------ phased verify
# The same mathematics as `verify`, split at natural protocol boundaries so
# each jit compiles a ~3x smaller graph (XLA compile time is superlinear in
# graph size on these op mixes; see NOTES_ROUND1.md). Challenges cross the
# phase boundary as a plain pytree (dict of lists/tuples of F elements).
def phase_challenges(F, common: CommonData, circuit_digest, pa: dict):
    """Phase 1: public-input hash + Fiat–Shamir replay."""
    pi_hash = pg.hash_no_pad(F, _scalar_list(F, pa["public_inputs"]))
    ch = get_challenges(F, common, pa, pi_hash, circuit_digest)
    ch_tree = {
        "plonk_betas": ch.plonk_betas,
        "plonk_gammas": ch.plonk_gammas,
        "plonk_alphas": ch.plonk_alphas,
        "plonk_zeta": ch.plonk_zeta,
        "fri_alpha": ch.fri_alpha,
        "fri_betas": ch.fri_betas,
        "fri_pow_response": ch.fri_pow_response,
        "fri_query_indices": ch.fri_query_indices,
    }
    return pi_hash, ch_tree


def _ch_from_tree(t) -> "ProofChallenges":
    ch = ProofChallenges()
    for k, v in t.items():
        setattr(ch, k, v)
    return ch


def phase_vanishing(F, common: CommonData, pa: dict, pi_hash, ch_tree):
    """Phase 2: vanishing polynomial at zeta + quotient recombination."""
    R = ExtRing(F)
    ch = _ch_from_tree(ch_tree)
    vanishing, zeta_pow_deg = eval_vanishing_poly(F, common, ch, pa, pi_hash)
    ok = None
    z_h_zeta = R.sub(zeta_pow_deg, R.one())
    quotient_list = _ext_list(F, pa["open_quotient_polys"])
    qdf = common.quotient_degree_factor
    for i in range(common.config.num_challenges):
        chunk = quotient_list[i * qdf : (i + 1) * qdf]
        recombined = R.reduce_with_powers(zeta_pow_deg, chunk)
        computed = R.mul(z_h_zeta, recombined)
        eq = ext2.equal(F, vanishing[i], computed)
        ok = eq if ok is None else (ok & eq)
    return _all(ok)


def phase_fri(F, common: CommonData, vk_cap, pa: dict, ch_tree, ok):
    """Phase 3: DEEP reduced openings + full FRI verification."""
    ch = _ch_from_tree(ch_tree)
    alpha = ch.fri_alpha
    batches = _opening_batches(F, pa)
    reduced_openings = [ext2.reduce_with_powers(F, alpha, b) for b in batches]
    g_zeta_factor = F.const(_g_pow(ORDER >> common.degree_bits))
    zeta_next = ext2.scalar_mul(F, ch.plonk_zeta, g_zeta_factor)
    return verify_fri(F, common, ch, pa, vk_cap,
                      reduced_openings, ch.plonk_zeta, zeta_next, ok)
