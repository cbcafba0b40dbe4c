"""plonky2-compatible prover (host side, numpy, batched over witnesses).

Produces proofs that the TPU verifier (core/verifier.py) accepts, with the
identical transcript schedule the reference constrains. Whole pipeline is
vectorized over a leading batch of witnesses for the same circuit: wire FFTs,
Merkle forests, permutation argument, quotient evaluation, DEEP/FRI folding
and PoW grinding all carry a batch axis.

This is the fixture producer standing in for the Rust plonky2 prover the
reference links against (reference: Cargo.toml:11; SURVEY §2.4) — no Rust
toolchain exists in this environment, so proof generation is a first-class
component here (it is also what `AccessSet::make_signal` needs; reference:
plonky2_semaphore/access_set.rs:61-104).
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..core import gates as G
from ..core.challenger import Challenger
from ..core.merkle import MerkleTree
from ..core.rings import BaseRing
from ..core.types import CommonData, FriProof, FriQueryRounds, OpeningSet, Proof
from ..ops import ext2
from ..ops import gl64_np as gl
from ..ops import ntt_np as ntt
from . import lde as _lde
from ..ops import poseidon_gl as pg
from ..utils.bits import reverse_index_bits_perm
from .builder import CircuitData

SHIFT = 7  # multiplicative group generator; FRI LDE coset is 7*H


def _observe_cap_batch(ch: Challenger, cap: np.ndarray):
    """cap: [c, 4] (shared) or [B, c, 4] (batched)."""
    if cap.ndim == 2:
        for r in range(cap.shape[0]):
            for i in range(4):
                ch.observe_element(np.broadcast_to(cap[r, i], ch.state[0].shape))
    else:
        for r in range(cap.shape[1]):
            for i in range(4):
                ch.observe_element(cap[:, r, i])


def _ext_powers(point, n: int):
    """z^0..z^{n-1} for ext z = ([B],[B]) -> ([B,n],[B,n]), log-doubling:
    [1] -> [1,z] -> [1,z,z^2,z^3] -> ... (log2(n) batched ext muls instead
    of n sequential ones)."""
    B = point[0].shape[0]
    pw = (np.ones((B, 1), np.uint64), np.zeros((B, 1), np.uint64))
    cur = point  # z^(current width)
    while pw[0].shape[1] < n:
        blk = ext2.mul(gl, pw, (cur[0][:, None], cur[1][:, None]))
        pw = (np.concatenate([pw[0], blk[0]], axis=1),
              np.concatenate([pw[1], blk[1]], axis=1))
        cur = ext2.square(gl, cur)
    return (pw[0][:, :n], pw[1][:, :n])


def _gl_sum_last(x: np.ndarray) -> np.ndarray:
    """Modular sum along the last axis by halving folds (log2(n) gl.adds)."""
    while x.shape[-1] > 1:
        if x.shape[-1] % 2:
            last, x = x[..., -1], x[..., :-1]
        else:
            last = None
        x = gl.add(x[..., 0::2], x[..., 1::2])
        if last is not None:
            x = x.copy()
            x[..., 0] = gl.add(x[..., 0], last)
    return x[..., 0]


def _poly_eval_ext(coeffs: np.ndarray, point):
    """coeffs [P, n] u64, point ext ([B],[B]) -> ([P,B],[P,B]) ext.

    sum_k c_k z^k with the power table vectorized over k (coeffs are
    base-field, so the two ext coordinates are independent dot products)."""
    zp = _ext_powers(point, coeffs.shape[-1])  # [B, n]
    return (
        _gl_sum_last(gl.mul(coeffs[:, None, :], zp[0][None])),
        _gl_sum_last(gl.mul(coeffs[:, None, :], zp[1][None])),
    )


def _ext_fft_batch(coeffs_ext, shift: int):
    """coset_fft of ext-coeff polys: coordinates transform independently
    (twiddles are base-field). coeffs_ext: pair of [B, m] -> pair [B, m]."""
    return (
        ntt.coset_fft(coeffs_ext[0], shift),
        ntt.coset_fft(coeffs_ext[1], shift),
    )


def _vlog(msg):
    import os, time

    if os.environ.get("SVT_PROVER_VERBOSE"):
        print(f"[prove {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def prove_batch(data: CircuitData, inputs: Dict, batch: int,
                hasher: str = None, check_witness: bool = True,
                max_lanes: int = None) -> List[Proof]:
    """max_lanes chunks a wide batch into sequential sub-batches of at most
    that many lanes (SVT_PROVE_CHUNK overrides; 0 = monolithic). Every
    witness/LDE plane carries a [*, B, n]-shaped working set — at the
    recursion degrees (2^14 rows, x8 LDE) per-lane cost grows measurably
    with B as the planes outgrow the cache hierarchy (measured round 5:
    16-pair level 380 s monolithic vs 159 s in chunks of 4), so chunking
    the batch keeps the footprint at the sweet spot."""
    import os

    if max_lanes is None:
        max_lanes = int(os.environ.get("SVT_PROVE_CHUNK", "0"))
    if max_lanes and batch > max_lanes:
        out: List[Proof] = []
        for s in range(0, batch, max_lanes):
            e = min(batch, s + max_lanes)
            sub = {t: np.asarray(v)[..., s:e] if np.ndim(v) else v
                   for t, v in inputs.items()}
            out.extend(prove_batch(data, sub, e - s, hasher=hasher,
                                   check_witness=check_witness, max_lanes=0))
        return out
    common = data.common
    cfg = common.config
    # transcript/Merkle hash config (reference: plonky2_config.rs:53-104);
    # public-input hashing below stays Goldilocks Poseidon (InnerHasher)
    from ..ops.hashers import get_permute

    hperm = get_permute(hasher or getattr(cfg, "hasher", "poseidon"), gl)
    n = common.degree
    nb = common.degree_bits
    rate_bits = cfg.fri_config.rate_bits
    lde_n = n << rate_bits
    lde_bits = common.fri_params.lde_bits
    cap_h = cfg.fri_config.cap_height
    nc = cfg.num_challenges
    nr = cfg.num_routed_wires
    qdf = common.quotient_degree_factor
    B = batch

    # ---- 1. witness
    _vlog("witness")
    W, pis = data.generate_witness(inputs, batch, check=check_witness)  # [nw, n, B], [npi, B]
    W = np.ascontiguousarray(np.swapaxes(W, 1, 2))  # [nw, B, n]

    # ---- 2. wires commitment
    hiding = common.fri_params.hiding
    salt_rng = np.random.default_rng()

    def _salt(leaves):
        """Append SALT_SIZE random columns to blinded-oracle leaves
        (reference: types/assigned.rs:57-72 strips them on the verify side)."""
        if not hiding:
            return leaves
        salt = salt_rng.integers(0, gl.P, size=leaves.shape[:-1] + (4,),
                                 dtype=np.uint64)
        return np.concatenate([leaves, salt], axis=-1)

    _vlog("wires commit")
    wire_coeffs = ntt.intt(W)
    wire_lde = _lde.coset_lde(wire_coeffs, rate_bits, SHIFT)  # [nw, B, lde_n]
    perm = reverse_index_bits_perm(lde_n)
    wires_leaves = _salt(np.take(
        np.ascontiguousarray(np.moveaxis(wire_lde, 0, -1)), perm, axis=-2
    ))  # [B, lde_n, nw(+salt)]
    wires_tree = MerkleTree(wires_leaves, cap_h, permute=hperm)

    # ---- 3. transcript: digest, PI hash, wires cap -> betas, gammas
    pi_hash = pg.hash_no_pad(gl, [pis[i] for i in range(pis.shape[0])], shape=(B,))
    ch = Challenger(gl, shape=(B,), permute=hperm)
    for i in range(4):
        ch.observe_element(np.broadcast_to(data.vk.circuit_digest[i], (B,)))
    for h in pi_hash:
        ch.observe_element(h)
    _observe_cap_batch(ch, wires_tree.cap)
    betas = [ch.get_challenge() for _ in range(nc)]
    gammas = [ch.get_challenge() for _ in range(nc)]

    # ---- 4. permutation argument: Z polys + partial products
    _vlog("permutation argument")
    s_id = gl.mul(
        data.common.k_is[:, None].astype(np.uint64),
        data.subgroup[None, :],
    )  # [nr, n]
    num_chunks = (nr + qdf - 1) // qdf
    zs_pp_values = []  # poly list in oracle order: Z_0..Z_{nc-1}, pps...
    all_pps = []
    for i in range(nc):
        beta = betas[i][None, :, None]  # [1, B, 1]
        gamma = gammas[i][None, :, None]
        nums = gl.add(gl.add(W[:nr], gl.mul(beta, s_id[:, None, :])), gamma)
        dens = gl.add(
            gl.add(W[:nr], gl.mul(beta, data.sigma_vals[:, None, :])), gamma
        )  # [nr, B, n]
        num_prod = np.empty((num_chunks, B, n), np.uint64)
        den_prod = np.empty((num_chunks, B, n), np.uint64)
        for c in range(num_chunks):
            np_ = gl.ones((B, n))
            dp = gl.ones((B, n))
            for k in range(c * qdf, min((c + 1) * qdf, nr)):
                np_ = gl.mul(np_, nums[k])
                dp = gl.mul(dp, dens[k])
            num_prod[c] = np_
            den_prod[c] = dp
        den_inv = gl.inv(den_prod)
        quot = gl.ones((B, n))
        for c in range(num_chunks):
            quot = gl.mul(quot, gl.mul(num_prod[c], den_inv[c]))
        # Z(w^0)=1, Z(w^{j+1}) = Z(w^j) * quot(w^j): exclusive prefix
        # product over rows, vectorized as a Hillis-Steele log-doubling
        # scan (log2(n) batched muls instead of n sequential ones — this
        # was the prover's last O(n) python loop at the deg-2^14
        # aggregation shapes).
        pp = quot.copy()
        d = 1
        while d < n:
            pp[:, d:] = gl.mul(pp[:, d:], pp[:, :-d])
            d <<= 1
        Z = np.empty((B, n), np.uint64)
        Z[:, 0] = 1
        Z[:, 1:] = pp[:, :-1]
        zs_pp_values.append(Z)
        # partial products: accs between chunk applications (per row)
        acc = Z
        pps_i = []
        for c in range(num_chunks - 1):
            acc = gl.mul(acc, gl.mul(num_prod[c], den_inv[c]))
            pps_i.append(acc)
        all_pps.append(pps_i)
    for i in range(nc):
        zs_pp_values.extend(all_pps[i])
    zs_pp_values = np.stack(zs_pp_values)  # [nc*(1+npp), B, n]

    zs_pp_coeffs = ntt.intt(zs_pp_values)
    zs_pp_lde = _lde.coset_lde(zs_pp_coeffs, rate_bits, SHIFT)
    zs_pp_leaves = _salt(np.take(
        np.ascontiguousarray(np.moveaxis(zs_pp_lde, 0, -1)), perm, axis=-2
    ))
    zs_pp_tree = MerkleTree(zs_pp_leaves, cap_h, permute=hperm)
    _observe_cap_batch(ch, zs_pp_tree.cap)
    alphas = [ch.get_challenge() for _ in range(nc)]

    # ---- 5. quotient polynomials
    _vlog("quotient")
    quotient_polys = _compute_quotient(
        data, W, wire_lde, zs_pp_lde, pi_hash, betas, gammas, alphas, B
    )  # [nc*qdf, B, n]
    q_lde = _lde.coset_lde(quotient_polys, rate_bits, SHIFT)
    q_leaves = _salt(np.take(
        np.ascontiguousarray(np.moveaxis(q_lde, 0, -1)), perm, axis=-2
    ))
    q_tree = MerkleTree(q_leaves, cap_h, permute=hperm)
    _observe_cap_batch(ch, q_tree.cap)
    zeta = (ch.get_challenge(), ch.get_challenge())

    # ---- 6. openings at zeta / g*zeta
    _vlog("openings")
    g_n = int(data.subgroup[1]) if n > 1 else 1
    zeta_next = ext2.scalar_mul(gl, zeta, gl.const(g_n, (B,)))
    cs_coeffs = data.constants_sigmas_coeffs          # [ncst+nr, n]
    n_consts = common.num_constants
    open_cs = _poly_eval_shared(cs_coeffs, zeta)          # [ncst+nr, B] ext
    open_wires = _poly_eval_batched(wire_coeffs, zeta)    # [nw, B]
    open_zs_pp = _poly_eval_batched(zs_pp_coeffs, zeta)
    open_q = _poly_eval_batched(quotient_polys, zeta)
    open_zs_next = _poly_eval_batched(zs_pp_coeffs[:nc], zeta_next)

    npp = common.num_partial_products
    openings = OpeningSet(
        constants=_pack_ext(open_cs, 0, n_consts),
        plonk_sigmas=_pack_ext(open_cs, n_consts, n_consts + nr),
        wires=_pack_ext(open_wires, 0, cfg.num_wires),
        plonk_zs=_pack_ext(open_zs_pp, 0, nc),
        plonk_zs_next=_pack_ext(open_zs_next, 0, nc),
        partial_products=_pack_ext(open_zs_pp, nc, nc * (1 + npp)),
        quotient_polys=_pack_ext(open_q, 0, nc * qdf),
    )

    # observe openings in transcript order: constants, sigmas, wires, zs,
    # partial_products, quotient; then zs_next (same storage order here)
    for ext_arr in (
        open_cs,
        open_wires,
        open_zs_pp,
        open_q,
    ):
        for k in range(ext_arr[0].shape[0]):
            ch.observe_element(np.broadcast_to(ext_arr[0][k], (B,)).astype(np.uint64))
            ch.observe_element(np.broadcast_to(ext_arr[1][k], (B,)).astype(np.uint64))
    for k in range(nc):
        ch.observe_element(open_zs_next[0][k])
        ch.observe_element(open_zs_next[1][k])
    fri_alpha = (ch.get_challenge(), ch.get_challenge())

    # ---- 7. DEEP composition -> final polynomial (coeff form, ext)
    # batch 0 at zeta: all polys in fri_all_polys order
    b0_coeffs = np.concatenate(
        [
            np.broadcast_to(cs_coeffs[:, None, :], (cs_coeffs.shape[0], B, n)),
            wire_coeffs,
            zs_pp_coeffs,
            quotient_polys,
        ],
        axis=0,
    )  # [P0, B, n]
    comp0 = _alpha_combine(b0_coeffs, fri_alpha)     # [B, n] ext
    q0 = _deep_quotient(comp0, zeta)
    comp1 = _alpha_combine(zs_pp_coeffs[:nc], fri_alpha)
    q1 = _deep_quotient(comp1, zeta_next)
    a_pow = ext2.pow_const(gl, fri_alpha, nc, (B,))
    q0_shifted = _ext_mul_scalar_poly(q0, a_pow)
    final_coeffs = (gl.add(q0_shifted[0], q1[0]), gl.add(q0_shifted[1], q1[1]))

    # ---- 8. FRI commit phase
    _vlog("fri commit")
    lde_coeffs = (
        np.concatenate([final_coeffs[0], np.zeros((B, lde_n - n), np.uint64)], axis=1),
        np.concatenate([final_coeffs[1], np.zeros((B, lde_n - n), np.uint64)], axis=1),
    )
    values = _ext_fft_batch(lde_coeffs, SHIFT)
    coeffs = lde_coeffs
    shift = SHIFT
    commit_trees = []
    fri_betas = []
    for arity_bits in common.fri_params.reduction_arity_bits:
        arity = 1 << arity_bits
        m = values[0].shape[1]
        p_m = reverse_index_bits_perm(m)
        v0 = np.take(values[0], p_m, axis=1)
        v1 = np.take(values[1], p_m, axis=1)
        # leaf = flattened coset: [e0c0, e0c1, e1c0, e1c1, ...]
        leaves = np.stack([v0, v1], axis=-1).reshape(B, m // arity, 2 * arity)
        tree = MerkleTree(leaves, min(cap_h, _log2(m // arity)), permute=hperm)
        commit_trees.append(tree)
        _observe_cap_batch(ch, tree.cap)
        beta = (ch.get_challenge(), ch.get_challenge())
        fri_betas.append(beta)
        # fold coefficients: c'_i = sum_j beta^j c_{arity*i + j}
        mc = coeffs[0].shape[1]
        c0 = coeffs[0].reshape(B, mc // arity, arity)
        c1 = coeffs[1].reshape(B, mc // arity, arity)
        acc = (np.zeros((B, mc // arity), np.uint64), np.zeros((B, mc // arity), np.uint64))
        for j in range(arity - 1, -1, -1):
            acc = ext2.mul(gl, acc, (beta[0][:, None], beta[1][:, None]))
            acc = (gl.add(acc[0], c0[:, :, j]), gl.add(acc[1], c1[:, :, j]))
        coeffs = acc
        shift = pow(shift, arity, gl.P)
        values = _ext_fft_batch(coeffs, shift)
    # final polynomial: true coefficients (zero-padded tail removed)
    flen = coeffs[0].shape[1] >> rate_bits
    final_poly = np.stack([coeffs[0][:, :flen], coeffs[1][:, :flen]], axis=-1)
    for k in range(flen):
        ch.observe_element(final_poly[:, k, 0])
        ch.observe_element(final_poly[:, k, 1])

    # ---- 9. PoW grinding
    _vlog("pow grind")
    pow_bits = cfg.fri_config.proof_of_work_bits
    pow_witness = _grind_pow(ch, pow_bits, B)
    ch.observe_element(pow_witness)
    pow_response = ch.get_challenge()
    assert ((pow_response >> np.uint64(64 - pow_bits)) == 0).all()
    nq = cfg.fri_config.num_query_rounds
    q_indices = np.stack(
        [ch.get_challenge() & np.uint64(lde_n - 1) for _ in range(nq)], axis=1
    ).astype(np.int64)  # [B, Q]

    # ---- 10. query round proofs
    _vlog("queries")
    initial_trees = [data.constants_sigmas_tree, wires_tree, zs_pp_tree, q_tree]
    init_evals, init_sibs = [], []
    for tree in initial_trees:
        init_evals.append(tree.leaves_at(q_indices).astype(np.uint64))
        init_sibs.append(tree.prove_batch(q_indices))
    step_evals, step_sibs = [], []
    idx = q_indices
    for li, arity_bits in enumerate(common.fri_params.reduction_arity_bits):
        arity = 1 << arity_bits
        cidx = idx >> arity_bits
        tree = commit_trees[li]
        leaf = tree.leaves_at(cidx)  # [B, Q, 2*arity]
        step_evals.append(leaf.reshape(leaf.shape[:-1] + (arity, 2)))
        step_sibs.append(tree.prove_batch(cidx))
        idx = cidx

    # ---- assemble per-proof objects
    proofs = []
    for b in range(B):
        qr = FriQueryRounds(
            initial_evals=[e[b] for e in init_evals],
            initial_siblings=[s[b] for s in init_sibs],
            step_evals=[e[b] for e in step_evals],
            step_siblings=[s[b] for s in step_sibs],
        )
        proofs.append(
            Proof(
                wires_cap=wires_tree.cap[b],
                plonk_zs_partial_products_cap=zs_pp_tree.cap[b],
                quotient_polys_cap=q_tree.cap[b],
                openings=OpeningSet(
                    **{
                        f: getattr(openings, f)[b]
                        for f in (
                            "constants", "plonk_sigmas", "wires", "plonk_zs",
                            "plonk_zs_next", "partial_products", "quotient_polys",
                        )
                    }
                ),
                opening_proof=FriProof(
                    commit_phase_caps=np.stack([t.cap[b] for t in commit_trees])
                    if commit_trees
                    else np.zeros((0, 1 << cap_h, 4), np.uint64),
                    query_rounds=qr,
                    final_poly=final_poly[b],
                    pow_witness=pow_witness[b],
                ),
                public_inputs=pis[:, b],
            )
        )
    return proofs


def _log2(x):
    return x.bit_length() - 1


def _pack_ext(ext_arr, a, b):
    """([P,B],[P,B]) ext slice rows a:b -> [B, b-a, 2] uint64."""
    return np.stack([ext_arr[0][a:b], ext_arr[1][a:b]], axis=-1).transpose(1, 0, 2)


def _poly_eval_shared(coeffs, point):
    """coeffs [P, n] shared across batch; point ext [B]."""
    return _poly_eval_ext(coeffs, point)


def _poly_eval_batched(coeffs, point):
    """coeffs [P, B, n], point ext ([B],[B]) -> ([P,B],[P,B])."""
    zp = _ext_powers(point, coeffs.shape[-1])  # [B, n]
    return (
        _gl_sum_last(gl.mul(coeffs, zp[0][None])),
        _gl_sum_last(gl.mul(coeffs, zp[1][None])),
    )


def _alpha_combine(coeffs, alpha):
    """sum_i alpha^i * p_i for base-coeff polys [P, B, n] -> [B, n] ext."""
    P_, B, n = coeffs.shape
    acc = (np.zeros((B, n), np.uint64), np.zeros((B, n), np.uint64))
    al = (alpha[0][:, None], alpha[1][:, None])
    for i in range(P_ - 1, -1, -1):
        acc = ext2.mul(gl, acc, al)
        acc = (gl.add(acc[0], coeffs[i]), acc[1])
    return acc


def _deep_quotient(comp, point):
    """(comp(X) - comp(z)) / (X - z): [B, n] ext coeffs -> [B, n] ext
    coeffs (top coefficient zero).

    The synthetic-division recurrence q_{k-1} = c_k + z*q_k closes to
    q_{k-1} = z^{-k} * S_k with S_k = sum_{m>=k} c_m z^m, so it vectorizes
    as power table + suffix-sum (Hillis-Steele log-doubling) + power table
    of z^{-1} — log2(n) batched ops instead of n sequential ones."""
    B, n = comp[0].shape
    if bool(((point[0] == 0) & (point[1] == 0)).any()):
        return _deep_quotient_horner(comp, point)  # z=0: q_k = c_{k+1}... shiftable, but keep the exact loop
    zp = _ext_powers(point, n)
    t = ext2.mul(gl, comp, zp)  # t_m = c_m z^m
    s0, s1 = t[0].copy(), t[1].copy()
    d = 1
    while d < n:
        s0[:, :-d] = gl.add(s0[:, :-d], s0[:, d:])
        s1[:, :-d] = gl.add(s1[:, :-d], s1[:, d:])
        d <<= 1
    zinv = ext2.inv(gl, point)
    zip_ = _ext_powers(zinv, n)  # zinv^0..zinv^{n-1}
    q = ext2.mul(gl, (s0[:, 1:], s1[:, 1:]), (zip_[0][:, 1:], zip_[1][:, 1:]))
    q0 = np.zeros((B, n), np.uint64)
    q1 = np.zeros((B, n), np.uint64)
    q0[:, : n - 1] = q[0]
    q1[:, : n - 1] = q[1]
    return (q0, q1)


def _deep_quotient_horner(comp, point):
    """Sequential synthetic division (golden model / z=0 fallback)."""
    B, n = comp[0].shape
    q0 = np.zeros((B, n), np.uint64)
    q1 = np.zeros((B, n), np.uint64)
    acc = (np.zeros(B, np.uint64), np.zeros(B, np.uint64))
    for k in range(n - 1, 0, -1):
        c = (comp[0][:, k], comp[1][:, k])
        acc = c if k == n - 1 else ext2.add(gl, c, ext2.mul(gl, acc, point))
        q0[:, k - 1] = acc[0]
        q1[:, k - 1] = acc[1]
    return (q0, q1)


def _ext_mul_scalar_poly(poly, s):
    """poly [B, n] ext * s [B] ext."""
    return ext2.mul(gl, poly, (s[0][:, None], s[1][:, None]))


def _grind_pow(ch: Challenger, pow_bits: int, B: int, chunk: int = 1 << 13):
    """Find per-proof witnesses w s.t. observing w then squeezing yields a
    challenge with `pow_bits` leading zero bits. Vectorized over candidates.

    Native fast path: the C hash plane grinds each lane to completion
    (expected 2^pow_bits permutations/lane) instead of hashing
    [B, chunk] candidate tiles through numpy."""
    from .. import native

    if native.lib() is not None and ch.permute_fn is pg.permute:
        states = np.stack(
            [np.broadcast_to(s, (B,)) for s in ch.state], axis=1)
        if ch.input_buffer:
            prefixes = np.stack(
                [np.broadcast_to(x, (B,)) for x in ch.input_buffer], axis=1)
        else:
            prefixes = np.zeros((B, 1), dtype=np.uint64)[:, :0]
        return native.grind_pow_np(states, prefixes, pow_bits)
    found = np.zeros(B, dtype=bool)
    out = np.zeros(B, dtype=np.uint64)
    base = 0
    while not found.all():
        cands = np.arange(base, base + chunk, dtype=np.uint64)
        sim = _clone_challenger_broadcast(ch, (B, chunk))
        sim.observe_element(np.broadcast_to(cands[None, :], (B, chunk)))
        resp = sim.get_challenge()  # [B, chunk]
        okm = (resp >> np.uint64(64 - pow_bits)) == 0
        hit = okm.any(axis=1) & ~found
        first = okm.argmax(axis=1)
        out = np.where(hit, cands[first], out)
        found |= hit
        base += chunk
    return out


def _clone_challenger_broadcast(ch: Challenger, shape):
    c = Challenger(gl, shape, permute=ch.permute_fn)
    c.state = [np.broadcast_to(s[..., None], shape).copy() for s in ch.state]
    c.input_buffer = [np.broadcast_to(x[..., None], shape) for x in ch.input_buffer]
    c.output_buffer = [np.broadcast_to(x[..., None], shape) for x in ch.output_buffer]
    return c


def _compute_quotient(data, W, wire_lde, zs_pp_lde, pi_hash, betas, gammas, alphas, B):
    """Evaluate the vanishing polynomial on the LDE coset and divide by Z_H.

    Returns quotient chunk polys [nc*qdf, B, n] (coefficient form)."""
    common = data.common
    cfg = common.config
    n = common.degree
    lde_n = n << cfg.fri_config.rate_bits
    nc = cfg.num_challenges
    nr = cfg.num_routed_wires
    qdf = common.quotient_degree_factor
    npp = common.num_partial_products

    R = BaseRing(gl, (B, lde_n))
    # domain points x = 7 * w_{lde}^j
    w_lde = gl.primitive_root_of_unity(common.fri_params.lde_bits)
    xs = np.empty(lde_n, np.uint64)
    acc = SHIFT % gl.P
    for j in range(lde_n):
        xs[j] = acc
        acc = (acc * w_lde) % gl.P
    x = np.broadcast_to(xs, (B, lde_n))

    csl = data.constants_sigmas_lde  # [ncst+nr, lde_n]
    n_consts = common.num_constants
    local_constants = [np.broadcast_to(csl[i], (B, lde_n)) for i in range(n_consts)]
    sigmas = [np.broadcast_to(csl[n_consts + i], (B, lde_n)) for i in range(nr)]
    local_wires = [wire_lde[i] for i in range(cfg.num_wires)]
    rot = 1 << cfg.fri_config.rate_bits
    zs = [zs_pp_lde[i] for i in range(nc)]
    zs_next = [np.roll(zs_pp_lde[i], -rot, axis=-1) for i in range(nc)]
    pps = [zs_pp_lde[nc + i] for i in range(nc * npp)]
    pi_h = [np.broadcast_to(h[:, None], (B, lde_n)) for h in pi_hash]

    # gate constraints
    combined = [R.zero() for _ in range(common.num_gate_constraints)]
    num_selectors = common.selectors_info.num_selectors
    for i, gate in enumerate(common.gates):
        si = common.selectors_info.selector_indices[i]
        group = range(*common.selectors_info.groups[si])
        G.eval_filtered(R, gate, si, group, num_selectors, i,
                        local_constants, local_wires, pi_h, combined)

    # L_0(x) = (x^n - 1)/(n (x - 1))
    x_pow_n = gl.pow_const(x, n)
    z_h = gl.sub(x_pow_n, gl.ones((B, lde_n)))
    l0 = gl.mul(z_h, gl.inv(gl.mul(gl.const(n, (B, lde_n)), gl.sub(x, gl.ones((B, lde_n))))))

    s_ids = [gl.mul(gl.const(int(k), (B, lde_n)), x) for k in common.k_is]

    z1_terms, pp_terms = [], []
    for i in range(nc):
        z_x, z_gx = zs[i], zs_next[i]
        z1_terms.append(gl.sub(gl.mul(l0, z_x), l0))
        beta = np.broadcast_to(betas[i][:, None], (B, lde_n))
        gamma = np.broadcast_to(gammas[i][:, None], (B, lde_n))
        nums, dens = [], []
        for j in range(nr):
            wpg = gl.add(local_wires[j], gamma)
            nums.append(gl.add(gl.mul(beta, s_ids[j]), wpg))
            dens.append(gl.add(gl.mul(beta, sigmas[j]), wpg))
        accs = [z_x] + pps[i * npp : (i + 1) * npp] + [z_gx]
        for c in range(0, nr, qdf):
            k = c // qdf
            np_ = gl.ones((B, lde_n))
            dp = gl.ones((B, lde_n))
            for j in range(c, min(c + qdf, nr)):
                np_ = gl.mul(np_, nums[j])
                dp = gl.mul(dp, dens[j])
            pp_terms.append(gl.sub(gl.mul(accs[k], np_), gl.mul(accs[k + 1], dp)))

    all_terms = z1_terms + pp_terms + combined
    z_h_inv = gl.inv(z_h)
    out = np.empty((nc * qdf, B, n), np.uint64)
    for i in range(nc):
        alpha = np.broadcast_to(alphas[i][:, None], (B, lde_n))
        vanishing = gl.zeros((B, lde_n))
        for t in reversed(all_terms):
            vanishing = gl.add(gl.mul(vanishing, alpha), t)
        quotient_vals = gl.mul(vanishing, z_h_inv)
        q_coeffs = ntt.coset_ifft(quotient_vals, SHIFT)  # [B, lde_n]
        # degree < qdf*n: split into qdf chunks of n
        tail = q_coeffs[:, qdf * n :]
        if not (tail == 0).all():  # explicit: must survive `python -O`
            from .builder import WitnessConflict

            raise WitnessConflict(
                "quotient degree overflow — constraints unsatisfied?")
        for c in range(qdf):
            out[i * qdf + c] = q_coeffs[:, c * n : (c + 1) * n]
    return out
