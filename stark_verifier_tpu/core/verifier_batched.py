"""Explicit batch-in-lanes verifier (experimental; round-2 fast path).

Same mathematics as core/verifier.py, but the proof batch rides as the
LEADING axis of every element array instead of via jax.vmap: query-vector
values are [B, Q], scalars are [B]. This keeps the VPU lanes full inside
every op regardless of vmap behavior and lets the Poseidon Pallas kernel
(SVT_PALLAS=1) see thousands of lanes.

Status: validated against the vmap path (tests/test_batched_verifier.py,
honest + corrupt lanes, zk and bn254-config fixtures) and is the bench
default (bench.py / models/flagship batched path).
"""
from __future__ import annotations

import numpy as np

from ..ops import ext2
from ..ops import poseidon_gl as pg
from . import verifier as V1
from .challenger import Challenger
from .rings import ExtRing
from .types import CommonData


def _bq(F, e):
    """Lift a [B] scalar-lane element to broadcast against [B, Q]."""
    from ..ops.gl64_jax import gmap

    return gmap(lambda a: a[..., None], e)


def _bq_ext(F, e):
    return (_bq(F, e[0]), _bq(F, e[1]))


def _all_q(mask):
    """Reduce bool [B, Q] -> [B] (keep the batch axis)."""
    import jax.numpy as jnp

    return jnp.all(mask, axis=-1) if mask.ndim > 1 else mask


def verify_batched(F, common: CommonData, vk_cap, circuit_digest, pa: dict):
    """pa arrays carry a leading batch axis B; returns accept bool [B]."""
    R = ExtRing(F)
    B = pa["public_inputs"].l0.shape[0]

    # PI hash is the InnerHasher: stays Goldilocks Poseidon under every
    # config (plonky2_config.rs:74); the transcript/Merkle permutation
    # follows common.config.hasher (plonky2_config.rs:53-104).
    pi_hash = pg.hash_no_pad(
        F, V1._scalar_list(F, pa["public_inputs"]), shape=(B,))
    ch = _get_challenges_batched(F, common, pa, pi_hash, circuit_digest, B)

    vanishing, zeta_pow_deg = V1.eval_vanishing_poly(F, common, ch, pa, pi_hash)

    ok = None
    one = R.one()
    z_h_zeta = R.sub(zeta_pow_deg, one)
    quotient_list = V1._ext_list(F, pa["open_quotient_polys"])
    qdf = common.quotient_degree_factor
    for i in range(common.config.num_challenges):
        chunk = quotient_list[i * qdf : (i + 1) * qdf]
        recombined = R.reduce_with_powers(zeta_pow_deg, chunk)
        eq = ext2.equal(F, vanishing[i], R.mul(z_h_zeta, recombined))
        ok = eq if ok is None else (ok & eq)

    alpha = ch.fri_alpha
    batches = V1._opening_batches(F, pa)
    reduced_openings = [ext2.reduce_with_powers(F, alpha, b) for b in batches]
    g_zeta = F.const(V1._g_pow(V1.ORDER >> common.degree_bits))
    zeta_next = ext2.scalar_mul(F, ch.plonk_zeta, g_zeta)
    return _verify_fri_batched(
        F, common, ch, pa, vk_cap, reduced_openings, ch.plonk_zeta,
        zeta_next, ok, B)


def _get_challenges_batched(F, common, pa, pi_hash, circuit_digest, B):
    """Identical schedule to V1.get_challenges; replicated VK inputs are
    broadcast to [B] lanes."""
    from ..ops.gl64_jax import gmap

    def b_(x):
        import jax.numpy as jnp

        return gmap(lambda a: jnp.broadcast_to(a, (B,) + a.shape), x)

    pa2 = dict(pa)
    ch = V1.ProofChallenges()
    nc = common.config.num_challenges
    # record the duplex schedule, run all permutations in one lax.scan
    # (byte-exact; see TapeChallenger) — the per-step inlined permutation
    # body dominated the batched verifier's XLA compile time
    from .challenger import TapeChallenger, resolve_challenges

    c = TapeChallenger(F, shape=(B,), permute=V1._perm_for(F, common))
    for e in V1._scalar_list(F, circuit_digest):
        c.observe_element(b_(e))
    for e in pi_hash:
        c.observe_element(e)
    c.observe_cap(_digest_rows_b(F, pa["wires_cap"]))
    ch.plonk_betas = c.get_n_challenges(nc)
    ch.plonk_gammas = c.get_n_challenges(nc)
    c.observe_cap(_digest_rows_b(F, pa["zs_pp_cap"]))
    ch.plonk_alphas = c.get_n_challenges(nc)
    c.observe_cap(_digest_rows_b(F, pa["quotient_cap"]))
    ch.plonk_zeta = c.get_extension_challenge()
    flat = [
        x for batch in V1._opening_batches(F, pa) for e in batch
        for x in (e[0], e[1])
    ]
    c.observe_elements(flat)
    ch.fri_alpha = c.get_extension_challenge()
    ch.fri_betas = []
    L = pa["commit_phase_caps"].l0.shape[1]
    for i in range(L):
        cap_i = V1._col_axis(F, pa["commit_phase_caps"], i, axis=1)
        c.observe_cap(_digest_rows_b(F, cap_i))
        ch.fri_betas.append(c.get_extension_challenge())
    c.observe_elements(
        [x for e in V1._ext_list(F, pa["final_poly"]) for x in (e[0], e[1])]
    )
    c.observe_element(pa["pow_witness"])
    ch.fri_pow_response = c.get_challenge()
    ch.fri_query_indices = c.get_n_challenges(
        common.config.fri_config.num_query_rounds)
    vals = c.finalize()
    for f in ("plonk_betas", "plonk_gammas", "plonk_alphas", "plonk_zeta",
              "fri_alpha", "fri_betas", "fri_pow_response",
              "fri_query_indices"):
        setattr(ch, f, resolve_challenges(getattr(ch, f), vals))
    return ch


def _digest_rows_b(F, cap):
    """cap [B, c, 4] -> list of c digests of 4 [B]-elements."""
    c = cap.l0.shape[1]
    return [
        [V1._col(F, V1._col_axis(F, cap, r, axis=1), i) for i in range(4)]
        for r in range(c)
    ]


def _verify_fri_batched(F, common, ch, pa, vk_cap, reduced_openings, zeta,
                        zeta_next, ok, B):
    """Query lanes trail the batch axis: [B, Q]."""
    import jax.numpy as jnp

    fp = common.fri_params
    lde_bits = fp.lde_bits
    cap_height = fp.config.cap_height
    pow_bits = fp.config.proof_of_work_bits

    pw = ch.fri_pow_response
    okb = None
    for i in range(64 - pow_bits, 64):
        z = F.bit(pw, i) == 0
        okb = z if okb is None else (okb & z)
    ok = ok & okb

    omega = V1.primitive_root(lde_bits)
    xi = F.stack(ch.fri_query_indices, axis=-1)  # [B, Q]
    bits = [F.bit(xi, i) for i in range(lde_bits)]
    if cap_height == 0:
        cap_index = jnp.zeros_like(bits[0]).astype(jnp.int32)
    else:
        cap_index = sum(
            (b.astype(jnp.int32) << k)
            for k, b in enumerate(bits[lde_bits - cap_height:])
        )

    depth = lde_bits - cap_height
    caps = [vk_cap, pa["wires_cap"], pa["zs_pp_cap"], pa["quotient_cap"]]
    # vk cap has no batch axis: lift it
    from ..ops.gl64_jax import gmap

    caps[0] = gmap(lambda a: jnp.broadcast_to(a, (B,) + a.shape), caps[0])

    perm = V1._perm_for(F, common)
    states = []
    for o in range(4):
        leaf = V1._scalar_list(F, pa[f"init_evals_{o}"])  # [B, Q] each
        states.append(
            pg.hash_or_noop(F, leaf, shape=leaf[0].shape, permute=perm))
    big_state = [
        F.concat([states[o][i] for o in range(4)], axis=-1) for i in range(4)
    ]
    big_bits = [jnp.concatenate([b] * 4, axis=-1) for b in bits[:depth]]
    big_sibs = [
        [
            F.concat(
                [V1._col(F, V1._col_axis(F, pa[f"init_sibs_{o}"], d, axis=-2), i)
                 for o in range(4)],
                axis=-1,
            )
            for i in range(4)
        ]
        for d in range(depth)
    ]
    from .merkle import _merkle_walk_scan

    big_state = _merkle_walk_scan(F, big_state, big_bits, big_sibs,
                                  permute=perm)
    Q = xi.l0.shape[-1]
    for o in range(4):
        expected = _take_cap_b(F, caps[o], cap_index)  # [B, Q, 4]
        for i in range(4):
            lane = F.index(big_state[i], (slice(None), slice(o * Q, (o + 1) * Q)))
            ok = ok & _all_q(F.equal(V1._col(F, expected, i), lane))

    x = F.mul(F.const(V1.GENERATOR), V1._exp_from_bits_rev(F, omega, bits))
    x_ext = (x, F.zeros(x.shape))
    alpha_b = _bq_ext(F, ch.fri_alpha)
    oracles = common.fri_oracles()
    evs = [V1._scalar_list(F, pa[f"init_evals_{o}"]) for o in range(4)]
    salts = [common.salt_size(oracles[o][1]) for o in range(4)]
    zeta_vals = sum(
        (evs[o][: len(evs[o]) - salts[o]] for o in range(4)), [])
    zs_vals = evs[2][: common.config.num_challenges]
    summ = ext2.zero(F, x.shape)
    for point, vals, ro in (
        (zeta, zeta_vals, reduced_openings[0]),
        (zeta_next, zs_vals, reduced_openings[1]),
    ):
        reduced_evals = ext2.reduce_base_terms(F, alpha_b, vals)
        numerator = ext2.sub(F, reduced_evals, _bq_ext(F, ro))
        denominator = ext2.sub(F, x_ext, _bq_ext(F, point))
        summ = ext2.mul(F, ext2.pow_const(F, alpha_b, len(vals), x.shape), summ)
        summ = ext2.add(F, ext2.div(F, numerator, denominator), summ)
    prev_eval = summ

    cur_bits = bits
    for li, arity_bits in enumerate(fp.reduction_arity_bits):
        # generalized to any ConstantArityBits like the golden path
        # (core/verifier.py:478-570; exceeds the reference's arity-2-only
        # fri_chip.rs:211) — select-tree consistency check + barycentric
        # interpolation at beta on the multiplicative coset.
        arity = 1 << arity_bits
        evals = pa[f"step_evals_{li}"]  # [B, Q, arity, 2]
        e = [
            (V1._col(F, V1._col_axis(F, evals, j, axis=-2), 0),
             V1._col(F, V1._col_axis(F, evals, j, axis=-2), 1))
            for j in range(arity)
        ]
        idx_bits = cur_bits[:arity_bits]  # LE: x_index_within_coset
        masks = [b != 0 if not V1._is_bool(b) else b for b in idx_bits]
        sel = e
        for m in masks:
            sel = [ext2.select(F, m, sel[2 * k + 1], sel[2 * k])
                   for k in range(len(sel) // 2)]
        ok = ok & _all_q(ext2.equal(F, prev_eval, sel[0]))

        beta = _bq_ext(F, ch.fri_betas[li])
        if arity_bits == 1:
            e_0, e_1 = e
            coset_start = F.select(masks[0], F.neg(x), x)
            a0 = (coset_start, F.zeros(x.shape))
            b0p = (F.neg(coset_start), F.zeros(x.shape))
            num = ext2.mul(F, ext2.sub(F, beta, a0), ext2.sub(F, e_1, e_0))
            den = ext2.sub(F, b0p, a0)
            prev_eval = ext2.add(F, ext2.div(F, num, den), e_0)
        else:
            g = V1.primitive_root(arity_bits)
            g_inv = pow(g, V1.P - 2, V1.P)
            coset_start = x
            for j in range(arity_bits):
                c = F.const(pow(g_inv, 1 << j, V1.P), x.shape)
                coset_start = F.select(masks[arity_bits - 1 - j],
                                       F.mul(coset_start, c), coset_start)
            ev = [e[int(f"{i:0{arity_bits}b}"[::-1], 2)] for i in range(arity)]
            cs_ext = (coset_start, F.zeros(x.shape))
            cs_pow = ext2.pow_const(F, cs_ext, arity, x.shape)
            beta_pow = ext2.pow_const(F, beta, arity, x.shape)
            front = ext2.div(
                F,
                ext2.sub(F, beta_pow, cs_pow),
                ext2.mul(
                    F,
                    (F.const(arity, x.shape), F.zeros(x.shape)),
                    ext2.pow_const(F, cs_ext, arity - 1, x.shape),
                ),
            )
            total = ext2.zero(F, x.shape)
            for i in range(arity):
                gi = F.const(pow(g, i, V1.P), x.shape)
                x_i = (F.mul(coset_start, gi), F.zeros(x.shape))
                term = ext2.div(
                    F,
                    ext2.mul(F, ev[i], (gi, F.zeros(x.shape))),
                    ext2.sub(F, beta, x_i),
                )
                total = ext2.add(F, total, term)
            prev_eval = ext2.mul(F, front, total)

        coset_bits = cur_bits[arity_bits:]
        d_i = len(coset_bits) - cap_height
        sibs = pa[f"step_sibs_{li}"]
        leaf = [c for ej in e for c in ej]  # flattened stored order
        siblings = [
            [V1._col(F, V1._col_axis(F, sibs, d, axis=-2), i) for i in range(4)]
            for d in range(d_i)
        ]
        cap_li = V1._col_axis(F, pa["commit_phase_caps"], li, axis=1)
        state = pg.hash_or_noop(F, leaf, shape=leaf[0].shape, permute=perm)
        if d_i >= 1:
            state = _merkle_walk_scan(F, state, coset_bits[:d_i], siblings,
                                      permute=perm)
        expected = _take_cap_b(F, cap_li, cap_index)
        for i in range(4):
            ok = ok & _all_q(F.equal(V1._col(F, expected, i), state[i]))

        for _ in range(arity_bits):
            x = F.mul(x, x)
        x_ext = (x, F.zeros(x.shape))
        cur_bits = coset_bits

    final_coeffs = [
        _bq_ext(F, e) for e in V1._ext_list(F, pa["final_poly"])
    ]
    final_eval = ext2.reduce_with_powers(F, x_ext, final_coeffs)
    ok = ok & _all_q(ext2.equal(F, prev_eval, final_eval))
    return ok


def _take_cap_b(F, cap, idx):
    """cap GF [B, c, 4], idx int [B, Q] -> GF [B, Q, 4]."""
    import jax.numpy as jnp

    from ..ops.gl64_jax import gmap

    return gmap(
        lambda a: jnp.take_along_axis(a, idx[..., None].astype(jnp.int32), axis=1),
        cap,
    )
