"""Randomized proof-mutation fuzz: every single-bit corruption of a real
proof must be rejected.

Hand-picked negative tests (test_kats, test_fri_arity, ...) cover known
failure modes; this pass covers the ones nobody thought of: a seeded RNG
flips ONE random bit at a random position of a random proof component in
each of ~250 mutated copies of real proofs, and every mutant must verify
False. Any surviving mutant is a soundness bug.

Soundness of the oracle itself: a single bit flip always changes the field
residue (v ^ 2^k differs from v by ±2^k, and 2^k mod p != 0 for k <= 63),
so no mutation is a no-op encoding change; every u64 of the proof is
consumed by the verifier (Merkle-checked openings, transcript-absorbed
caps/openings/pow, re-exposed public inputs).

Coverage spans both verifier semantics:
- the batched scan-based production path (core/verifier_batched.py), jit
  on the REAL flagship workload (deg 2^9, 28 queries, zk) — 192 mutants
  in 3 batch-64 calls, one compile;
- the per-proof golden path (core/verifier.verify_proof, numpy instance
  of the SAME backend-generic code the vmap/jit path traces) — 64 mutants
  on the small config.

The reference has zero negative tests (SURVEY §4); this exceeds it.
"""
import numpy as np
import pytest

import jax

from stark_verifier_tpu.core.types import load_proofs
from stark_verifier_tpu.core.verifier import verify_proof
from stark_verifier_tpu.core.verifier_batched import verify_batched
from stark_verifier_tpu.models import flagship as FS
from stark_verifier_tpu.models.flagship import batched_arrays
from stark_verifier_tpu.ops import gl64_cpu as gc
from stark_verifier_tpu.ops import gl64_np as gl

pytestmark = pytest.mark.quick


def _mutate_one_lane(rng, batched: dict, lane: int) -> str:
    """Flip one random bit of one random component of `lane`; returns a
    description of the mutation for failure reporting."""
    keys = sorted(batched.keys())
    key = keys[rng.integers(len(keys))]
    arr = batched[key]
    # lane:lane+1 slice, NOT arr[lane]: integer indexing of a 1-D array
    # (pow_witness) yields a scalar COPY and the mutation would be a no-op
    lane_view = arr[lane:lane + 1].reshape(-1)
    idx = int(rng.integers(lane_view.size))
    bit = int(rng.integers(64))
    lane_view[idx] ^= np.uint64(1) << np.uint64(bit)
    return f"{key}[flat {idx}] bit {bit}"


def test_fuzz_batched_zk20():
    """192 seeded single-bit mutants of real zk20 proofs, all rejected by
    the batched production path."""
    proofs, common, vk = load_proofs("fixtures/sem_zk20b64.npz")
    base = batched_arrays(proofs)
    vk_cap = gc.from_u64(vk.constants_sigmas_cap)
    digest = gc.from_u64(vk.circuit_digest)
    fn = jax.jit(
        lambda pa: verify_batched(gc, common, vk_cap, digest, pa))

    # control: unmutated batch accepts everywhere
    ok = np.asarray(fn({k: gc.from_u64(v) for k, v in base.items()}))
    assert ok.all(), "control batch must accept"

    rng = np.random.default_rng(20260820)
    for round_i in range(3):
        mut = {k: v.copy() for k, v in base.items()}
        descs = [_mutate_one_lane(rng, mut, lane) for lane in range(64)]
        ok = np.asarray(fn({k: gc.from_u64(v) for k, v in mut.items()}))
        survivors = [f"lane {i}: {descs[i]}" for i in np.nonzero(ok)[0]]
        assert not survivors, (
            f"round {round_i}: mutations accepted: {survivors}")


def test_fuzz_golden_small():
    """64 seeded single-bit mutants through the per-proof numpy golden
    (the same backend-generic code the vmap path jits)."""
    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=4, batch=8, config=FS.small_config(),
        cache_tag="entry8")
    base = batched_arrays(proofs)
    rng = np.random.default_rng(31337)
    from stark_verifier_tpu.core.types import (
        FriProof, FriQueryRounds, OpeningSet, Proof)

    def unbatch(b: dict, lane: int) -> Proof:
        qr = FriQueryRounds(
            initial_evals=[b[f"init_evals_{o}"][lane] for o in range(4)],
            initial_siblings=[b[f"init_sibs_{o}"][lane] for o in range(4)],
            step_evals=[b[k][lane] for k in sorted(b) if k.startswith("step_evals_")],
            step_siblings=[b[k][lane] for k in sorted(b) if k.startswith("step_sibs_")],
        )
        return Proof(
            wires_cap=b["wires_cap"][lane],
            plonk_zs_partial_products_cap=b["zs_pp_cap"][lane],
            quotient_polys_cap=b["quotient_cap"][lane],
            openings=OpeningSet(*[b["open_" + f][lane] for f in (
                "constants", "plonk_sigmas", "wires", "plonk_zs",
                "plonk_zs_next", "partial_products", "quotient_polys")]),
            opening_proof=FriProof(
                commit_phase_caps=b["commit_phase_caps"][lane],
                query_rounds=qr,
                final_poly=b["final_poly"][lane],
                pow_witness=b["pow_witness"][lane],
            ),
            public_inputs=b["public_inputs"][lane],
        )

    for trial in range(64):
        mut = {k: v.copy() for k, v in base.items()}
        lane = trial % 8
        desc = _mutate_one_lane(rng, mut, lane)
        assert not verify_proof(gl, common, vk, unbatch(mut, lane)), (
            f"trial {trial}: mutation accepted: lane {lane}, {desc}")
