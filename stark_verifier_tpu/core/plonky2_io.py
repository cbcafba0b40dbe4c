"""plonky2 wire-format (serde JSON) proof interchange.

Serializes/deserializes proofs in the JSON shape plonky2's serde derives
produce for `ProofWithPublicInputs<F, C, 2>` (the reference depends on
serde/serde_json for exactly this; reference: Cargo.toml:28-29):

  ProofWithPublicInputs { proof, public_inputs: [u64] }
  Proof { wires_cap, plonk_zs_partial_products_cap, quotient_polys_cap,
          openings, opening_proof }
  MerkleCap        -> [ {"elements": [u64;4]}, ... ]        (newtype Vec)
  HashOut          -> {"elements": [u64;4]}
  QuadraticExtension -> [u64, u64]                          (newtype [F;2])
  OpeningSet { constants, plonk_sigmas, wires, plonk_zs, plonk_zs_next,
               partial_products, quotient_polys }
  FriProof { commit_phase_merkle_caps, query_round_proofs,
             final_poly: {"coeffs": [[u64,u64]]}, pow_witness: u64 }
  FriQueryRound { initial_trees_proof: {"evals_proofs":
                    [[[u64], {"siblings": [HashOut]}], ...]},
                  steps: [{"evals": [[u64,u64]],
                           "merkle_proof": {"siblings": [HashOut]}}] }

A proof recorded from the Rust reference loads with `proof_from_json`; the
emit side (`proof_to_json`) round-trips bit-exactly (tests/test_plonky2_io.py)
so the loader cannot silently drift from the writer.
"""
from __future__ import annotations

import json
from typing import List

import numpy as np

from .types import FriProof, FriQueryRounds, OpeningSet, Proof


def _hashout(arr4) -> dict:
    return {"elements": [int(x) for x in arr4]}

def _cap(cap) -> list:
    return [_hashout(cap[r]) for r in range(cap.shape[0])]

def _exts(arr) -> list:
    """[n, 2] -> [[u64, u64], ...]"""
    return [[int(e[0]), int(e[1])] for e in arr]


def proof_to_json(proof: Proof) -> str:
    op = proof.opening_proof
    qr = op.query_rounds
    Q = qr.initial_evals[0].shape[0]
    rounds = []
    for q in range(Q):
        evals_proofs = []
        for o in range(4):
            evals_proofs.append([
                [int(x) for x in qr.initial_evals[o][q]],
                {"siblings": [_hashout(h) for h in qr.initial_siblings[o][q]]},
            ])
        steps = []
        for li in range(len(qr.step_evals)):
            steps.append({
                "evals": _exts(qr.step_evals[li][q]),
                "merkle_proof": {
                    "siblings": [_hashout(h) for h in qr.step_siblings[li][q]]
                },
            })
        rounds.append({
            "initial_trees_proof": {"evals_proofs": evals_proofs},
            "steps": steps,
        })
    obj = {
        "proof": {
            "wires_cap": _cap(proof.wires_cap),
            "plonk_zs_partial_products_cap": _cap(proof.plonk_zs_partial_products_cap),
            "quotient_polys_cap": _cap(proof.quotient_polys_cap),
            "openings": {
                "constants": _exts(proof.openings.constants),
                "plonk_sigmas": _exts(proof.openings.plonk_sigmas),
                "wires": _exts(proof.openings.wires),
                "plonk_zs": _exts(proof.openings.plonk_zs),
                "plonk_zs_next": _exts(proof.openings.plonk_zs_next),
                "partial_products": _exts(proof.openings.partial_products),
                "quotient_polys": _exts(proof.openings.quotient_polys),
            },
            "opening_proof": {
                "commit_phase_merkle_caps": [
                    _cap(op.commit_phase_caps[i])
                    for i in range(op.commit_phase_caps.shape[0])
                ],
                "query_round_proofs": rounds,
                "final_poly": {"coeffs": _exts(op.final_poly)},
                "pow_witness": int(op.pow_witness),
            },
        },
        "public_inputs": [int(x) for x in proof.public_inputs],
    }
    return json.dumps(obj)


def _np_cap(lst) -> np.ndarray:
    if not lst:
        return np.zeros((0, 4), np.uint64)
    return np.array([h["elements"] for h in lst], dtype=np.uint64)

def _np_exts(lst) -> np.ndarray:
    if not lst:
        return np.zeros((0, 2), np.uint64)
    return np.array(lst, dtype=np.uint64)


def proof_from_json(s: str) -> Proof:
    d = json.loads(s)
    p = d["proof"]
    op = p["opening_proof"]
    rounds = op["query_round_proofs"]
    n_oracles = len(rounds[0]["initial_trees_proof"]["evals_proofs"])
    assert n_oracles == 4, n_oracles
    n_steps = len(rounds[0]["steps"])
    init_evals: List[np.ndarray] = []
    init_sibs: List[np.ndarray] = []
    for o in range(4):
        init_evals.append(np.array(
            [r["initial_trees_proof"]["evals_proofs"][o][0] for r in rounds],
            dtype=np.uint64))
        init_sibs.append(np.stack([
            _np_cap(r["initial_trees_proof"]["evals_proofs"][o][1]["siblings"])
            for r in rounds
        ]))
    step_evals, step_sibs = [], []
    for li in range(n_steps):
        step_evals.append(np.stack(
            [_np_exts(r["steps"][li]["evals"]) for r in rounds]))
        step_sibs.append(np.stack(
            [_np_cap(r["steps"][li]["merkle_proof"]["siblings"]) for r in rounds]))
    cpc = op["commit_phase_merkle_caps"]
    return Proof(
        wires_cap=_np_cap(p["wires_cap"]),
        plonk_zs_partial_products_cap=_np_cap(p["plonk_zs_partial_products_cap"]),
        quotient_polys_cap=_np_cap(p["quotient_polys_cap"]),
        openings=OpeningSet(
            constants=_np_exts(p["openings"]["constants"]),
            plonk_sigmas=_np_exts(p["openings"]["plonk_sigmas"]),
            wires=_np_exts(p["openings"]["wires"]),
            plonk_zs=_np_exts(p["openings"]["plonk_zs"]),
            plonk_zs_next=_np_exts(p["openings"]["plonk_zs_next"]),
            partial_products=_np_exts(p["openings"]["partial_products"]),
            quotient_polys=_np_exts(p["openings"]["quotient_polys"]),
        ),
        opening_proof=FriProof(
            commit_phase_caps=(np.stack([_np_cap(c) for c in cpc])
                               if cpc else np.zeros((0, 1, 4), np.uint64)),
            query_rounds=FriQueryRounds(
                initial_evals=init_evals,
                initial_siblings=init_sibs,
                step_evals=step_evals,
                step_siblings=step_sibs,
            ),
            final_poly=_np_exts(op["final_poly"]["coeffs"]),
            pow_witness=np.uint64(op["pow_witness"]),
        ),
        public_inputs=np.array(d["public_inputs"], dtype=np.uint64),
    )
