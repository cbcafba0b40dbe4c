"""Verify an externally supplied plonky2 proof file end-to-end.

Closes the external-parity loop to "run one command on one file": a proof
produced by ANY plonky2 build (e.g. the Rust reference's
`ProofWithPublicInputs::to_bytes`, or its serde_json encoding) is loaded,
decoded, and run through the full verifier; exit code 0 = ACCEPT.

Usage:
  python tools/cross_check.py proof.bin  --common common.json --vk vk.json
  python tools/cross_check.py proof.json --common common.json --vk vk.json
  python tools/cross_check.py fixtures/sem_entry8.npz          # all-in-one
  python tools/cross_check.py --emit-sample outdir/            # write a
        sample (proof.bin + proof.json + common.json + vk.json) for format
        documentation / round-trip testing against external tooling

Formats:
  proof.bin  — plonky2 compact binary (util/serialization Buffer layout;
               see core/plonky2_io.proof_to_bytes docstring)
  proof.json — plonky2 serde-JSON of ProofWithPublicInputs
  common.json — this repo's CommonData JSON (core/types.CommonData.to_json)
  vk.json    — {"constants_sigmas_cap": [{"elements": [u64;4]}...],
                "circuit_digest": {"elements": [u64;4]}}
               (plonky2 serde shape of VerifierOnlyCircuitData)

Reference: the reference's whole test model is differential against
plonky2-native output (chip/plonk/gates/gate_test.rs:154-176,
chip/hasher_chip.rs:262-275); this tool is the standing interface for that
cross-check once external proof bytes exist.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from stark_verifier_tpu.core.plonky2_io import (
    proof_from_bytes, proof_from_json, proof_to_bytes, proof_to_json)
from stark_verifier_tpu.core.types import (
    CommonData, VerifierOnlyData, load_proofs)
from stark_verifier_tpu.core.verifier import verify_proof
from stark_verifier_tpu.ops import gl64_np as gl


def vk_to_json(vk: VerifierOnlyData) -> str:
    return json.dumps({
        "constants_sigmas_cap": [
            {"elements": [int(x) for x in h]} for h in vk.constants_sigmas_cap],
        "circuit_digest": {
            "elements": [int(x) for x in vk.circuit_digest]},
    })


def vk_from_json(s: str) -> VerifierOnlyData:
    d = json.loads(s)
    return VerifierOnlyData(
        constants_sigmas_cap=np.array(
            [h["elements"] for h in d["constants_sigmas_cap"]],
            dtype=np.uint64),
        circuit_digest=np.array(
            d["circuit_digest"]["elements"], dtype=np.uint64),
    )


def emit_sample(outdir: Path):
    from stark_verifier_tpu.models import flagship as FS
    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=4, batch=8, config=FS.small_config(),
        cache_tag="entry8")
    outdir.mkdir(parents=True, exist_ok=True)
    (outdir / "proof.bin").write_bytes(proof_to_bytes(proofs[0]))
    (outdir / "proof.json").write_text(proof_to_json(proofs[0]))
    (outdir / "common.json").write_text(common.to_json())
    (outdir / "vk.json").write_text(vk_to_json(vk))
    print(f"sample written to {outdir}/ "
          f"(proof.bin {len(proof_to_bytes(proofs[0]))} bytes)")


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("proof", nargs="?", help=".bin / .json proof, or .npz fixture")
    ap.add_argument("--common", help="CommonData JSON (required for .bin/.json)")
    ap.add_argument("--vk", help="verifier-key JSON (required for .bin/.json)")
    ap.add_argument("--emit-sample", metavar="DIR",
                    help="write a sample proof in both formats + metadata")
    args = ap.parse_args()

    if args.emit_sample:
        emit_sample(Path(args.emit_sample))
        return 0
    if not args.proof:
        ap.error("a proof file (or --emit-sample DIR) is required")

    path = Path(args.proof)
    if path.suffix == ".npz":
        proofs, common, vk = load_proofs(path)
    else:
        if not (args.common and args.vk):
            ap.error("--common and --vk are required for .bin/.json proofs")
        common = CommonData.from_json(Path(args.common).read_text())
        vk = vk_from_json(Path(args.vk).read_text())
        if path.suffix == ".json":
            proofs = [proof_from_json(path.read_text())]
        else:
            proofs = [proof_from_bytes(path.read_bytes(), common)]

    n_ok = 0
    for i, p in enumerate(proofs):
        ok = verify_proof(gl, common, vk, p)
        n_ok += bool(ok)
        if not ok:
            print(f"proof[{i}]: REJECT")
    print(f"CROSS_CHECK: {n_ok}/{len(proofs)} ACCEPT "
          f"({path.name}, deg 2^{common.degree_bits}, "
          f"{common.config.fri_config.num_query_rounds} queries)")
    return 0 if n_ok == len(proofs) else 1


if __name__ == "__main__":
    sys.exit(main())
