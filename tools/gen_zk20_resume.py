"""Resumable generator for the headline zk-2^20 fixture: 1024 DISTINCT
Semaphore signals over the 2^20-member access set with the reference proving
preset (zk on, blowup 8, 28 queries, 16 PoW bits; reference:
plonky2_semaphore/access_set.rs:68-84, README.md:155).

Proves in chunks (SVT_ZK20_CHUNK, default 32) and checkpoints the cumulative
fixture to fixtures/sem_zk20b{n}.npz after every chunk (sem_zk20.npz at the
full 1024), so an interrupted run resumes where it left off. Designed to run
detached at low priority for hours:

    setsid nohup nice -n 10 python tools/gen_zk20_resume.py \
        > .bank/r2b_zk20_resume.log 2>&1 &
"""
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

from stark_verifier_tpu.core.merkle import MerkleTree
from stark_verifier_tpu.core.types import load_proofs, save_proofs
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.semaphore.access_set import AccessSet, semaphore_config

FIXDIR = REPO / "fixtures"
TOTAL = int(os.environ.get("SVT_ZK20_TOTAL", "1024"))
CHUNK = int(os.environ.get("SVT_ZK20_CHUNK", "32"))


def main():
    rng = np.random.default_rng(0)
    n = 1 << 20
    sks = rng.integers(0, gl.P, size=(n, 4), dtype=np.uint64)
    idx = rng.integers(0, n, size=TOTAL)
    topics = rng.integers(0, gl.P, size=(TOTAL, 4), dtype=np.uint64)

    tree_cache = FIXDIR / "aset_tree_20_0.npz"
    aset = AccessSet.__new__(AccessSet)
    if tree_cache.exists():
        aset.tree = MerkleTree.load(tree_cache)
    else:
        pks = AccessSet.public_key(sks)
        full = AccessSet(pks, semaphore_config())
        full.tree.save(tree_cache)
        aset.tree = full.tree
    aset.tree_height = 20
    aset.config = semaphore_config()
    aset.min_degree = 0
    aset._circuit = None
    data = aset.circuit()
    nullifiers = AccessSet.nullifier(sks[idx], topics)

    # resume from the largest consistent partial fixture
    proofs = []
    parts = sorted(
        (p for p in FIXDIR.glob("sem_zk20b*.npz")
         if re.fullmatch(r"sem_zk20b\d+", p.stem)),
        key=lambda p: int(p.stem[len("sem_zk20b"):]), reverse=True)
    for part in parts:
        cand, _, _ = load_proofs(part)
        k = len(cand)
        exp = np.concatenate(
            [np.broadcast_to(aset.merkle_root, (k, 4)),
             nullifiers[:k], topics[:k]], axis=1)
        got = np.stack([p.public_inputs for p in cand])
        if got.shape == exp.shape and (got == exp).all():
            proofs = cand
            print(f"resuming from {part.name}: {k} proofs", flush=True)
            break
        print(f"{part.name} does not match the batch-{TOTAL} draw; skipping",
              flush=True)

    while len(proofs) < TOTAL:
        a = len(proofs)
        b = min(a + CHUNK, TOTAL)
        t0 = time.time()
        sig = aset.make_signals(sks[idx[a:b]], topics[a:b], idx[a:b])
        dt = time.time() - t0
        from stark_verifier_tpu.core.verifier import verify_proof

        assert verify_proof(gl, data.common, data.vk, sig[0].proof), \
            f"golden verify failed at chunk [{a}:{b}]"
        proofs = proofs + [s.proof for s in sig]
        tag = "zk20" if len(proofs) >= 1024 else f"zk20b{len(proofs)}"
        save_proofs(FIXDIR / f"sem_{tag}.npz", proofs, data.common, data.vk)
        print(f"[{len(proofs)}/{TOTAL}] chunk {b-a} in {dt:.0f}s "
              f"({dt/(b-a):.1f}s/proof) -> sem_{tag}.npz", flush=True)
        prev = FIXDIR / f"sem_zk20b{a}.npz"
        if prev.exists() and a > 64:
            prev.unlink()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
