"""Generate the headline zk-2^20 benchmark fixture: 1024 DISTINCT Semaphore
signals over a 2^20-member access set with the reference's proving preset
(zk on, blowup 8, 28 queries, 16 PoW bits; reference:
plonky2_semaphore/access_set.rs:68-84, README.md:155).

Writes fixtures/sem_zk20.npz (kept out of git; regenerate with this tool).
Run detached: ~25 min for keys+tree, a few min of batched proving.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from stark_verifier_tpu.models import flagship as FS
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.semaphore.access_set import semaphore_config


def main():
    batch = int(os.environ.get("SVT_ZK20_BATCH", "1024"))
    # partial fixtures (fewer distinct proofs) get a size-suffixed tag so
    # bench.py's auto preset doesn't pick up a low-occupancy batch
    tag = "zk20" if batch >= 1024 else f"zk20b{batch}"
    t0 = time.time()
    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=20, batch=batch, config=semaphore_config(),
        cache_tag=tag)
    print(f"fixture ready: {len(proofs)} proofs, deg 2^{common.degree_bits}, "
          f"hiding={common.fri_params.hiding}, in {time.time()-t0:.0f}s",
          flush=True)
    from stark_verifier_tpu.core.verifier import verify_proof

    t0 = time.time()
    for p in proofs[:2]:
        assert verify_proof(gl, common, vk, p)
    print(f"golden verify 2/{len(proofs)}: PASS ({time.time()-t0:.1f}s)",
          flush=True)


if __name__ == "__main__":
    main()
