"""Generate the bn254-wrapped benchmark fixture — the reference's ACTUAL
verified object.

What the reference verifies per signal is not the inner Goldilocks-config
proof but its bn254-Poseidon wrap (reference: plonky2_semaphore/
access_set.rs:28-59 + bn245_poseidon/plonky2_config.rs:78-104: the signal
proof is re-proved under Bn254PoseidonGoldilocksConfig, cap_height 0, so
its transcript/Merkle hashes are EVM-friendly). This tool wraps N real zk20
signal proofs (fixtures/sem_zk20b64.npz) under hasher="bn254" and saves
them as fixtures/sem_wrapped{N}.npz for `SVT_BENCH_PRESET=wrapped`.

Usage: python tools/gen_wrapped_fixture.py [N]   (default 16)
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(n: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from stark_verifier_tpu.core.types import load_proofs, save_proofs
    from stark_verifier_tpu.core.verifier import verify_proof
    from stark_verifier_tpu.ops import gl64_np as gl
    from stark_verifier_tpu.semaphore.recursion import build_wrapper_circuit

    proofs, common, vk = load_proofs(REPO / "fixtures" / "sem_zk20b64.npz")
    assert len(proofs) >= n
    print(f"# inner: deg 2^{common.degree_bits}, zk={common.fri_params.hiding},"
          f" q={common.config.fri_config.num_query_rounds}", flush=True)

    t0 = time.time()
    wrap = build_wrapper_circuit(common, hasher="bn254")
    print(f"# wrapper circuit built: deg 2^{wrap.data.common.degree_bits}, "
          f"hasher={wrap.data.common.config.hasher}, "
          f"cap={wrap.data.common.config.fri_config.cap_height} "
          f"({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    wrapped = wrap.prove(proofs[:n], vk)
    dt = time.time() - t0
    print(f"# wrapped {n} proofs in {dt:.1f}s ({dt/n:.2f}s/proof)", flush=True)

    wc, wvk = wrap.data.common, wrap.data.vk
    for i in (0, n - 1):
        assert verify_proof(gl, wc, wvk, wrapped[i]), i
    print("# spot verify (host golden): ok", flush=True)

    out = REPO / "fixtures" / f"sem_wrapped{n}.npz"
    save_proofs(out, wrapped, wc, wvk)
    print(f"# saved {out} ({out.stat().st_size/1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
