import sys, time
sys.path.insert(0, "/root/repo")
from stark_verifier_tpu.models import flagship as FS
t0 = time.time()
proofs, common, vk = FS.build_semaphore_batch(
    n_members_bits=10, batch=32, config=FS.bench_config(),
    min_degree=1 << 12, cache_tag="bench10")
print(f"full fixture: {len(proofs)} proofs, degree 2^{common.degree_bits}, "
      f"lde_bits {common.fri_params.lde_bits}, "
      f"arities {common.fri_params.reduction_arity_bits}, "
      f"{time.time()-t0:.0f}s", flush=True)
# golden-verify one
from stark_verifier_tpu.core.verifier import verify_proof
from stark_verifier_tpu.ops import gl64_np as gl
t0 = time.time()
assert verify_proof(gl, common, vk, proofs[0])
print(f"golden verify ok in {time.time()-t0:.1f}s", flush=True)
