"""Time TPU compile+run of the batched verifier at a given config size."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
import numpy as np
from stark_verifier_tpu.models import flagship as FS

which = sys.argv[1] if len(sys.argv) > 1 else "small"
if which == "small":
    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=6, batch=32, config=FS.small_config(), cache_tag="small6")
elif which == "mid":
    from stark_verifier_tpu.core.types import CircuitConfig, FriConfig
    cfg = CircuitConfig(fri_config=FriConfig(rate_bits=3, cap_height=2,
                                             proof_of_work_bits=12, num_query_rounds=12))
    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=8, batch=32, config=cfg, cache_tag="mid8")
else:  # headline
    proofs, common, vk = FS.build_semaphore_batch(
        n_members_bits=10, batch=32, config=FS.bench_config(),
        min_degree=1 << 12, cache_tag="bench10")
print("degree", common.degree, "lde_bits", common.fri_params.lde_bits,
      "arities", common.fri_params.reduction_arity_bits,
      "queries", common.config.fri_config.num_query_rounds, flush=True)

fn, to_gf = FS.make_verifier_fn(common, vk)
batched = FS.batched_arrays(proofs)
pa_gf = to_gf(batched)
t0 = time.time()
lowered = fn.lower(pa_gf)
print(f"lower {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
comp = lowered.compile()
print(f"compile {time.time()-t0:.1f}s", flush=True)
B = len(proofs)
t0 = time.time()
ok = np.asarray(comp(pa_gf))
print("run1:", ok.all(), f"{time.time()-t0:.3f}s", flush=True)
t0 = time.time()
reps = 20
for _ in range(reps):
    ok = comp(pa_gf)
np.asarray(ok)
dt = (time.time() - t0) / reps
print(f"steady: {dt*1000:.2f} ms/batch({B}) -> {B/dt:.1f} proofs/s", flush=True)
