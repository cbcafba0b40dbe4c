"""Prototype: dryrun via NamedSharding jit(vmap) + small shard_map agg."""
import os, sys, time
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map as sm
except ImportError:
    from jax.experimental.shard_map import shard_map as sm

from stark_verifier_tpu.core import verifier as V
from stark_verifier_tpu.models import flagship as FS
from stark_verifier_tpu.ops import gl64_jax as gj
from stark_verifier_tpu.parallel.batch_verify import digest_chain

n_devices = 8
batch = 2 * n_devices
proofs, common, vk = FS.build_semaphore_batch(
    n_members_bits=4, batch=batch, config=FS.small_config(),
    cache_tag=f"entry{batch}")
mesh = Mesh(np.array(jax.devices()[:n_devices]), ("data",))
shard = NamedSharding(mesh, P("data"))

vk_cap = gj.from_u64(vk.constants_sigmas_cap)
digest = gj.from_u64(vk.circuit_digest)

def verify_one(pa):
    return V.verify(gj, common, vk_cap, digest, pa)

batched = FS.batched_arrays(proofs)
pa_gf = {k: gj.from_u64(v) for k, v in batched.items()}
pa_gf = jax.device_put(pa_gf, shard)
print("inputs sharded", flush=True)

t0 = time.time()
vfn = jax.jit(jax.vmap(verify_one))
comp = vfn.lower(pa_gf).compile()
print(f"verify compile {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
ok = comp(pa_gf)
ok_np = np.asarray(ok)
print(f"verify exec {time.time()-t0:.1f}s ok={ok_np.tolist()}", flush=True)

@jax.jit
@partial(sm, mesh=mesh, in_specs=(P("data"), P("data")),
         out_specs=(P("data"), P()), check_vma=False)
def agg(pis, okv):
    d = digest_chain(pis, okv)
    count = jax.lax.psum(jnp.sum(okv.astype(jnp.uint32)), "data")
    return gj.gmap(lambda a: a[None], d), count

t0 = time.time()
digests, count = agg(pa_gf["public_inputs"], ok)
print(f"agg {time.time()-t0:.1f}s count={int(np.asarray(count))} "
      f"digest shards {np.asarray(digests.l0).shape}", flush=True)
assert ok_np.all() and int(np.asarray(count)) == batch
print("dryrun_v2 PASS", flush=True)
