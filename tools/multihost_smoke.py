"""Two-process jax.distributed PROOF-VERIFICATION test (run by
tests/test_multihost.py).

Each process owns 4 virtual CPU devices; the global mesh spans 8 devices
across both processes — the same wiring a real multi-host TPU pod uses
(parallel/multihost.py), with the TCP coordinator standing in for DCN. The
cross-process payload is the real thing, not an integer sum: a 16-proof
batch is fed per-host (each process supplies only its half), verified by the
sharded SPMD verifier on the u64 CPU field backend, and reduced with the
collective accept-count psum + per-shard Poseidon digest chain. Each process
checks its addressable digest shards against a host replay of the golden
hash, so cross-process accept bits AND digests must match the
single-process run.

Usage: python tools/multihost_smoke.py <process_id> <num_processes> <port>
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
# force exactly 4 virtual devices per process (override any inherited flag,
# e.g. the 8-device one tests/conftest.py exports)
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "host_platform_device_count" not in f]
flags.append("--xla_force_host_platform_device_count=4")
os.environ["XLA_FLAGS"] = " ".join(flags)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

from stark_verifier_tpu.parallel.multihost import (
    global_data_mesh,
    host_batch_slice,
    init_distributed,
)

ok = init_distributed(coordinator=f"127.0.0.1:{port}", num_processes=nproc,
                      process_id=pid)
assert ok, "init_distributed returned False"
assert jax.process_count() == nproc, jax.process_count()

import numpy as np

from stark_verifier_tpu.models import flagship as FS
from stark_verifier_tpu.ops import gl64_cpu as gc
from stark_verifier_tpu.ops import gl64_np as gl
from stark_verifier_tpu.ops import poseidon_gl as pg
from stark_verifier_tpu.parallel.batch_verify import make_sharded_verifier

mesh = global_data_mesh()
n_global = len(mesh.devices.reshape(-1))
assert n_global == 4 * nproc, n_global

# the cached dryrun fixture: identical on both processes (committed npz)
B = 16
proofs, common, vk = FS.build_dryrun_batch(batch=B)
batched = FS.batched_arrays(proofs)
sharding, verify_fn, agg_fn = make_sharded_verifier(common, vk, mesh, F=gc)

# per-host data feeding: this process materializes ONLY its slice
lo, hi = host_batch_slice(B)


def feed(a):
    a = np.asarray(a, np.uint64)
    g = jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(a[lo:hi]), a.shape)
    return gc.GF(g, g, g, g)


pa_gf = {k: feed(v) for k, v in batched.items()}
accept = jax.jit(verify_fn)(pa_gf)
digests, count = agg_fn(pa_gf["public_inputs"], accept)

# accept bits: every addressable shard of this process must be all-True
for sh in accept.addressable_shards:
    assert bool(np.asarray(sh.data).all()), f"proc {pid} shard {sh.index}"
# global count crosses the process boundary via psum
count = int(np.asarray(count))
assert count == B, (count, B)

# digest shards: host-replay the golden Poseidon fold for each addressable
# shard (shard d covers proofs [2d, 2d+2) of the global batch)
pis_u64 = np.asarray(batched["public_inputs"], np.uint64)
per = B // n_global
for sh in digests.l0.addressable_shards:
    d = sh.index[0].start
    acc = np.zeros(4, np.uint64)
    for i in range(per * d, per * (d + 1)):
        inputs = list(pis_u64[i]) + [np.uint64(1)] + list(acc)
        acc = np.array(
            pg.hash_no_pad(gl, [gl.const(int(x)) for x in inputs]),
            dtype=np.uint64)
    got = np.asarray(sh.data)[0]
    assert (got == acc).all(), (pid, d, got, acc)

print(f"MULTIHOST_VERIFY[{pid}]: PASS count={count} procs="
      f"{jax.process_count()} devices={n_global}", flush=True)
