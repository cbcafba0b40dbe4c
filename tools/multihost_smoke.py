"""Two-process jax.distributed smoke test (run by tests/test_multihost.py).

Each process owns 4 virtual CPU devices; the global mesh spans 8 devices
across both processes — the same wiring a real multi-host TPU pod uses
(parallel/multihost.py), with DCN standing in for the TCP coordinator.
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
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = global_data_mesh()
n_global = len(mesh.devices.reshape(-1))
assert n_global == 4 * nproc, n_global

# per-host slice of a global batch of "accept bits", reduced with psum
lo, hi = host_batch_slice(8 * nproc)
local = np.arange(lo, hi, dtype=np.int32)

try:
    from jax import shard_map as _shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map as _shard_map
from functools import partial

global_shape = (8 * nproc,)
# make the global array from per-host shards (per-host data loading)
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, global_shape)


@partial(_shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
def total(x):
    return jax.lax.psum(x.sum(), "data")


out = int(np.asarray(jax.jit(total)(garr)).reshape(-1)[0])
expect = sum(range(8 * nproc))
assert out == expect, (out, expect)
print(f"MULTIHOST_SMOKE[{pid}]: PASS total={out} procs={jax.process_count()} "
      f"devices={n_global}", flush=True)
