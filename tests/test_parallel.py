"""Multi-device batched verification over the virtual CPU mesh.

Compile-heavy: gated behind SVT_SLOW (the graft dryrun exercises the same
path; with a warm .jax_cache this runs quickly)."""
import os

import numpy as np
import pytest


def test_sharded_aggregation_fast():
    """Ungated: the collective half of the multichip step (psum accept
    count + per-shard Poseidon digest chain under shard_map) on the
    8-device virtual mesh, checked against the host digest fold."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from stark_verifier_tpu.ops import gl64_jax as gj
    from stark_verifier_tpu.ops import gl64_np as gl
    from stark_verifier_tpu.ops import poseidon_gl as pg
    from stark_verifier_tpu.parallel.batch_verify import digest_chain

    devs = jax.devices()
    assert len(devs) >= 8, "conftest should provide 8 virtual devices"
    mesh = Mesh(np.array(devs[:8]), ("data",))

    import jax.numpy as jnp
    from functools import partial

    try:
        from jax import shard_map as sm
    except ImportError:
        from jax.experimental.shard_map import shard_map as sm

    try:
        wrap = partial(sm, mesh=mesh, in_specs=(P("data"), P("data")),
                       out_specs=(P("data"), P()), check_vma=False)
    except TypeError:
        wrap = partial(sm, mesh=mesh, in_specs=(P("data"), P("data")),
                       out_specs=(P("data"), P()), check_rep=False)

    @jax.jit
    @wrap
    def agg(pis, ok):
        d = digest_chain(pis, ok)
        count = jax.lax.psum(jnp.sum(ok.astype(jnp.uint32)), "data")
        return gj.gmap(lambda a: a[None], d), count

    rng = np.random.default_rng(0)
    B, npi = 16, 5
    pis_u64 = rng.integers(0, gl.P, size=(B, npi), dtype=np.uint64)
    ok_np = np.ones(B, bool)
    ok_np[5] = False

    sharding = NamedSharding(mesh, P("data"))
    pis = jax.device_put(gj.from_u64(pis_u64), sharding)
    ok = jax.device_put(ok_np, sharding)
    digests, count = agg(pis, ok)
    assert int(np.asarray(count)) == B - 1
    d_np = np.asarray(gj.to_u64(digests))
    assert d_np.shape == (8, 4)

    # host replay of shard 0's chain (proofs 0..1)
    acc = np.zeros(4, np.uint64)
    for i in range(2):
        inputs = list(pis_u64[i]) + [np.uint64(bool(ok_np[i]))] + list(acc)
        acc = np.array(
            pg.hash_no_pad(gl, [gl.const(int(x)) for x in inputs]),
            dtype=np.uint64)
    assert (d_np[0] == acc).all()


def test_dryrun_multichip_8():
    """The driver-checked multichip dryrun: 8-device CPU mesh, sharded SPMD
    verify + psum/digest collectives. Runs in ~40 s with the u64 CPU field
    backend (ops/gl64_cpu); in a subprocess because gl64_cpu enables
    jax_enable_x64 globally, which must not leak into other tests."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as E; E.dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "verified 16 proofs" in proc.stdout


def test_zk20_sharded_multichip():
    """The REAL zk20 workload (zk on, 2^20-member set, 28 queries) verified
    SPMD over the 8-device virtual mesh, honest + corrupted lane
    (subprocess: gl64_cpu enables x64 globally)."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "tools" / "zk20_mesh_check.py")],
        cwd=repo, env=dict(os.environ), capture_output=True, text=True,
        timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ZK20_MESH: PASS" in proc.stdout
