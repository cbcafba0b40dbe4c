"""Device-mesh helpers: proof-batch data parallelism over ICI/DCN.

The reference's only parallelism is rayon threads over independent proofs
(reference: plonky2_semaphore/recursion.rs:214-227; SURVEY §2.3). The
TPU-native equivalent: shard the proof batch over a `jax.sharding.Mesh`
("data" axis), verify locally, and reduce accept bitmaps / digest
accumulators with XLA collectives over ICI.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, pytree, axis: str = "data"):
    """Place a batched pytree with leading batch axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), pytree)


def replicate(mesh: Mesh, pytree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), pytree)
