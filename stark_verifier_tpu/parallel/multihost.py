"""Multi-host wiring: jax.distributed init + host-spanning meshes.

The reference is single-host (rayon threads; SURVEY §2.3). Here the proof
batch shards over every chip of a multi-host slice: accept bitmaps and
aggregate digests reduce over ICI within a host and DCN across hosts via
the same psum in parallel/batch_verify.py — the mesh shape is the only
difference. (This box has one chip; multi-host paths are exercised via the
virtual CPU mesh and dry-run compiles.)
"""
from __future__ import annotations

import os

import numpy as np


def init_distributed(coordinator: str = None, num_processes: int = None,
                     process_id: int = None):
    """Initialize jax.distributed from explicit args or the standard env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). No-op
    when single-process."""
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", "0")),
    )
    return True


def global_data_mesh(axis: str = "data"):
    """One data axis over every chip of every host."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def host_batch_slice(global_batch: int):
    """[start, end) of the proof batch this host is responsible for
    feeding (per-host data loading for multi-host runs)."""
    import jax

    pid = jax.process_index()
    n = jax.process_count()
    per = (global_batch + n - 1) // n
    return pid * per, min((pid + 1) * per, global_batch)
