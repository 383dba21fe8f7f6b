"""Device meshes and sharding helpers.

The reference has no in-process parallelism at all (SURVEY §2: zero
torch.distributed; multi-node = SLURM array jobs). On TPU the equivalents are
sharding annotations over a Mesh:

  * training: batch sharded over a 'data' axis; parameters replicated; XLA
    inserts the gradient psum over ICI and computes batch-norm statistics
    over the global batch (sync-BN) because the jit graph is global-view.
  * lightcone: tile batches sharded over 'data' for multi-chip painting;
    multi-host fan-out over LOS/shells via jax.distributed (one process per
    host, replacing the SLURM array pattern as an in-framework capability).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["data_parallel_mesh", "replicate", "shard_batch",
           "initialize_multihost"]


def data_parallel_mesh(n_devices: Optional[int] = None,
                       devices: Optional[Sequence] = None,
                       axis_name: str = "data") -> Mesh:
    """1-D mesh over all (or the first n) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=(axis_name,))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(tree, mesh: Mesh, axis_name: str = "data",
                batch_axis: int = 0):
    """Shard every array's ``batch_axis`` over the mesh's data axis."""
    def put(x):
        spec = [None] * np.ndim(x)
        spec[batch_axis] = axis_name
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.tree.map(put, tree)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None):
    """Initialize multi-host JAX (DCN) for lightcone fan-out across hosts.

    Thin wrapper over jax.distributed.initialize; replaces the reference's
    SLURM-array-of-independent-processes pattern
    (scripts/lightcone_slurm_sbatch.sh) with an in-framework capability.

    No-op only when already initialized, or when called with no arguments
    outside any recognizable cluster environment (a plain single-process
    run). Explicit arguments that fail — e.g. a mistyped coordinator
    address — RAISE instead of silently degrading to single-process.
    """
    explicit = any(a is not None
                   for a in (coordinator_address, num_processes, process_id))
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        raise
    except ValueError:
        if explicit:
            raise
        # auto-detection found no cluster environment: single-process run
