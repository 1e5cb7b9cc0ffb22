"""Device mesh + sharding helpers.

The reference's entire parallelism story is NCCL data parallelism, one
process per GPU (/root/reference/ibl/utils/dist_utils.py:11-42, SURVEY.md §2).
TPU-native replacement: a single-controller ``jax.sharding.Mesh`` with the
'data' axis over ICI; params replicated, batches sharded, gradient psum
inserted by XLA under jit. Multi-host (DCN) initialization goes through
``jax.distributed.initialize`` (call ``maybe_init_distributed`` first in
multi-process launches).
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def maybe_init_distributed():
    """Initialize jax.distributed from env when launched multi-process.

    Replaces the reference's init_dist / init_dist_slurm NCCL rendezvous
    (dist_utils.py:21-42); JAX picks up coordinator/process env vars or Slurm
    automatically via its cluster-detection plugins.

    A half-configured multi-process environment fails LOUDLY (like the
    reference's init_dist raising on an unknown launcher, dist_utils.py:19):
    silently degrading to single-process would train on a fraction of the
    data while appearing healthy.
    """
    if jax.process_count() > 1:
        return  # already initialized
    multiproc_env = [
        k for k in
        ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "SLURM_NTASKS")
        if os.environ.get(k)
    ]
    if not multiproc_env:
        return
    if os.environ.get("SLURM_NTASKS") == "1" and len(multiproc_env) == 1:
        return  # a 1-task slurm allocation is a single-process launch
    try:
        jax.distributed.initialize()
    except Exception as e:
        raise RuntimeError(
            f"multi-process launch detected ({'/'.join(multiproc_env)} set) "
            f"but jax.distributed.initialize() failed — refusing to degrade "
            f"to single-process. Check coordinator address/port and that "
            f"num_processes/process_id are consistent on every host."
        ) from e


def get_mesh(n_devices=None, devices=None, axis=DATA_AXIS):
    """1-D data-parallel mesh over available devices (ICI within a slice)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh, ndim, axis=DATA_AXIS):
    """Shard dim 0 over the data axis, replicate the rest."""
    spec = [axis] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch, axis=DATA_AXIS):
    """Place a host array on the mesh, sharded along dim 0."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x), axis)), batch
    )


def pad_to_multiple(n, m):
    return -(-n // m) * m
