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

    ORDERING: this must run before anything initializes the XLA backend —
    ``jax.distributed.initialize`` refuses to run after the first backend
    touch, so nothing here may call backend-initializing jax APIs
    (``jax.process_count()``, ``jax.devices()``, ...) before it. The
    already-initialized check goes through ``jax.distributed.is_initialized``
    which only inspects client state.
    """
    if jax.distributed.is_initialized():
        return
    multiproc_env = [
        k for k in
        ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "SLURM_NTASKS")
        if os.environ.get(k)
    ]
    if not multiproc_env:
        return
    if os.environ.get("SLURM_NTASKS") == "1" and len(multiproc_env) == 1:
        return  # a 1-task slurm allocation is a single-process launch
    # jax auto-detects Slurm/OpenMPI topologies via its cluster plugins but
    # does NOT read JAX_NUM_PROCESSES/JAX_PROCESS_ID from the environment —
    # pass the manual-launch vars (scripts/test_multihost.sh convention)
    # through explicitly when set
    kwargs = {}
    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    if addr:
        kwargs["coordinator_address"] = addr
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    if os.environ.get("OPENIBL_DIST_INIT_TIMEOUT"):
        # rendezvous deadline in seconds (jax default: 300) — lower it for
        # fail-fast launches and tests
        kwargs["initialization_timeout"] = int(
            os.environ["OPENIBL_DIST_INIT_TIMEOUT"]
        )
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:
        raise RuntimeError(
            f"multi-process launch detected ({'/'.join(multiproc_env)} set) "
            f"but jax.distributed.initialize() failed — refusing to degrade "
            f"to single-process. Check coordinator address/port and that "
            f"num_processes/process_id are consistent on every host "
            f"(if the error says the XLA backend was already initialized, "
            f"maybe_init_distributed ran too late in the program)."
        ) from e


def get_mesh(n_devices=None, devices=None, axis=DATA_AXIS):
    """1-D data-parallel mesh over available devices (ICI within a slice)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def process_local_mesh(mesh=None, axis=DATA_AXIS):
    """Sub-mesh of this process's addressable devices.

    Per-host compute phases that reassemble over DCN (sharded extraction,
    redundant eval kNN) run on this mesh: jitting over the global mesh would
    require globally-sharded inputs, while these phases feed host-local
    arrays. Single-process: returns ``mesh`` unchanged (or a fresh local
    mesh when None)."""
    if mesh is not None and jax.process_count() == 1:
        return mesh
    devs = mesh.devices.ravel() if mesh is not None else np.asarray(jax.devices())
    local = [d for d in devs if d.process_index == jax.process_index()]
    names = mesh.axis_names if mesh is not None else (axis,)
    return Mesh(np.asarray(local), names)


def global_batch(mesh, x, axis=DATA_AXIS):
    """This process's rows → a global jax.Array sharded on dim 0.

    The multi-host analog of the reference's per-rank DataLoader shard
    (ibl/utils/data/sampler.py:62-71): each process passes its slice of the
    global batch and the returned Array spans the whole mesh — the jitted
    step then runs SPMD with XLA inserting the DCN/ICI collectives.
    Single-process this is just a sharded device_put."""
    x = np.asarray(x)
    sharding = data_sharding(mesh, x.ndim, axis)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)


def globalize_tree(mesh, tree):
    """Make every leaf a fully-replicated global array over ``mesh``.

    Multi-host jitted steps require global jax.Arrays for every argument;
    model init / checkpoint load / host-side LR mutation produce process-
    local leaves. Leaves that are already global (outputs of a previous
    step) pass through untouched, so per-epoch cost is only the handful of
    host-mutated leaves. Single-process: identity (the jit's in_shardings
    place local arrays fine)."""
    if jax.process_count() == 1:
        return tree
    rep = NamedSharding(mesh, P())

    def fix(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x  # already global
        arr = np.asarray(x)
        return jax.make_array_from_process_local_data(rep, arr, arr.shape)

    return jax.tree.map(fix, tree)


def local_view_tree(tree):
    """Global fully-replicated leaves → host arrays.

    Per-host compute phases (sharded extraction on the process-local mesh)
    cannot consume global arrays; a fully-replicated global array's local
    replica is host-readable with no cross-host traffic. Local leaves pass
    through untouched."""

    def fix(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x)
        return x

    return jax.tree.map(fix, tree)


def copy_tree(tree):
    """Deep copy that never aliases soon-to-be-donated device buffers.

    Single-process: on-device copies (jnp.array — NOT jnp.asarray, which
    aliases; see build notes). Multi-process: host copies of the local
    replica (jnp.array of a non-addressable global array is not allowed);
    the trainers re-globalize them on the next step."""
    if jax.process_count() == 1:
        import jax.numpy as jnp

        return jax.tree.map(jnp.array, tree)
    return jax.tree.map(lambda x: np.array(x), tree)


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
