"""Mesh-sharded descriptor extraction.

Replaces the reference's per-rank slice extraction + NCCL gather
(/root/reference/ibl/evaluators.py:36-103, C9/C13 in SURVEY.md): under a
single-controller mesh, each batch is sharded over the 'data' axis and the
jitted forward runs SPMD — XLA handles the device placement; the "gather" is
just reading the output. Multi-host: each process feeds its slice
(data.sampler.slice_indices) and results are assembled by process index.
"""

import numpy as np
import jax
import jax.numpy as jnp

from openibl_tpu.parallel.mesh import data_sharding, replicated
from openibl_tpu.utils import l2_normalize


def make_extract_fn(apply_fn, mesh=None, pca_proj=None, pca_bias=None,
                    l2norm=True, feature="vlad", masked=False):
    """Build a jitted (params, images[, valid_hw]) -> descriptors function.

    ``apply_fn`` returns either descriptors or a (pool, desc) tuple (the
    EmbedNet convention); ``feature`` selects "vlad" (desc) or "pool" — the
    reference's --vlad flag (extract_cnn_feature, evaluators.py:22-34).
    Output is L2-normalized and optionally PCA-projected on device
    (evaluators.py:56-57). With ``masked`` the apply_fn takes (params,
    images, valid_hw) — the bucket-padded variable-shape path.
    """
    if feature not in ("vlad", "pool"):
        raise ValueError(f"feature must be 'vlad' or 'pool', got {feature!r}")

    def fwd(params, images, *extra):
        out = apply_fn(params, images, *extra)
        if isinstance(out, tuple):
            out = out[0] if feature == "pool" else out[1]
        if l2norm:
            out = l2_normalize(out, axis=-1)
        if pca_proj is not None:
            from openibl_tpu.ops.pca import pca_apply

            out = pca_apply(out, pca_proj, pca_bias)
        return out

    if mesh is None:
        return jax.jit(fwd)
    data_in = (data_sharding(mesh, 4),) + (
        (data_sharding(mesh, 2),) if masked else ()
    )
    return jax.jit(
        fwd,
        in_shardings=(replicated(mesh),) + data_in,
        out_shardings=replicated(mesh),
    )


def _write_rows(buf, rows, start):
    return jax.lax.dynamic_update_slice(buf, rows, (start, 0))


# donate_argnums=0 aliases the output to ``buf``: each batch's rows land
# in-place in the preallocated (N, D) HBM buffer, so device-resident
# extraction peaks at N x D + one batch instead of 2 x N x D (a concat
# would OOM a Pitts250k-scale 32k-dim gallery on a 16 GB chip).
# ``start`` is a traced scalar — one compile covers every offset.
_write_rows = jax.jit(_write_rows, donate_argnums=0)


def extract_features(apply_fn, params, loader, mesh=None, pca=None,
                     feature="vlad", verbose=False, sort=True,
                     masked_apply_fn=None, device_output=False):
    """Extract descriptors for every item the loader yields.

    loader yields (images (B, H, W, 3), indices, count) — BatchLoader
    contract — or (images, valid_hw, indices, count) — PaddedBatchLoader
    contract, routed through ``masked_apply_fn`` (e.g.
    EmbedNet.apply_masked). Returns (N, D) numpy array ordered by ascending
    loader index (``sort=True``) or in emission order (``sort=False``, used
    for positional multi-host reassembly).

    ``device_output=True`` keeps the result in HBM as a jax.Array (same
    ordering contract): batches are written into one preallocated buffer by
    a donated dynamic_update_slice, so consumers like the hard-negative
    miner (ops.distance.mine_hard_tuples) read the extraction output with
    NO host round trip — the reference re-uploads its CPU feature store to
    the GPU every refresh (/root/reference/examples/netvlad_img.py:73-83 via
    ibl/utils/data/sampler.py); at Pitts250k scale that is ~11 GB of H2D
    per refresh this mode deletes. Requires a loader exposing ``.indices``
    (BatchLoader / PaddedBatchLoader do).
    """
    pca_proj = pca_bias = None
    if pca is not None:
        if not pca.loaded:
            pca.load()
        pca_proj, pca_bias = pca._proj, pca._bias
    fn = make_extract_fn(apply_fn, mesh=mesh, pca_proj=pca_proj,
                         pca_bias=pca_bias, feature=feature)
    fn_masked = None
    if masked_apply_fn is not None:
        fn_masked = make_extract_fn(masked_apply_fn, mesh=mesh,
                                    pca_proj=pca_proj, pca_bias=pca_bias,
                                    feature=feature, masked=True)
    n_dev = mesh.size if mesh is not None else 1

    if device_output:
        if not hasattr(loader, "indices"):
            raise ValueError(
                "device_output=True needs a loader with .indices "
                "(BatchLoader / PaddedBatchLoader) to size the HBM buffer"
            )
        n_total = len(loader.indices)

    # keep a couple of batches in flight: JAX's async dispatch then overlaps
    # host decode + H2D + D2H with device compute (large win behind
    # high-latency transports)
    in_flight = []

    def drain(one=False):
        while in_flight and (one or len(in_flight) > 2):
            out, count = in_flight.pop(0)
            chunks.append(np.asarray(out)[:count])
            one = False

    buf, offset = None, 0
    chunks, orders = [], []
    for i, batch in enumerate(loader):
        if len(batch) == 4:
            if fn_masked is None:
                raise ValueError(
                    "loader yields (images, valid_hw, idx, count) batches "
                    "but no masked_apply_fn was provided"
                )
            images, valid_hw, idx, count = batch
        else:
            images, idx, count = batch
            valid_hw = None
        # data-sharded dim 0 must divide the mesh: pad by repetition
        pad = (-len(images)) % n_dev
        if pad:
            images = np.concatenate([images, np.repeat(images[-1:], pad, 0)])
            if valid_hw is not None:
                valid_hw = np.concatenate(
                    [valid_hw, np.repeat(valid_hw[-1:], pad, 0)]
                )
        if valid_hw is None:
            out = fn(params, jnp.asarray(images))
        else:
            out = fn_masked(params, jnp.asarray(images), jnp.asarray(valid_hw))
        if device_output:
            if buf is None:
                buf = jnp.zeros((n_total, out.shape[1]), out.dtype)
                if mesh is not None:
                    buf = jax.device_put(buf, replicated(mesh))
            # all-async: the slice + in-place write queue behind the forward
            # while the host decodes the next batch
            buf = _write_rows(buf, out[:count], offset)
            offset += count
            # periodic fence: with no np.asarray drain on this path, nothing
            # would otherwise block until return — the host could enqueue the
            # whole dataset's staged H2D pixel batches ahead of a slow device
            # (np.asarray because block_until_ready is a no-op on the
            # tunneled platform); one element of ``out`` gates on batch i's
            # forward, bounding in-flight work at ~16 batches (~2.4 GB of
            # staged bs128 pixels; each fence costs one ~33 ms tunnel round
            # trip, ~1% of 16 batches' compute)
            if (i + 1) % 16 == 0:
                np.asarray(out[0, 0])
        else:
            in_flight.append((out, count))
        orders.append(np.asarray(idx)[:count])
        drain()
        if verbose and (i + 1) % 10 == 0:
            print(f"  extract [{i + 1}/{len(loader)}]")
    while in_flight:
        drain(one=True)
    if device_output:
        assert offset == n_total, (offset, n_total)
        if not sort:
            return buf
        order = np.concatenate(orders)
        perm = np.argsort(order, kind="stable")
        if np.array_equal(perm, np.arange(len(perm))):
            return buf  # emission order already ascending (e.g. arange)
        return jnp.take(buf, jnp.asarray(perm), axis=0)
    feats = np.concatenate(chunks)
    if not sort:
        return feats
    order = np.concatenate(orders)
    return feats[np.argsort(order, kind="stable")]  # ascending dataset order


def extract_features_sharded(apply_fn, params, source, indices=None,
                             batch_size=32, mesh=None, pca=None,
                             feature="vlad", verbose=False, prefetch=2,
                             device_output=False):
    """Multi-host-aware extraction.

    Single process: one sharded-over-mesh pass. Multi-host (DCN): each process
    extracts its contiguous slice (data.sampler.slice_indices — same
    reassembly convention as the reference's DistributedSliceSampler +
    broadcast, evaluators.py:88-101) on its addressable sub-mesh, and features
    are all-gathered across hosts. Returns (N, D) in dataset order on every
    host. A global (multi-process) ``mesh`` is reduced to this process's
    sub-mesh automatically — per-host batches can't shard over devices this
    host doesn't own.

    ``device_output=True`` keeps the single-process result HBM-resident (see
    extract_features) so mining consumes it with no host round trip; the
    multi-host path ignores it — the cross-host all-gather reassembly is
    numpy by design.
    """
    import jax as _jax

    from openibl_tpu.data.loader import BatchLoader
    from openibl_tpu.data.sampler import slice_indices

    if indices is None:
        indices = np.arange(len(source))
    indices = np.asarray(indices)
    n_proc = _jax.process_count()
    if n_proc == 1:
        loader = BatchLoader(source, indices, batch_size, prefetch=prefetch)
        return extract_features(apply_fn, params, loader, mesh=mesh, pca=pca,
                                feature=feature, verbose=verbose,
                                device_output=device_output)

    from openibl_tpu.parallel.mesh import local_view_tree, process_local_mesh

    if mesh is not None:
        mesh = process_local_mesh(mesh)
    # params may be global replicated arrays mid-training; the per-host jit
    # reads the local replica (no cross-host traffic)
    params = local_view_tree(params)
    mine = slice_indices(len(indices), n_proc, _jax.process_index())
    loader = BatchLoader(source, indices[mine], batch_size, prefetch=prefetch)
    # emission order (sort=False): positional reassembly — the wrap-around
    # padding on the last shard makes index-sorted order wrong here
    local = extract_features(apply_fn, params, loader, mesh=mesh, pca=pca,
                             feature=feature, verbose=verbose, sort=False)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(local)  # (n_proc, per, D)
    feats = np.asarray(gathered).reshape(-1, local.shape[-1])
    return feats[: len(indices)]
