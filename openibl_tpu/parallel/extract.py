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
                    l2norm=True):
    """Build a jitted (params, images) -> descriptors function.

    ``apply_fn`` returns either descriptors or a (pool, desc) tuple (the
    EmbedNet convention). Output is L2-normalized (idempotent for already
    normalized descriptors, matching extract_cnn_feature, evaluators.py:22-34)
    and optionally PCA-projected on device (evaluators.py:56-57).
    """

    def fwd(params, images):
        out = apply_fn(params, images)
        if isinstance(out, tuple):
            out = out[1]
        if l2norm:
            out = l2_normalize(out, axis=-1)
        if pca_proj is not None:
            from openibl_tpu.ops.pca import pca_apply

            out = pca_apply(out, pca_proj, pca_bias)
        return out

    if mesh is None:
        return jax.jit(fwd)
    return jax.jit(
        fwd,
        in_shardings=(replicated(mesh), data_sharding(mesh, 4)),
        out_shardings=replicated(mesh),
    )


def extract_features(apply_fn, params, loader, mesh=None, pca=None,
                     feature_dim=None, verbose=False):
    """Extract descriptors for every item the loader yields.

    loader yields (images (B, H, W, 3), indices, count) — BatchLoader
    contract. Returns (N, D) numpy array ordered by the loader's indices.
    """
    pca_proj = pca_bias = None
    if pca is not None:
        if not pca.loaded:
            pca.load()
        pca_proj, pca_bias = pca._proj, pca._bias
    fn = make_extract_fn(apply_fn, mesh=mesh, pca_proj=pca_proj, pca_bias=pca_bias)

    chunks, orders = [], []
    for i, (images, idx, count) in enumerate(loader):
        out = fn(params, jnp.asarray(images))
        chunks.append(np.asarray(out)[:count])
        orders.append(np.asarray(idx)[:count])
        if verbose and (i + 1) % 10 == 0:
            print(f"  extract [{i + 1}/{len(loader)}]")
    feats = np.concatenate(chunks)
    order = np.concatenate(orders)
    return feats[np.argsort(order, kind="stable")]  # ascending dataset order
