"""Inference hub API: the vgg16_netvlad single-image descriptor model.

Mirrors the reference torch.hub surface (/root/reference/hubconf.py:5-11):
VGG16 + NetVLAD + PCA-whitening to a 4096-d L2-normalized descriptor for one
480x640 image. Weights come from a released torch checkpoint (converted) or
one of our own checkpoints; no-weight construction gives random init.
"""

import numpy as np
import jax
import jax.numpy as jnp

from openibl_tpu import models
from openibl_tpu.data.transforms import TestTransform


def _require_loaded(params, template, path):
    """Inference loads must be complete: a leaf the tolerant merge 'kept
    target' on (missing from the archive or shape-mismatched) is RANDOM init
    here — fail loudly instead of serving garbage descriptors. The pca
    subtree is exempt (trainer checkpoints never carry it; vgg16_netvlad
    fills it from the PCA params file or raises)."""
    flat_t = jax.tree_util.tree_flatten_with_path(template)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    bad = [
        jax.tree_util.keystr(p)
        for (p, t_leaf), (_, leaf) in zip(flat_t, flat_p)
        if leaf is t_leaf and not jax.tree_util.keystr(p).startswith("['pca']")
    ]
    if bad:
        raise ValueError(
            f"{path} did not provide {len(bad)} model leaves (e.g. "
            f"{bad[:3]}): wrong file or architecture mismatch — check "
            f"num_clusters/pca_dim against the checkpoint"
        )


def vgg16_netvlad(pretrained=None, num_clusters=64, pca_dim=4096,
                  pca_params=None):
    """Build the inference model.

    Args:
      pretrained: path to weights — a torch .pth/.pth.tar state dict (the
        released vgg16_netvlad.pth, converted on the fly) or one of our .npz
        checkpoints. None → random init.
      pca_params: optional path to a PCA-whitening params file (.h5/.npz from
        ops.pca.save_pca). Trainer checkpoints never contain the pca leaves
        (PCA is trained separately, engine/pipeline.py finalize_with_pca),
        so for those the projection must come from here; when omitted, the
        reference convention ``pca_params_<checkpoint stem>.h5`` next to the
        checkpoint (test.py:109) is tried automatically.
    Returns: (model, params).
    """
    import os.path as osp

    model = models.create(
        "embednetpca",
        net_vlad=models.NetVLAD(num_clusters=num_clusters),
        pca_dim=pca_dim,
    )
    if pretrained is None:
        params = model.init(jax.random.PRNGKey(0))
    elif str(pretrained).endswith(".npz"):
        from openibl_tpu.utils.checkpoint import load_checkpoint

        template = model.init(jax.random.PRNGKey(0))
        # sniff the key layout without leaking an open NpzFile handle (the
        # archive is re-read by load_checkpoint below; the sniff only parses
        # the zip directory)
        with np.load(pretrained) as data:
            is_pipeline_ckpt = any(
                k.startswith("leaf:params/") for k in data.files
            )
            ckpt_has_pca = any(
                k.startswith("leaf:params/pca/") for k in data.files
            )
        if is_pipeline_ckpt:
            # pipeline checkpoints store {'params':..., 'opt_state':...}
            loaded, _ = load_checkpoint(pretrained, {"params": template},
                                        strict=False, verbose=True)
            params = loaded["params"]
            _require_loaded(params, template, pretrained)
            if pca_params is None and not ckpt_has_pca:
                stem = osp.basename(str(pretrained)).split(".")[0] or "model"
                cand = osp.join(osp.dirname(str(pretrained)) or ".",
                                f"pca_params_{stem}.h5")
                if osp.isfile(cand):
                    pca_params = cand
                else:
                    # without this the pca leaves silently keep their RANDOM
                    # init and every descriptor is whitened by noise
                    raise ValueError(
                        f"{pretrained} is a trainer checkpoint without PCA "
                        f"leaves and no PCA params file was found (tried "
                        f"{cand}); pass pca_params=<path to the .h5 written "
                        f"by training/finalize> or use the 32768-d "
                        f"'embednet' model instead"
                    )
        else:
            params, _ = load_checkpoint(pretrained, template, verbose=True)
            _require_loaded(params, template, pretrained)
    else:
        from openibl_tpu.models import convert

        # weights-only load (never full pickle execution); falls back to a
        # numpy-scalar allowlist for reference full training checkpoints
        state = convert.load_torch_checkpoint(pretrained)
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        params = convert.embednetpca_params_from_torch(state)
    if pca_params is not None:
        from openibl_tpu.ops.pca import load_pca, pca_projection

        proj, bias = pca_projection(load_pca(pca_params),
                                    n_components=pca_dim, whiten=True)
        params["pca"] = {"w": jnp.asarray(proj), "b": jnp.asarray(bias)}
    return model, params


class DescriptorExtractor:
    """Convenience wrapper: PIL image(s) → 4096-d descriptors
    (the examples/extract.py flow, reference extract.py:6-23)."""

    def __init__(self, pretrained=None, height=480, width=640,
                 pca_params=None):
        self.model, self.params = vgg16_netvlad(pretrained,
                                                pca_params=pca_params)
        self.transform = TestTransform(height, width)
        self._fwd = jax.jit(self.model.apply)

    def __call__(self, images):
        if not isinstance(images, (list, tuple)):
            images = [images]
        batch = np.stack([self.transform(img) for img in images])
        return np.asarray(self._fwd(self.params, jnp.asarray(batch)))
