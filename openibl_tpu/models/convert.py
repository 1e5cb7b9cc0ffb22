"""Convert released PyTorch/MatConvNet checkpoints into our param pytrees.

The reference ships weights as torch state dicts (hubconf vgg16_netvlad
release, MatConvNet conv5_3 backbone 'vd16_offtheshelf_conv5_3_max.pth',
training checkpoints). Key layouts handled:

  base_model.base.<i>.weight / .bias   (EmbedNet/EmbedNetPCA/EmbedRegionNet)
  base.<i>.weight / <i>.weight         (bare VGG backbone)
  net_vlad.conv.weight (K,C,1,1), net_vlad.centroids (K,C)
  pca_layer.weight (D_out,D_in,1,1), pca_layer.bias
  optional 'module.' DDP prefix

Torch conv weights are OIHW; ours are HWIO; the NetVLAD 1x1 assignment conv
becomes a (C, K) matrix and the PCA 1x1 conv a (D_in, D_out) matrix.
"""

import numpy as np
import jax.numpy as jnp

# torchvision vgg16.features conv indices → our layer names
# (/root/reference/ibl/models/vgg.py uses features[:-2], conv indices below)
TORCH_VGG16_CONV_INDEX = {
    0: "conv1_1", 2: "conv1_2",
    5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
    17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
    24: "conv5_1", 26: "conv5_2", 28: "conv5_3",
}


def load_torch_checkpoint(path):
    """torch.load for checkpoint files without opting into pickle execution.

    Plain tensor state dicts (the hub release) load under
    ``weights_only=True`` directly. Reference-style FULL training checkpoints
    additionally store metadata as numpy scalars (netvlad_img.py:201-204
    saves ``best_recall5 = recalls[1]``, an np.float64 from
    evaluators.py:160), which the weights-only unpickler rejects; retry under
    ``safe_globals`` that allow exactly the numpy scalar-reconstruction
    globals — still never arbitrary pickle execution.
    """
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        allow = [np.dtype, np.ndarray, np.float64, np.float32,
                 np.int64, np.int32]
        multiarray = getattr(np, "_core", np.core).multiarray
        for name in ("scalar", "_reconstruct"):
            fn = getattr(multiarray, name, None)
            if fn is not None:
                allow.append(fn)
        try:  # numpy>=1.25 pickles dtypes via the numpy.dtypes classes
            from numpy import dtypes as _np_dtypes

            allow += [getattr(_np_dtypes, n) for n in dir(_np_dtypes)
                      if n.endswith("DType")]
        except ImportError:
            pass
        with torch.serialization.safe_globals(allow):
            return torch.load(path, map_location="cpu", weights_only=True)


def _to_np(v):
    # Accept torch tensors or numpy arrays without importing torch here.
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _strip(key):
    for prefix in ("module.",):
        if key.startswith(prefix):
            key = key[len(prefix):]
    return key


def vgg16_params_from_torch(state_dict, prefix_candidates=("base_model.base.", "base.", "")):
    """Extract VGG16 backbone params from a torch state dict."""
    sd = {_strip(k): _to_np(v) for k, v in state_dict.items()}
    params = {}
    for prefix in prefix_candidates:
        found = 0
        trial = {}
        for idx, name in TORCH_VGG16_CONV_INDEX.items():
            wk, bk = f"{prefix}{idx}.weight", f"{prefix}{idx}.bias"
            if wk in sd:
                w = sd[wk]  # (O, I, 3, 3)
                trial[name] = {
                    "w": jnp.asarray(w.transpose(2, 3, 1, 0)),  # HWIO
                    "b": jnp.asarray(sd[bk]),
                }
                found += 1
        if found == len(TORCH_VGG16_CONV_INDEX):
            params = trial
            break
    if not params:
        raise ValueError(
            "could not locate all 13 VGG16 conv layers in state dict "
            f"(keys sample: {list(sd)[:5]})"
        )
    return params


def netvlad_params_from_torch(state_dict, prefix="net_vlad."):
    sd = {_strip(k): _to_np(v) for k, v in state_dict.items()}
    w = sd[f"{prefix}conv.weight"]  # (K, C, 1, 1)
    centroids = sd[f"{prefix}centroids"]  # (K, C)
    return {
        "assign_w": jnp.asarray(w[:, :, 0, 0].T),  # (C, K)
        "centroids": jnp.asarray(centroids),
    }


def pca_layer_params_from_torch(state_dict, prefix="pca_layer."):
    sd = {_strip(k): _to_np(v) for k, v in state_dict.items()}
    w = sd[f"{prefix}weight"]  # (D_out, D_in, 1, 1)
    return {
        "w": jnp.asarray(w[:, :, 0, 0].T),  # (D_in, D_out)
        "b": jnp.asarray(sd[f"{prefix}bias"]),
    }


def embednet_params_from_torch(state_dict):
    return {
        "base": vgg16_params_from_torch(state_dict),
        "vlad": netvlad_params_from_torch(state_dict),
    }


def embednetpca_params_from_torch(state_dict):
    params = embednet_params_from_torch(state_dict)
    params["pca"] = pca_layer_params_from_torch(state_dict)
    return params


def merge_params(target, source, verbose=False):
    """Tolerant pytree merge: copy leaves from ``source`` whose path exists in
    ``target`` with matching shape — the functional analog of the reference's
    copy_state_dict (/root/reference/ibl/utils/serialization.py:52-81)."""

    def _merge(t, s, path=""):
        if isinstance(t, dict):
            return {
                k: _merge(t[k], s[k], f"{path}/{k}") if isinstance(s, dict) and k in s else t[k]
                for k in t
            }
        # jnp.array (copy), NOT jnp.asarray: asarray aliases live device
        # buffers, and a merged tree later donated into a train step would
        # invalidate the retained source tree (CLAUDE.md donation gotcha)
        s_arr = jnp.array(s)
        if jnp.shape(t) != jnp.shape(s_arr):
            if verbose:
                print(f"mismatch at {path}: {jnp.shape(s_arr)} vs {jnp.shape(t)}")
            return t
        return s_arr

    return _merge(target, source)
