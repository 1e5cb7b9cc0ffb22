"""NetVLAD aggregation head and descriptor models, TPU-native.

Re-implements the published NetVLAD math of the reference
(/root/reference/ibl/models/netvlad.py:8-207) with a TPU-first factorization:
instead of materializing the (N, K, C, H*W) residual tensor the reference
builds, we use

    vlad[n,k,c] = sum_p a[n,p,k] * x[n,p,c]  -  (sum_p a[n,p,k]) * centroid[k,c]

which is one batched (K x P) @ (P x C) matmul on the MXU plus a rank-1
correction — mathematically identical, O(K*C*P) FLOPs with O(K*C) memory.

Models:
  * NetVLAD       — soft-assign aggregation → (N, K, C) un-normalized VLAD
  * EmbedNet      — backbone → NetVLAD → intra-norm → flatten → L2 (train/eval)
  * EmbedNetPCA   — EmbedNet + learned PCA-whitening projection to 4096-d
                    (the hub inference model, reference hubconf.py:5-11)
  * EmbedRegionNet— SFRS 9-region model (4 quarters + 4 halves + global),
                    exploiting VLAD's additivity over spatial positions
                    (reference /root/reference/ibl/models/netvlad.py:112-207)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from openibl_tpu.models import vgg as vgg_mod
from openibl_tpu.utils import l2_normalize


# ---------------------------------------------------------------------------
# NetVLAD core
# ---------------------------------------------------------------------------

def init_netvlad_params(rng, num_clusters=64, dim=512, alpha=100.0):
    """Random init (uniform centroids, alpha-scaled assignment), used before
    k-means bootstrap. Mirrors reference defaults (netvlad.py:11-31)."""
    k1, k2 = jax.random.split(rng)
    centroids = jax.random.uniform(k1, (num_clusters, dim), jnp.float32)
    assign_w = (
        jax.random.normal(k2, (dim, num_clusters), jnp.float32)
        * np.sqrt(2.0 / dim)
        * alpha
        / 100.0
    )
    return {"assign_w": assign_w, "centroids": centroids}


def netvlad_init_from_clusters(clsts: np.ndarray, traindescs: np.ndarray):
    """Centroid-based init (reference _init_params, netvlad.py:34-42):

      alpha = -ln(0.01) / mean(top1 - top2 assignment dot gap over train descs)
      assign_w = alpha * normalized centroids  (as a C->K projection)
      centroids = raw k-means centroids
    """
    clsts = np.asarray(clsts, np.float32)
    traindescs = np.asarray(traindescs, np.float32)
    clsts_assign = clsts / np.linalg.norm(clsts, axis=1, keepdims=True)
    dots = clsts_assign @ traindescs.T  # (K, Nd)
    top2 = -np.partition(-dots, 1, axis=0)[:2]  # (2, Nd) descending
    alpha = float(-np.log(0.01) / np.mean(top2[0] - top2[1]))
    return {
        "assign_w": jnp.asarray((alpha * clsts_assign).T),  # (C, K)
        "centroids": jnp.asarray(clsts),  # (K, C)
    }


def netvlad_apply(
    params,
    fmap: jnp.ndarray,
    *,
    normalize_input: bool = True,
    fused: bool = False,
    valid_hw=None,
) -> jnp.ndarray:
    """Soft-assignment VLAD aggregation.

    Args:
      fmap: (N, H, W, C) conv feature map (NHWC).
      valid_hw: optional (N, 2) valid spatial extents (feature-map scale).
        VLAD is a sum of per-location contributions, so zeroing the soft
        assignment outside the valid extent makes the padded aggregation
        exactly equal to aggregating the unpadded map.
    Returns:
      (N, K, C) un-normalized VLAD, matching reference netvlad.py:44-61.
    """
    if fused:
        if valid_hw is not None:
            raise ValueError("the fused kernel has no masked path; "
                             "use fused=False for bucket-padded inputs")
        from openibl_tpu.ops.netvlad_kernel import netvlad_fused

        return netvlad_fused(
            fmap, params["assign_w"], params["centroids"],
            normalize_input=normalize_input,
        )
    n, h, w, c = fmap.shape
    k = params["assign_w"].shape[1]
    x = fmap.astype(jnp.float32)
    if normalize_input:
        x = l2_normalize(x, axis=-1)  # per-location, across channels
    xf = x.reshape(n, h * w, c)
    logits = jnp.einsum(
        "npc,ck->npk", xf, params["assign_w"],
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    a = jax.nn.softmax(logits, axis=-1)  # (N, P, K)
    if valid_hw is not None:
        from openibl_tpu.models.vgg import _extent_mask

        mask = _extent_mask(jnp.asarray(valid_hw, jnp.int32), h, w)
        a = a * mask.reshape(n, h * w, 1)
    # MXU-friendly factorization (see module docstring).
    weighted = jnp.einsum(
        "npk,npc->nkc", a, xf,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    a_sum = jnp.sum(a, axis=1)  # (N, K)
    vlad = weighted - a_sum[:, :, None] * params["centroids"][None]
    return vlad


def vlad_postprocess(vlad: jnp.ndarray) -> jnp.ndarray:
    """intra-norm (per cluster) → flatten → global L2.

    The "[IMPORTANT] normalize" chain of the reference (netvlad.py:76-80)."""
    vlad = l2_normalize(vlad, axis=-1)  # intra-normalization over C
    n = vlad.shape[0]
    flat = vlad.reshape(n, -1)  # K-major flatten, like torch .view(N,-1)
    return l2_normalize(flat, axis=-1)


# ---------------------------------------------------------------------------
# PCA projection layer (learned variant baked into EmbedNetPCA)
# ---------------------------------------------------------------------------

def init_pca_layer_params(rng, in_dim, out_dim):
    # torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))
    bound = 1.0 / np.sqrt(in_dim)
    k1, k2 = jax.random.split(rng)
    return {
        "w": jax.random.uniform(k1, (in_dim, out_dim), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (out_dim,), jnp.float32, -bound, bound),
    }


def pca_layer_apply(params, x):
    """1x1-conv-as-matmul PCA projection + L2 norm (netvlad.py:104-108)."""
    out = (
        jnp.dot(x, params["w"], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + params["b"]
    )
    return l2_normalize(out, axis=-1)


# ---------------------------------------------------------------------------
# Composite models
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NetVLAD:
    num_clusters: int = 64
    dim: int = 512
    normalize_input: bool = True
    fused: bool = False

    def init(self, rng):
        return init_netvlad_params(rng, self.num_clusters, self.dim)

    def init_from_clusters(self, clsts, traindescs):
        return netvlad_init_from_clusters(clsts, traindescs)

    def apply(self, params, fmap, valid_hw=None):
        return netvlad_apply(
            params, fmap, normalize_input=self.normalize_input,
            fused=self.fused and valid_hw is None, valid_hw=valid_hw,
        )


@dataclasses.dataclass(frozen=True)
class EmbedNet:
    """backbone + NetVLAD → 32768-d L2-normalized descriptor.

    apply() returns (pool_x, vlad_x) like the reference EmbedNet
    (netvlad.py:73-82)."""

    base: vgg_mod.VGG16 = dataclasses.field(default_factory=vgg_mod.VGG16)
    net_vlad: NetVLAD = dataclasses.field(default_factory=NetVLAD)

    @property
    def descriptor_dim(self):
        return self.net_vlad.num_clusters * self.net_vlad.dim

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        return {"base": self.base.init(k1), "vlad": self.net_vlad.init(k2)}

    def apply(self, params, images):
        pool_x, fmap = self.base.apply(params["base"], images)
        if self.net_vlad.fused:
            from openibl_tpu.ops.netvlad_kernel import netvlad_descriptor_fused

            return pool_x, netvlad_descriptor_fused(params["vlad"], fmap)
        vlad = self.net_vlad.apply(params["vlad"], fmap)
        return pool_x, vlad_postprocess(vlad)

    def apply_masked(self, params, images, valid_hw):
        """Forward on bucket-padded images (one jit for all aspect ratios).

        valid_hw: (N, 2) int32 valid (h, w) extents at image scale. Output is
        bit-equal to apply() on each image at its own true shape (the masked
        backbone re-zeroes the pad region per layer; the NetVLAD assignment
        is masked at conv5 scale — VALID pooling makes that extent h//16).
        """
        pool_x, fmap = self.base.apply_masked(params["base"], images, valid_hw)
        hw5 = jnp.asarray(valid_hw, jnp.int32) // 16
        vlad = netvlad_apply(
            params["vlad"], fmap,
            normalize_input=self.net_vlad.normalize_input, valid_hw=hw5,
        )
        return pool_x, vlad_postprocess(vlad)

    def trainable_mask(self, params):
        return {
            "base": self.base.trainable_mask(params["base"]),
            "vlad": jax.tree.map(lambda _: True, params["vlad"]),
        }


@dataclasses.dataclass(frozen=True)
class EmbedNetPCA:
    """EmbedNet + learned PCA-whitening projection (hub inference model)."""

    base: vgg_mod.VGG16 = dataclasses.field(default_factory=vgg_mod.VGG16)
    net_vlad: NetVLAD = dataclasses.field(default_factory=NetVLAD)
    pca_dim: int = 4096

    @property
    def descriptor_dim(self):
        return self.pca_dim

    def init(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        in_dim = self.net_vlad.num_clusters * self.net_vlad.dim
        return {
            "base": self.base.init(k1),
            "vlad": self.net_vlad.init(k2),
            "pca": init_pca_layer_params(k3, in_dim, self.pca_dim),
        }

    def apply(self, params, images):
        _, fmap = self.base.apply(params["base"], images)
        if self.net_vlad.fused:
            from openibl_tpu.ops.netvlad_kernel import netvlad_descriptor_fused

            desc = netvlad_descriptor_fused(params["vlad"], fmap)
        else:
            vlad = self.net_vlad.apply(params["vlad"], fmap)
            desc = vlad_postprocess(vlad)
        return pca_layer_apply(params["pca"], desc)

    def apply_masked(self, params, images, valid_hw):
        """Bucket-padded forward; see EmbedNet.apply_masked."""
        _, fmap = self.base.apply_masked(params["base"], images, valid_hw)
        vlad = netvlad_apply(
            params["vlad"], fmap,
            normalize_input=self.net_vlad.normalize_input,
            valid_hw=jnp.asarray(valid_hw, jnp.int32) // 16,
        )
        return pca_layer_apply(params["pca"], vlad_postprocess(vlad))


# region composition order: [global, top, bottom, left, right, q0..q3]
# quarter index b = 2*i + j (i = row half, j = col half), matching the
# reference's reshape/permute ordering (netvlad.py:127-133,148-174).

def _quarter_fmap(fmap):
    """(N,H,W,C) → (N, 4, H/2, W/2, C) quarters [TL, TR, BL, BR]."""
    n, h, w, c = fmap.shape
    x = fmap.reshape(n, 2, h // 2, 2, w // 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (N, 2, 2, H/2, W/2, C)
    return x.reshape(n, 4, h // 2, w // 2, c)


def region_vlads(netvlad: NetVLAD, vlad_params, fmap):
    """All 9 region descriptors per image.

    VLAD is additive over spatial positions (input-norm and soft-assignment
    are per-location), so halves/global are exact sums of quarter VLADs —
    the same identity the reference exploits (netvlad.py:139-174).

    Returns (N, 9, K*C) L2-normalized region descriptors.
    """
    n = fmap.shape[0]
    quarters = _quarter_fmap(fmap)  # (N, 4, h, w, C)
    qshape = quarters.shape
    q_vlad = netvlad.apply(
        vlad_params, quarters.reshape((n * 4,) + qshape[2:])
    )  # (N*4, K, C)
    k, c = q_vlad.shape[1:]
    q_vlad = q_vlad.reshape(n, 4, k, c)
    halves = jnp.stack(
        [
            q_vlad[:, 0] + q_vlad[:, 1],  # top
            q_vlad[:, 2] + q_vlad[:, 3],  # bottom
            q_vlad[:, 0] + q_vlad[:, 2],  # left
            q_vlad[:, 1] + q_vlad[:, 3],  # right
        ],
        axis=1,
    )
    global_ = jnp.sum(q_vlad, axis=1, keepdims=True)
    regions = jnp.concatenate([global_, halves, q_vlad], axis=1)  # (N, 9, K, C)
    regions = l2_normalize(regions, axis=-1)  # intra-norm
    regions = regions.reshape(n, 9, k * c)
    return l2_normalize(regions, axis=-1)


@dataclasses.dataclass(frozen=True)
class EmbedRegionNet:
    """SFRS region-similarity model (reference netvlad.py:112-207).

    Train path: for each tuple (anchor, pos, negs...) compute 9 region
    descriptors per image and the (9, 9) anchor-region x pair-region
    similarity matrix. Eval path: identical to EmbedNet.
    """

    base: vgg_mod.VGG16 = dataclasses.field(default_factory=vgg_mod.VGG16)
    net_vlad: NetVLAD = dataclasses.field(default_factory=NetVLAD)
    tuple_size: int = 1

    @property
    def descriptor_dim(self):
        return self.net_vlad.num_clusters * self.net_vlad.dim

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        return {"base": self.base.init(k1), "vlad": self.net_vlad.init(k2)}

    def trainable_mask(self, params):
        return {
            "base": self.base.trainable_mask(params["base"]),
            "vlad": jax.tree.map(lambda _: True, params["vlad"]),
        }

    def apply(self, params, images):
        """Eval forward: (pool_x, 32768-d descriptor)."""
        pool_x, fmap = self.base.apply(params["base"], images)
        if self.net_vlad.fused:
            from openibl_tpu.ops.netvlad_kernel import netvlad_descriptor_fused

            return pool_x, netvlad_descriptor_fused(params["vlad"], fmap)
        vlad = self.net_vlad.apply(params["vlad"], fmap)
        return pool_x, vlad_postprocess(vlad)

    def region_descriptors(self, params, images):
        """(N, H, W, 3) → (N, 9, L) normalized region descriptors."""
        _, fmap = self.base.apply(params["base"], images)
        return region_vlads(self.net_vlad, params["vlad"], fmap)

    def apply_train(self, params, images):
        """Train forward on tuples.

        Args:
          images: (T * G, H, W, 3) where T = tuple_size and G = images per
            tuple, image 0 of each tuple being the anchor.
        Returns:
          score:  (T, G-1, 9, 9) — score[t,p,i,j] = <anchor region i, pair p region j>
          vlad_a: (T, 1, 9, L) anchor region descriptors
          vlad_p: (T, G-1, 9, L) pair region descriptors
        (mirrors _forward_train/_compute_region_sim, netvlad.py:123-194)
        """
        t = self.tuple_size
        _, fmap = self.base.apply(params["base"], images)
        regions = region_vlads(self.net_vlad, params["vlad"], fmap)
        n, _, l = regions.shape
        g = n // t
        regions = regions.reshape(t, g, 9, l)
        vlad_a = regions[:, :1]  # (T, 1, 9, L)
        vlad_p = regions[:, 1:]  # (T, G-1, 9, L)
        score = jnp.einsum(
            "txil,tpjl->tpij", vlad_a, vlad_p, preferred_element_type=jnp.float32
        )  # i == 9 anchor regions, j == 9 pair regions, x == singleton
        return score, vlad_a, vlad_p
