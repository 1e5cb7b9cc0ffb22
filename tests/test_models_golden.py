"""Golden parity tests for the model math.

Strategy (SURVEY.md §4): compare our JAX implementations against independent
oracles — torchvision's VGG16 (random weights, via the converter) for the
backbone, and a naive numpy implementation of the published NetVLAD equations
for the head. This pins the full normalization chain (descriptor fidelity is
"hard part #1" in SURVEY.md §7).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openibl_tpu import models
from openibl_tpu.models import convert
from openibl_tpu.models.netvlad import (
    netvlad_apply,
    netvlad_init_from_clusters,
    vlad_postprocess,
    region_vlads,
    NetVLAD,
)

torch = pytest.importorskip("torch")


def _np_l2norm(x, axis):
    return x / np.maximum(
        np.linalg.norm(x, axis=axis, keepdims=True), 1e-12
    )


def naive_netvlad(x_nhwc, assign_w, centroids, normalize_input=True):
    """Direct transcription of the published NetVLAD equations in numpy:
    per-location L2 norm, 1x1-conv soft-assignment softmax over clusters,
    residual-to-centroid accumulation."""
    n, h, w, c = x_nhwc.shape
    k = assign_w.shape[1]
    x = x_nhwc.astype(np.float64)
    if normalize_input:
        x = _np_l2norm(x, axis=-1)
    logits = x @ assign_w  # (n, h, w, k)
    logits -= logits.max(axis=-1, keepdims=True)
    a = np.exp(logits)
    a /= a.sum(axis=-1, keepdims=True)
    vlad = np.zeros((n, k, c))
    for ki in range(k):
        resid = x - centroids[ki][None, None, None, :]  # (n, h, w, c)
        vlad[:, ki] = (a[..., ki : ki + 1] * resid).sum(axis=(1, 2))
    return vlad


class TestNetVLAD:
    def test_matches_naive_numpy(self, rng):
        n, h, w, c, k = 2, 6, 8, 16, 5
        x = rng.randn(n, h, w, c).astype(np.float32)
        params = {
            "assign_w": jnp.asarray(rng.randn(c, k).astype(np.float32) * 3),
            "centroids": jnp.asarray(rng.randn(k, c).astype(np.float32)),
        }
        ours = np.asarray(netvlad_apply(params, jnp.asarray(x)))
        ref = naive_netvlad(
            x, np.asarray(params["assign_w"]), np.asarray(params["centroids"])
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_postprocess_norm_chain(self, rng):
        # intra-norm per cluster, flatten K-major, global L2
        vlad = jnp.asarray(rng.randn(3, 4, 8).astype(np.float32))
        out = np.asarray(vlad_postprocess(vlad))
        v = np.asarray(vlad)
        v = _np_l2norm(v, axis=-1).reshape(3, -1)
        v = _np_l2norm(v, axis=-1)
        np.testing.assert_allclose(out, v, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=1), 1.0, rtol=1e-5
        )

    def test_cluster_init_alpha(self, rng):
        # alpha = -ln(0.01)/mean(top1-top2); assignment = alpha * unit centroids
        k, c, nd = 8, 16, 100
        clsts = rng.randn(k, c).astype(np.float32)
        descs = _np_l2norm(rng.randn(nd, c).astype(np.float32), axis=1)
        params = netvlad_init_from_clusters(clsts, descs)
        ca = clsts / np.linalg.norm(clsts, axis=1, keepdims=True)
        dots = np.sort(ca @ descs.T, axis=0)[::-1]
        alpha = -np.log(0.01) / np.mean(dots[0] - dots[1])
        np.testing.assert_allclose(
            np.asarray(params["assign_w"]), (alpha * ca).T, rtol=1e-5
        )
        np.testing.assert_allclose(np.asarray(params["centroids"]), clsts, rtol=1e-6)


class TestVGG16:
    def test_matches_torchvision(self, rng):
        """Random-weight VGG16 features[:-2] (built inline with torch.nn in
        torchvision's exact layer order/indices) vs ours via the converter:
        validates conv layout, padding, pooling, relu placement and the
        truncation point."""
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512]
        layers, cin = [], 3
        for v in cfg:
            if v == "M":
                layers.append(torch.nn.MaxPool2d(2, 2))
            else:
                layers += [torch.nn.Conv2d(cin, v, 3, padding=1), torch.nn.ReLU()]
                cin = v
        # [:-1] drops the ReLU after conv5_3 == torchvision features[:-2]
        features = torch.nn.Sequential(*layers[:-1]).eval()

        sd = {f"base.{k}": v for k, v in features.state_dict().items()}
        params = convert.vgg16_params_from_torch(sd)

        x = rng.randn(1, 3, 32, 48).astype(np.float32)  # NCHW for torch
        with torch.no_grad():
            ref_map = features(torch.from_numpy(x)).numpy()  # (1, 512, 2, 3)
        model = models.create("vgg16")
        pool_x, fmap = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        ours_map = np.asarray(fmap).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours_map, ref_map, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(pool_x), ref_map.max(axis=(2, 3)), rtol=1e-4, atol=1e-4
        )

    def test_trainable_mask(self):
        model = models.create("vgg16", train_layers="conv5")
        params = model.init(jax.random.PRNGKey(0))
        mask = model.trainable_mask(params)
        assert mask["conv5_1"]["w"] and mask["conv5_3"]["b"]
        assert not mask["conv4_3"]["w"] and not mask["conv1_1"]["w"]
        full = models.create("vgg16", train_layers="full").trainable_mask(params)
        assert all(v["w"] for v in full.values())


class TestEmbedNets:
    def _tiny_embednet(self, rng, k=4, c=512):
        model = models.create(
            "embednet", net_vlad=NetVLAD(num_clusters=k, dim=c)
        )
        params = model.init(jax.random.PRNGKey(1))
        return model, params

    def test_embednet_output_norm(self, rng):
        model, params = self._tiny_embednet(rng)
        x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32) * 50)
        pool_x, desc = model.apply(params, x)
        assert desc.shape == (2, 4 * 512)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(desc), axis=1), 1.0, rtol=1e-4
        )
        assert pool_x.shape == (2, 512)

    def test_embednetpca_shape_and_norm(self, rng):
        model = models.create(
            "embednetpca", net_vlad=NetVLAD(num_clusters=4, dim=512), pca_dim=64
        )
        params = model.init(jax.random.PRNGKey(2))
        x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32) * 50)
        desc = model.apply(params, x)
        assert desc.shape == (2, 64)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(desc), axis=1), 1.0, rtol=1e-4
        )


class TestRegionVLAD:
    def test_region_additivity(self, rng):
        """Global region descriptor must equal the full-image VLAD: VLAD is a
        sum over spatial positions, so quarter VLADs sum exactly to it."""
        nv = NetVLAD(num_clusters=5, dim=16)
        params = {
            "assign_w": jnp.asarray(rng.randn(16, 5).astype(np.float32) * 2),
            "centroids": jnp.asarray(rng.randn(5, 16).astype(np.float32)),
        }
        fmap = jnp.asarray(rng.randn(3, 8, 12, 16).astype(np.float32))
        regions = np.asarray(region_vlads(nv, params, fmap))  # (3, 9, 80)
        full = np.asarray(vlad_postprocess(netvlad_apply(params, fmap)))
        np.testing.assert_allclose(regions[:, 0], full, rtol=1e-4, atol=1e-5)
        # quarters + halves consistency: region 1 (top) == normalize(q0+q1)
        quarters_raw = naive_netvlad(
            _quarter_np(np.asarray(fmap)).reshape(12, 4, 6, 16),
            np.asarray(params["assign_w"]),
            np.asarray(params["centroids"]),
        ).reshape(3, 4, 5, 16)
        top = quarters_raw[:, 0] + quarters_raw[:, 1]
        top = _np_l2norm(top, axis=-1).reshape(3, -1)
        top = _np_l2norm(top, axis=-1)
        np.testing.assert_allclose(regions[:, 1], top, rtol=1e-4, atol=1e-5)

    def test_train_forward_scores(self, rng):
        """score[t,p,i,j] must equal <anchor region i, pair p region j>."""
        nv = NetVLAD(num_clusters=3, dim=512)
        model = models.create("embedregionnet", net_vlad=nv, tuple_size=2)
        params = model.init(jax.random.PRNGKey(3))
        # 2 tuples x 4 images (anchor + pos + 2 negs)
        x = jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32) * 20)
        score, vlad_a, vlad_p = model.apply_train(params, x)
        assert score.shape == (2, 3, 9, 9)
        assert vlad_a.shape[:3] == (2, 1, 9) and vlad_p.shape[:3] == (2, 3, 9)
        expect = np.einsum(
            "txil,tpjl->tpij", np.asarray(vlad_a), np.asarray(vlad_p)
        )
        np.testing.assert_allclose(np.asarray(score), expect, rtol=1e-4, atol=1e-5)


def _quarter_np(fmap):
    n, h, w, c = fmap.shape
    x = fmap.reshape(n, 2, h // 2, 2, w // 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n * 4, h // 2, w // 2, c)
