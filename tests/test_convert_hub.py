"""Weight-converter and hub API tests: a synthetic torch state dict shaped
exactly like the released vgg16_netvlad.pth must convert and produce
descriptors identical to torch's forward math (no network needed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from openibl_tpu import models
from openibl_tpu.models import convert
from openibl_tpu.ops.kmeans import kmeans


def _fake_released_state(rng, k=4, pca_dim=32):
    """State dict with the released checkpoint's key layout:
    base_model.base.<i>.*, net_vlad.{conv.weight,centroids}, pca_layer.*"""
    sd = {}
    cfg = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
           (10, 128, 256), (12, 256, 256), (14, 256, 256),
           (17, 256, 512), (19, 512, 512), (21, 512, 512),
           (24, 512, 512), (26, 512, 512), (28, 512, 512)]
    for idx, cin, cout in cfg:
        sd[f"base_model.base.{idx}.weight"] = torch.from_numpy(
            rng.randn(cout, cin, 3, 3).astype(np.float32) * 0.05
        )
        sd[f"base_model.base.{idx}.bias"] = torch.from_numpy(
            rng.randn(cout).astype(np.float32) * 0.05
        )
    sd["net_vlad.conv.weight"] = torch.from_numpy(
        rng.randn(k, 512, 1, 1).astype(np.float32)
    )
    sd["net_vlad.centroids"] = torch.from_numpy(
        rng.randn(k, 512).astype(np.float32)
    )
    sd["pca_layer.weight"] = torch.from_numpy(
        rng.randn(pca_dim, k * 512, 1, 1).astype(np.float32) * 0.01
    )
    sd["pca_layer.bias"] = torch.from_numpy(
        rng.randn(pca_dim).astype(np.float32) * 0.01
    )
    return sd


class TestConverter:
    def test_embednetpca_conversion_shapes(self, rng):
        sd = _fake_released_state(rng)
        params = convert.embednetpca_params_from_torch(sd)
        assert params["base"]["conv1_1"]["w"].shape == (3, 3, 3, 64)
        assert params["vlad"]["assign_w"].shape == (512, 4)
        assert params["vlad"]["centroids"].shape == (4, 512)
        assert params["pca"]["w"].shape == (4 * 512, 32)
        assert params["pca"]["b"].shape == (32,)

    def test_ddp_prefix_stripped(self, rng):
        sd = {f"module.{k}": v for k, v in _fake_released_state(rng).items()}
        params = convert.embednetpca_params_from_torch(sd)
        assert params["vlad"]["assign_w"].shape == (512, 4)

    def test_netvlad_conv_transpose_semantics(self, rng):
        """assign logits via our (C,K) matmul == torch's 1x1 conv."""
        sd = _fake_released_state(rng)
        nv = convert.netvlad_params_from_torch(sd)
        x = rng.randn(1, 512, 4, 5).astype(np.float32)  # NCHW
        w = sd["net_vlad.conv.weight"]
        ref = torch.nn.functional.conv2d(torch.from_numpy(x), w).numpy()
        ours = np.einsum(
            "nhwc,ck->nkhw",
            x.transpose(0, 2, 3, 1),
            np.asarray(nv["assign_w"]),
        ).transpose(0, 1, 2, 3)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_hub_loads_torch_checkpoint(self, rng, tmp_path):
        from openibl_tpu.hub import vgg16_netvlad

        sd = _fake_released_state(rng)
        path = str(tmp_path / "fake_vgg16_netvlad.pth")
        torch.save(sd, path)
        model, params = vgg16_netvlad(path, num_clusters=4, pca_dim=32)
        x = jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32) * 40)
        desc = np.asarray(model.apply(params, x))
        assert desc.shape == (1, 32)
        np.testing.assert_allclose(np.linalg.norm(desc, axis=1), 1.0, rtol=1e-4)

    def test_hub_loads_full_training_checkpoint_with_numpy_metadata(
            self, rng, tmp_path):
        """Reference FULL training checkpoints wrap the state dict with
        numpy-scalar metadata (netvlad_img.py:201-204 saves best_recall5 =
        recalls[1], an np.float64) — the weights-only unpickler rejects
        those globals, so the loader must fall back to the numpy-scalar
        allowlist rather than crash (round-4 review regression)."""
        from openibl_tpu.hub import vgg16_netvlad

        sd = _fake_released_state(rng)
        path = str(tmp_path / "model_best.pth.tar")
        torch.save({"state_dict": sd, "epoch": 3,
                    "best_recall5": np.float64(0.5)}, path)
        model, params = vgg16_netvlad(path, num_clusters=4, pca_dim=32)
        x = jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32) * 40)
        desc = np.asarray(model.apply(params, x))
        assert desc.shape == (1, 32)
        np.testing.assert_allclose(np.linalg.norm(desc, axis=1), 1.0,
                                   rtol=1e-4)

    def test_merge_params_tolerant(self, rng):
        target = {"a": jnp.zeros((2, 2)), "b": {"c": jnp.ones(3)}}
        source = {"a": np.full((2, 2), 5.0), "b": {"c": np.zeros(99)}}  # c mismatches
        merged = convert.merge_params(target, source)
        np.testing.assert_array_equal(np.asarray(merged["a"]), 5.0 * np.ones((2, 2)))
        np.testing.assert_array_equal(np.asarray(merged["b"]["c"]), np.ones(3))


class TestKMeans:
    def test_recovers_planted_clusters(self, rng):
        centers = rng.randn(5, 8).astype(np.float32) * 10
        x = np.concatenate([c + rng.randn(50, 8) * 0.2 for c in centers])
        got, inertia = kmeans(x, 5, iters=30, seed=0)
        # each planted center has a recovered centroid within 0.5
        d = ((centers[:, None] - got[None]) ** 2).sum(-1) ** 0.5
        assert (d.min(axis=1) < 0.5).all()
        assert inertia < 0.2 * 8


class TestFullChainFidelity:
    @pytest.fixture(autouse=True)
    def _tmp(self, tmp_path):
        self.tmp_path = tmp_path

    def test_embednetpca_vs_independent_oracle(self, rng):
        """Full inference chain on converted released-layout weights vs a
        piecewise oracle: torch conv stack -> naive numpy NetVLAD ->
        numpy norm chain -> numpy PCA projection. Catches wiring bugs the
        per-component golden tests can't."""
        from tests.test_models_golden import naive_netvlad, _np_l2norm
        from openibl_tpu.hub import vgg16_netvlad

        sd = _fake_released_state(rng, k=4, pca_dim=32)
        path = str(self.tmp_path / "w.pth")
        torch.save(sd, path)
        model, params = vgg16_netvlad(path, num_clusters=4, pca_dim=32)

        x = rng.randn(1, 3, 32, 48).astype(np.float32) * 30  # NCHW

        # oracle: torch conv stack (inline, same as torchvision features[:-2])
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512]
        layers, cin = [], 3
        for v in cfg:
            if v == "M":
                layers.append(torch.nn.MaxPool2d(2, 2))
            else:
                layers += [torch.nn.Conv2d(cin, v, 3, padding=1),
                           torch.nn.ReLU()]
                cin = v
        features = torch.nn.Sequential(*layers[:-1]).eval()
        features.load_state_dict(
            {k[len("base_model.base."):]: v for k, v in sd.items()
             if k.startswith("base_model.base.")}
        )
        with torch.no_grad():
            fmap = features(torch.from_numpy(x)).numpy()  # (1, 512, 2, 3)
        fmap_nhwc = fmap.transpose(0, 2, 3, 1)
        assign_w = sd["net_vlad.conv.weight"].numpy()[:, :, 0, 0].T
        centroids = sd["net_vlad.centroids"].numpy()
        vlad = naive_netvlad(fmap_nhwc, assign_w, centroids)  # (1, 4, 512)
        vlad = _np_l2norm(vlad, axis=-1).reshape(1, -1)
        vlad = _np_l2norm(vlad, axis=-1)
        pca_w = sd["pca_layer.weight"].numpy()[:, :, 0, 0]  # (32, 2048)
        out = vlad @ pca_w.T + sd["pca_layer.bias"].numpy()
        expect = _np_l2norm(out, axis=-1)

        ours = np.asarray(
            model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        )
        np.testing.assert_allclose(ours, expect, rtol=1e-3, atol=1e-5)
