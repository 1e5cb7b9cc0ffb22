"""Bucket-padded (masked) variable-shape evaluation path.

The reference evaluates Tokyo 24/7 queries at their own aspect-preserved
shapes, batch 1, on every rank (/root/reference/examples/test.py:44-48).
Our TPU-native replacement pads to a static per-orientation bucket shape and
masks the backbone + NetVLAD aggregation so one compiled program produces
per-image results exactly equal to per-shape runs — and, being fixed-shape,
shards over the device mesh.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from openibl_tpu import models
from openibl_tpu.data.loader import BatchLoader, PaddedBatchLoader, ImageSource
from openibl_tpu.data.transforms import TestTransform
from openibl_tpu.parallel.extract import extract_features
from openibl_tpu.parallel.mesh import get_mesh


@pytest.fixture(scope="module")
def small_model():
    model = models.create("embednet", net_vlad=models.NetVLAD(num_clusters=4))
    params = model.init(jax.random.PRNGKey(0))
    return model, params


class TestMaskedForward:
    @pytest.mark.parametrize("h,w", [(48, 64), (64, 48), (37, 64), (33, 47)])
    def test_masked_equals_per_shape(self, small_model, rng, h, w):
        """Padded+masked forward == unpadded forward, incl. shapes where
        pooling floors odd extents."""
        model, params = small_model
        x = rng.randn(h, w, 3).astype(np.float32) * 40
        _, want = model.apply(params, jnp.asarray(x[None]))

        padded = np.zeros((1, 64, 64, 3), np.float32)
        padded[0, :h, :w] = x
        _, got = model.apply_masked(
            params, jnp.asarray(padded), jnp.asarray([[h, w]], np.int32)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-7
        )

    def test_masked_uint8_input(self, small_model, rng):
        """Device-side mean subtraction must not leak into the pad region."""
        model, params = small_model
        x = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
        _, want = model.apply(params, jnp.asarray(x[None]))
        padded = np.zeros((1, 64, 64, 3), np.uint8)
        padded[0, :48, :48] = x
        _, got = model.apply_masked(
            params, jnp.asarray(padded), jnp.asarray([[48, 48]], np.int32)
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-7)

    def test_embednetpca_masked(self, rng):
        model = models.create(
            "embednetpca", net_vlad=models.NetVLAD(num_clusters=4), pca_dim=16
        )
        params = model.init(jax.random.PRNGKey(1))
        x = rng.randn(37, 64, 3).astype(np.float32) * 40
        want = model.apply(params, jnp.asarray(x[None]))
        padded = np.zeros((1, 64, 64, 3), np.float32)
        padded[0, :37, :64] = x
        got = model.apply_masked(
            params, jnp.asarray(padded), jnp.asarray([[37, 64]], np.int32)
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-7)

    def test_fused_kernel_rejects_mask(self, small_model):
        model, params = small_model
        with pytest.raises(ValueError, match="masked"):
            models.netvlad_apply(
                params["vlad"], jnp.zeros((1, 2, 2, 512)), fused=True,
                valid_hw=jnp.asarray([[2, 2]]),
            )


@pytest.fixture
def image_dir(tmp_path, rng):
    """A few images with Tokyo-like mixed aspect ratios on disk."""
    sizes = [(64, 48), (48, 64), (64, 48), (52, 64), (64, 37)]  # (W, H)
    items = []
    for i, (w, h) in enumerate(sizes):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        name = f"img{i}.png"
        Image.fromarray(arr).save(tmp_path / name)
        items.append((name, i, float(i), 0.0))
    return str(tmp_path), items


class TestPaddedBatchLoader:
    def test_buckets_and_padding(self, image_dir):
        root, items = image_dir
        tf = TestTransform(32, 48, tokyo=True)  # shorter side -> 48
        src = ImageSource(items, root, tf)
        loader = PaddedBatchLoader(src, batch_size=4)
        seen = {}
        for images, valid_hw, idx, count in loader:
            assert images.shape[0] == 4  # static batch
            for j in range(count):
                h, w = valid_hw[j]
                # pad region is zero
                assert images.shape[1] >= h and images.shape[2] >= w
                assert not images[j, h:].any()
                assert not images[j, :, w:].any()
                seen[int(idx[j])] = (images[j, :h, :w], (h, w))
        assert sorted(seen) == [0, 1, 2, 3, 4]
        # valid regions equal the direct transform output
        for i in seen:
            direct = src.load(i)
            got, (h, w) = seen[i]
            assert direct.shape[:2] == (h, w)
            np.testing.assert_array_equal(got, direct)

    def test_extraction_matches_per_shape(self, image_dir, small_model):
        """extract_features over PaddedBatchLoader == per-image unpadded
        extraction, both single-device and sharded over the 8-device mesh."""
        root, items = image_dir
        model, params = small_model
        tf = TestTransform(32, 48, tokyo=True)
        src = ImageSource(items, root, tf)

        # per-shape truth, batch 1 (the reference's regime)
        want = []
        for i in range(len(items)):
            img = src.load(i)
            _, d = model.apply(params, jnp.asarray(img[None]))
            from openibl_tpu.utils import l2_normalize

            want.append(np.asarray(l2_normalize(d, axis=-1))[0])
        want = np.stack(want)

        loader = PaddedBatchLoader(src, batch_size=2)
        got = extract_features(model.apply, params, loader,
                               masked_apply_fn=model.apply_masked)
        np.testing.assert_allclose(got, want, atol=5e-7)

        mesh = get_mesh()
        assert mesh.size == 8
        loader = PaddedBatchLoader(src, batch_size=4)
        got_sharded = extract_features(model.apply, params, loader, mesh=mesh,
                                       masked_apply_fn=model.apply_masked)
        np.testing.assert_allclose(got_sharded, want, atol=5e-7)

    def test_plain_loader_with_masked_fn_unaffected(self, image_dir, small_model):
        """3-tuple batches still route through the plain apply."""
        root, items = image_dir
        model, params = small_model
        tf = TestTransform(32, 48)  # fixed resize
        src = ImageSource(items, root, tf)
        plain = extract_features(model.apply, params,
                                 BatchLoader(src, batch_size=2))
        both = extract_features(model.apply, params,
                                BatchLoader(src, batch_size=2),
                                masked_apply_fn=model.apply_masked)
        np.testing.assert_array_equal(plain, both)
