"""On-device ColorJitter (ops/augment.py) vs the host PIL reference path.

The reference jitters through PIL on CPU workers
(/root/reference/ibl/utils/data/__init__.py:30-32); the device path must
match per-op semantics up to PIL's own uint8 quantization."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image, ImageEnhance

from openibl_tpu.ops import augment
from openibl_tpu.data.transforms import _shift_hue


@pytest.fixture
def img_u8():
    return np.random.RandomState(0).randint(0, 256, (40, 56, 3), np.uint8)


class TestOpParity:
    def test_brightness(self, img_u8):
        want = np.asarray(ImageEnhance.Brightness(
            Image.fromarray(img_u8)).enhance(1.43), np.float32)
        got = np.asarray(augment._brightness(
            jnp.asarray(img_u8, jnp.float32), 1.43))
        assert np.abs(want - got).max() <= 1.0  # PIL rounds to uint8

    def test_contrast(self, img_u8):
        want = np.asarray(ImageEnhance.Contrast(
            Image.fromarray(img_u8)).enhance(0.62), np.float32)
        got = np.asarray(augment._contrast(
            jnp.asarray(img_u8, jnp.float32), 0.62))
        assert np.abs(want - got).max() <= 2.0  # + PIL's rounded gray mean

    def test_saturation(self, img_u8):
        want = np.asarray(ImageEnhance.Color(
            Image.fromarray(img_u8)).enhance(1.51), np.float32)
        got = np.asarray(augment._saturation(
            jnp.asarray(img_u8, jnp.float32), 1.51))
        assert np.abs(want - got).max() <= 2.0

    @pytest.mark.parametrize("shift", [0.23, -0.4])
    def test_hue(self, img_u8, shift):
        # PIL's HSV round-trip is uint8-quantized (256 hue levels), so only
        # distributional closeness is achievable; bound mean + tail error
        want = np.asarray(_shift_hue(Image.fromarray(img_u8), shift),
                          np.float32)
        got = np.asarray(augment._hue(jnp.asarray(img_u8, jnp.float32),
                                      shift))
        err = np.abs(want - got)
        assert err.mean() < 3.0
        assert np.percentile(err, 99) < 12.0

    def test_hue_roundtrip_identity(self, img_u8):
        x = jnp.asarray(img_u8, jnp.float32)
        got = np.asarray(augment._hue(x, 0.0))
        assert np.abs(got - np.asarray(x)).max() < 1e-2


class TestBatch:
    def test_deterministic_and_key_sensitive(self, img_u8):
        imgs = np.stack([img_u8[:16, :24]] * 3)
        k = jax.random.PRNGKey(7)
        a = np.asarray(augment.color_jitter_batch(imgs, k))
        b = np.asarray(augment.color_jitter_batch(imgs, k))
        assert np.array_equal(a, b)
        c = np.asarray(augment.color_jitter_batch(imgs, jax.random.PRNGKey(8)))
        assert not np.allclose(a, c)
        # per-image independence: identical inputs, different outputs
        assert not np.allclose(a[0], a[1])
        assert a.min() >= 0.0 and a.max() <= 255.0

    def test_zero_ranges_identity(self, img_u8):
        imgs = img_u8[None].astype(np.float32)
        out = np.asarray(augment.color_jitter_batch(
            imgs, jax.random.PRNGKey(0), brightness=0, contrast=0,
            saturation=0, hue=0,
        ))
        np.testing.assert_allclose(out, imgs, atol=1e-2)


class TestTrainerIntegration:
    def test_device_jitter_step(self):
        from openibl_tpu import models
        from openibl_tpu.engine.trainer import Trainer

        model = models.create(
            "embednet", net_vlad=models.NetVLAD(num_clusters=4)
        )
        params = model.init(jax.random.PRNGKey(0))
        trainer = Trainer(model, loss_type="sare_ind", lr=1e-3,
                          device_jitter=True)
        opt = trainer.init(params)
        batch = np.random.RandomState(0).randint(
            0, 256, (1, 4, 32, 32, 3), np.uint8
        )
        with pytest.raises(ValueError):
            trainer.step(params, opt, jnp.asarray(batch))  # key required
        p2, o2, loss = trainer.step(params, opt, jnp.asarray(batch),
                                    key=jax.random.PRNGKey(3))
        assert np.isfinite(float(loss))

    def test_sfrs_device_jitter_step(self):
        """SFRS step takes the raw union tuple + key; student and teacher
        consume the same augmented pixels."""
        from openibl_tpu import models
        from openibl_tpu.engine.sfrs import SFRSTrainer

        region = models.create(
            "embedregionnet", net_vlad=models.NetVLAD(num_clusters=4),
            tuple_size=1,
        )
        params = region.init(jax.random.PRNGKey(1))
        teacher = jax.tree.map(jnp.array, params)
        trainer = SFRSTrainer(region, neg_num=2, lr=1e-3, device_jitter=True)
        opt = trainer.init_generation(params)
        # anchor + pos + 2 negs + 1 diff positive
        tup = np.random.RandomState(0).randint(
            0, 256, (1, 5, 32, 32, 3), np.uint8
        )
        step = trainer.step_fn(1)
        p2, o2, lh, ls = step(params, teacher, opt, jnp.asarray(tup),
                              jax.random.PRNGKey(2))
        assert np.isfinite(float(lh)) and np.isfinite(float(ls))

    def test_jitter_stream_reproducible(self):
        """Same rng_key → identical loss (resume-faithful augmentation)."""
        from openibl_tpu import models
        from openibl_tpu.engine.trainer import Trainer

        losses = []
        for _ in range(2):
            model = models.create(
                "embednet", net_vlad=models.NetVLAD(num_clusters=4)
            )
            params = model.init(jax.random.PRNGKey(0))
            trainer = Trainer(model, loss_type="triplet", lr=1e-3,
                              device_jitter=True)
            opt = trainer.init(params)
            batch = np.random.RandomState(1).randint(
                0, 256, (1, 4, 32, 32, 3), np.uint8
            )
            _, _, loss = trainer.step(params, opt, jnp.asarray(batch),
                                      key=jax.random.PRNGKey(5))
            losses.append(float(loss))
        assert losses[0] == losses[1]
