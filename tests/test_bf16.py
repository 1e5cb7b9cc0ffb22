"""bfloat16 compute-path coverage (the bench/production extraction dtype).

Params stay float32; activations run in bf16 (models/vgg.py docstring). The
descriptor path's fidelity-critical matmuls are Precision.HIGHEST f32, so
bf16 backbone noise should barely move the normalized descriptor."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openibl_tpu import models


@pytest.fixture(scope="module")
def image():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randn(2, 32, 48, 3).astype(np.float32) * 40)


class TestBf16Forward:
    def test_backbone_close_to_f32(self, image):
        params = models.VGG16().init(jax.random.PRNGKey(0))
        pool32, fmap32 = models.VGG16(compute_dtype=jnp.float32).apply(
            params, image
        )
        pool16, fmap16 = models.VGG16(compute_dtype=jnp.bfloat16).apply(
            params, image
        )
        assert fmap16.dtype == jnp.bfloat16  # map stays in compute dtype
        assert np.isfinite(np.asarray(pool16)).all()
        # bf16 has ~3 decimal digits; activations are O(1e2-1e4) deep in the
        # stack, so compare relatively
        rel = np.abs(np.asarray(pool16) - np.asarray(pool32)) / (
            np.abs(np.asarray(pool32)) + 1e-3
        )
        assert np.median(rel) < 0.05

    def test_descriptor_cosine_close(self, image):
        nv = models.NetVLAD(num_clusters=8)
        m32 = models.create("embednet", base=models.VGG16(), net_vlad=nv)
        params = m32.init(jax.random.PRNGKey(1))
        m16 = models.create(
            "embednet", base=models.VGG16(compute_dtype=jnp.bfloat16),
            net_vlad=nv,
        )
        _, d32 = m32.apply(params, image)
        _, d16 = m16.apply(params, image)
        assert d16.dtype == jnp.float32  # descriptors come back in f32
        cos = np.sum(np.asarray(d32) * np.asarray(d16), axis=1)
        assert (cos > 0.99).all(), cos  # both L2-normalized

    def test_train_step_bf16(self, image):
        from openibl_tpu.engine.trainer import Trainer

        model = models.create(
            "embednet", base=models.VGG16(compute_dtype=jnp.bfloat16),
            net_vlad=models.NetVLAD(num_clusters=4),
        )
        params = model.init(jax.random.PRNGKey(2))
        trainer = Trainer(model, loss_type="sare_ind", lr=1e-3)
        opt = trainer.init(params)
        batch = np.random.RandomState(3).randn(1, 4, 32, 32, 3).astype(
            np.float32
        )
        p2, o2, loss = trainer.step(params, opt, jnp.asarray(batch))
        assert np.isfinite(float(loss))
        # params and their updates stay f32 (master weights)
        assert p2["base"]["conv5_3"]["w"].dtype == jnp.float32

    def test_sfrs_step_bf16(self):
        from openibl_tpu.engine.sfrs import SFRSTrainer

        region = models.create(
            "embedregionnet", base=models.VGG16(compute_dtype=jnp.bfloat16),
            net_vlad=models.NetVLAD(num_clusters=4), tuple_size=1,
        )
        params = region.init(jax.random.PRNGKey(4))
        teacher = jax.tree.map(jnp.array, params)
        trainer = SFRSTrainer(region, neg_num=2, lr=1e-3)
        opt = trainer.init_generation(params)
        tup = np.random.RandomState(5).randn(1, 5, 32, 32, 3).astype(
            np.float32
        )
        easy, diff = trainer.split_tuple_images(jnp.asarray(tup))
        step = trainer.step_fn(1)
        _, _, lh, ls = step(params, teacher, opt, easy, diff)
        assert np.isfinite(float(lh)) and np.isfinite(float(ls))
