"""Int8 post-training quantization: fidelity, masking, and retrieval gates.

The quantized backbone (openibl_tpu/ops/quant.py) is a beyond-reference
inference mode (the reference stack is fp32-only); these tests pin that
 * the mixed bf16/int8 forward tracks the f32 forward closely enough that
   descriptors (and therefore retrieval results) are preserved,
 * the bucket-padded masked path equals per-image unpadded runs,
 * the quantized tree round-trips the composite models unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openibl_tpu import models
from openibl_tpu.models.vgg import vgg16_apply
from openibl_tpu.ops.quant import (
    QuantVGG16,
    calibrate_vgg16,
    quantize_model_params,
    quantize_vgg16,
    vgg16_apply_int8,
)


@pytest.fixture(scope="module")
def setup():
    model = models.create(
        "embednet",
        base=models.VGG16(compute_dtype=jnp.float32),
        net_vlad=models.NetVLAD(num_clusters=8),
    )
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32) * 40)
    qmodel, qparams = quantize_model_params(model, params, imgs)
    return model, params, qmodel, qparams, imgs


def test_weight_quantization_per_channel(setup):
    _, params, _, qparams, _ = setup
    q = qparams["base"]["conv3_1"]
    assert q["wq"].dtype == jnp.int8
    # per-output-channel symmetric: every channel's max |q| is 127 (weights
    # are continuous so the channel amax always hits the clip point)
    assert np.all(np.max(np.abs(np.asarray(q["wq"])), axis=(0, 1, 2)) == 127)


def test_fmap_fidelity(setup):
    _, params, _, qparams, imgs = setup
    _, f32 = vgg16_apply(params["base"], imgs)
    _, fq = vgg16_apply_int8(
        qparams["base"], imgs, compute_dtype=jnp.float32
    )
    f32, fq = np.asarray(f32), np.asarray(fq)
    rel = np.linalg.norm(f32 - fq) / np.linalg.norm(f32)
    cos = (f32 * fq).sum() / (np.linalg.norm(f32) * np.linalg.norm(fq))
    assert rel < 0.08, rel
    assert cos > 0.995, cos


def test_descriptor_fidelity(setup):
    model, params, qmodel, qparams, imgs = setup
    _, d32 = jax.jit(model.apply)(params, imgs)
    _, dq = jax.jit(qmodel.apply)(qparams, imgs)
    d32, dq = np.asarray(d32), np.asarray(dq)
    cos = (d32 * dq).sum(-1)  # both L2-normalized
    assert np.all(cos > 0.999), cos


def test_retrieval_agreement(setup):
    """Nearest-neighbor ranking over a descriptor gallery survives int8."""
    model, params, qmodel, qparams, _ = setup
    rng = np.random.RandomState(1)
    # 12 distinct scenes + noisy variants of scene 0 as queries
    base = rng.randn(12, 64, 96, 3).astype(np.float32) * 40
    queries = base[:4] + rng.randn(4, 64, 96, 3).astype(np.float32) * 4
    gal32 = np.asarray(jax.jit(model.apply)(params, jnp.asarray(base))[1])
    q32 = np.asarray(jax.jit(model.apply)(params, jnp.asarray(queries))[1])
    galq = np.asarray(jax.jit(qmodel.apply)(qparams, jnp.asarray(base))[1])
    qq = np.asarray(jax.jit(qmodel.apply)(qparams, jnp.asarray(queries))[1])
    top32 = np.argmax(q32 @ gal32.T, axis=1)
    topq = np.argmax(qq @ galq.T, axis=1)
    assert np.array_equal(top32, np.arange(4))  # sanity: f32 retrieves right
    assert np.array_equal(topq, top32)


def test_masked_path_equals_unpadded(setup):
    """Bucket-padded quantized forward == per-image unpadded forward."""
    _, params, _, qparams, _ = setup
    rng = np.random.RandomState(2)
    shapes = [(48, 64), (64, 96)]
    pad_h, pad_w = 64, 96
    batch = np.zeros((2, pad_h, pad_w, 3), np.float32)
    singles = []
    for i, (h, w) in enumerate(shapes):
        img = rng.randn(h, w, 3).astype(np.float32) * 40
        batch[i, :h, :w] = img
        singles.append(img)
    valid = jnp.asarray([[48, 64], [64, 96]], jnp.int32)
    _, fq = vgg16_apply_int8(
        qparams["base"], jnp.asarray(batch), compute_dtype=jnp.float32,
        valid_hw=valid,
    )
    fq = np.asarray(fq)
    for i, (h, w) in enumerate(shapes):
        _, ref = vgg16_apply_int8(
            qparams["base"], jnp.asarray(singles[i][None]),
            compute_dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            fq[i, : h // 16, : w // 16], np.asarray(ref)[0], rtol=0,
            atol=1e-5,
        )
        # padded region of the output map is exactly zero
        assert np.all(fq[i, h // 16:] == 0)
        assert np.all(fq[i, :, w // 16:] == 0)


def test_uint8_input_path(setup):
    """Raw uint8 pixels take the on-device mean-subtract, like the f32 path."""
    _, params, _, qparams, _ = setup
    rng = np.random.RandomState(3)
    pix = rng.randint(0, 256, (1, 64, 96, 3), dtype=np.uint8)
    from openibl_tpu.data.transforms import PIXEL_MEAN

    norm = pix.astype(np.float32) - np.asarray(PIXEL_MEAN, np.float32)
    _, a = vgg16_apply_int8(
        qparams["base"], jnp.asarray(pix), compute_dtype=jnp.float32
    )
    _, b = vgg16_apply_int8(
        qparams["base"], jnp.asarray(norm), compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_calibration_reuse(setup):
    """act_amax from calibrate_vgg16 reproduces quantize_vgg16's scales."""
    _, params, _, qparams, imgs = setup
    amax = calibrate_vgg16(params["base"], imgs)
    q2 = quantize_vgg16(params["base"], None, act_amax=amax)
    a = jax.tree.leaves(qparams["base"])
    b = jax.tree.leaves(q2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_embednetpca_composition(setup):
    """QuantVGG16 slots into EmbedNetPCA via quantize_model_params."""
    _, _, _, _, imgs = setup
    model = models.create(
        "embednetpca",
        base=models.VGG16(compute_dtype=jnp.float32),
        net_vlad=models.NetVLAD(num_clusters=8),
        pca_dim=32,
    )
    params = model.init(jax.random.PRNGKey(1))
    qmodel, qparams = quantize_model_params(model, params, imgs)
    assert isinstance(qmodel.base, QuantVGG16)
    d32 = np.asarray(jax.jit(model.apply)(params, imgs))
    dq = np.asarray(jax.jit(qmodel.apply)(qparams, imgs))
    cos = (d32 * dq).sum(-1)
    assert np.all(cos > 0.99), cos
    # vlad/pca subtrees are shared, not copied
    assert qparams["vlad"] is params["vlad"]
    assert qparams["pca"] is params["pca"]


def test_init_raises():
    with pytest.raises(NotImplementedError):
        QuantVGG16().init(jax.random.PRNGKey(0))


def test_quantize_model_params_propagates_backbone_fields():
    """quantize_model_params must carry cut_at_pooling/feature_dim (and the
    compute dtype) from the source backbone into QuantVGG16 — a composite
    built on a cut_at_pooling backbone must not change behavior after
    quantization (ADVICE r4)."""
    from openibl_tpu import models
    from openibl_tpu.ops.quant import quantize_model_params

    base = models.VGG16(compute_dtype=jnp.float32, cut_at_pooling=True)
    model = models.create(
        "embednet", base=base,
        net_vlad=models.NetVLAD(num_clusters=4),
    )
    params = model.init(jax.random.PRNGKey(0))
    calib = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 48, 3)) * 40
    qmodel, _ = quantize_model_params(model, params, calib)
    assert qmodel.base.cut_at_pooling is True
    assert qmodel.base.feature_dim == base.feature_dim
    assert qmodel.base.compute_dtype == jnp.float32


def test_serving_noise_calibration_warns(tmp_path):
    """RetrievalService(quant_backbone=True) without calib_images must warn
    that activation scales come from random noise (ADVICE r4)."""
    import warnings

    from openibl_tpu.serving import RetrievalService

    rng = np.random.RandomState(0)
    g = rng.randn(8, 4096).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        RetrievalService({"descriptors": g}, height=32, width=48,
                         quant_backbone=True)
    assert any("calib_images" in str(x.message) for x in w)
