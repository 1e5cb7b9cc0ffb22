"""Fused NetVLAD Pallas kernel vs the XLA reference path (interpret mode on
CPU; the real-TPU comparison runs in verification / bench)."""

import numpy as np
import jax
import jax.numpy as jnp

from openibl_tpu.models.netvlad import netvlad_apply, vlad_postprocess
from openibl_tpu.ops.netvlad_kernel import netvlad_fused, netvlad_descriptor_fused


def _params(rng, c=256, k=8):
    return {
        "assign_w": jnp.asarray(rng.randn(c, k).astype(np.float32) * 2),
        "centroids": jnp.asarray(rng.randn(k, c).astype(np.float32)),
    }


class TestFusedKernel:
    def test_matches_xla_raw(self, rng):
        params = _params(rng)
        fmap = jnp.asarray(rng.randn(3, 8, 16, 256).astype(np.float32))
        ref = np.asarray(netvlad_apply(params, fmap))
        out = np.asarray(
            netvlad_fused(fmap, params["assign_w"], params["centroids"])
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_matches_xla_postprocessed(self, rng):
        params = _params(rng)
        fmap = jnp.asarray(rng.randn(2, 8, 16, 256).astype(np.float32))
        ref = np.asarray(vlad_postprocess(netvlad_apply(params, fmap)))
        out = np.asarray(netvlad_descriptor_fused(params, fmap))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)

    def test_no_input_norm_variant(self, rng):
        params = _params(rng)
        fmap = jnp.asarray(rng.randn(1, 8, 16, 256).astype(np.float32))
        ref = np.asarray(netvlad_apply(params, fmap, normalize_input=False))
        out = np.asarray(
            netvlad_fused(fmap, params["assign_w"], params["centroids"],
                          normalize_input=False)
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_gradient_matches_xla(self, rng):
        """custom_vjp must route gradients through the XLA path."""
        params = _params(rng, c=256, k=4)
        fmap = jnp.asarray(rng.randn(1, 8, 8, 256).astype(np.float32))

        def loss_fused(w):
            return jnp.sum(
                netvlad_fused(fmap, w, params["centroids"]) ** 2
            )

        def loss_xla(w):
            return jnp.sum(
                netvlad_apply({"assign_w": w, "centroids": params["centroids"]},
                              fmap) ** 2
            )

        g_fused = np.asarray(jax.grad(loss_fused)(params["assign_w"]))
        g_xla = np.asarray(jax.grad(loss_xla)(params["assign_w"]))
        np.testing.assert_allclose(g_fused, g_xla, rtol=1e-3, atol=1e-4)

    def test_jit_compatible(self, rng):
        params = _params(rng)
        fmap = jnp.asarray(rng.randn(2, 8, 16, 256).astype(np.float32))

        @jax.jit
        def f(fmap):
            return netvlad_descriptor_fused(params, fmap)

        out = np.asarray(f(fmap))
        assert out.shape == (2, 8 * 256)


class TestFusedModels:
    def test_embednet_fused_matches(self, rng):
        from openibl_tpu import models

        nv = models.NetVLAD(num_clusters=4, dim=512)
        plain = models.create("embednet", net_vlad=nv)
        fused = models.create(
            "embednet", net_vlad=models.NetVLAD(num_clusters=4, dim=512, fused=True)
        )
        params = plain.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32) * 30)
        _, d_plain = plain.apply(params, x)
        _, d_fused = fused.apply(params, x)
        np.testing.assert_allclose(
            np.asarray(d_fused), np.asarray(d_plain), rtol=1e-4, atol=1e-5
        )


