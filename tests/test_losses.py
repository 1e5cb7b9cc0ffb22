"""Loss parity tests vs torch.nn.functional oracles (torch CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from openibl_tpu.ops import losses

torch = pytest.importorskip("torch")
F = torch.nn.functional

MARGIN = 0.1 ** 0.5  # sqrt(0.1), reference margin**0.5 (netvlad_img.py:169)


def _tuples(rng, b=3, neg=10, l=32):
    d = rng.randn(b, 2 + neg, l).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return d


class TestBaselineLosses:
    def test_triplet_vs_torch(self, rng):
        d = _tuples(rng)
        t = torch.from_numpy(d)
        b, n2, l = d.shape
        neg = n2 - 2
        a = t[:, 0:1].expand(b, neg, l).reshape(-1, l)
        p = t[:, 1:2].expand(b, neg, l).reshape(-1, l)
        n = t[:, 2:].reshape(-1, l)
        ref = F.triplet_margin_loss(a, p, n, margin=MARGIN, p=2).item()
        ours = float(losses.triplet_loss(jnp.asarray(d), MARGIN))
        assert abs(ours - ref) < 1e-4

    def test_sare_joint_vs_torch(self, rng):
        d = _tuples(rng)
        t = torch.from_numpy(d)
        d_pos = ((t[:, 0] - t[:, 1]) ** 2).sum(1, keepdim=True)
        d_neg = ((t[:, 0:1] - t[:, 2:]) ** 2).sum(2)
        dist = F.log_softmax(-torch.cat((d_pos, d_neg), 1), 1)
        ref = (-dist[:, 0]).mean().item()
        ours = float(losses.sare_joint_loss(jnp.asarray(d)))
        assert abs(ours - ref) < 1e-4

    def test_sare_ind_vs_torch(self, rng):
        d = _tuples(rng)
        t = torch.from_numpy(d)
        b = t.shape[0]
        d_pos = ((t[:, 0] - t[:, 1]) ** 2).sum(1).view(b, 1, 1)
        d_neg = ((t[:, 0:1] - t[:, 2:]) ** 2).sum(2).unsqueeze(2)
        pair = -torch.cat((d_pos.expand_as(d_neg), d_neg), 2).view(-1, 2)
        ref = (-F.log_softmax(pair, 1)[:, 0]).mean().item()
        ours = float(losses.sare_ind_loss(jnp.asarray(d)))
        assert abs(ours - ref) < 1e-4


class TestDotLosses:
    def test_sare_ind_dot(self, rng):
        b, neg, l, temp = 2, 5, 16, 0.07
        a = rng.randn(b, l).astype(np.float32)
        p = rng.randn(b, l).astype(np.float32)
        n = rng.randn(b, neg, l).astype(np.float32)
        ta, tp, tn = map(torch.from_numpy, (a, p, n))
        s_pos = (ta * tp).sum(1).view(b, 1, 1)
        s_neg = torch.einsum("bl,bnl->bn", ta, tn).unsqueeze(2)
        pair = torch.cat((s_pos.expand_as(s_neg), s_neg), 2).view(-1, 2) / temp
        ref = (-F.log_softmax(pair, 1)[:, 0]).mean().item()
        ours = float(
            losses.sare_ind_dot_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), temp)
        )
        assert abs(ours - ref) < 1e-4

    def test_sare_joint_dot(self, rng):
        b, neg, l, temp = 2, 5, 16, 0.07
        a = rng.randn(b, l).astype(np.float32)
        p = rng.randn(b, l).astype(np.float32)
        n = rng.randn(b, neg, l).astype(np.float32)
        ta, tp, tn = map(torch.from_numpy, (a, p, n))
        s_pos = (ta * tp).sum(1, keepdim=True)
        s_neg = torch.einsum("bl,bnl->bn", ta, tn)
        logits = torch.cat((s_pos, s_neg), 1) / temp
        ref = (-F.log_softmax(logits, 1)[:, 0]).mean().item()
        ours = float(
            losses.sare_joint_dot_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), temp)
        )
        assert abs(ours - ref) < 1e-4


class TestSFRSLosses:
    def test_soft_loss_vs_torch(self, rng):
        t, pos, temp_s, temp_t = 2, 10, 0.07, 0.05
        sim_s = rng.randn(t, pos, 9, 9).astype(np.float32)
        sim_t = rng.randn(t, pos, 9, 9).astype(np.float32)
        ts, tt = torch.from_numpy(sim_s), torch.from_numpy(sim_t)
        log_sim = F.log_softmax(ts[:, :, 0].reshape(t, -1) / temp_s, dim=1)
        ref = (
            (-F.softmax(tt[:, :, 0].reshape(t, -1) / temp_t, dim=1) * log_sim)
            .mean(0)
            .sum()
            .item()
        )
        ours = float(
            losses.sfrs_soft_loss(jnp.asarray(sim_s), jnp.asarray(sim_t), temp_s, temp_t)
        )
        assert abs(ours - ref) < 1e-4

    def test_hard_loss_gen0_equals_global_sare(self, rng):
        t, neg, l = 3, 4, 16
        vlad_a = rng.randn(t, 1, 9, l).astype(np.float32)
        vlad_p = rng.randn(t, 1 + neg, 9, l).astype(np.float32)
        sim = np.einsum("txil,tpjl->tpij", vlad_a, vlad_p).astype(np.float32)
        gen0 = float(
            losses.sfrs_hard_loss(
                jnp.asarray(vlad_a), jnp.asarray(vlad_p), jnp.asarray(sim),
                "sare_ind", 0.07, MARGIN, gen=0,
            )
        )
        expect = float(
            losses.sare_ind_dot_loss(
                jnp.asarray(vlad_a[:, 0, 0]),
                jnp.asarray(vlad_p[:, 0, 0]),
                jnp.asarray(vlad_p[:, 1:, 0]),
                0.07,
            )
        )
        assert abs(gen0 - expect) < 1e-6

    def test_hard_loss_gen1_selects_hardest_region(self, rng):
        """gen>=1 must use, per negative, the region with max anchor-global
        similarity (reference trainers.py:261-270)."""
        t, neg, l = 1, 2, 8
        vlad_a = rng.randn(t, 1, 9, l).astype(np.float32)
        vlad_p = rng.randn(t, 1 + neg, 9, l).astype(np.float32)
        sim = np.einsum("txil,tpjl->tpij", vlad_a, vlad_p).astype(np.float32)
        got = float(
            losses.sfrs_hard_loss(
                jnp.asarray(vlad_a), jnp.asarray(vlad_p), jnp.asarray(sim),
                "sare_ind", 0.07, MARGIN, gen=1,
            )
        )
        # manual selection
        hardest = sim[:, 1:, 0].argmax(-1)  # (t, neg)
        sel = np.stack(
            [vlad_p[ti, 1 + ni, hardest[ti, ni]] for ti in range(t) for ni in range(neg)]
        ).reshape(t, neg, l)
        expect = float(
            losses.sare_ind_dot_loss(
                jnp.asarray(vlad_a[:, 0, 0]), jnp.asarray(vlad_p[:, 0, 0]),
                jnp.asarray(sel), 0.07,
            )
        )
        assert abs(got - expect) < 1e-6
