"""Weakly-supervised retrieval losses, as pure jnp functions.

Implements the loss math of the reference trainers
(/root/reference/ibl/trainers.py:82-162 and :261-315):

  * triplet        — hinge on L2 distances, margin = sqrt(0.1)
  * sare_joint     — softmax over −[d²⁺, d²₁⁻..d²ₙ⁻], NLL of the positive
  * sare_ind       — per-negative 2-way softmax, averaged
  * dot-product variants with temperature (used by SFRS, trainers.py:282-315)
  * SFRS hard-region selection + soft distillation CE (trainers.py:235-270)

All take descriptors shaped (B, 2+neg, L): [anchor, positive, negatives...].
"""

import jax
import jax.numpy as jnp


def _split_tuple(desc):
    return desc[:, 0], desc[:, 1], desc[:, 2:]  # anchors, positives, negatives


def _l2_dist(a, b, eps=1e-6):
    # torch.pairwise_distance adds eps inside the norm; replicate for parity.
    return jnp.sqrt(jnp.sum(jnp.square(a - b + eps), axis=-1))


def triplet_loss(desc, margin):
    """F.triplet_margin_loss equivalent (trainers.py:90-95), mean over all
    (anchor, positive, negative) triplets."""
    a, p, n = _split_tuple(desc)
    d_pos = _l2_dist(a, p)[:, None]  # (B, 1)
    d_neg = _l2_dist(a[:, None], n)  # (B, neg)
    return jnp.mean(jnp.maximum(d_pos - d_neg + margin, 0.0))


def sare_joint_loss(desc):
    """Softmax over negated squared-euclidean distances (trainers.py:97-109)."""
    a, p, n = _split_tuple(desc)
    d2_pos = jnp.sum(jnp.square(a - p), axis=-1, keepdims=True)  # (B, 1)
    d2_neg = jnp.sum(jnp.square(a[:, None] - n), axis=-1)  # (B, neg)
    logits = -jnp.concatenate([d2_pos, d2_neg], axis=1)
    return jnp.mean(-jax.nn.log_softmax(logits, axis=1)[:, 0])


def sare_ind_loss(desc):
    """Per-negative two-way softmax, averaged (trainers.py:126-140)."""
    a, p, n = _split_tuple(desc)
    d2_pos = jnp.sum(jnp.square(a - p), axis=-1)  # (B,)
    d2_neg = jnp.sum(jnp.square(a[:, None] - n), axis=-1)  # (B, neg)
    pair = -jnp.stack(
        [jnp.broadcast_to(d2_pos[:, None], d2_neg.shape), d2_neg], axis=-1
    )  # (B, neg, 2)
    return jnp.mean(-jax.nn.log_softmax(pair, axis=-1)[..., 0])


# --- dot-product variants with temperature (SFRS _get_loss, :282-315) -------

def sare_joint_dot_loss(anchors, positives, negatives, temp):
    """anchors/positives (B, L), negatives (B, neg, L)."""
    s_pos = jnp.sum(anchors * positives, axis=-1, keepdims=True)  # (B, 1)
    s_neg = jnp.einsum("bl,bnl->bn", anchors, negatives)  # (B, neg)
    logits = jnp.concatenate([s_pos, s_neg], axis=1) / temp
    return jnp.mean(-jax.nn.log_softmax(logits, axis=1)[:, 0])


def sare_ind_dot_loss(anchors, positives, negatives, temp):
    s_pos = jnp.sum(anchors * positives, axis=-1)  # (B,)
    s_neg = jnp.einsum("bl,bnl->bn", anchors, negatives)  # (B, neg)
    pair = (
        jnp.stack([jnp.broadcast_to(s_pos[:, None], s_neg.shape), s_neg], axis=-1)
        / temp
    )
    return jnp.mean(-jax.nn.log_softmax(pair, axis=-1)[..., 0])


def triplet_dot_loss(anchors, positives, negatives, margin):
    """SFRS triplet variant (still euclidean, trainers.py:286-291)."""
    d_pos = _l2_dist(anchors, positives)[:, None]
    d_neg = _l2_dist(anchors[:, None], negatives)
    return jnp.mean(jnp.maximum(d_pos - d_neg + margin, 0.0))


def sfrs_hard_loss(vlad_a, vlad_p, sim_easy, loss_type, temp, margin, gen):
    """SFRS hard loss over region descriptors.

    Args:
      vlad_a: (T, 1, 9, L) anchor regions; vlad_p: (T, 1+neg, 9, L);
      sim_easy: (T, 1+neg, 9, 9) anchor-region x pair-region scores.
    gen 0: plain loss on full-image (region 0) descriptors; gen >= 1: per
    negative, pick its hardest of 9 regions by detached anchor-global
    similarity argmax (reference trainers.py:247-270).
    """
    anchors = vlad_a[:, 0, 0]  # (T, L) anchor global
    positives = vlad_p[:, 0, 0]  # (T, L) positive global
    if gen == 0:
        negatives = vlad_p[:, 1:, 0]  # (T, neg, L) negative globals
    else:
        # (T, neg, 9): similarity of anchor global (region 0) to each
        # negative's 9 regions; argmax picks the hardest region.
        score_neg = jax.lax.stop_gradient(sim_easy[:, 1:, 0])
        hardest = jnp.argmax(score_neg, axis=-1)  # (T, neg)
        negatives = jnp.take_along_axis(
            vlad_p[:, 1:], hardest[:, :, None, None], axis=2
        )[:, :, 0]  # (T, neg, L)
    if loss_type == "sare_ind":
        return sare_ind_dot_loss(anchors, positives, negatives, temp)
    if loss_type == "sare_joint":
        return sare_joint_dot_loss(anchors, positives, negatives, temp)
    if loss_type == "triplet":
        return triplet_dot_loss(anchors, positives, negatives, margin)
    raise ValueError(f"unknown loss_type {loss_type}")


def sfrs_soft_loss(sim_student, sim_teacher, temp_student, temp_teacher):
    """Self-distillation CE between student and teacher region similarities.

    sim_*: (T, pos, 9, 9) anchor-region x diff-positive-region scores; only
    the anchor-global row (region 0) is distilled, flattened over
    (pos x 9 regions) — reference trainers.py:256-257.
    """
    t = sim_student.shape[0]
    logits_s = sim_student[:, :, 0].reshape(t, -1) / temp_student
    logits_t = sim_teacher[:, :, 0].reshape(t, -1) / temp_teacher
    log_p_s = jax.nn.log_softmax(logits_s, axis=1)
    p_t = jax.lax.stop_gradient(jax.nn.softmax(logits_t, axis=1))
    # reference: (-p_t * log_p_s).mean(0).sum() == mean over batch of CE sums
    return jnp.sum(jnp.mean(-p_t * log_p_s, axis=0))


def tuple_loss(desc, loss_type, margin=None):
    """Dispatch for the baseline Trainer loss (trainers.py:82-160)."""
    if loss_type == "triplet":
        return triplet_loss(desc, margin)
    if loss_type == "sare_joint":
        return sare_joint_loss(desc)
    if loss_type == "sare_ind":
        return sare_ind_loss(desc)
    raise ValueError(f"unknown loss_type {loss_type}")
