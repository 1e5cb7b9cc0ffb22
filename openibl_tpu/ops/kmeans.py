"""k-means on device (Lloyd iterations + k-means++ seeding).

Replaces the reference's sklearn KMeans for NetVLAD centroid bootstrap
(/root/reference/examples/cluster.py:110-112: k=64, 100 iterations over 50k
L2-normalized conv5 descriptors). Assignment is one (N, D) x (D, K) matmul
per iteration — MXU work, trivially fast at this size.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _plus_plus_init(rng, x, k):
    """k-means++ seeding (host-side; k is small).

    When every remaining point coincides with a chosen center (duplicate-
    heavy data, or k exceeding the distinct-row count), the D² weights are
    all zero — fall back to uniform sampling instead of crashing in
    np.random.choice (sklearn's k-means++ tolerates this case too)."""
    n = x.shape[0]
    rs = np.random.RandomState(int(rng))
    centers = [x[rs.randint(n)]]
    d2 = ((x - centers[0]) ** 2).sum(-1)
    for _ in range(k - 1):
        total = d2.sum()
        if total > 0:
            idx = rs.choice(n, p=d2 / total)
        else:
            idx = rs.randint(n)
        centers.append(x[idx])
        d2 = np.minimum(d2, ((x - centers[-1]) ** 2).sum(-1))
    return np.stack(centers)


@functools.partial(jax.jit, static_argnames=("iters",))
def _lloyd(x, centers, iters):
    n, d = x.shape
    k = centers.shape[0]
    x2 = jnp.sum(jnp.square(x), axis=1, keepdims=True)

    def assign_d2(centers):
        # HIGHEST precision (CLAUDE.md descriptor-path rule): bf16 default
        # matmul error ~1e-2 on unit-norm conv5 descriptors swamps the
        # squared-distance gaps between nearby centroids and flips
        # borderline assignments every iteration
        c2 = jnp.sum(jnp.square(centers), axis=1)[None, :]
        return x2 + c2 - 2.0 * jnp.dot(
            x, centers.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def body(centers, _):
        d2 = assign_d2(centers)
        assign = jnp.argmin(d2, axis=1)
        one_hot = jax.nn.one_hot(assign, k, dtype=jnp.float32)
        counts = one_hot.sum(axis=0)  # (K,)
        sums = jnp.dot(one_hot.T, x, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
        # keep empty clusters where they were
        new_centers = jnp.where(counts[:, None] > 0, new_centers, centers)
        return new_centers, None

    centers, _ = jax.lax.scan(body, centers, None, length=iters)
    # inertia of the RETURNED centers (inside the scan the metric lagged one
    # Lloyd step: it was computed against the pre-update carry)
    inertia = jnp.min(assign_d2(centers), axis=1).mean()
    return centers, inertia


def kmeans(x, k, iters=100, seed=0):
    """Returns (centroids (K, D), final mean inertia)."""
    x = np.asarray(x, np.float32)
    init = _plus_plus_init(seed, x, k)
    centers, inertia = _lloyd(jnp.asarray(x), jnp.asarray(init), iters)
    return np.asarray(centers), float(inertia)
