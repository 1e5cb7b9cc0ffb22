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
    """k-means++ seeding (host-side; k is small)."""
    n = x.shape[0]
    rs = np.random.RandomState(int(rng))
    centers = [x[rs.randint(n)]]
    d2 = ((x - centers[0]) ** 2).sum(-1)
    for _ in range(k - 1):
        probs = d2 / max(d2.sum(), 1e-12)
        idx = rs.choice(n, p=probs)
        centers.append(x[idx])
        d2 = np.minimum(d2, ((x - centers[-1]) ** 2).sum(-1))
    return np.stack(centers)


@functools.partial(jax.jit, static_argnames=("iters",))
def _lloyd(x, centers, iters):
    n, d = x.shape
    k = centers.shape[0]
    x2 = jnp.sum(jnp.square(x), axis=1, keepdims=True)

    def body(centers, _):
        c2 = jnp.sum(jnp.square(centers), axis=1)[None, :]
        d2 = x2 + c2 - 2.0 * jnp.dot(
            x, centers.T, preferred_element_type=jnp.float32
        )
        assign = jnp.argmin(d2, axis=1)
        one_hot = jax.nn.one_hot(assign, k, dtype=jnp.float32)
        counts = one_hot.sum(axis=0)  # (K,)
        sums = jnp.dot(one_hot.T, x, preferred_element_type=jnp.float32)
        new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
        # keep empty clusters where they were
        new_centers = jnp.where(counts[:, None] > 0, new_centers, centers)
        return new_centers, jnp.min(d2, axis=1).mean()

    centers, inertia = jax.lax.scan(body, centers, None, length=iters)
    return centers, inertia[-1]


def kmeans(x, k, iters=100, seed=0):
    """Returns (centroids (K, D), final mean inertia)."""
    x = np.asarray(x, np.float32)
    init = _plus_plus_init(seed, x, k)
    centers, inertia = _lloyd(jnp.asarray(x), jnp.asarray(init), iters)
    return np.asarray(centers), float(inertia)
