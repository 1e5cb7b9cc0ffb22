"""PCA-whitening, on-device (jnp.linalg.eigh instead of torch.symeig).

Re-implements the reference PCA train/load/infer pipeline
(/root/reference/ibl/pca.py:28-123), which follows relja_matlab's relja_PCA:
covariance (dual formulation when D > N) → eigendecomposition → top-k
eigenvectors; whitening bakes diag(1/sqrt(lam)) into the projection.

Parameters are stored as a plain dict {U, lams, mu} (numpy) and serialized to
.h5 (for interop with reference artifacts) or .npz.
"""

import numpy as np
import jax
import jax.numpy as jnp

from openibl_tpu.utils import l2_normalize


def pca_train(x, n_components=4096):
    """Compute PCA parameters from descriptors ``x`` (N, D).

    Returns dict with U (D, k), lams (k,), mu (D, 1). Mirrors
    /root/reference/ibl/pca.py:28-76 including the dual (gram) path for
    D > N and the 1e-9 eigenvalue floor.
    """
    x = jnp.asarray(x, jnp.float32).T  # (D, N)
    n_points = x.shape[1]
    n_dims = x.shape[0]
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu

    do_dual = n_dims > n_points
    if do_dual:
        cov = jnp.dot(xc.T, xc, preferred_element_type=jnp.float32) / (n_points - 1)
    else:
        cov = jnp.dot(xc, xc.T, preferred_element_type=jnp.float32) / (n_points - 1)

    lams, u = jnp.linalg.eigh(cov)  # ascending
    k = min(n_components, cov.shape[0])
    # top-k by descending eigenvalue
    order = jnp.argsort(-lams)[:k]
    lams = lams[order]
    u = u[:, order]
    lams = jnp.maximum(lams, 1e-9)

    if do_dual:
        # U_primal = Xc @ U_dual @ diag(1/sqrt(lams * (N-1)))
        u = jnp.dot(
            xc, u * (1.0 / jnp.sqrt(lams * (n_points - 1)))[None, :],
            preferred_element_type=jnp.float32,
        )

    return {
        "U": np.asarray(u),
        "lams": np.asarray(lams),
        "mu": np.asarray(mu),
    }


def pca_projection(params, n_components=None, whiten=True):
    """Materialize the (D, k) projection matrix and (k,) bias.

    Mirrors PCA.load (/root/reference/ibl/pca.py:86-106): optionally folds
    diag(1/sqrt(lams)) into U, recomputes Utmu from the whitened U, and the
    inference output is l2norm(x @ U + (-U^T mu))."""
    u = np.asarray(params["U"])
    lams = np.asarray(params["lams"])
    mu = np.asarray(params["mu"])
    if n_components is not None:
        u = u[:, :n_components]
        lams = lams[:n_components]
    if whiten:
        u = u * (1.0 / np.sqrt(lams))[None, :]
    bias = -(u.T @ mu).reshape(-1)
    return jnp.asarray(u, jnp.float32), jnp.asarray(bias, jnp.float32)


def pca_apply(x, proj, bias):
    """Project + L2-normalize (reference PCA.infer, pca.py:108-123)."""
    out = jnp.dot(jnp.asarray(x, jnp.float32), proj,
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out = out + bias
    return l2_normalize(out, axis=-1)


def save_pca(params, path):
    # atomic tmp + os.replace (mirrors utils/checkpoint.py): run_eval reuses
    # an existing pca_params_*.h5 on a bare isfile() check, so a crash
    # mid-save must never leave a truncated file that every later eval
    # silently loads instead of refitting (ADVICE r3)
    import os

    tmp = str(path) + ".tmp"
    if str(path).endswith(".h5"):
        import h5py

        u = np.asarray(params["U"])
        mu = np.asarray(params["mu"])
        with h5py.File(tmp, "w") as h5:
            h5.create_dataset("U", data=u)
            h5.create_dataset("lams", data=np.asarray(params["lams"]))
            h5.create_dataset("mu", data=mu)
            h5.create_dataset("Utmu", data=u.T @ mu)
    else:
        # np.savez appends '.npz' to a bare filename; write through an open
        # file object so the path on disk is EXACTLY what load_pca will open
        with open(tmp, "wb") as f:
            np.savez(f, **{k: np.asarray(v) for k, v in params.items()})
    os.replace(tmp, path)


def load_pca(path):
    if str(path).endswith(".h5"):
        import h5py

        with h5py.File(path, "r") as h5:
            return {
                "U": h5["U"][...],
                "lams": h5["lams"][...],
                "mu": h5["mu"][...],
            }
    with np.load(path) as data:
        return {k: data[k] for k in ("U", "lams", "mu")}


class PCA:
    """Stateful convenience wrapper matching the reference's PCA object
    surface (train → save; load → infer), for the entry-point scripts."""

    def __init__(self, n_components=4096, whiten=True, params_path=None):
        self.n_components = n_components
        self.whiten = whiten
        self.params_path = params_path
        self._proj = None
        self._bias = None

    def train(self, x):
        params = pca_train(x, self.n_components)
        if self.params_path:
            save_pca(params, self.params_path)
        self._proj, self._bias = pca_projection(
            params, self.n_components, self.whiten
        )
        return params

    def load(self):
        params = load_pca(self.params_path)
        self._proj, self._bias = pca_projection(
            params, self.n_components, self.whiten
        )
        return self

    @property
    def loaded(self):
        return self._proj is not None

    def infer(self, x):
        if self._proj is None:
            self.load()
        return pca_apply(x, self._proj, self._bias)
