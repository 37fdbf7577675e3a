"""Trajectory PCA analysis (parity: /root/reference/utils.py:242-334).

Regularized covariance-SVD PCA, subspace projection, orthogonal-Procrustes
trajectory alignment, and the PCA-stability sweep the reference uses for
its phase-portrait notebooks. All device-side jnp (the reference mixes
torch, torch_pca and scipy); only Procrustes calls into scipy (host).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def perform_pca_lowrank(a, n_eigenvectors: int = 6, center: bool = True,
                        reg_eps: float = 1e-5):
    """PCA via SVD of the Tikhonov-regularized covariance.

    Returns (U_cov, S[:n], V[:, :n]) like the reference (its ``Vt`` is in
    fact V — torch.svd returns V, not V^T).
    """
    a = jnp.asarray(a, jnp.float32)
    if center:
        a = a - jnp.mean(a, axis=0, keepdims=True)
    cov = a.T @ a
    cov = cov + reg_eps * jnp.eye(cov.shape[0], dtype=cov.dtype)
    u, s, vt = jnp.linalg.svd(cov)
    v = vt.T
    return u, s[:n_eigenvectors], v[:, :n_eigenvectors]


def project_onto_subspace(a, v, k: int = 1):
    """Project rows of ``a`` onto the first k principal directions."""
    return jnp.asarray(a) @ v[:, :k]


def align_trajectories(x, y):
    """Align Y to X with orthogonal Procrustes; returns Y @ R."""
    import scipy.linalg
    r, _ = scipy.linalg.orthogonal_procrustes(np.asarray(y), np.asarray(x))
    return np.asarray(y) @ r


def pca_components(a, n_components: int = 10
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """L2-normalize rows, full-SVD PCA; returns (components [n, D],
    explained_variance_ratio [n])."""
    a = jnp.asarray(a, jnp.float32)
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    a = a - jnp.mean(a, axis=0, keepdims=True)
    _, s, vt = jnp.linalg.svd(a, full_matrices=False)
    var = s ** 2
    ratio = var / jnp.sum(var)
    return vt[:n_components], ratio[:n_components]


def analyse_pca_stability(
    a_full,
    n_components: int = 10,
    sample_sizes: Sequence[int] = (1000, 2000, 5000, 10000),
    seed: int = 0,
    plot_dir: str | None = None,
):
    """Cosine similarity of the top component between full-data PCA and
    subsample PCA, plus explained-variance curves (reference analyse_PCA,
    utils.py:306-371). Returns (angles, explained_variances)."""
    a_full = jnp.asarray(a_full, jnp.float32)
    comps_full, _ = pca_components(a_full, n_components)
    rng = np.random.default_rng(seed)
    angles: List[float] = []
    variances = []
    for n in sample_sizes:
        n = min(n, a_full.shape[0])
        idx = rng.permutation(a_full.shape[0])[:n]
        comps, ratio = pca_components(a_full[idx], n_components)
        cos = float(jnp.dot(comps_full[0], comps[0])
                    / (jnp.linalg.norm(comps_full[0])
                       * jnp.linalg.norm(comps[0])))
        angles.append(abs(cos))      # sign of principal axes is arbitrary
        variances.append(np.asarray(ratio))
    variances = np.stack(variances)

    if plot_dir is not None:
        import os
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        os.makedirs(plot_dir, exist_ok=True)
        plt.figure(figsize=(7, 5))
        plt.plot(list(sample_sizes)[:len(angles)], angles, marker="o")
        plt.title("Stability of the Top PCA Component")
        plt.xlabel("Number of Samples Used for PCA")
        plt.ylabel("|cos| with Full Dataset PCA")
        plt.grid(True, linestyle="--", alpha=0.7)
        plt.tight_layout()
        plt.savefig(os.path.join(plot_dir, "pca_cosine_similarity.png"))
        plt.close()
        plt.figure(figsize=(8, 6))
        for i in range(variances.shape[1]):
            plt.plot(list(sample_sizes)[:len(angles)], variances[:, i],
                     marker="o", label=f"PC {i+1}")
        plt.title("Explained Variance Ratio of PCA Components")
        plt.legend()
        plt.tight_layout()
        plt.savefig(os.path.join(plot_dir, "pca_explained_variance.png"))
        plt.close()
    return np.asarray(angles), variances
