"""Koopman / DMD analysis of ODE trajectories.

The reference's Koopman tooling lives in a stripped notebook
(visus_ode.ipynb, .MISSING_LARGE_BLOBS) plus a broken helper
(utils.py:293-304, undefined names w/lam) whose intended rollout is
``g_{t+1} = g_t @ (W diag(lambda) Z*)^T``. Re-derivation: fit a linear
operator K to trajectory snapshot pairs by least squares (exact DMD),
eigendecompose K = W diag(lambda) W^{-1} (so Z* = W^{-1}), and roll out.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class KoopmanModel(NamedTuple):
    w: jnp.ndarray        # eigenvectors [D, D] (complex)
    lam: jnp.ndarray      # eigenvalues [D] (complex)
    z: jnp.ndarray        # left factor: K = w @ diag(lam) @ z.conj().T
    k: jnp.ndarray        # the fitted operator itself [D, D] (real lstsq)


def fit_koopman(trajectory) -> KoopmanModel:
    """Fit g_{t+1} ~= g_t @ K^T from snapshots [T, D] (rows are states)."""
    g = jnp.asarray(trajectory, jnp.float32)
    x, y = g[:-1], g[1:]
    # y = x @ K^T  =>  K^T = lstsq(x, y)
    kt, *_ = jnp.linalg.lstsq(x, y, rcond=None)
    k = kt.T
    lam, w = jnp.linalg.eig(k.astype(jnp.complex64))
    # K = w diag(lam) w^{-1}; with z = (w^{-1})^H we get K = w diag(lam) z^H
    z = jnp.linalg.inv(w).conj().T
    return KoopmanModel(w=w, lam=lam, z=z, k=k)


def predict_trajectory(g0, model: KoopmanModel, horizon: int):
    """Roll the Koopman operator forward: returns [horizon+1, ...] states
    (the reference's intended predict_trajectory, fixed)."""
    k_op = (model.w @ (jnp.diag(model.lam) @ model.z.conj().T))
    g = jnp.asarray(g0, jnp.complex64)
    steps = [g]
    for _ in range(horizon):
        g = g @ k_op.T
        steps.append(g)
    return jnp.stack(steps)


def koopman_spectrum(model: KoopmanModel):
    """(|lambda|, angle(lambda)): stability/rotation of each mode."""
    return jnp.abs(model.lam), jnp.angle(model.lam)
