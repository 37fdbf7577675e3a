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

import numpy as _np


class KoopmanModel(NamedTuple):
    w: _np.ndarray        # eigenvectors [D, D] (complex, host)
    lam: _np.ndarray      # eigenvalues [D] (complex, host)
    z: _np.ndarray        # left factor: K = w @ diag(lam) @ z.conj().T
    k: _np.ndarray        # the fitted operator itself [D, D] (real lstsq)


def fit_koopman(trajectory) -> KoopmanModel:
    """Fit g_{t+1} ~= g_t @ K^T from snapshots [T, D] (rows are states).

    Runs on host numpy: non-symmetric ``eig`` has no TPU lowering, and
    Koopman snapshots are tiny (T x a-few-PCs) — device round-trips would
    cost more than the math.
    """
    import numpy as np
    g = np.asarray(trajectory, np.float32)
    x, y = g[:-1], g[1:]
    # y = x @ K^T  =>  K^T = lstsq(x, y)
    kt, *_ = np.linalg.lstsq(x, y, rcond=None)
    k = kt.T
    lam, w = np.linalg.eig(k.astype(np.complex64))
    # K = w diag(lam) w^{-1}; with z = (w^{-1})^H we get K = w diag(lam) z^H
    z = np.linalg.inv(w).conj().T
    # complex dtypes stay host-side: TPU has no complex lowering
    return KoopmanModel(w=w, lam=lam, z=z, k=k)


def predict_trajectory(g0, model: KoopmanModel, horizon: int):
    """Roll the Koopman operator forward: returns [horizon+1, ...] states
    (the reference's intended predict_trajectory, fixed). Host numpy —
    complex arithmetic has no TPU lowering."""
    import numpy as np
    w = np.asarray(model.w)
    lam = np.asarray(model.lam)
    z = np.asarray(model.z)
    k_op = w @ (np.diag(lam) @ z.conj().T)
    g = np.asarray(g0).astype(np.complex64)
    steps = [g]
    for _ in range(horizon):
        g = g @ k_op.T
        steps.append(g)
    return np.stack(steps)


def koopman_spectrum(model: KoopmanModel):
    """(|lambda|, angle(lambda)): stability/rotation of each mode."""
    import numpy as np
    lam = np.asarray(model.lam)
    return np.abs(lam), np.angle(lam)
