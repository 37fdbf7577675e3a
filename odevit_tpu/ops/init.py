"""Spectral initialization: Xavier-normal rescaled to unit top singular value.

The ODE-ViT vector field is initialized so every linear/conv map has
sigma_1 = 1 (Lipschitz <= 1), which keeps the ODE well-posed at t=0
(reference behavior: /root/reference/models/ode_transformer_gpt.py:494-513).

We implement it as a Flax initializer: sample Xavier-normal, flatten to a
(fan_out, fan_in)-like matrix, divide by the top singular value. Singular
values are invariant to transposition and column permutation, so flax's
[in, out] kernel layout and [kh, kw, in, out] conv layout produce the same
sigma_1 as torch's [out, in] / [out, in, kh, kw].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


import numpy as np


def _top_singular_value(mat) -> jnp.ndarray:
    # For init-time use only; runs once per parameter at model.init.
    # Eager init gives concrete values: use host numpy (a per-shape XLA
    # SVD compile on TPU costs seconds each; numpy is instant at these
    # sizes). Under tracing (e.g. jit'd init) fall back to jnp.
    if not isinstance(mat, jax.core.Tracer):
        return np.linalg.svd(np.asarray(mat, np.float32),
                             compute_uv=False)[0]
    s = jnp.linalg.svd(mat.astype(jnp.float32), compute_uv=False)
    return s[0]


def spectral_xavier_normal(dtype=jnp.float32):
    """Initializer: xavier_normal / sigma_1.

    Works for 2-D dense kernels [in, out] and 4-D conv kernels
    [kh, kw, in, out] (flattened to a matrix with the output channels as
    one axis, matching torch's reshape-to-(out, fan_in) convention up to a
    column permutation, which preserves singular values).
    """

    base = nn.initializers.xavier_normal()

    def init(key, shape, dtype_=dtype):
        w = base(key, shape, jnp.float32)
        if w.ndim == 2:
            mat = w
        else:
            # conv kernel [kh, kw, in, out] -> (out, kh*kw*in)
            mat = jnp.moveaxis(w, -1, 0).reshape(shape[-1], -1)
        sigma1 = _top_singular_value(mat)
        return (w / sigma1).astype(dtype_)

    return init


def spectral_normalize_pytree(params):
    """Re-apply sigma_1 normalization to every >=2D kernel in a pytree.

    Utility for post-hoc normalization (e.g. after grafting foreign
    weights); leaves biases and norm scales untouched.
    """

    def norm_leaf(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if leaf.ndim >= 2 and "kernel" in name:
            mat = leaf if leaf.ndim == 2 else jnp.moveaxis(leaf, -1, 0).reshape(leaf.shape[-1], -1)
            return leaf / _top_singular_value(mat)
        return leaf

    return jax.tree_util.tree_map_with_path(norm_leaf, params)
