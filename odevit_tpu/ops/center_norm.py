"""CenterNorm: mean-centering normalization without variance division.

A Lipschitz-friendly LayerNorm substitute used by the ODE-ViT vector field:
``y = gamma * (n/(n-1)) * (x - mean(x)) + beta`` over the last axis.

Reference semantics: /root/reference/models/ode_transformer_gpt.py:66-83.
TPU notes: this is a pure VPU op; mean reduction runs in float32 for
stability regardless of the compute dtype, then casts back.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def center_norm(x, weight, bias, *, dtype=None):
    """Functional CenterNorm over the last axis.

    Args:
      x: [..., D] input.
      weight: [D] scale.
      bias: [D] shift.
      dtype: optional compute dtype for the affine part (mean stays f32).
    """
    d = x.shape[-1]
    scale = d / (d - 1.0)
    u = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    centered = (x.astype(jnp.float32) - u) * scale
    out_dtype = dtype or x.dtype
    centered = centered.astype(out_dtype)
    return weight.astype(out_dtype) * centered + bias.astype(out_dtype)


class CenterNorm(nn.Module):
    """Flax module wrapper over :func:`center_norm`."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        weight = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return center_norm(x, weight, bias, dtype=self.dtype)
