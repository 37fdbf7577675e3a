"""Positional-embedding helpers.

``pos_emb_sincos_2d`` — fixed 2-D sin/cos positional embedding (parity:
/root/reference/models/utils.py:5-20; unused by the reference's main path
but part of its public surface).
"""

from __future__ import annotations

import jax.numpy as jnp


def pos_emb_sincos_2d(h: int, w: int, dim: int, temperature: float = 10000.0,
                      dtype=jnp.float32):
    """[h*w, dim] fixed 2D sin/cos embedding; dim must be divisible by 4."""
    assert dim % 4 == 0, "dimension must be divisible by 4"
    y, x = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    omega = jnp.arange(dim // 4, dtype=jnp.float32)
    omega = 1.0 / (temperature ** omega)
    y = y.reshape(-1)[:, None] * omega[None, :]
    x = x.reshape(-1)[:, None] * omega[None, :]
    pe = jnp.concatenate(
        [jnp.sin(x), jnp.cos(x), jnp.sin(y), jnp.cos(y)], axis=1)
    return pe.astype(dtype)
