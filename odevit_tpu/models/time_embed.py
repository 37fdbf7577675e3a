"""Time embeddings + FiLM conditioning for the ODE vector field.

The reference ships these modules (models/time_emb.py) but never wires
them in — the vector field ignores ``t`` (commented-out projections at
ode_transformer_gpt.py:271-272, and time_emb.py even contains a live
pdb.set_trace at :66). BASELINE.json names time conditioning as part of
the north star, so here it is real: ``TimeEmbedding`` produces a feature
vector from the scalar solver time, and ``ScaleShift`` turns it into FiLM
(scale, shift) pairs applied inside the vector field when
``time_conditioning=True``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


class SinusoidalTimeEmbedding(nn.Module):
    """[t, sin(w t), cos(w t)] features; output dim = 2*dim + 1."""

    dim: int
    max_period: float = 10000.0
    scale: float = 1000.0

    @nn.compact
    def __call__(self, t):
        assert self.dim % 2 == 0
        t = jnp.asarray(t, jnp.float32)
        ts = t * self.scale
        half = self.dim // 2
        freqs = jnp.exp(-math.log(self.max_period)
                        * jnp.arange(half, dtype=jnp.float32) / half)
        args = ts[..., None] * freqs
        return jnp.concatenate(
            [t[..., None], jnp.sin(args), jnp.cos(args)], axis=-1)


class LearnedSinusoidalTimeEmbedding(nn.Module):
    """Random-Fourier features with learned frequencies."""

    dim: int

    @nn.compact
    def __call__(self, t):
        assert self.dim % 2 == 0
        w = self.param("weights", nn.initializers.normal(stddev=1.0),
                       (self.dim,))
        t = jnp.asarray(t, jnp.float32)
        freqs = t[..., None] * w * 2.0 * math.pi
        return jnp.concatenate(
            [t[..., None], jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class TimeEmbedding(nn.Module):
    """Sinusoidal features -> SiLU MLP -> embed_dim vector."""

    sinusoidal_dim: int
    embed_dim: int
    multiplier: int = 1
    dropout: float = 0.0
    learnable_sinusoidal: bool = False

    @nn.compact
    def __call__(self, t, *, deterministic: bool = True):
        if self.learnable_sinusoidal:
            x = LearnedSinusoidalTimeEmbedding(self.sinusoidal_dim)(t)
        else:
            x = SinusoidalTimeEmbedding(self.sinusoidal_dim)(t)
        x = nn.Dense(self.embed_dim * self.multiplier, name="lin1")(x)
        x = jax.nn.silu(x)
        if self.dropout > 0.0 and not deterministic:
            x = nn.Dropout(rate=self.dropout)(x, deterministic=False)
        return nn.Dense(self.embed_dim, name="lin2")(x)


class ScaleShift(nn.Module):
    """FiLM head: time features -> (scale, shift) over out_dim channels."""

    out_dim: int

    @nn.compact
    def __call__(self, temb):
        x = jax.nn.silu(temb)
        x = nn.Dense(self.out_dim * 2,
                     kernel_init=nn.initializers.zeros, name="lin")(x)
        x = x.reshape(x.shape[:-1] + (self.out_dim, 2))
        return x[..., 0], x[..., 1]
