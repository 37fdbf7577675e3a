"""Feed-forward blocks for the ODE-ViT vector fields.

``Mlp`` is the bias-free GELU MLP of the primary vector field (parity:
/root/reference/models/ode_transformer_gpt.py:185-200 — Linear(no bias) ->
GELU -> Drop -> Linear(no bias) -> Drop, exact erf GELU as in torch's
default). ``MacaronFFN`` is the biased, small-init FFN shared by both half
steps of the Macaron vector field (parity: models/macaron.py:86-101).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from odevit_tpu.ops.init import spectral_xavier_normal


class Mlp(nn.Module):
    dim: int
    hidden_dim: int
    drop: float = 0.0
    dtype: jnp.dtype | None = None
    spectral_init: bool = True

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        init = spectral_xavier_normal() if self.spectral_init else nn.initializers.xavier_normal()
        w1 = self.param("fc1_kernel", init, (self.dim, self.hidden_dim))
        w2 = self.param("fc2_kernel", init, (self.hidden_dim, self.dim))
        dtype = self.dtype or x.dtype

        h = jnp.dot(x.astype(dtype), w1.astype(dtype),
                    preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h, approximate=False)
        if self.drop > 0.0 and not deterministic:
            h = nn.Dropout(rate=self.drop)(h, deterministic=False)
        out = jnp.dot(h.astype(dtype), w2.astype(dtype),
                      preferred_element_type=jnp.float32).astype(dtype)
        if self.drop > 0.0 and not deterministic:
            out = nn.Dropout(rate=self.drop)(out, deterministic=False)
        return out


class MacaronFFN(nn.Module):
    """dim -> hidden -> dim FFN with trunc-normal(1e-3) init, biased."""

    dim: int
    hidden_dim: int
    drop: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        small = nn.initializers.truncated_normal(stddev=1e-3)
        dtype = self.dtype or x.dtype
        h = nn.Dense(self.hidden_dim, kernel_init=small,
                     bias_init=nn.initializers.zeros, dtype=dtype,
                     name="fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        if self.drop > 0.0 and not deterministic:
            h = nn.Dropout(rate=self.drop)(h, deterministic=False)
        h = nn.Dense(self.dim, kernel_init=small,
                     bias_init=nn.initializers.zeros, dtype=dtype,
                     name="fc2")(h)
        if self.drop > 0.0 and not deterministic:
            h = nn.Dropout(rate=self.drop)(h, deterministic=False)
        return h
