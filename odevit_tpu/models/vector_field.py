"""ODE vector fields: the single transformer block integrated over time.

``ParallelVectorField`` is the primary ODE-ViT drift (parity:
ParallelAttentionMLP + ViT_ODEFunc,
/root/reference/models/ode_transformer_gpt.py:240-330):
``dx/dt = (MLP(CN(x)) + Attn(CN(x))) * scaler`` — parallel sublayers,
pre-CenterNorm, no residual (the solver provides it), where
``scaler = emulate_depth`` when integrating over [0, 1].

``MacaronVectorField`` is the sequential macaron drift (parity:
models/macaron.py:74-150): half-FFN -> attention -> half-FFN with a
learnable res_scale, LayerNorms, and a shared FFN for both half steps.

Both return ``(dx, attn)`` where ``attn`` is the per-head attention map
(the Macaron reference discards maps; we return them anyway so diagnostics
work uniformly — unused outputs are DCE'd by XLA).

Optional real time conditioning (``time_conditioning=True``): FiLM
scale/shift derived from a sinusoidal time embedding modulate each
normalized sublayer input. Initialized to identity (zero-init FiLM head),
so a time-conditioned model starts exactly at the autonomous field.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from odevit_tpu.ops.attention import L2SelfAttention, SoftmaxSelfAttention
from odevit_tpu.ops.center_norm import CenterNorm
from odevit_tpu.ops.mlp import MacaronFFN, Mlp
from odevit_tpu.models.time_embed import ScaleShift, TimeEmbedding


def drift_scaler(emulate_depth: float, time_interval: float) -> float:
    """emulate_depth when integrating over [0,1], else 1.0 (reference
    rule, ode_transformer_gpt.py:312-315)."""
    return float(emulate_depth) if time_interval == 1.0 else 1.0


class ParallelVectorField(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    mlp_drop: float = 0.0
    emulate_depth: float = 12.0
    time_interval: float = 12.0
    l2_attention: bool = False
    time_conditioning: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, t, *, deterministic: bool = True):
        norm_attn = CenterNorm(self.dim, dtype=self.dtype, name="norm_attn")
        norm_mlp = CenterNorm(self.dim, dtype=self.dtype, name="norm_mlp")
        attn_cls = L2SelfAttention if self.l2_attention else SoftmaxSelfAttention
        attn = attn_cls(dim=self.dim, num_heads=self.num_heads,
                        attn_drop=self.attn_drop, proj_drop=self.proj_drop,
                        dtype=self.dtype, name="attn")
        mlp = Mlp(dim=self.dim, hidden_dim=int(self.dim * self.mlp_ratio),
                  drop=self.mlp_drop, dtype=self.dtype, name="mlp")

        xa = norm_attn(x)
        xm = norm_mlp(x)
        if self.time_conditioning:
            temb = TimeEmbedding(sinusoidal_dim=64, embed_dim=self.dim,
                                 name="time_embed")(
                jnp.asarray(t)[None], deterministic=deterministic)[0]
            sa, ba = ScaleShift(self.dim, name="film_attn")(temb)
            sm, bm = ScaleShift(self.dim, name="film_mlp")(temb)
            xa = xa * (1.0 + sa) + ba
            xm = xm * (1.0 + sm) + bm

        g, attn_maps = attn(xa, deterministic=deterministic)
        f = mlp(xm, deterministic=deterministic)
        scaler = drift_scaler(self.emulate_depth, self.time_interval)
        return (f + g) * scaler, attn_maps


class MacaronVectorField(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    mlp_drop: float = 0.0
    emulate_depth: float = 12.0
    time_interval: float = 12.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, t, *, deterministic: bool = True):
        hidden = int(self.dim * self.mlp_ratio)
        ffn = MacaronFFN(dim=self.dim, hidden_dim=hidden, drop=self.mlp_drop,
                         dtype=self.dtype, name="ffn")
        attn = SoftmaxSelfAttention(dim=self.dim, num_heads=self.num_heads,
                                    attn_drop=self.attn_drop,
                                    proj_drop=self.proj_drop, use_bias=True,
                                    dtype=self.dtype, spectral_init=False,
                                    name="attn")
        res_scale = self.param("res_scale", nn.initializers.ones, (1,))

        x1 = x + 0.5 * res_scale * ffn(
            nn.LayerNorm(name="norm1")(x), deterministic=deterministic)
        delta2, attn_maps = attn(nn.LayerNorm(name="norm2")(x1),
                                 deterministic=deterministic)
        x2 = x1 + res_scale * delta2
        x3 = x2 + 0.5 * res_scale * ffn(
            nn.LayerNorm(name="norm3")(x2), deterministic=deterministic)
        scaler = drift_scaler(self.emulate_depth, self.time_interval)
        return x3 * scaler, attn_maps
