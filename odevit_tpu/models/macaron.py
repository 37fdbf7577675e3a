"""ViTMacaron: macaron-style continuous-depth ViT (alternative model).

Half-FFN -> attention -> half-FFN vector field with a learnable residual
scale, LayerNorms instead of CenterNorm, optional learned initial-value
problem (a small conv net that seeds the CLS token), and an optional
distillation token. Parity target: /root/reference/models/macaron.py:157-352.

Differences from ViTODE worth knowing: no register tokens, no spectral
init (small trunc-normal FFN init instead), CE without label smoothing,
a LayerNorm before the head, control points NOT last-clamped, default
control-point temperature 100.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from odevit_tpu.losses.classification import cross_entropy
from odevit_tpu.losses.control_points import (MACARON_LAYER_DISPLACEMENTS,
                                              proportional_control_points)
from odevit_tpu.models.ode_block import ODEBlock
from odevit_tpu.models.vector_field import MacaronVectorField
from odevit_tpu.ops.patch_embed import patchify


class ViTMacaron(nn.Module):
    img_size: int = 32
    patch_size: int = 4
    in_chans: int = 3
    num_classes: int = 100
    embed_dim: int = 192
    num_heads: int = 3
    mlp_ratio: float = 4.0
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    mlp_drop: float = 0.0
    emulate_depth: float = 12.0
    time_interval: float = 12.0
    num_eval_steps: int = 48
    solver: str = "rk4"
    add_distillation_token: bool = False
    learn_ivp: bool = False
    remat: bool = True
    dtype: Any = None
    # accepted-for-parity config keys (unused, as in the reference default path)
    predict_outher_space: bool = False
    outher_embedding_dimension: int = 768

    def make_time_grid(self):
        return jnp.linspace(0.0, self.time_interval, self.num_eval_steps)

    @nn.compact
    def __call__(
        self,
        pixel_values,                     # [B, H, W, C]
        labels=None,
        *,
        output_hidden_states: bool = False,
        output_control_points: bool = False,
        t_grid=None,
        temperature: float = 100.0,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        d = self.embed_dim
        trunc02 = nn.initializers.truncated_normal(stddev=0.02)
        dtype = self.dtype or pixel_values.dtype

        # -- embed: conv patchify + (optionally learned-IVP) CLS + pos --
        patches = patchify(pixel_values.astype(dtype), self.patch_size)
        proj = nn.Dense(d, name="patch_proj")
        x = proj(patches)
        b, n, _ = x.shape

        cls_token = self.param("cls_token", trunc02, (1, 1, d))
        cls = jnp.broadcast_to(cls_token.astype(dtype), (b, 1, d))
        if self.learn_ivp:
            ivp = nn.Conv(d, (5, 5), padding="VALID", name="init_ivp")(
                pixel_values.astype(dtype))
            ivp = jax.nn.gelu(ivp, approximate=False)
            ivp = jnp.mean(ivp, axis=(1, 2))          # adaptive avg pool -> [B, D]
            ivp = jnp.concatenate([cls, ivp[:, None, :]], axis=-1)
            cls = jax.nn.gelu(
                nn.Dense(d, name="ivp_projector")(ivp), approximate=False)

        extra = 1
        parts = [cls]
        if self.add_distillation_token:
            extra = 2
            dist_token = self.param("dist_token", trunc02, (1, 1, d))
            parts.append(jnp.broadcast_to(dist_token.astype(dtype), (b, 1, d)))
        parts.append(x)
        tokens = jnp.concatenate(parts, axis=1)

        pos_embed = self.param("pos_embed", trunc02, (1, extra + n, d))
        tokens = tokens + pos_embed.astype(dtype)

        # -- integrate --
        vf = MacaronVectorField(
            dim=d, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            attn_drop=self.attn_drop, proj_drop=self.proj_drop,
            mlp_drop=self.mlp_drop, emulate_depth=self.emulate_depth,
            time_interval=self.time_interval, dtype=self.dtype, name="vf")
        ode = ODEBlock(vf=vf, method=self.solver, remat=self.remat,
                       name="ode_block")

        ts = self.make_time_grid() if t_grid is None else jnp.asarray(t_grid)
        num_eval_steps = int(ts.shape[0])
        need_states = output_hidden_states or output_control_points
        states, _, _ = ode(tokens, ts, deterministic=deterministic,
                           collect_states=need_states)
        final = states[-1] if need_states else states

        cls_final = nn.LayerNorm(name="norm_head")(
            final[:, 0].astype(jnp.float32))
        logits = nn.Dense(self.num_classes,
                          bias_init=nn.initializers.zeros, name="head")(
            cls_final)
        out: Dict[str, Any] = {"logits": logits}

        if self.add_distillation_token:
            dist_final = nn.LayerNorm(name="norm_dist")(
                final[:, 1].astype(jnp.float32))
            out["logits_dist"] = nn.Dense(self.num_classes,
                                          name="dist_head")(dist_final)

        if labels is not None:
            out["loss"] = cross_entropy(logits, labels)

        if output_hidden_states:
            out["states"] = states

        if output_control_points:
            idx = proportional_control_points(
                num_eval_steps, temperature,
                displacements=MACARON_LAYER_DISPLACEMENTS, clamp_last=False)
            out["control_points"] = states[np.asarray(idx)]

        return out
