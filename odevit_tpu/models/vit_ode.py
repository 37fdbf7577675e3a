"""ViTODE: the continuous-depth Vision Transformer (flagship model).

Patch embed (+CLS, register tokens, learned pos-embed) -> fixed-step ODE
integration of a single parallel attention+MLP vector field -> linear head
over the final CLS state. Parity target: ViTNeuralODE,
/root/reference/models/ode_transformer_gpt.py:338-645, with these
deliberate TPU-first deviations (all documented where they happen):

* the solver is a ``lax.scan`` with per-step remat instead of an unrolled
  torchdiffeq loop storing every activation;
* attention maps are *returned through the scan* (and JaSMin is folded to
  one scalar per evaluation inside it) instead of a mutable Python list
  side channel;
* the control-point indices are computed statically at trace time;
* the stability bounds are opt-in (``output_stability_bounds``) rather
  than recomputed on every forward (torch.svd per step in the reference);
  the analytic-bound helper lives here as :func:`analytic_bound_from_variables`
  because it reads weights, not activations.

Forward flags, output-dict keys, and loss semantics otherwise mirror the
reference exactly so the training recipes transfer.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from odevit_tpu.losses.bounds import (analytic_upper_bound,
                                      finite_difference_upper_bound)
from odevit_tpu.losses.classification import cross_entropy
from odevit_tpu.losses.control_points import (VIT_LAYER_DISPLACEMENTS,
                                              proportional_control_points)
from odevit_tpu.losses.jasmin import jasmin_map_loss, jasmin_trajectory_window
from odevit_tpu.models.ode_block import ODEBlock
from odevit_tpu.models.vector_field import ParallelVectorField
from odevit_tpu.ops.init import spectral_xavier_normal
from odevit_tpu.ops.patch_embed import PatchEmbed


class ViTODE(nn.Module):
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
    num_eval_steps: int = 24
    solver: str = "rk4"
    # dopri5 fast-path error control (fast_forward); ignored by the
    # fixed-grid euler/rk4 solvers
    solver_rtol: float = 1e-5
    solver_atol: float = 1e-6
    add_distillation_token: bool = False
    l2_attention: bool = False
    register_tokens: int = 4
    pos_embed_register_tokens: bool = False
    time_conditioning: bool = False
    remat: bool = True
    dtype: Any = None
    # extra (ignored) reference config keys accepted for config parity
    outher_embedding_dimension: int = 768

    def make_time_grid(self):
        return jnp.linspace(0.0, self.time_interval, self.num_eval_steps)

    @nn.compact
    def __call__(
        self,
        pixel_values,                      # [B, H, W, C] (NHWC)
        labels=None,                       # [B] int labels
        *,
        output_hidden_states: bool = False,
        output_control_points: bool = False,
        output_attentions: bool = False,
        output_attention_trajectory: bool = False,
        output_stability_bounds: bool = False,
        t_grid=None,
        temperature: float = 30.0,
        jasmin_k: int = 10,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        patch_embed = PatchEmbed(
            img_size=self.img_size, patch_size=self.patch_size,
            in_chans=self.in_chans, embed_dim=self.embed_dim,
            add_distillation_token=self.add_distillation_token,
            register_tokens=self.register_tokens,
            pos_embed_register_tokens=self.pos_embed_register_tokens,
            dtype=self.dtype, name="patch_embed")
        vf = ParallelVectorField(
            dim=self.embed_dim, num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio, attn_drop=self.attn_drop,
            proj_drop=self.proj_drop, mlp_drop=self.mlp_drop,
            emulate_depth=self.emulate_depth,
            time_interval=self.time_interval,
            l2_attention=self.l2_attention,
            time_conditioning=self.time_conditioning,
            dtype=self.dtype, name="vf")
        ode = ODEBlock(vf=vf, method=self.solver, remat=self.remat,
                       name="ode_block")

        tokens = patch_embed(pixel_values, deterministic=deterministic)
        ts = self.make_time_grid() if t_grid is None else jnp.asarray(t_grid)
        num_eval_steps = int(ts.shape[0])

        want_jasmin = output_attentions
        want_traj = output_attention_trajectory
        need_states = (output_hidden_states or output_control_points
                       or output_stability_bounds)

        eval_aux_fn = None
        if want_jasmin or want_traj:
            def eval_aux_fn(attn):
                aux = {}
                if want_jasmin:
                    aux["jasmin"] = jasmin_map_loss(attn, k=jasmin_k)
                if want_traj:
                    aux["attn"] = attn
                return aux

        # JaSMin scores only the last int(0.85 T) evaluations
        # (ode_transformer_gpt.py:615): when nothing else needs per-eval
        # aux, skip the reduction for the leading steps entirely.
        tail_steps = None
        if want_jasmin and not want_traj:
            from odevit_tpu.core.integrators import num_stages
            stages = num_stages(self.solver)
            window = max(1, min(int(0.85 * num_eval_steps),
                                (num_eval_steps - 1) * stages))
            tail_steps = -(-window // stages)

        states, eval_aux, last_attn = ode(
            tokens, ts, deterministic=deterministic,
            eval_aux_fn=eval_aux_fn, collect_states=need_states,
            carry_attention=output_attentions,
            eval_aux_tail_steps=tail_steps)

        final = states[-1] if need_states else states
        cls_final = final[:, 0]
        head_init = spectral_xavier_normal()
        logits = nn.Dense(self.num_classes, kernel_init=head_init,
                          name="head")(cls_final.astype(jnp.float32))

        out: Dict[str, Any] = {"logits": logits}

        r = self.register_tokens

        def strip_registers(maps):
            return maps[..., :maps.shape[-2] - r, :maps.shape[-1] - r] \
                if r > 0 else maps

        if output_attention_trajectory:
            traj = eval_aux["attn"]
            e = traj.shape[0] * traj.shape[1]
            traj = traj.reshape((e,) + traj.shape[2:])  # flat eval order
            out["attention_trajectory"] = strip_registers(traj)

        if output_attentions:
            out["attentions"] = strip_registers(last_attn)
            if r > 0:
                out["attentions_register_tokens"] = \
                    last_attn[:, :, last_attn.shape[2] - r:, :]
            out["jasmin_loss"] = jasmin_trajectory_window(
                eval_aux["jasmin"], num_eval_steps)

        if self.add_distillation_token:
            logits_dist = nn.Dense(self.num_classes, kernel_init=head_init,
                                   name="dist_head")(
                final[:, 1].astype(jnp.float32))
            out["logits_dist"] = logits_dist

        if labels is not None:
            out["loss"] = cross_entropy(logits, labels, label_smoothing=0.05)

        if output_hidden_states:
            out["states"] = states

        if output_control_points:
            idx = proportional_control_points(
                num_eval_steps, temperature,
                displacements=VIT_LAYER_DISPLACEMENTS, clamp_last=True)
            pts = states[np.asarray(idx)]
            out["control_points"] = (pts[:, :, :pts.shape[2] - r]
                                     if r > 0 else pts)

        if output_stability_bounds:
            out["finite_difference_upper_bound"] = \
                finite_difference_upper_bound(
                    states, L=0.5, N=1.0 / self.num_eval_steps)

        return out

    # --- convenience configs -------------------------------------------

    @classmethod
    def tiny_cifar(cls, num_classes=10, **kw):
        """~0.5M free-training CIFAR config (README.md:57 row)."""
        kw.setdefault("solver", "rk4")
        return cls(img_size=32, patch_size=4, embed_dim=192, num_heads=3,
                   mlp_ratio=4.0, num_classes=num_classes, emulate_depth=12,
                   time_interval=1.0, num_eval_steps=12, register_tokens=4,
                   **kw)

    @classmethod
    def base_224(cls, num_classes=100, **kw):
        """TS-Base distillation config (experiment_classification_edo_
        distillation.yaml student inputs)."""
        kw.setdefault("solver", "euler")
        return cls(img_size=224, patch_size=16, embed_dim=768, num_heads=12,
                   mlp_ratio=1.0, num_classes=num_classes, emulate_depth=12,
                   time_interval=1.0, num_eval_steps=36,
                   register_tokens=10, pos_embed_register_tokens=False, **kw)


def analytic_bound_from_variables(variables, *, embed_dim, num_eval_steps,
                                  l2_attention=False, R=10, L=0.5):
    """Analytic stability bound from a ViTODE variables pytree.

    Replaces the reference's in-forward torch.svd
    (ode_transformer_gpt.py:515-527, :581-583) with an on-demand helper:
    call it at logging cadence, not per step. Supports both attention
    variants (the reference's version breaks for L2 attention).
    """
    attn_params = variables["params"]["vf"]["attn"]
    if l2_attention:
        w_q = attn_params["q_kernel"].T
        w_k = attn_params["k_kernel"].T
        w_v = attn_params["v_kernel"].T
    else:
        qkv = attn_params["qkv_kernel"]          # [D, 3D]
        w_q = qkv[:, :embed_dim].T               # [D, D] (out, in) layout
        w_k = qkv[:, embed_dim:2 * embed_dim].T
        w_v = qkv[:, 2 * embed_dim:].T
    return analytic_upper_bound(w_q, w_k, w_v, R=R, L=L,
                                num_eval_steps=num_eval_steps)
