"""Fast inference path: ViTODE forward through the fused Pallas kernel.

The serving/bench engine. Differences from the flax forward:
  * the token axis is padded to the 128-lane boundary ONCE before
    integration and sliced once after — padded tokens are masked out of
    attention inside the kernel and evolve independently (provably
    harmless: attention rows are per-query, CenterNorm/MLP per-token);
  * the whole trajectory runs ``return_states=False`` (no [T,...] history
    in HBM) with the fused kernel as the vector field;
  * deterministic only (no dropout) and no attention-map outputs — the
    diagnostic surface stays on the flax path.

Works for the softmax-attention ParallelVectorField without time
conditioning; falls back to the XLA twin when ``use_pallas=False`` (same
padded layout, useful for A/B numerics).
"""

from __future__ import annotations

import jax.numpy as jnp

import jax

from odevit_tpu.core.adaptive import odeint_dopri5
from odevit_tpu.core.integrators import odeint
from odevit_tpu.kernels.vector_field import (TOKEN_PAD,
                                             fused_euler_chain_from_params,
                                             fused_euler_step_from_params,
                                             fused_rk4_step_from_params,
                                             fused_vf_from_params,
                                             fused_vf_l2_from_params)
from odevit_tpu.models.vector_field import drift_scaler
from odevit_tpu.ops.patch_embed import PatchEmbed


def _patch_embed_module(model):
    return PatchEmbed(
        img_size=model.img_size, patch_size=model.patch_size,
        in_chans=model.in_chans, embed_dim=model.embed_dim,
        add_distillation_token=model.add_distillation_token,
        register_tokens=model.register_tokens,
        pos_embed_register_tokens=model.pos_embed_register_tokens,
        dtype=model.dtype)


def serving_vmem_plan(model):
    """(compiler_options_dict, vmem_budget | None) a serving jit over
    ``fast_forward`` should use for this model's shape.

    Big shapes (ViT-Base 224px: the reference's FLOPs-notebook model)
    are tile-starved under the stock 16MB scoped limit (bb=1); raising
    the limit per ``fwd_vmem_plan`` unlocks bb=4. CIFAR-class shapes
    return ``({}, None)`` — no special options, identical tiles. The
    ``extra_states`` term matches the solver route fast_forward picks
    (fused euler/chain keep one extra state copy live; the rk4
    stage-advance kernel two)."""
    if hasattr(model, "learn_ivp"):           # ViTMacaron: own planner
        return {}, None
    from odevit_tpu.kernels.vector_field import fwd_vmem_plan
    pe = _patch_embed_module(model)
    n = pe.seq_len
    extra = {"euler": 1, "rk4": 2}.get(model.solver, 0)
    kib, budget = fwd_vmem_plan(n, model.embed_dim,
                                int(model.embed_dim * model.mlp_ratio),
                                model.num_heads, extra_states=extra)
    if kib is None:
        return {}, None
    return {"xla_tpu_scoped_vmem_limit_kib": kib}, budget


def fast_forward(model, params, images, *, block_b: int = 16,
                 use_pallas: bool = True, t_grid=None, vmem_budget=None):
    """logits = head(odeint(fused_vf, patch_embed(images)))[CLS].

    Args:
      model: a ViTODE or ViTMacaron instance (config carrier).
      params: its params pytree.
      images: [B, H, W, C] preprocessed floats.
      vmem_budget: tile-chooser budget override when the enclosing jit
        raises the scoped-VMEM limit (see ``serving_vmem_plan``).
    Returns {"logits": [B, num_classes]}.
    """
    if hasattr(model, "learn_ivp"):           # ViTMacaron
        return fast_forward_macaron(model, params, images,
                                    block_b=block_b, use_pallas=use_pallas,
                                    t_grid=t_grid)
    assert not model.time_conditioning, "autonomous field only"

    pe = _patch_embed_module(model)
    tokens = pe.apply({"params": params["patch_embed"]}, images)
    b, n, d = tokens.shape

    n_pad = -(-n // TOKEN_PAD) * TOKEN_PAD
    if n_pad != n:
        tokens = jnp.pad(tokens, ((0, 0), (0, n_pad - n), (0, 0)))

    scaler = drift_scaler(model.emulate_depth, model.time_interval)
    # grid statically on host: uniformity decides the fused-Euler route,
    # which must be a trace-time (not traced) decision
    import numpy as np
    if t_grid is None:
        ts = np.linspace(0.0, model.time_interval, model.num_eval_steps)
    else:
        ts = np.asarray(t_grid)

    uniform = (len(ts) < 3
               or bool(np.allclose(np.diff(ts), ts[1] - ts[0])))
    if model.l2_attention:
        vf_apply = fused_vf_l2_from_params
    else:
        vf_apply = fused_vf_from_params

    if model.solver == "dopri5":
        # adaptive inference: error-controlled NFE instead of a fixed grid
        def f(t, y):
            return vf_apply(
                y, params["vf"], num_heads=model.num_heads, scaler=scaler,
                block_b=block_b, use_pallas=use_pallas, n_real=n,
                vmem_budget=vmem_budget)

        states, _ = odeint_dopri5(f, tokens,
                                  jnp.asarray([ts[0], ts[-1]]),
                                  rtol=getattr(model, "solver_rtol", 1e-5),
                                  atol=getattr(model, "solver_atol", 1e-6))
        y_final = states[-1]
    elif (model.solver == "euler" and use_pallas and uniform
          and not model.l2_attention):
        # fused Euler: the y + dt*f(y) update happens inside the kernel.
        # Chaining several steps per kernel launch (the state's HBM
        # round trip amortizes over the chain) MEASURES SLOWER than the
        # per-step fused kernel on v5e — 22.2k vs 24.2k img/s at the
        # CIFAR headline shape (B=2048) and 1,526 vs 1,559 at 224px/768d
        # serving: the chain's serial inner loop costs more pipelining
        # than the round trip it saves. Per-step is the default; set
        # ODEVIT_EULER_CHAIN=<c> to opt in where a shape disagrees.
        import os as _os
        dt = float(ts[1] - ts[0])
        n_steps = len(ts) - 1
        chain = int(_os.environ.get("ODEVIT_EULER_CHAIN", "1"))
        chain = chain if chain > 1 and n_steps % chain == 0 else 1

        if chain > 1:
            def step(y, _):
                return fused_euler_chain_from_params(
                    y, params["vf"], num_heads=model.num_heads,
                    scaler=scaler, dt=dt, chain=chain, block_b=block_b,
                    n_real=n, vmem_budget=vmem_budget), None

            y_final, _ = jax.lax.scan(step, tokens, None,
                                      length=n_steps // chain)
        else:
            def step(y, _):
                return fused_euler_step_from_params(
                    y, params["vf"], num_heads=model.num_heads,
                    scaler=scaler, dt=dt, block_b=block_b, n_real=n,
                    vmem_budget=vmem_budget), None

            y_final, _ = jax.lax.scan(step, tokens, None, length=n_steps)
    elif (model.solver == "rk4" and use_pallas and uniform
          and not model.l2_attention):
        # fused rk4 (Kutta 3/8): every stage advance happens inside the
        # kernel; the k_i slopes never round-trip HBM
        dt = float(ts[1] - ts[0])

        def step(y, _):
            return fused_rk4_step_from_params(
                y, params["vf"], num_heads=model.num_heads, scaler=scaler,
                dt=dt, block_b=block_b, n_real=n,
                vmem_budget=vmem_budget), None

        y_final, _ = jax.lax.scan(step, tokens, None, length=len(ts) - 1)
    else:
        def f(t, y):
            return vf_apply(
                y, params["vf"], num_heads=model.num_heads, scaler=scaler,
                block_b=block_b, use_pallas=use_pallas, n_real=n,
                vmem_budget=vmem_budget)

        y_final, _ = odeint(f, tokens, ts, method=model.solver,
                            return_states=False)

    cls_final = y_final[:, 0].astype(jnp.float32)
    logits = cls_final @ params["head"]["kernel"] + params["head"]["bias"]
    out = {"logits": logits}
    if model.add_distillation_token and "dist_head" in params:
        out["logits_dist"] = (y_final[:, 1].astype(jnp.float32)
                              @ params["dist_head"]["kernel"]
                              + params["dist_head"]["bias"])
    return out


def _layer_norm(x, scale, bias, eps=1e-6):
    mu = jnp.mean(x, -1, keepdims=True)
    c = x - mu
    var = jnp.mean(c * c, -1, keepdims=True)
    return c * jax.lax.rsqrt(var + eps) * scale + bias


def fast_forward_macaron(model, params, images, *, block_b: int = 16,
                         use_pallas: bool = True, t_grid=None,
                         differentiable: bool = False):
    """ViTMacaron inference through the fused Macaron kernel
    (kernels/macaron.py). The embed (Dense patchify + optional learned
    IVP + pos) and head (LayerNorm + Dense) replicate the flax model's
    inline math; the integration loop runs the fused kernel.

    ``differentiable=True`` (the training step) keeps plain f-eval
    integration through ``fused_macaron`` (which carries the native
    backward); the default serving path takes the fused Euler /
    Kutta-3/8 stage-advance routes, which are forward-only."""
    from odevit_tpu.kernels.macaron import (
        fused_macaron_euler_step_from_params, fused_macaron_from_params,
        fused_macaron_rk4_step_from_params)
    from odevit_tpu.ops.patch_embed import patchify

    import numpy as np

    dtype = model.dtype or images.dtype
    d = model.embed_dim
    patches = patchify(images.astype(dtype), model.patch_size)
    x = patches @ params["patch_proj"]["kernel"].astype(dtype) \
        + params["patch_proj"]["bias"]
    b = x.shape[0]

    cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (b, 1, d))
    if model.learn_ivp:
        ivp = jax.lax.conv_general_dilated(
            images.astype(dtype), params["init_ivp"]["kernel"].astype(dtype),
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ivp = ivp + params["init_ivp"]["bias"]
        ivp = jax.nn.gelu(ivp, approximate=False)
        ivp = jnp.mean(ivp, axis=(1, 2))
        ivp = jnp.concatenate([cls, ivp[:, None, :]], axis=-1)
        cls = jax.nn.gelu(
            ivp @ params["ivp_projector"]["kernel"].astype(dtype)
            + params["ivp_projector"]["bias"], approximate=False)

    parts = [cls]
    if model.add_distillation_token:
        parts.append(jnp.broadcast_to(params["dist_token"].astype(dtype),
                                      (b, 1, d)))
    parts.append(x)
    tokens = jnp.concatenate(parts, axis=1)
    tokens = tokens + params["pos_embed"].astype(dtype)
    n = tokens.shape[1]

    n_pad = -(-n // TOKEN_PAD) * TOKEN_PAD
    if n_pad != n:
        tokens = jnp.pad(tokens, ((0, 0), (0, n_pad - n), (0, 0)))

    scaler = drift_scaler(model.emulate_depth, model.time_interval)
    ts = (np.linspace(0.0, model.time_interval, model.num_eval_steps)
          if t_grid is None else np.asarray(t_grid))
    uniform = (len(ts) < 3
               or bool(np.allclose(np.diff(ts), ts[1] - ts[0])))

    if (model.solver == "euler" and use_pallas and uniform
            and not differentiable):
        # fused Euler: y + dt*f(y) inside the kernel — one HBM state
        # round trip per evaluation, no XLA elementwise pass
        dt = float(ts[1] - ts[0])

        def step(y, _):
            return fused_macaron_euler_step_from_params(
                y, params["vf"], num_heads=model.num_heads, scaler=scaler,
                dt=dt, block_b=block_b, n_real=n), None

        y_final, _ = jax.lax.scan(step, tokens, None, length=len(ts) - 1)
    elif (model.solver == "rk4" and use_pallas and uniform
          and not differentiable):
        # fused rk4 (Kutta 3/8): stage advances inside the kernel; the
        # k_i slopes never round-trip HBM. Macaron's default solver.
        dt = float(ts[1] - ts[0])

        def step(y, _):
            return fused_macaron_rk4_step_from_params(
                y, params["vf"], num_heads=model.num_heads, scaler=scaler,
                dt=dt, block_b=block_b, n_real=n), None

        y_final, _ = jax.lax.scan(step, tokens, None, length=len(ts) - 1)
    else:
        def f(t, y):
            return fused_macaron_from_params(
                y, params["vf"], num_heads=model.num_heads, scaler=scaler,
                block_b=block_b, use_pallas=use_pallas, n_real=n)

        y_final, _ = odeint(f, tokens, ts, method=model.solver,
                            return_states=False)

    cls_final = _layer_norm(y_final[:, 0].astype(jnp.float32),
                            params["norm_head"]["scale"],
                            params["norm_head"]["bias"])
    logits = cls_final @ params["head"]["kernel"] + params["head"]["bias"]
    out = {"logits": logits}
    if model.add_distillation_token and "dist_head" in params:
        df = _layer_norm(y_final[:, 1].astype(jnp.float32),
                         params["norm_dist"]["scale"],
                         params["norm_dist"]["bias"])
        out["logits_dist"] = (df @ params["dist_head"]["kernel"]
                              + params["dist_head"]["bias"])
    return out
