"""Fused-kernel training steps (scaffolding for a native backward).

Runs each solver evaluation through the attention-emitting Pallas kernel
(fused_vf_attn) with JaSMin folded per evaluation, inside a remat'd
lax.scan; numerics match the flax step exactly (tested).

STATUS (measured, v5e, authoritative record in ARCHITECTURE.md): with
the native Pallas backward kernel (kernels/vector_field_bwd.py, all 9
cotangents parity-tested vs the XLA vjp) plus the JaSMin tail-split,
this fused step LEADS the flax path at production batch: 2,409 vs
2,028 img/s @ B=1024 rk4x13 CIFAR (re-measured round 2). At small
batch (B=256) the flax path can still win — the backward tile runs at
1/4 block to fit VMEM and remat forces forward-kernel stage recomputes.
Remaining levers: chunked-hidden backward (bigger tiles), euler-fused
training (fewer stage recomputes).

Constraints (asserted): softmax attention, no time conditioning, no
dropout (the kernel is deterministic).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from odevit_tpu.core.integrators import make_step
from odevit_tpu.kernels.vector_field import fused_vf_attn_from_params
from odevit_tpu.losses.classification import cross_entropy
from odevit_tpu.losses.jasmin import jasmin_map_loss, \
    jasmin_trajectory_window
from odevit_tpu.models.fast_forward import _patch_embed_module
from odevit_tpu.models.vector_field import drift_scaler
from odevit_tpu.train.steps import _accuracy, optax_global_norm


def fast_free_forward(model, params, pixels, labels, *, jasmin_k: int,
                      use_pallas: bool = True, block_b: int = 16):
    """CE + JaSMin forward through the fused kernel; returns (loss, aux)."""
    assert not model.l2_attention and not model.time_conditioning
    assert model.attn_drop == model.proj_drop == model.mlp_drop == 0.0, \
        "fused training path is deterministic (no dropout)"

    pe = _patch_embed_module(model)
    tokens = pe.apply({"params": params["patch_embed"]}, pixels)
    n = tokens.shape[1]
    scaler = drift_scaler(model.emulate_depth, model.time_interval)

    def f(t, y):
        dx, attn = fused_vf_attn_from_params(
            y, params["vf"], num_heads=model.num_heads, scaler=scaler,
            block_b=block_b, use_pallas=use_pallas, n_real=n)
        return dx, jasmin_map_loss(attn, k=jasmin_k)

    from odevit_tpu.core.integrators import num_stages
    from odevit_tpu.kernels.vector_field import fused_vf_from_params

    step = make_step(model.solver, has_aux=True)
    ts = np.linspace(0.0, model.time_interval, model.num_eval_steps)

    def f_plain(t, y):
        dx = fused_vf_from_params(
            y, params["vf"], num_heads=model.num_heads, scaler=scaler,
            block_b=block_b, use_pallas=use_pallas, n_real=n)
        return dx, jnp.zeros(())

    def body_of(fn):
        def body(y, t_dt):
            t, dt = t_dt
            y_next, jas_stages = step(fn, y, t, dt)
            return y_next, jas_stages
        if model.remat:
            body = jax.checkpoint(body, prevent_cse=False)
        return body

    # JaSMin scores only the last int(0.85 T) evaluations: run the head
    # of the trajectory without any map emission / reduction at all.
    stages = num_stages(model.solver)
    num_steps = model.num_eval_steps - 1
    window = max(1, min(int(0.85 * model.num_eval_steps),
                        num_steps * stages))
    tail = max(1, -(-window // stages))
    head = num_steps - tail

    ts_j = jnp.asarray(ts, jnp.float32)
    t_all, dt_all = ts_j[:-1], ts_j[1:] - ts_j[:-1]
    y_mid = tokens
    if head > 0:
        y_mid, _ = jax.lax.scan(body_of(f_plain), tokens,
                                (t_all[:head], dt_all[:head]))
    y_final, jas = jax.lax.scan(body_of(f), y_mid,
                                (t_all[head:], dt_all[head:]))

    cls_final = y_final[:, 0].astype(jnp.float32)
    logits = cls_final @ params["head"]["kernel"] + params["head"]["bias"]
    ce = cross_entropy(logits, labels, label_smoothing=0.05)
    jas_loss = jasmin_trajectory_window(jas, model.num_eval_steps)
    return ce + jas_loss, {"logits": logits, "ce": ce,
                           "jasmin_loss": jas_loss}


def make_fast_free_train_step(model, tx, *, jasmin_k: int = 10,
                              lr_schedule: Optional[Callable] = None,
                              preprocess_fn: Optional[Callable] = None,
                              use_pallas: bool = True,
                              block_b: int = 16, donate: bool = True):
    """Drop-in fused alternative to make_free_train_step (deterministic)."""

    def step(state, batch, rng):
        del rng                                    # deterministic path
        pixels = (preprocess_fn(batch["pixel_values"]) if preprocess_fn
                  else batch["pixel_values"])

        def loss_fn(params):
            return fast_free_forward(model, params, pixels,
                                     batch["labels"], jasmin_k=jasmin_k,
                                     use_pallas=use_pallas,
                                     block_b=block_b)

        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, tx)
        metrics = {"loss": loss, "jasmin_loss": aux["jasmin_loss"],
                   "acc": _accuracy(aux["logits"], batch["labels"]),
                   "grad_norm": optax_global_norm(grads)}
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
