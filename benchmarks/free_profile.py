"""Subtractive decomposition of the fused CIFAR free-training step.

The free step measures ~18% MFU at B=1024 while the TS-Base distill
step reaches ~29% — this times the step's separable pieces (fused
forward loss / loss vjp / full step with AdamW; plus the same loss
through the flax path for reference) to locate the gap. Same
measurement rules as train_speed.py (second-pass timing, best-of-N).

Usage:  python benchmarks/free_profile.py [--batch 1024] [--drop 0.0]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from odevit_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import json
import time

import numpy as np


def _time(fn, *args, iters=6):
    """Tunnel-safe timing: device_get every output (a host fetch is a
    true completion barrier; per-array ready events can fire early under
    the tunneled runtime — see kernel_decomp._time). Timed fns return
    one scalar so the fetch is O(1)."""
    import jax
    out = jax.device_get(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    del out
    return round(best * 1e3, 3)   # ms


def profile(batch=1024, drop=0.0, iters=6):
    import jax
    import jax.numpy as jnp
    from odevit_tpu.data.pipeline import make_preprocess
    from odevit_tpu.models.vit_ode import ViTODE
    from odevit_tpu.train.fast_steps import (_fused_jit_kwargs,
                                             fast_free_forward,
                                             make_fast_free_train_step)
    from odevit_tpu.train.state import (all_trainable, create_train_state,
                                        make_optimizer)
    from odevit_tpu.utils.init_utils import init_on_cpu

    rng = np.random.default_rng(0)
    pixels_u8 = jax.device_put(rng.integers(
        0, 256, (batch, 32, 32, 3), dtype=np.uint8))
    labels = jax.device_put(rng.integers(0, 100, batch).astype(np.int32))
    pre = make_preprocess(None, dtype=jnp.bfloat16)
    m = ViTODE(img_size=32, patch_size=4, embed_dim=192, num_heads=3,
               mlp_ratio=4.0, num_classes=100, emulate_depth=12.0,
               time_interval=1.0, num_eval_steps=49, solver="euler",
               register_tokens=4, pos_embed_register_tokens=False,
               remat=False, dtype=jnp.bfloat16,
               attn_drop=drop, proj_drop=drop, mlp_drop=drop)
    params = init_on_cpu(m, jax.random.PRNGKey(0), pre(pixels_u8[:2]))[
        "params"]
    jit_kw = _fused_jit_kwargs(m)
    key = jax.random.PRNGKey(2)
    out = {"batch": batch, "drop": drop, "nfe": m.num_eval_steps - 1}

    def loss_fn(p, px, lab, rng_):
        # the returned loss already folds the JaSMin term (the second
        # element is the aux metrics dict)
        loss, _aux = fast_free_forward(
            m, p, pre(px), lab, jasmin_k=10,
            rng=rng_ if drop > 0 else None, remat=False)
        return loss

    fwd = jax.jit(loss_fn, **jit_kw)
    out["fwd_loss_ms"] = _time(fwd, params, pixels_u8, labels, key,
                               iters=iters)
    def leaf_sum(t):
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree.leaves(t))
    grad = jax.jit(lambda *a: leaf_sum(jax.grad(loss_fn)(*a)), **jit_kw)
    out["grad_ms"] = _time(grad, params, pixels_u8, labels, key,
                           iters=iters)
    out["bwd_only_ms"] = round(out["grad_ms"] - out["fwd_loss_ms"], 2)

    tx = make_optimizer(1e-4, trainable_mask=all_trainable(params))
    state = create_train_state(params, tx)
    step = make_fast_free_train_step(m, tx, jasmin_k=10,
                                     preprocess_fn=pre, donate=False,
                                     remat=False)
    data = {"pixel_values": pixels_u8, "labels": labels}

    def full(state):
        _, mm = step(state, data, jax.random.PRNGKey(2))
        return mm["loss"]
    out["full_step_ms"] = _time(full, state, iters=iters)
    out["optimizer_etc_ms"] = round(out["full_step_ms"] - out["grad_ms"],
                                    2)

    from odevit_tpu.analysis.flops import train_step_flops
    flops = train_step_flops(m, batch)
    tf = flops / (out["full_step_ms"] / 1e3) / 1e12
    out["tflops_per_sec"] = round(tf, 2)
    out["mfu"] = round(tf / 197.0, 4)
    out["images_per_sec"] = round(batch / (out["full_step_ms"] / 1e3), 1)
    # per-eval split: fwd kernels vs (bwd kernels + jas vjp)
    n_evals = m.num_eval_steps - 1
    out["per_eval_fwd_ms"] = round(out["fwd_loss_ms"] / n_evals, 3)
    out["per_eval_bwd_ms"] = round(out["bwd_only_ms"] / n_evals, 3)
    return out


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--drop", type=float, default=0.0)
    a = ap.parse_args()
    print(json.dumps(profile(batch=a.batch, drop=a.drop)))
