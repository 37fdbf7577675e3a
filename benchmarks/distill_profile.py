"""Subtractive decomposition of the fused TS-Base distillation step.

Where do the step's milliseconds go?  The Perfetto route needs proto
tooling the image lacks, so this times the step's separable pieces
directly (teacher fwd / student fused fwd loss / loss vjp / full step
with optimizer; plus single-eval fwd and bwd kernel latencies) and
prints a JSON breakdown.  All measurement rules from train_speed.py's
module docstring apply (second-pass timing, host-derived keys).

Usage:  python benchmarks/distill_profile.py [--batch 64] [--drop 0.0]
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


def _time(fn, *args, iters=5):
    """Tunnel-safe timing: device_get every output (a host fetch is a
    true completion barrier; per-array ready events can fire early under
    the tunneled runtime — see kernel_decomp._time). Fetch cost is noise
    at the >=10ms granularity profiled here."""
    import jax
    out = jax.device_get(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    del out
    return best * 1e3   # ms


def profile(batch=64, drop=0.0, iters=5, *, img_size=224, patch=16,
            embed_dim=768, heads=12, evals=36, registers=10,
            mlp_ratio=1.0):
    import jax
    import jax.numpy as jnp
    from odevit_tpu.data.pipeline import make_preprocess
    from odevit_tpu.models.vit_ode import ViTODE
    from odevit_tpu.teacher.vit import ViTTeacher
    from odevit_tpu.train.fast_steps import (_fused_jit_kwargs,
                                             fast_distill_forward,
                                             make_fast_distill_train_step)
    from odevit_tpu.train.state import (all_trainable, create_train_state,
                                        make_optimizer)
    from odevit_tpu.utils.init_utils import init_on_cpu

    rng = np.random.default_rng(0)
    pixels_u8 = jax.device_put(rng.integers(
        0, 256, (batch, img_size, img_size, 3), dtype=np.uint8))
    labels = jax.device_put(rng.integers(0, 100, batch).astype(np.int32))
    pre = make_preprocess(None, dtype=jnp.bfloat16)
    student = ViTODE(img_size=img_size, patch_size=patch,
                     embed_dim=embed_dim,
                     num_heads=heads, mlp_ratio=mlp_ratio, num_classes=100,
                     emulate_depth=12.0, time_interval=1.0,
                     num_eval_steps=evals, solver="euler",
                     register_tokens=registers,
                     remat=False, dtype=jnp.bfloat16,
                     attn_drop=drop, proj_drop=drop, mlp_drop=drop)
    teacher = ViTTeacher(num_classes=100, dtype=jnp.bfloat16,
                         image_size=img_size, patch_size=patch,
                         hidden_size=embed_dim, num_heads=heads,
                         mlp_dim=4 * embed_dim, num_layers=12)
    sp = init_on_cpu(student, jax.random.PRNGKey(0), pre(pixels_u8[:2]))[
        "params"]
    tp = init_on_cpu(teacher, jax.random.PRNGKey(1), pre(pixels_u8[:2]))[
        "params"]
    jit_kw = _fused_jit_kwargs(student)
    out = {"batch": batch, "drop": drop, "mlp_ratio": mlp_ratio}

    # 1. teacher forward (hidden states + last attention), as the step
    #    runs it
    # every timed fn returns ONE f32 scalar: it forces the full
    # computation while keeping the _time device_get barrier O(1)
    # (teacher activations alone are ~240MB at B=64)
    def leaf_sum(t):
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree.leaves(t))

    def teacher_fwd(tp, px):
        return teacher.apply({"params": tp}, pre(px),
                             output_hidden_states=True,
                             output_attentions=True)
    t_fwd = jax.jit(lambda tp, px: leaf_sum(teacher_fwd(tp, px)))
    out["teacher_fwd_ms"] = _time(t_fwd, tp, pixels_u8, iters=iters)
    tout = jax.jit(teacher_fwd)(tp, pixels_u8)
    t_states = jax.lax.stop_gradient(jnp.stack(tout["hidden_states"][1:]))
    t_attn = jax.lax.stop_gradient(tout["attentions"][-1])

    # 2. student fused forward (loss only, no grad)
    key = jax.random.PRNGKey(2)

    # t_states is ~240MB at B=64: it MUST be a traced argument, not a
    # closed-over constant — jit bakes captured concrete arrays into the
    # serialized program, which blows the remote-compile body limit
    # (observed as HTTP 413 over the tunnel)
    def loss_fn(params, px, lab, rng, ts, ta):
        loss, aux = fast_distill_forward(
            student, params, pre(px), lab, ts, ta,
            jasmin_k=2, temperature=3.0, lambda_param=0.5,
            mse_full_path=True, use_distillation=True,
            rng=rng if drop > 0 else None, remat=False)
        return loss

    fwd = jax.jit(loss_fn, **jit_kw)
    out["student_fwd_loss_ms"] = _time(fwd, sp, pixels_u8, labels, key,
                                       t_states, t_attn, iters=iters)

    # 3. loss vjp (fwd + bwd, no optimizer)
    grad = jax.jit(lambda *a: leaf_sum(jax.grad(loss_fn)(*a)), **jit_kw)
    out["student_grad_ms"] = _time(grad, sp, pixels_u8, labels, key,
                                   t_states, t_attn, iters=iters)
    out["student_bwd_only_ms"] = round(
        out["student_grad_ms"] - out["student_fwd_loss_ms"], 2)

    # 4. full training step (teacher + grad + optimizer)
    tx = make_optimizer(1e-4, trainable_mask=all_trainable(sp))
    state = create_train_state(sp, tx)
    step = make_fast_distill_train_step(
        student, teacher, tx, lambda_param=0.5, jasmin_k=2,
        mse_full_path=True, use_distillation=True, preprocess_fn=pre,
        donate=False, remat=False)
    data = {"pixel_values": pixels_u8, "labels": labels}

    def full(state):
        s2, mm = step(state, tp, data, jax.random.PRNGKey(2), True)
        return mm["loss"]
    out["full_step_ms"] = _time(full, state, iters=iters)

    # 5. single fused vector-field eval: fwd kernel and its vjp
    from odevit_tpu.kernels.vector_field import fused_vf_from_params
    from odevit_tpu.models.vector_field import drift_scaler
    n_tok = (img_size // patch) ** 2 + 1 + registers
    y = jnp.asarray(rng.standard_normal(
        (batch, n_tok, embed_dim)), jnp.bfloat16)
    scaler = drift_scaler(12.0, 1.0)

    def one_eval(vf, y):
        return fused_vf_from_params(y, vf, num_heads=heads, scaler=scaler,
                                    n_real=n_tok)
    ev = jax.jit(lambda vf, y: leaf_sum(one_eval(vf, y)), **jit_kw)
    out["one_eval_fwd_ms"] = _time(ev, sp["vf"], y, iters=iters)

    def eval_loss(vf, y):
        return jnp.sum(one_eval(vf, y).astype(jnp.float32))
    evg = jax.jit(lambda vf, y: leaf_sum(jax.grad(eval_loss)(vf, y)),
                  **jit_kw)
    out["one_eval_grad_ms"] = _time(evg, sp["vf"], y, iters=iters)

    # bookkeeping: expected per-step composition
    n_evals = student.num_eval_steps - 1
    out["n_evals"] = n_evals
    out["evals_fwd_extrapolated_ms"] = round(
        out["one_eval_fwd_ms"] * n_evals, 1)
    out["evals_grad_extrapolated_ms"] = round(
        out["one_eval_grad_ms"] * n_evals, 1)
    from odevit_tpu.analysis.flops import distill_step_flops, mfu
    out.update(mfu(distill_step_flops(student, teacher, batch),
                   out["full_step_ms"] / 1e3))
    out["images_per_sec"] = round(batch / (out["full_step_ms"] / 1e3), 1)
    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 3)
    return out


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--drop", type=float, default=0.0)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--mlp-ratio", type=float, default=1.0)
    args = ap.parse_args()
    print(json.dumps(profile(args.batch, args.drop, args.iters,
                             mlp_ratio=args.mlp_ratio)))
