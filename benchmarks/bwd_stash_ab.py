"""A/B: recomputing backward vs residual-stashing backward (VERDICT r4
item 4) at TS-Base shapes.

The native backward kernels recompute the forward's qkv and MLP-hidden
matmuls in VMEM (~4x model-FLOPs executed per step while MFU counts 3x).
The stash arm's forward writes qkv [B*n_pad, 3D] and pre-GELU h1
[B*n_pad, dh] to HBM as extra vjp residuals and the backward skips both
recompute matmuls — trading ~2*(3d+dh)*N bytes/eval of HBM traffic for
(6d^2 + 2*d*dh) FLOPs/row of recompute.

Measurement discipline (NOTES_ROUND3): kernel A/Bs decide on ALTERNATING
same-window runs of the full train step; the arms differ only in the
stash flag. Default shape = the split-study arm (TS-Base distill, B=64,
mlp_ratio 4, euler x37).

Usage: python -m benchmarks.bwd_stash_ab [--batch 64] [--rounds 5]
       [--mlp-ratio 4.0] [--cached] [--free]
       (--free measures the CIFAR free-training step at B=1024 instead)
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


def build_distill_step(batch, mlp_ratio, cached, stash):
    import jax
    import jax.numpy as jnp
    from odevit_tpu.data.pipeline import make_preprocess
    from odevit_tpu.models.vit_ode import ViTODE
    from odevit_tpu.teacher.vit import ViTTeacher
    from odevit_tpu.train.fast_steps import make_fast_distill_train_step
    from odevit_tpu.train.state import (all_trainable, create_train_state,
                                        make_optimizer)
    from odevit_tpu.utils.init_utils import init_on_cpu

    rng = np.random.default_rng(0)
    data = {"pixel_values": jax.device_put(rng.integers(
                0, 256, (batch, 224, 224, 3), dtype=np.uint8)),
            "labels": jax.device_put(rng.integers(0, 100, batch)
                                     .astype(np.int32))}
    pre = make_preprocess(None, dtype=jnp.bfloat16)
    student = ViTODE(img_size=224, patch_size=16, embed_dim=768,
                     num_heads=12, mlp_ratio=mlp_ratio, num_classes=100,
                     emulate_depth=12.0, time_interval=1.0,
                     num_eval_steps=37, solver="euler",
                     register_tokens=0, remat=True, dtype=jnp.bfloat16)
    teacher = ViTTeacher(num_classes=100, dtype=jnp.bfloat16)
    sp = init_on_cpu(student, jax.random.PRNGKey(0),
                     pre(data["pixel_values"][:2]))["params"]
    tp = init_on_cpu(teacher, jax.random.PRNGKey(1),
                     pre(data["pixel_values"][:2]))["params"]
    tx = make_optimizer(1e-4, trainable_mask=all_trainable(sp))
    state = create_train_state(sp, tx)
    kw = {"remat": None}
    tpack = tp
    if cached:
        from odevit_tpu.train.teacher_cache import build_teacher_cache
        tpack = build_teacher_cache(teacher, tp,
                                    np.asarray(data["pixel_values"]),
                                    preprocess=pre, batch_size=batch)
        data = dict(data, index=jax.device_put(
            np.arange(batch, dtype=np.int32)))
        kw["teacher_cache"] = True
    step = make_fast_distill_train_step(
        student, teacher, tx, lambda_param=0.5, jasmin_k=2,
        mse_full_path=True, use_distillation=True, preprocess_fn=pre,
        donate=False, stash=stash, **kw)
    from odevit_tpu.analysis.flops import distill_step_flops
    flops = distill_step_flops(student, None if cached else teacher, batch)

    def run(st, dat):
        new_state, mm = step(st, tpack, dat, jax.random.PRNGKey(2), True)
        return new_state, mm

    return run, state, data, flops


def build_free_step(batch, stash):
    import jax
    import jax.numpy as jnp
    from odevit_tpu.data.pipeline import make_preprocess
    from odevit_tpu.models.vit_ode import ViTODE
    from odevit_tpu.train.fast_steps import make_fast_free_train_step
    from odevit_tpu.train.state import (all_trainable, create_train_state,
                                        make_optimizer)
    from odevit_tpu.utils.init_utils import init_on_cpu

    rng = np.random.default_rng(0)
    data = {"pixel_values": jax.device_put(rng.integers(
                0, 256, (batch, 32, 32, 3), dtype=np.uint8)),
            "labels": jax.device_put(rng.integers(0, 100, batch)
                                     .astype(np.int32))}
    pre = make_preprocess(None, dtype=jnp.bfloat16)
    model = ViTODE(img_size=32, patch_size=4, embed_dim=192, num_heads=3,
                   mlp_ratio=4.0, num_classes=100, emulate_depth=12.0,
                   time_interval=1.0, num_eval_steps=13, solver="rk4",
                   register_tokens=4, remat=False, dtype=jnp.bfloat16)
    params = init_on_cpu(model, jax.random.PRNGKey(0),
                         pre(data["pixel_values"][:2]))["params"]
    tx = make_optimizer(1e-4, trainable_mask=all_trainable(params))
    state = create_train_state(params, tx)
    step = make_fast_free_train_step(model, tx, jasmin_k=10,
                                     preprocess_fn=pre, donate=False,
                                     stash=stash)
    from odevit_tpu.analysis.flops import train_step_flops
    flops = train_step_flops(model, batch)

    def run(st, dat):
        return step(st, dat, jax.random.PRNGKey(2))

    return run, state, data, flops


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--mlp-ratio", type=float, default=4.0)
    ap.add_argument("--cached", action="store_true")
    ap.add_argument("--free", action="store_true",
                    help="measure the CIFAR free step (B defaults 1024)")
    a = ap.parse_args()
    if a.free and a.batch == 64:
        a.batch = 1024

    import jax

    arms = {}
    for name, stash in (("recompute", False), ("stash", True)):
        t0 = time.perf_counter()
        if a.free:
            run, state, data, flops = build_free_step(a.batch, stash)
        else:
            run, state, data, flops = build_distill_step(
                a.batch, a.mlp_ratio, a.cached, stash)
        _, mm = run(state, data)
        jax.device_get(mm["loss"])
        arms[name] = {"run": run, "state": state, "data": data,
                      "flops": flops,
                      "compile_s": round(time.perf_counter() - t0, 1)}
        print(f"# {name}: compiled+first-step in "
              f"{arms[name]['compile_s']}s", flush=True)

    times = {"recompute": [], "stash": []}
    for _ in range(a.rounds):
        for name in ("recompute", "stash"):    # alternate same-window
            arm = arms[name]
            t0 = time.perf_counter()
            _, mm = arm["run"](arm["state"], arm["data"])
            jax.device_get(mm["loss"])
            times[name].append(time.perf_counter() - t0)

    from odevit_tpu.analysis.flops import mfu
    out = {"batch": a.batch, "free": a.free, "mlp_ratio": a.mlp_ratio,
           "cached": a.cached, "rounds": a.rounds}
    for name in ("recompute", "stash"):
        best = min(times[name])
        out[name] = {
            "best_step_ms": round(best * 1e3, 1),
            "images_per_sec": round(a.batch / best, 1),
            "all_ms": [round(t * 1e3, 1) for t in times[name]],
            **mfu(arms[name]["flops"], best)}
    out["stash_speedup"] = round(
        min(times["recompute"]) / min(times["stash"]), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
