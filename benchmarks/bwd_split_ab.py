"""A/B: combined bb=1 backward vs split bb=2 backward at TS-Base shapes.

VERDICT r3 item 4a. Measurement discipline (NOTES_ROUND3): kernel A/Bs
decide on ALTERNATING same-window runs of the GRAD program (the full
train step here — the arms differ only in the backward dispatch), never
on fwd-only or cross-session numbers. Arm A forces the combined kernel
by suppressing _split_tiles at trace time; arm B is the normal dispatch
(split at big-d shapes where the halves tile at bb>=2).

Usage: python -m benchmarks.bwd_split_ab [--batch 64] [--rounds 5]
       [--mlp-ratio 4.0] [--cached]
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


def build_step(batch, mlp_ratio, cached):
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
        donate=False, **kw)
    from odevit_tpu.analysis.flops import distill_step_flops
    flops = distill_step_flops(student, None if cached else teacher, batch)
    return step, state, tpack, data, flops


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--mlp-ratio", type=float, default=4.0)
    ap.add_argument("--cached", action="store_true")
    a = ap.parse_args()

    import jax
    from odevit_tpu.kernels import vector_field_bwd as VB

    arms = {}
    orig = VB._split_tiles
    # trace/compile arm A (combined) with split suppressed, then arm B
    # (normal dispatch); dispatch happens at trace time, so patching
    # only affects which program each arm compiles
    for name, patch in (("combined", lambda *q, **k: None),
                        ("split", orig)):
        VB._split_tiles = patch
        try:
            step, state, tpack, data, flops = build_step(
                a.batch, a.mlp_ratio, a.cached)
            t0 = time.perf_counter()
            st, mm = step(state, tpack, data, jax.random.PRNGKey(2), True)
            jax.device_get(mm["loss"])
            arms[name] = {"step": step, "state": state, "tpack": tpack,
                          "data": data, "flops": flops,
                          "compile_s": round(time.perf_counter() - t0, 1)}
        finally:
            VB._split_tiles = orig
        print(f"# {name}: compiled+first-step in "
              f"{arms[name]['compile_s']}s", flush=True)

    times = {"combined": [], "split": []}
    for _ in range(a.rounds):
        for name in ("combined", "split"):      # alternate same-window
            arm = arms[name]
            t0 = time.perf_counter()
            _, mm = arm["step"](arm["state"], arm["tpack"], arm["data"],
                                jax.random.PRNGKey(2), True)
            jax.device_get(mm["loss"])
            times[name].append(time.perf_counter() - t0)

    from odevit_tpu.analysis.flops import mfu
    out = {"batch": a.batch, "mlp_ratio": a.mlp_ratio,
           "cached": a.cached, "rounds": a.rounds}
    for name in ("combined", "split"):
        best = min(times[name])
        out[name] = {
            "best_step_ms": round(best * 1e3, 1),
            "images_per_sec": round(a.batch / best, 1),
            "all_ms": [round(t * 1e3, 1) for t in times[name]],
            **mfu(arms[name]["flops"], best)}
    out["split_speedup"] = round(
        min(times["combined"]) / min(times["split"]), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
