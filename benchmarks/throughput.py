"""Throughput sweep harness: images/sec/chip across model configs, batch
sizes, solvers, dtypes, and forward paths (flax-XLA vs fused-Pallas).

Usage:  python benchmarks/throughput.py [--quick]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from odevit_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import argparse
import json
import time

import numpy as np


def measure(model, params, images, forward, iters=20):
    """Tunnel-safe: keep and block on EVERY output — under the tunneled
    runtime, blocking only the last result has been observed to return
    before earlier executions complete (bench.py measured 47M img/s that
    way). A final device_get is the true completion barrier."""
    import jax
    jax.device_get(forward(params, images))
    t0 = time.perf_counter()
    outs = [forward(params, images) for _ in range(iters)]
    jax.block_until_ready(outs)
    jax.device_get(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    return images.shape[0] / dt, dt


def run(configs):
    import jax
    import jax.numpy as jnp
    from odevit_tpu.models.vit_ode import ViTODE
    from odevit_tpu.models.fast_forward import fast_forward
    from odevit_tpu.data.pipeline import make_preprocess
    from odevit_tpu.utils.init_utils import init_on_cpu
    from odevit_tpu.core.integrators import nfe

    rng = np.random.default_rng(0)
    for cfg in configs:
        model = ViTODE(img_size=cfg["img"], patch_size=cfg["patch"],
                       embed_dim=cfg["dim"], num_heads=cfg["heads"],
                       mlp_ratio=cfg.get("mlp_ratio", 4.0), num_classes=100,
                       emulate_depth=12.0, time_interval=1.0,
                       num_eval_steps=cfg["steps"], solver=cfg["solver"],
                       register_tokens=cfg.get("registers", 4),
                       pos_embed_register_tokens=False, remat=False,
                       dtype=jnp.bfloat16)
        pre = make_preprocess(None, dtype=jnp.bfloat16)
        images = jax.device_put(rng.integers(
            0, 256, (cfg["batch"], cfg["img"], cfg["img"], 3),
            dtype=np.uint8))
        params = init_on_cpu(model, jax.random.PRNGKey(0),
                             pre(images[:2]))["params"]

        paths = {"xla": jax.jit(lambda p, im: model.apply(
            {"params": p}, pre(im))["logits"])}
        if not model.l2_attention:
            from odevit_tpu.models.fast_forward import serving_vmem_plan
            opts, budget = serving_vmem_plan(model)
            paths["pallas"] = jax.jit(
                lambda p, im: fast_forward(
                    model, p, pre(im), block_b=8,
                    vmem_budget=budget)["logits"],
                compiler_options=opts or None)

        for path, fwd in paths.items():
            ips, dt = measure(model, params, images, fwd)
            print(json.dumps({
                "config": cfg, "path": path,
                "images_per_sec": round(ips, 1),
                "step_ms": round(dt * 1e3, 3),
                "nfe": nfe(model.solver, model.num_eval_steps),
            }), flush=True)


QUICK = [
    dict(img=32, patch=4, dim=192, heads=3, steps=13, solver="rk4",
         batch=1024),
]
FULL = QUICK + [
    dict(img=32, patch=4, dim=192, heads=3, steps=49, solver="euler",
         batch=1024),
    dict(img=32, patch=4, dim=384, heads=6, steps=13, solver="rk4",
         batch=512),
    dict(img=224, patch=16, dim=768, heads=12, steps=36, solver="euler",
         batch=64, mlp_ratio=1.0, registers=10),
]

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    run(QUICK if args.quick else FULL)
