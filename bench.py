#!/usr/bin/env python
"""Benchmark: ODE-ViT CIFAR-100 forward throughput on one chip.

Measures the BASELINE.json headline metric — images/sec/chip for the
CIFAR-resolution ODE-ViT at NFE = 4*depth = 48 function evaluations
(rk4 over a 13-point grid), bf16 compute, device-side normalization
included (uint8 in, logits out). Model = the free-training CIFAR
architecture (embed 192, heads 3, patch 4, 32x32; README.md:57 row) with
100 classes. Target: >= 20_000 img/s/chip (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))


def _subproc_json(code, timeout=2400):
    """Run a python snippet in a FRESH interpreter and parse its last
    JSON stdout line. Under the tunneled TPU runtime, a client process
    can enter a state where every FRESH remote compile 500s while
    brand-new processes compile the same HLO fine (cache hits keep
    working either way) — so every bench section that may need a fresh
    compile runs isolated. The persistent compilation cache makes the
    per-process cost one interpreter startup, not a recompile."""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=timeout, cwd=_REPO)
    for line in reversed(r.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError((r.stdout + "\n" + r.stderr)[-400:])


def _retry(fn, attempts=3, sleep_s=20.0):
    """Retry a compile/run thunk: the tunneled TPU runtime's remote
    compile helper intermittently 500s (observed right after a VM boot);
    the same program compiles fine seconds later. Never let a transient
    helper crash zero out a bench path."""
    last = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:                            # noqa: BLE001
            last = e
            if "remote_compile" not in str(e) and "INTERNAL" not in str(e):
                raise
            if i + 1 < attempts:
                time.sleep(sleep_s)
    raise last


def main():
    import os
    import jax
    from odevit_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax.numpy as jnp

    from odevit_tpu.models.vit_ode import ViTODE
    from odevit_tpu.models.fast_forward import fast_forward
    from odevit_tpu.data.pipeline import make_preprocess
    from odevit_tpu.utils.init_utils import init_on_cpu
    from odevit_tpu.core.integrators import nfe

    def make_model(solver, steps):
        return ViTODE(img_size=32, patch_size=4, embed_dim=192, num_heads=3,
                      mlp_ratio=4.0, num_classes=100, emulate_depth=12.0,
                      time_interval=1.0, num_eval_steps=steps, solver=solver,
                      register_tokens=4, pos_embed_register_tokens=False,
                      remat=False, dtype=jnp.bfloat16)

    # NFE = 48 either way: rk4 over 13 grid points or euler over 49 (the
    # reference's CIFAR configs use euler; both are benched, best wins)
    models = {"rk4x13": make_model("rk4", 13),
              "eulerx49": make_model("euler", 49)}
    for m in models.values():
        assert nfe(m.solver, m.num_eval_steps) == 48
    model = models["rk4x13"]

    preprocess = make_preprocess(image_size=None, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    def make_fwd(model, use_pallas):
        def forward(params, images_u8):
            return fast_forward(model, params, preprocess(images_u8),
                                block_b=16, use_pallas=use_pallas)["logits"]
        return jax.jit(forward)

    big = jax.device_put(rng.integers(
        0, 256, (2048, 32, 32, 3), dtype=np.uint8))
    params = init_on_cpu(model, jax.random.PRNGKey(0), big[:2]
                         .astype(jnp.uint8))["params"]

    # The best (batch, path) combo shifts with compiler/runtime versions;
    # sweep a small grid and report the winner. Set ODEVIT_BENCH_PALLAS=0
    # to restrict to the XLA path (e.g. cold Pallas compile caches).
    paths = {"xla-rk4x13": make_fwd(models["rk4x13"], False)}
    if os.environ.get("ODEVIT_BENCH_PALLAS", "1") != "0":
        for mname, m in models.items():
            paths[f"pallas-{mname}"] = make_fwd(m, True)

    # --- compiled-kernel parity gate (VERDICT r1 item 3) ---------------
    # The Mosaic-compiled kernels are the thing producing the headline
    # number; assert on-chip agreement with the XLA path every bench run
    # (interpret-mode tests can't catch TPU-lowering bugs). bf16 compute:
    # gate on relative L2 over the logits and over the backward's
    # parameter cotangents.
    def rel_l2(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9))

    parity_ok, parity = False, {}
    try:
        small = big[:256]
        fwd_x = paths["xla-rk4x13"]
        fwd_p = make_fwd(models["rk4x13"], True)
        err_fwd = rel_l2(_retry(lambda: jax.device_get(fwd_p(params, small))),
                         jax.device_get(fwd_x(params, small)))

        # backward: CE-loss gradients through the fused kernel vjp vs the
        # flax/XLA path, at the training configuration (euler grid)
        from odevit_tpu.train.fast_steps import fast_free_forward
        from jax.flatten_util import ravel_pytree
        from odevit_tpu.train.fast_steps import _fused_jit_kwargs
        labels = jnp.asarray(
            np.random.default_rng(1).integers(0, 100, 256))

        def grad_pair(m_tr, px, p):
            lbl = labels[:px.shape[0]]

            def loss_fused(q):
                loss, _ = fast_free_forward(m_tr, q, px, lbl,
                                            jasmin_k=10)
                return loss

            def loss_flax(q):
                out = m_tr.apply({"params": q}, px, lbl,
                                 output_attentions=True, jasmin_k=10)
                return out["loss"] + out["jasmin_loss"]

            gf = _retry(lambda: jax.device_get(
                jax.jit(jax.grad(loss_fused), **_fused_jit_kwargs())(p)))
            gx = jax.device_get(jax.jit(jax.grad(loss_flax))(p))
            return gf, gx

        g_fused, g_flax = grad_pair(make_model("rk4", 13),
                                    preprocess(small), params)
        flat_f, _ = ravel_pytree(g_fused)
        flat_x, _ = ravel_pytree(g_flax)
        err_bwd = rel_l2(flat_f, flat_x)

        # per-tensor cotangent breakdown (VERDICT r2 "weak" 1): is the
        # bf16 discrepancy diffuse accumulation noise, or concentrated
        # in a single cotangent?
        from jax.tree_util import tree_flatten_with_path, keystr
        lf, _t = tree_flatten_with_path(g_fused)
        lx, _ = tree_flatten_with_path(g_flax)
        per = sorted(((rel_l2(a, b), keystr(ka))
                      for (ka, a), (_, b) in zip(lf, lx)
                      if np.linalg.norm(np.asarray(b, np.float32)) > 1e-6),
                     reverse=True)
        worst = {k: round(e, 5) for e, k in per[:5]}

        # f32-mode grad parity: the same comparison with f32 activations
        # on both paths — separates dtype noise from kernel-math error.
        # On TPU this is only meaningful under matmul precision
        # "highest": the default decomposes f32 matmuls into bf16 MXU
        # passes whose rounding differs between the two paths' dot
        # orderings (measured 2.1e-2 at default vs 2.2e-6 at highest,
        # CPU-interpret exact at 1.8e-7 — so the bf16-mode bwd_rel_l2
        # above is quantified as pure MXU quantization, not kernel
        # math). Tight gate.
        def make_model_f32(solver, steps):
            return ViTODE(img_size=32, patch_size=4, embed_dim=192,
                          num_heads=3, mlp_ratio=4.0, num_classes=100,
                          emulate_depth=12.0, time_interval=1.0,
                          num_eval_steps=steps, solver=solver,
                          register_tokens=4,
                          pos_embed_register_tokens=False,
                          remat=False, dtype=jnp.float32)

        pre32 = make_preprocess(image_size=None, dtype=jnp.float32)
        # b=64: the f32 pair is a NUMERICAL gate, and at b=256 the f32
        # trajectories + attention maps exceed the 16G HBM (measured)
        jax.config.update("jax_default_matmul_precision", "highest")
        try:
            gf32, gx32 = grad_pair(make_model_f32("rk4", 13),
                                   pre32(small[:64]), params)
        finally:
            jax.config.update("jax_default_matmul_precision", None)
        f32f, _ = ravel_pytree(gf32)
        f32x, _ = ravel_pytree(gx32)
        err_bwd_f32 = rel_l2(f32f, f32x)

        parity = {"fwd_rel_l2": round(err_fwd, 5),
                  "bwd_rel_l2": round(err_bwd, 5),
                  "bwd_rel_l2_f32_highest": float(f"{err_bwd_f32:.3g}"),
                  "bwd_worst_tensors": worst}
        parity_ok = (err_fwd < 2e-2 and err_bwd < 3e-2
                     and err_bwd_f32 < 1e-4)
    except Exception as e:                                # noqa: BLE001
        parity = {"error": str(e)[:200]}

    # --- in-kernel dropout semantics gate (VERDICT r2 item 5) ----------
    # pltpu-prng mask contract: the backward regenerates the forward's
    # masks bit-identically at a different batch tile; drop-rate stats in
    # tolerance; deterministic across calls. The driver-visible on-TPU
    # counterpart of the three CPU-skipped tests.
    dropout_parity = {}
    try:
        from benchmarks.tpu_dropout_check import run_checks
        r = _retry(run_checks)
        dropout_parity = {
            "ok": bool(r.get("ok", False)),
            **{k: v for k, v in r.items()
               if k not in ("ok",) and not isinstance(v, (list, dict))}}
        parity_ok = parity_ok and dropout_parity["ok"]
    except Exception as e:                                # noqa: BLE001
        dropout_parity = {"ok": False, "error": str(e)[:200]}
        parity_ok = False

    best = None
    combos = [(name, batch) for batch in (1024, 2048)
              for name in paths]
    for name, batch in combos:
        solver, steps = (("rk4", 13) if "rk4" in name else ("euler", 49))
        use_pallas = name.startswith("pallas")
        code = f"""
from odevit_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import json, time
import jax, jax.numpy as jnp, numpy as np
from odevit_tpu.models.vit_ode import ViTODE
from odevit_tpu.models.fast_forward import fast_forward
from odevit_tpu.data.pipeline import make_preprocess
from odevit_tpu.utils.init_utils import init_on_cpu
model = ViTODE(img_size=32, patch_size=4, embed_dim=192, num_heads=3,
               mlp_ratio=4.0, num_classes=100, emulate_depth=12.0,
               time_interval=1.0, num_eval_steps={steps},
               solver={solver!r}, register_tokens=4,
               pos_embed_register_tokens=False, remat=False,
               dtype=jnp.bfloat16)
preprocess = make_preprocess(image_size=None, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
images = jax.device_put(rng.integers(
    0, 256, ({batch}, 32, 32, 3), dtype=np.uint8))
params = init_on_cpu(model, jax.random.PRNGKey(0),
                     images[:2].astype(jnp.uint8))["params"]
def forward(params, images_u8):
    return fast_forward(model, params, preprocess(images_u8),
                        block_b=16, use_pallas={use_pallas})["logits"]
fwd = jax.jit(forward)
jax.block_until_ready(fwd(params, images))
iters = 30
t0 = time.perf_counter()
# keep and block on EVERY output: under the tunneled runtime, blocking
# only the last result has been observed to return before earlier
# executions complete (measured 47M img/s)
outs = [fwd(params, images) for _ in range(iters)]
jax.block_until_ready(outs)
dt = time.perf_counter() - t0
print(json.dumps({{"ips": {batch} * iters / dt,
                   "step_s": dt / iters}}))
"""
        try:
            r = _subproc_json(code)
        except Exception as e:                              # noqa: BLE001
            # a cold Pallas compile cache or runtime quirk must never
            # zero out the benchmark — fall through to other paths
            print(f"# bench path {name} b={batch} failed: "
                  f"{str(e)[:120]}", flush=True)
            continue
        if best is None or r["ips"] > best[0]:
            best = (r["ips"], batch, name, r["step_s"])

    # fused TRAINING throughput (full fwd+bwd+AdamW, CE+JaSMin, B=1024)
    # — the round-2 headline axis; details-only so the primary metric
    # stays comparable across rounds. train_matrix carries the full
    # variant ledger (free / drop / L2 / macaron / TS-Base, each with
    # achieved TFLOP/s + MFU) so every round's record is machine-
    # comparable (VERDICT r2 item 2).
    train = {}
    try:
        from benchmarks.train_speed import variant_matrix
        matrix = variant_matrix(budget_s=1500.0, isolate=True)
        free = matrix.get("free_b1024", {})
        train = {"train_images_per_sec": free.get("images_per_sec"),
                 "train_step_ms": free.get("step_ms"),
                 "train_tflops_per_sec": free.get("tflops_per_sec"),
                 "train_mfu": free.get("mfu"),
                 "train_matrix": matrix}
    except Exception as e:                                # noqa: BLE001
        train = {"train_error": str(e)[:160]}

    # ViT-Base-shape serving (the reference's FLOPs-notebook model,
    # evaluate_performance_memory.ipynb: ODE-ViT 224px euler; TS student
    # ratio-1 width) through the serving VMEM plan — the raised scoped
    # limit unlocks bb=8 tiles vs bb=1 at the stock 16MB limit.
    serve = {}
    try:
        r = _subproc_json("""
from odevit_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import json, time
import jax, jax.numpy as jnp, numpy as np
from odevit_tpu.models.vit_ode import ViTODE
from odevit_tpu.models.fast_forward import fast_forward, serving_vmem_plan
from odevit_tpu.data.pipeline import make_preprocess
from odevit_tpu.utils.init_utils import init_on_cpu
sm = ViTODE(img_size=224, patch_size=16, embed_dim=768, num_heads=12,
            mlp_ratio=1.0, num_classes=100, emulate_depth=12.0,
            time_interval=1.0, num_eval_steps=25, solver="euler",
            register_tokens=10, pos_embed_register_tokens=False,
            remat=False, dtype=jnp.bfloat16)
pre224 = make_preprocess(image_size=224, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
simg = jax.device_put(rng.integers(0, 256, (64, 224, 224, 3),
                                   dtype=np.uint8))
sparams = init_on_cpu(sm, jax.random.PRNGKey(0),
                      pre224(simg[:2]))["params"]
opts, budget = serving_vmem_plan(sm)
sfwd = jax.jit(lambda p, im: fast_forward(
    sm, p, pre224(im), vmem_budget=budget)["logits"],
    compiler_options=opts or None)
jax.block_until_ready(sfwd(sparams, simg))
best = 1e9
for _ in range(10):
    t0 = time.perf_counter()
    o = sfwd(sparams, simg)
    jax.block_until_ready(o)
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"ips": 64 / best, "ms": best * 1e3,
                  "kib": opts.get("xla_tpu_scoped_vmem_limit_kib")}))
""")
        serve = {"serve224_images_per_sec": round(r["ips"], 1),
                 "serve224_step_ms": round(r["ms"], 2),
                 "serve224_plan_kib": r["kib"]}
    except Exception as e:                                # noqa: BLE001
        serve = {"serve224_error": str(e)[:160]}

    ips, batch, path, step_s = best
    per_step_ms = step_s / (model.num_eval_steps - 1) * 1e3
    print(json.dumps({
        "metric": "images/sec/chip ODE-ViT CIFAR-100 fwd @ NFE=48 bf16",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / 20000.0, 4),
        "parity_ok": parity_ok,
        "details": {
            "parity": parity,
            "dropout_parity": dropout_parity,
            "batch": batch,
            "path": path,
            "per_rk_step_latency_ms": round(per_step_ms, 4),
            "nfe": 48,
            "device": str(jax.devices()[0]),
            **train,
            **serve,
        },
    }))


if __name__ == "__main__":
    main()
