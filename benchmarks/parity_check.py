"""Compiled-kernel parity gate, runnable standalone (one JSON line out).

The Mosaic-compiled kernels produce the headline bench number; this
asserts on-chip agreement with the XLA path (interpret-mode tests can't
catch TPU-lowering bugs). Three gates:
  * forward logits, bf16 (rel L2 < 2e-2 — MXU quantization bound),
  * backward parameter cotangents, bf16 (< 3e-2), with a per-tensor
    worst-offender breakdown,
  * backward cotangents at f32 + matmul_precision=highest (< 1e-4 —
    separates dtype noise from kernel-math error; measured 2.2e-6).

Extracted from bench.py (round 3) so the bench orchestrator can run it
in an isolated interpreter under its global wall-clock budget.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from odevit_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import numpy as np


def rel_l2(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9))


def run_parity(mode: str = "all"):
    """mode: 'all' | 'bf16' (fwd + bwd bf16 gates only) | 'f32' (the
    f32+highest pair only). Split so a cold-compile-cache bench run can
    land the load-bearing bf16 gates inside its budget and add the f32
    gate in a later section."""
    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree
    from jax.tree_util import keystr, tree_flatten_with_path

    from odevit_tpu.data.pipeline import make_preprocess
    from odevit_tpu.models.fast_forward import fast_forward
    from odevit_tpu.models.vit_ode import ViTODE
    from odevit_tpu.train.fast_steps import (_fused_jit_kwargs,
                                             fast_free_forward)
    from odevit_tpu.utils.init_utils import init_on_cpu

    def make_model(dtype):
        return ViTODE(img_size=32, patch_size=4, embed_dim=192, num_heads=3,
                      mlp_ratio=4.0, num_classes=100, emulate_depth=12.0,
                      time_interval=1.0, num_eval_steps=13, solver="rk4",
                      register_tokens=4, pos_embed_register_tokens=False,
                      remat=False, dtype=dtype)

    model = make_model(jnp.bfloat16)
    preprocess = make_preprocess(image_size=None, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    small = jax.device_put(rng.integers(0, 256, (256, 32, 32, 3),
                                        dtype=np.uint8))
    params = init_on_cpu(model, jax.random.PRNGKey(0),
                         small[:2].astype(jnp.uint8))["params"]

    labels = jnp.asarray(np.random.default_rng(1).integers(0, 100, 256))

    def grad_pair(m_tr, px, p):
        lbl = labels[:px.shape[0]]

        def loss_fused(q):
            loss, _ = fast_free_forward(m_tr, q, px, lbl, jasmin_k=10)
            return loss

        def loss_flax(q):
            out = m_tr.apply({"params": q}, px, lbl,
                             output_attentions=True, jasmin_k=10)
            return out["loss"] + out["jasmin_loss"]

        gf = jax.device_get(
            jax.jit(jax.grad(loss_fused), **_fused_jit_kwargs())(p))
        gx = jax.device_get(jax.jit(jax.grad(loss_flax))(p))
        return gf, gx

    out, ok = {}, True
    if mode in ("all", "bf16"):
        def make_fwd(m, use_pallas):
            return jax.jit(lambda p, im: fast_forward(
                m, p, preprocess(im), block_b=16,
                use_pallas=use_pallas)["logits"])

        err_fwd = rel_l2(
            jax.device_get(make_fwd(model, True)(params, small)),
            jax.device_get(make_fwd(model, False)(params, small)))

        g_fused, g_flax = grad_pair(model, preprocess(small), params)
        err_bwd = rel_l2(ravel_pytree(g_fused)[0], ravel_pytree(g_flax)[0])

        # per-tensor cotangent breakdown: is the bf16 discrepancy diffuse
        # accumulation noise, or concentrated in a single cotangent?
        lf, _ = tree_flatten_with_path(g_fused)
        lx, _ = tree_flatten_with_path(g_flax)
        per = sorted(((rel_l2(a, b), keystr(ka))
                      for (ka, a), (_, b) in zip(lf, lx)
                      if np.linalg.norm(np.asarray(b, np.float32)) > 1e-6),
                     reverse=True)
        ok = ok and err_fwd < 2e-2 and err_bwd < 3e-2
        out.update(fwd_rel_l2=round(err_fwd, 5),
                   bwd_rel_l2=round(err_bwd, 5),
                   bwd_worst_tensors={k: round(e, 5) for e, k in per[:5]})

    if mode in ("all", "f32"):
        # f32-mode grad parity under matmul precision "highest": the
        # default decomposes f32 matmuls into bf16 MXU passes whose
        # rounding differs between the two paths' dot orderings (measured
        # 2.1e-2 default vs 2.2e-6 highest, CPU-interpret 1.8e-7) — so
        # the bf16 figure above is quantified as pure MXU quantization,
        # not kernel math. b=64: the f32 trajectories + attention maps
        # exceed 16G HBM at b=256.
        pre32 = make_preprocess(image_size=None, dtype=jnp.float32)
        jax.config.update("jax_default_matmul_precision", "highest")
        try:
            gf32, gx32 = grad_pair(make_model(jnp.float32),
                                   pre32(small[:64]), params)
        finally:
            jax.config.update("jax_default_matmul_precision", None)
        err_f32 = rel_l2(ravel_pytree(gf32)[0], ravel_pytree(gx32)[0])
        ok = ok and err_f32 < 1e-4
        out["bwd_rel_l2_f32_highest"] = float(f"{err_f32:.3g}")

    return {"ok": bool(ok), **out}


if __name__ == "__main__":
    import json
    mode = "all"
    if "--bf16-only" in sys.argv:
        mode = "bf16"
    elif "--f32-only" in sys.argv:
        mode = "f32"
    print(json.dumps(run_parity(mode)))
