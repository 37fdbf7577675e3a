"""Per-evaluation decomposition of the fused vector-field kernels.

distill_profile.py showed the TS-Base *forward* scan is the slow half
of the training step (3.7 ms/eval vs the backward's ~4 ms at 3x the
flops), but its one-eval timings are useless over the tunnel (the
~28 ms dispatch floor swamps a 4 ms kernel). This times lax.scan chains
of K evaluations inside one jit — exactly how training runs them — and
reports per-eval milliseconds for each kernel variant and batch tile,
so the VPU-vs-MXU question (is JaSMin's in-kernel top-k or the softmax
the forward's cost center?) gets an empirical answer.

Usage: python benchmarks/kernel_decomp.py [--batch 64] [--evals 16]
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
    """Tunnel-safe timing: block_until_ready on a small per-call output
    has been observed to return BEFORE the execution completes under the
    tunneled runtime (scan chains of Pallas evals timed at 0.003 ms/eval
    — physically impossible). Host-fetch every output instead: the
    device_get of a scalar is a true completion barrier, and its
    transfer cost is noise at these step times."""
    import jax
    out = jax.device_get(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    del out
    return best * 1e3


def decompose(batch=64, evals=16, iters=5, *, img_size=224, patch=16,
              embed_dim=768, heads=12, mlp_ratio=1.0, registers=10,
              jas_k=2, only=None, no_grad=False):
    import jax
    import jax.numpy as jnp
    from odevit_tpu.kernels.vector_field import (auto_block_b,
                                                 fused_vf_from_params,
                                                 fused_vf_attn_from_params,
                                                 fused_vf_jasmin_from_params)
    from odevit_tpu.losses.jasmin import jasmin_from_stats
    from odevit_tpu.models.vector_field import drift_scaler
    from odevit_tpu.train.fast_steps import _fused_jit_kwargs

    d = embed_dim
    dh = int(d * mlp_ratio)
    n = (img_size // patch) ** 2 + 1 + registers
    scaler = drift_scaler(12.0, 1.0)
    dt = 1.0 / 35.0
    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.standard_normal((batch, n, d)) * 0.02,
                     jnp.bfloat16)

    # f32 masters, as training holds them (the kernel wrappers cast to
    # the compute dtype; the custom vjp returns f32 cotangents)
    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.02, jnp.float32)

    vf = {"norm_attn": {"scale": jnp.ones((d,), jnp.float32),
                        "bias": jnp.zeros((d,), jnp.float32)},
          "norm_mlp": {"scale": jnp.ones((d,), jnp.float32),
                       "bias": jnp.zeros((d,), jnp.float32)},
          "attn": {"qkv_kernel": mk((d, 3 * d)),
                   "out_kernel": mk((d, d))},
          "mlp": {"fc1_kernel": mk((d, dh)), "fc2_kernel": mk((dh, d))}}

    from odevit_tpu.kernels.vector_field import bwd_compiler_options
    out = {"batch": batch, "evals": evals, "n": n, "d": d, "dh": dh,
           "jas_k": jas_k,
           "bb_fwd_plain": auto_block_b(batch, n, d, dh, heads),
           "bb_fwd_jas": auto_block_b(batch, n, d, dh, heads,
                                      emit_jas=True),
           "bb_fwd_attn": auto_block_b(batch, n, d, dh, heads,
                                       emit_attn=True),
           "bb_bwd_jas": auto_block_b(batch, n, d, dh, heads,
                                      emit_jas=True, bwd=True),
           "bb_bwd_attn": auto_block_b(batch, n, d, dh, heads,
                                       emit_attn=True, bwd=True)}
    jit_kw = {"compiler_options": bwd_compiler_options(
        n, d, dh, heads, emit_attn=True, emit_jas=True)} \
        if jax.default_backend() == "tpu" else {}

    # per-eval flops (fwd): qkv/out/mlp matmuls + 2 NxN attention matmuls
    fwd_flops = batch * (2 * n * d * (3 * d + d + 2 * dh)
                         + 4 * n * n * d)
    out["fwd_gflops_per_eval"] = round(fwd_flops / 1e9, 2)

    def scan_of(eval_fn, length, with_loss=False):
        def f(vf, y):
            def body(y, _):
                r = eval_fn(vf, y)
                dx, aux = (r, jnp.zeros(())) if not with_loss else r
                return (y + dt * dx).astype(y.dtype), aux
            yT, aux = jax.lax.scan(body, y, None, length=length)
            return jnp.sum(yT.astype(jnp.float32)) + jnp.sum(aux)
        return f

    variants = {
        "plain": (lambda vf, y: fused_vf_from_params(
            y, vf, num_heads=heads, scaler=scaler, n_real=n), False),
        "jas": (lambda vf, y: (lambda dx, st: (
            dx, jasmin_from_stats(st, jas_k)))(
                *fused_vf_jasmin_from_params(
                    y, vf, num_heads=heads, scaler=scaler, jas_k=jas_k,
                    n_real=n)), True),
        "attn": (lambda vf, y: (lambda dx, a: (
            dx, jnp.sum(a.astype(jnp.float32))))(
                *fused_vf_attn_from_params(
                    y, vf, num_heads=heads, scaler=scaler, n_real=n)),
            True),
        "xla_twin": (lambda vf, y: fused_vf_from_params(
            y, vf, num_heads=heads, scaler=scaler, n_real=n,
            use_pallas=False), False),
    }

    # two-point slope: per-eval ms = (t(2K) - t(K)) / K, which cancels
    # the tunnel's per-dispatch floor and any fixed program overhead
    def slope_ms(make_fn, transform=None):
        times = {}
        for length in (evals, 2 * evals):
            f = make_fn(length)
            if transform is not None:
                f = transform(f)
            times[length] = _time(jax.jit(f, **jit_kw), vf, y0,
                                  iters=iters)
        return (times[2 * evals] - times[evals]) / evals

    if only:
        wanted = set(only.split(","))
        variants = {k: v for k, v in variants.items() if k in wanted}
        grads = tuple(v for v in ("plain", "jas") if v in wanted)
    else:
        grads = ("plain", "jas")
    if no_grad:
        grads = ()

    for name, (eval_fn, with_loss) in variants.items():
        try:
            ms = slope_ms(lambda L, e=eval_fn, w=with_loss:
                          scan_of(e, L, with_loss=w))
            out[f"fwd_{name}_ms_per_eval"] = round(ms, 3)
            out[f"fwd_{name}_tflops"] = round(fwd_flops / ms / 1e9, 1)
        except Exception as e:                             # noqa: BLE001
            out[f"fwd_{name}_ms_per_eval"] = f"error: {str(e)[:120]}"

    # backward: grad of the scans (fwd + bwd per eval)
    for name in grads:
        eval_fn, with_loss = variants[name]
        try:
            ms = slope_ms(lambda L, e=eval_fn, w=with_loss:
                          scan_of(e, L, with_loss=w), transform=jax.grad)
            out[f"grad_{name}_ms_per_eval"] = round(ms, 3)
        except Exception as e:                             # noqa: BLE001
            out[f"grad_{name}_ms_per_eval"] = f"error: {str(e)[:120]}"
    return out


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--evals", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--mlp-ratio", type=float, default=1.0)
    ap.add_argument("--jas-k", type=int, default=2)
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--patch", type=int, default=16)
    ap.add_argument("--embed-dim", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--registers", type=int, default=10)
    ap.add_argument("--no-grad", action="store_true")
    ap.add_argument("--only", type=str, default=None,
                    help="comma list of variants (plain,jas,attn,xla_twin)")
    args = ap.parse_args()
    print(json.dumps(decompose(args.batch, args.evals, args.iters,
                               mlp_ratio=args.mlp_ratio,
                               jas_k=args.jas_k, img_size=args.img_size,
                               patch=args.patch, embed_dim=args.embed_dim,
                               heads=args.heads, registers=args.registers,
                               only=args.only, no_grad=args.no_grad)))
