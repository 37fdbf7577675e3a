"""FLOPs / params / latency profiling.

Replaces the reference's thop-based notebook profiling
(evaluate_performance_memory.ipynb cells 6-10: ODE-ViT ~5.7 vs DINO
teacher ~16.9 G-scale FLOPs) with XLA's own cost analysis, plus a
jax.profiler trace helper for Perfetto.
"""

from __future__ import annotations

import time
from typing import Any, Dict

import jax


def count_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def xla_cost_analysis(fn, *args) -> Dict[str, Any]:
    """Compile ``fn`` and return XLA's cost analysis (flops, bytes
    accessed, ...)."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):     # older jax returns one dict per device
        ca = ca[0]
    return dict(ca or {})


def flops_estimate(fn, *args) -> float:
    return float(xla_cost_analysis(fn, *args).get("flops", float("nan")))


def measure_latency(fn, *args, iters: int = 20, warmup: int = 2
                    ) -> Dict[str, float]:
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "iters": iters}


def trace(fn, *args, log_dir: str = "/tmp/jax-trace"):
    """One profiled execution; open the result in Perfetto."""
    with jax.profiler.trace(log_dir):
        jax.block_until_ready(fn(*args))
    return log_dir
