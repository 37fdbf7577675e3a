"""Attention rollout and trajectory export.

Rollout (parity: attention_visualizations.ipynb cell 43): cumulative
``(A + I) / rowsum`` matmul across the evaluation sequence — for the
continuous model the "layers" are solver evaluations — yielding the CLS
row as a patch heatmap.
"""

from __future__ import annotations

import jax.numpy as jnp


def attention_rollout(attn_maps, head_reduce: str = "mean"):
    """attn_maps: [E, B, H, N, N] per-evaluation maps (registers already
    stripped). Returns rollout [B, N, N]."""
    maps = jnp.asarray(attn_maps, jnp.float32)
    if head_reduce == "mean":
        maps = jnp.mean(maps, axis=2)
    elif head_reduce == "max":
        maps = jnp.max(maps, axis=2)
    e, b, n, _ = maps.shape
    eye = jnp.eye(n)[None]
    result = jnp.broadcast_to(eye, (b, n, n))
    for i in range(e):
        a = maps[i] + eye
        a = a / jnp.sum(a, axis=-1, keepdims=True)
        result = jnp.einsum("bij,bjk->bik", a, result)
    return result


def cls_heatmap(rollout, grid_size: int):
    """CLS->patch row of a rollout as a [B, g, g] heat map."""
    heat = rollout[:, 0, 1:1 + grid_size * grid_size]
    heat = heat / (jnp.max(heat, axis=-1, keepdims=True) + 1e-12)
    return heat.reshape(-1, grid_size, grid_size)


def export_trajectory(model, variables, images, *, jasmin_k: int = 10,
                      temperature: float = 30.0):
    """Full diagnostic forward: states, per-eval attention trajectory,
    control points, bounds — as host numpy arrays (the analysis-notebook
    entry surface)."""
    import numpy as np
    import jax

    @jax.jit
    def run(params, images):
        return model.apply(
            {"params": params}, images,
            output_hidden_states=True, output_control_points=True,
            output_attentions=True, output_attention_trajectory=True,
            output_stability_bounds=True, jasmin_k=jasmin_k,
            temperature=temperature)

    out = run(variables["params"], images)
    return jax.tree_util.tree_map(np.asarray, out)
