"""Lyapunov-exponent extraction along ODE-ViT trajectories.

The reference ships only pickled results (lyapunov_results/*.pkl —
per-class lists of [pred_class, true_class, confidence, true_class,
lyapunov_exponent]); the producing notebook was stripped from the
snapshot. Re-derivation: the largest finite-time Lyapunov exponent is the
average exponential growth rate of an infinitesimal perturbation, obtained
by integrating the variational equation dv/dt = J_f(x) v alongside the
state (v propagated with jax.jvp — exact directional Jacobian, no O(D^2)
Jacobian materialization) with per-step Benettin renormalization.

TPU shape: one augmented lax.scan, everything batched over B.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from odevit_tpu.core.integrators import make_step


def max_lyapunov_exponent(f, x0, ts, *, v0=None, method: str = "euler",
                          key=None):
    """Largest finite-time Lyapunov exponent per batch element.

    Args:
      f: vector field f(t, x) -> dx with x [B, ...].
      x0: initial state [B, ...].
      ts: time grid [T].
      v0: initial perturbation (defaults to random normal, renormalized).
    Returns: lambda_max [B] — mean over steps of log(growth)/dt.
    """
    step = make_step(method, has_aux=False)

    def aug_f(t, state):
        x, v = state
        dx, dv = jax.jvp(lambda xx: f(t, xx), (x,), (v,))
        return (dx, dv)

    if v0 is None:
        key = key if key is not None else jax.random.PRNGKey(0)
        v0 = jax.random.normal(key, x0.shape, x0.dtype)

    batch = x0.shape[0]

    def norm(v):
        return jnp.sqrt(jnp.sum(v.reshape(batch, -1) ** 2, axis=-1))

    v0 = v0 / norm(v0).reshape((batch,) + (1,) * (x0.ndim - 1))

    def body(carry, t_dt):
        (x, v), log_acc = carry
        t, dt = t_dt
        (x1, v1), _ = step(aug_f, (x, v), t, dt)
        growth = norm(v1)
        v1 = v1 / growth.reshape((batch,) + (1,) * (x0.ndim - 1))
        return ((x1, v1), log_acc + jnp.log(growth + 1e-30)), None

    dts = ts[1:] - ts[:-1]
    ((_, _), log_sum), _ = jax.lax.scan(
        body, ((x0, v0), jnp.zeros(batch)), (ts[:-1], dts))
    total_time = ts[-1] - ts[0]
    return log_sum / total_time


def model_lyapunov_records(model, variables, images, labels, *,
                           key=None) -> Dict[int, List[list]]:
    """Per-class Lyapunov records in the reference artifact layout:
    {class_id: [[pred, true, confidence, true, lyapunov], ...]}."""
    patch_embed, vf = _standalone_modules(model)

    @jax.jit
    def run(params, images):
        out = model.apply({"params": params}, images)
        logits = out["logits"]
        probs = jax.nn.softmax(logits, axis=-1)

        tokens = patch_embed.apply({"params": params["patch_embed"]}, images)
        ts = model.make_time_grid()

        def f(t, x):
            dx, _ = vf.apply({"params": params["vf"]}, x, t)
            return dx

        lam = max_lyapunov_exponent(f, tokens, ts, method="euler", key=key)
        return jnp.argmax(logits, -1), jnp.max(probs, -1), lam

    preds, conf, lam = run(variables["params"], images)
    preds, conf, lam = map(np.asarray, (preds, conf, lam))
    labels = np.asarray(labels)
    records: Dict[int, List[list]] = {}
    for i in range(len(labels)):
        records.setdefault(int(labels[i]), []).append(
            [int(preds[i]), int(labels[i]), float(conf[i]),
             int(labels[i]), float(lam[i])])
    return records


def _standalone_modules(model):
    """(PatchEmbed, ParallelVectorField) configured like ``model``'s
    submodules — applied directly against the corresponding param
    subtrees (params['patch_embed'], params['vf'])."""
    from odevit_tpu.ops.patch_embed import PatchEmbed
    from odevit_tpu.models.vector_field import ParallelVectorField

    patch_embed = PatchEmbed(
        img_size=model.img_size, patch_size=model.patch_size,
        in_chans=model.in_chans, embed_dim=model.embed_dim,
        add_distillation_token=model.add_distillation_token,
        register_tokens=model.register_tokens,
        pos_embed_register_tokens=model.pos_embed_register_tokens,
        dtype=model.dtype)
    vf = ParallelVectorField(
        dim=model.embed_dim, num_heads=model.num_heads,
        mlp_ratio=model.mlp_ratio, attn_drop=model.attn_drop,
        proj_drop=model.proj_drop, mlp_drop=model.mlp_drop,
        emulate_depth=model.emulate_depth,
        time_interval=model.time_interval,
        l2_attention=model.l2_attention,
        time_conditioning=model.time_conditioning,
        dtype=model.dtype)
    return patch_embed, vf
