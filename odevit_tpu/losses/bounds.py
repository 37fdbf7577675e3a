"""Well-posedness / stability upper bounds for the ODE trajectory.

Two diagnostics from the paper, reproduced from
/root/reference/models/ode_transformer_gpt.py:515-543:

* analytic bound — spectral norms of W_v and W_k @ W_q^T from the
  attention projections;
* finite-difference bound — sup-norm of the discrete second time
  derivative of the trajectory.

The reference computes BOTH on every forward pass (torch.svd per step —
GPU-hostile there, TPU-hostile here). In this framework they are opt-in
diagnostics: request them via ``output_stability_bounds`` or call these
functions directly at a logging cadence.

Note on the finite-difference call convention: the reference invokes
``compute_upper_bound_by_fininte_difference(states, L=0.5, N=1/T)`` and
divides by ``delta_t = 1/N = T`` inside (:532, :584-586) — i.e. N and the
grid spacing are swapped relative to their natural meaning. We reproduce
the *callsite semantics* so logged numbers match the reference.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def spectral_norm(mat):
    return jnp.linalg.norm(mat.astype(jnp.float32), ord=2)


def analytic_upper_bound(w_q, w_k, w_v, *, R, L, num_eval_steps):
    """Analytic global-error bound from attention projection weights.

    Weights are [out, in]-agnostic (spectral norms are transpose
    invariant). Works for both attention variants: for the fused-QKV
    softmax attention pass the three [D, D] slices; the reference's
    version only supports nn.MultiheadAttention (ode_transformer_gpt.py:516)
    and breaks for L2 attention — here both are supported.
    """
    d_k = w_k.shape[-1]
    d_q = w_q.shape[-1]
    factor1 = R ** 2 * spectral_norm(w_v)
    factor2 = R * spectral_norm(w_k @ w_q.T) + d_k ** 0.5
    factor3 = (num_eval_steps ** 2) * (d_q ** 0.5)
    supremum = factor1 * factor2 / factor3
    return (math.e ** L - 1.0) / (2.0 * L * num_eval_steps) * supremum


def second_derivative_fd(states, delta_t):
    """Central-difference second derivative along the leading (time) axis.

    states: [T, B, N, D] -> [T-2, B, N, D].
    """
    f = states.astype(jnp.float32)
    return (f[2:] - 2.0 * f[1:-1] + f[:-2]) / (delta_t ** 2)


def finite_difference_upper_bound(states, L, N):
    """Curvature-based bound dict (global / per-batch / per-sequence).

    Reproduces the reference callsite convention: ``delta_t = 1/N``.
    """
    first_factor = (math.e ** L - 1.0) / (2.0 * L * N)
    curv = second_derivative_fd(states, 1.0 / N)
    curvature_norm = jnp.max(jnp.abs(curv), axis=-1)     # inf-norm over D
    max_sup_per_seq = jnp.max(curvature_norm, axis=0)    # [B, N]
    max_sup_per_batch = jnp.max(max_sup_per_seq, axis=-1)  # [B]
    sup_global = jnp.max(curvature_norm)
    return {
        "global_upper_bound": first_factor * sup_global,
        "batched_upper_bound": first_factor * max_sup_per_batch,
        "batched_upper_bound_per_seq": first_factor * max_sup_per_seq,
    }
