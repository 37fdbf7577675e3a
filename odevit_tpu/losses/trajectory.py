"""Trajectory distillation losses: teacher layer states vs student ODE
control points.

Parity targets: /root/reference/loss_trainer.py:119-160 (compute_mse_loss)
and :256-303 (train_batch_representation's fallback checkpointing).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _l2_normalize(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def trajectory_mse(student_points, teacher_states, *, full_path=True,
                   normalize=False):
    """CLS-token MSE between aligned student/teacher trajectories.

    Args:
      student_points: [Q, B, N_s, D] student control-point states.
      teacher_states: [Q, B, N_t, D] teacher per-layer hidden states
        (embedding output already dropped, i.e. layers 1..12).
      full_path: per-control-point CLS MSE summed over Q (each term also
        reported); otherwise final-state CLS MSE only.
      normalize: L2-normalize features first.

    Returns (total, {name: value}).
    """
    t = teacher_states.astype(jnp.float32)
    s = student_points.astype(jnp.float32)
    if normalize:
        t, s = _l2_normalize(t), _l2_normalize(s)

    if full_path:
        per_point = jnp.mean((t[:, :, 0] - s[:, :, 0]) ** 2, axis=(1, 2))
        parts = {f"mse_loss_t@{i}": per_point[i]
                 for i in range(per_point.shape[0])}
        return jnp.sum(per_point), parts
    q = t.shape[0] - 1
    last = jnp.mean((t[-1, :, 0] - s[-1, :, 0]) ** 2)
    return last, {f"mse_loss_t@{q}": last}


def uniform_checkpoints(num_states: int, num_targets: int) -> np.ndarray:
    """Fallback when no control points are provided: uniform indices over
    the trajectory (loss_trainer.py:261-271 — cumsum of the constant ratio
    T/num_targets, last index decremented)."""
    ratio = num_states / num_targets
    idx = np.cumsum(np.full(num_targets, ratio)).astype(np.int64)
    idx[-1] -= 1
    return np.clip(idx, 0, num_states - 1)


def weighted_full_path_mse(student_cls, teacher_cls):
    """Linearly-decayed full-path CLS MSE from the alternate loss path
    (loss_trainer.py:401-408): sum_i (Q - i) * mse_i / Q.

    Args: student_cls, teacher_cls: [Q, B, D].
    Returns (total, {name: value}).
    """
    q = student_cls.shape[0]
    per_point = jnp.mean((teacher_cls.astype(jnp.float32)
                          - student_cls.astype(jnp.float32)) ** 2, axis=(1, 2))
    weights = jnp.arange(q, 0, -1, dtype=jnp.float32)
    total = jnp.sum(weights * per_point) / q
    parts = {f"mse_loss_t@{i}": per_point[i] for i in range(q)}
    return total, parts
