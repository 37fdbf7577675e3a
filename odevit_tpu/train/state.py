"""Train state and optimizer construction.

The reference fuses loss + backward + clip + optimizer.step + scheduler
inside the criterion (loss_trainer.py:305-371). Idiomatic JAX splits a
pure loss from a pure train step; behavior preserved: AdamW(torch
defaults), global-norm clip 1.0 *after* frozen grads are zeroed (torch
never materializes frozen grads, so they must not enter the clip norm),
per-step HF schedule, decoupled weight decay masked to trainable params
(torch AdamW skips params without grads).

Freezing/curriculum: build the optimizer with a boolean ``trainable``
pytree. Two optimizers that differ only in the mask have identical state
structure, so the curriculum's epoch-200 head unfreeze is a zero-cost
optimizer swap mid-training (same opt_state carried over).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: Any
    params: Any
    opt_state: Any

    def apply_gradients(self, grads, tx):
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def all_trainable(params):
    return jax.tree_util.tree_map(lambda _: True, params)


def freeze_paths(params, frozen_paths):
    """Boolean trainable-mask pytree; a leaf is frozen when its key path
    (tuple of names) starts with any entry of ``frozen_paths``."""

    def is_trainable(path, _):
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        for fp in frozen_paths:
            fp = tuple(fp)
            if keys[:len(fp)] == fp:
                return False
        return True

    return jax.tree_util.tree_map_with_path(is_trainable, params)


def make_optimizer(
    learning_rate: Callable | float,
    *,
    weight_decay: float = 5e-2,
    clip_norm: Optional[float] = 1.0,
    trainable_mask=None,
    accumulate_steps: int = 1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    group_scale=None,
) -> optax.GradientTransformation:
    """``group_scale=(mask, schedule)`` multiplies the post-Adam update
    of the masked params by ``schedule(global_step)`` — a per-param-group
    LR factor. Used for the curriculum head re-warmup: when the grafted
    head unfreezes at epoch 200, its LR ramps 0 -> 1 instead of hitting
    the full schedule at once (the round-3 evidence run's post-unfreeze
    val cliff, 0.998 -> 0.813). Pass the SAME group_scale to the frozen-
    and open-phase optimizers: the state structures stay identical, so
    the curriculum swap remains a zero-cost opt_state carry-over (the
    scale is harmless pre-unfreeze — those grads are zeroed anyway)."""
    parts = []
    if trainable_mask is not None:
        frozen_mask = jax.tree_util.tree_map(lambda t: not t, trainable_mask)
        parts.append(optax.masked(optax.set_to_zero(), frozen_mask))
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts.append(optax.adamw(
        learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
        mask=trainable_mask))
    if group_scale is not None:
        mask, schedule = group_scale
        parts.append(optax.masked(optax.scale_by_schedule(schedule), mask))
    tx = optax.chain(*parts)
    if accumulate_steps and accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def create_train_state(params, tx) -> TrainState:
    import jax.numpy as jnp
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))
