"""Learning-rate and distillation-temperature schedules.

``cosine_hard_restarts_with_warmup`` reproduces HuggingFace's
``get_cosine_with_hard_restarts_schedule_with_warmup`` (the scheduler the
reference builds at main_classification_ode_distillation.py:162-167), as a
pure optax-compatible ``step -> multiplier`` function. ``TemperatureScheduler``
mirrors loss_trainer.py:16-28.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def cosine_hard_restarts_with_warmup(base_lr: float, num_warmup_steps: int,
                                     num_training_steps: int,
                                     num_cycles: int = 1):
    """optax schedule: linear warmup then num_cycles hard-restart cosines."""
    warmup = max(1, num_warmup_steps)
    decay_steps = max(1, num_training_steps - num_warmup_steps)
    cycles = max(num_cycles, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warmup
        progress = (step - num_warmup_steps) / decay_steps
        frac = jnp.mod(cycles * progress, 1.0)
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * frac)))
        cos = jnp.where(progress >= 1.0, 0.0, cos)
        return base_lr * jnp.where(step < num_warmup_steps, warm, cos)

    return schedule


def cosine_with_warmup(base_lr: float, num_warmup_steps: int,
                       num_training_steps: int):
    """HF get_cosine_schedule_with_warmup equivalent."""
    warmup = max(1, num_warmup_steps)
    decay_steps = max(1, num_training_steps - num_warmup_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warmup
        progress = jnp.clip((step - num_warmup_steps) / decay_steps, 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return base_lr * jnp.where(step < num_warmup_steps, warm, cos)

    return schedule


class TemperatureScheduler:
    """Cosine decay of the distillation temperature across epochs."""

    def __init__(self, initial_temp=6.0, final_temp=1.5, total_epochs=100):
        self.init_t = initial_temp
        self.final_t = final_temp
        self.total_epochs = total_epochs

    def get_temp(self, epoch: int) -> float:
        ratio = epoch / self.total_epochs
        return self.final_t + 0.5 * (self.init_t - self.final_t) * (
            1.0 + math.cos(math.pi * ratio))
