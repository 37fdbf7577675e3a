"""Classification losses and metrics.

CE with label smoothing 0.05 matches the reference's
``F.cross_entropy(..., label_smoothing=0.05)``
(/root/reference/models/ode_transformer_gpt.py:626); the logit-KD loss
matches loss_trainer.py:431-447.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels, *, label_smoothing=0.0):
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if label_smoothing > 0.0:
        onehot = (onehot * (1.0 - label_smoothing)
                  + label_smoothing / num_classes)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def logit_kd_loss(student_logits, teacher_logits, *, temperature,
                  lambda_param):
    """KL(teacher || student) on temperature-softened logits, scaled by
    T^2 * lambda (batchmean reduction)."""
    t = temperature
    soft_t = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    log_s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, axis=-1)
    kl = jnp.sum(soft_t * (jnp.log(jnp.clip(soft_t, 1e-12, None)) - log_s),
                 axis=-1)
    return jnp.mean(kl) * (t ** 2) * lambda_param


def topk_accuracies(logits, labels, ks=(1, 3, 5)):
    """{'acc@k': scalar} over the batch."""
    out = {}
    for k in ks:
        kk = min(k, logits.shape[-1])
        top = jax.lax.top_k(logits, kk)[1]
        hit = jnp.any(top == labels[:, None], axis=-1)
        out[f"acc@{k}"] = jnp.mean(hit.astype(jnp.float32))
    return out
