"""Frozen-teacher target cache for the distillation hot loop.

The reference recomputes the full teacher forward for every training
batch, every epoch (loss_trainer.py:305-371 — ``teacher(pixel_values)``
inside ``train_batch_representation``), even though the teacher is
frozen and its per-sample outputs never change.  Both distillation
losses consume only two tiny per-sample slices of that forward:

  * the CLS token of each of the 12 layer states
    (losses/trajectory.trajectory_mse uses ``teacher_states[:, :, 0]``)
  * the last layer's CLS->patch attention row
    (losses/attention_distill.* use ``teacher_attn[:, :, 0, 1:]``)

≈ (12·D + H·(M-1)) numbers per sample — ~20 KB at ViT-Base/16-224 in
bf16, so a 50k-image CIFAR cache is ~1 GB of HBM.  Precomputing them
once deletes the teacher forward (~17% of the step's FLOPs plus its
extract-mass argsort tail) from every step of every epoch, and frees
the teacher's parameters and activations from the training program.

Interaction with augmentation: the cache is keyed by dataset index, so
the targets always come from the *clean* image.  With input
augmentation enabled the student would see augmented pixels against
clean-teacher targets — supported on purpose (consistency-style
distillation) but different from the reference's recompute semantics,
so the CLI refuses the combination unless forced.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


def build_teacher_cache(teacher, teacher_params, images_u8, *,
                        preprocess=None, batch_size: int = 256,
                        dtype=None) -> Dict[str, jax.Array]:
    """One pass of the frozen teacher over ``images_u8`` [N, h, w, 3].

    Returns ``{"t_cls": [N, L, D], "t_rows": [N, H, M-1]}`` on device.
    ``dtype=None`` keeps the teacher's output dtype (bit-identical to
    the live path); pass e.g. ``jnp.bfloat16`` to halve the cache.
    """
    n = int(images_u8.shape[0])
    bs = int(min(batch_size, n))

    @jax.jit
    def fwd(tp, px):
        x = preprocess(px) if preprocess is not None else px
        out = teacher.apply({"params": tp}, x,
                            output_hidden_states=True,
                            output_attentions=True)
        cls = jnp.stack([h[:, 0] for h in out["hidden_states"][1:]],
                        axis=1)                        # [B, L, D]
        rows = out["attentions"][-1][:, :, 0, 1:]      # [B, H, M-1]
        if dtype is not None:
            cls, rows = cls.astype(dtype), rows.astype(dtype)
        return cls, rows

    cls_parts, row_parts = [], []
    for a in range(0, n, bs):
        px = np.asarray(images_u8[a:a + bs])
        if px.shape[0] < bs:     # static-shape pad; outputs trimmed below
            pad = bs - px.shape[0]
            px = np.concatenate([px, np.repeat(px[:1], pad, axis=0)], 0)
        cls, rows = fwd(teacher_params, jax.device_put(px))
        cls_parts.append(cls)
        row_parts.append(rows)
    cache = {"t_cls": jnp.concatenate(cls_parts, axis=0)[:n],
             "t_rows": jnp.concatenate(row_parts, axis=0)[:n]}
    return cache


def cache_nbytes(cache: Dict[str, jax.Array]) -> int:
    return sum(int(np.prod(v.shape)) * v.dtype.itemsize
               for v in cache.values())


def gather_targets(cache: Dict[str, jax.Array], index):
    """Per-batch teacher targets in the shapes the steps consume:
    ``t_states`` [L, B, 1, D] (CLS-only — trajectory_mse reads only
    token 0) and ``t_rows`` [B, H, M-1]."""
    t_cls = cache["t_cls"][index]                      # [B, L, D]
    t_states = jnp.swapaxes(t_cls, 0, 1)[:, :, None, :]
    return t_states, cache["t_rows"][index]
