"""Frozen discrete ViT teacher (HF ViT / DINO ViT-B/16 architecture).

The distillation recipe needs the teacher's per-layer hidden states and
attention maps (/root/reference/loss_trainer.py:321-324); the reference
loads ``transformers.ViTForImageClassification`` with eager attention.
This is the same architecture in flax, numerically matched to HF (see
tests/test_teacher.py): pre-LN encoder blocks, biased QKV, GELU MLP,
final LayerNorm, optional classifier head on the final CLS state.

``hidden_states`` follows the HF convention: entry 0 is the embedding
output, entries 1..L are the per-layer outputs (pre-final-LN), stacked as
one [L+1, B, N, D] array (TPU-friendly — one buffer, sliceable).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from odevit_tpu.ops.patch_embed import patchify


class ViTEncoderLayer(nn.Module):
    hidden_size: int
    num_heads: int
    mlp_dim: int
    layer_norm_eps: float = 1e-12
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d, h = self.hidden_size, self.num_heads
        hd = d // h
        dtype = self.dtype or x.dtype

        y = nn.LayerNorm(epsilon=self.layer_norm_eps,
                         name="layernorm_before")(x)
        q = nn.Dense(d, name="query", dtype=dtype)(y)
        k = nn.Dense(d, name="key", dtype=dtype)(y)
        v = nn.Dense(d, name="value", dtype=dtype)(y)

        b, n, _ = y.shape
        q = q.reshape(b, n, h, hd).transpose(0, 2, 1, 3) * hd ** -0.5
        k = k.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(dtype), v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, d).astype(dtype)
        x = x + nn.Dense(d, name="attn_output", dtype=dtype)(ctx)

        y = nn.LayerNorm(epsilon=self.layer_norm_eps,
                         name="layernorm_after")(x)
        y = nn.Dense(self.mlp_dim, name="intermediate", dtype=dtype)(y)
        y = jax.nn.gelu(y, approximate=False)
        x = x + nn.Dense(d, name="output", dtype=dtype)(y)
        return x, attn


class ViTTeacher(nn.Module):
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    num_classes: int = 0          # 0 -> no classifier head
    layer_norm_eps: float = 1e-12
    dtype: Any = None

    @nn.compact
    def __call__(self, pixel_values, *, output_hidden_states: bool = True,
                 output_attentions: bool = True) -> Dict[str, Any]:
        d = self.hidden_size
        dtype = self.dtype or pixel_values.dtype

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, d))
        num_patches = (self.image_size // self.patch_size) ** 2
        pos = self.param("position_embeddings",
                         nn.initializers.normal(stddev=0.02),
                         (1, num_patches + 1, d))
        patches = patchify(pixel_values.astype(dtype), self.patch_size)
        proj_kernel = self.param("patch_kernel",
                                 nn.initializers.xavier_uniform(),
                                 (patches.shape[-1], d))
        proj_bias = self.param("patch_bias", nn.initializers.zeros, (d,))
        tokens = (jnp.dot(patches, proj_kernel.astype(dtype),
                          preferred_element_type=jnp.float32)
                  + proj_bias).astype(dtype)
        b = tokens.shape[0]
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(dtype), (b, 1, d)), tokens],
            axis=1)
        x = x + pos.astype(dtype)

        hidden_states = [x]
        attentions = []
        for i in range(self.num_layers):
            x, attn = ViTEncoderLayer(
                hidden_size=d, num_heads=self.num_heads,
                mlp_dim=self.mlp_dim, layer_norm_eps=self.layer_norm_eps,
                dtype=self.dtype, name=f"layer_{i}")(x)
            hidden_states.append(x)
            attentions.append(attn)

        sequence_output = nn.LayerNorm(epsilon=self.layer_norm_eps,
                                       name="layernorm")(x)
        out: Dict[str, Any] = {"last_hidden_state": sequence_output}
        if output_hidden_states:
            out["hidden_states"] = jnp.stack(hidden_states, axis=0)
        if output_attentions:
            out["attentions"] = jnp.stack(attentions, axis=0)
        if self.num_classes > 0:
            out["logits"] = nn.Dense(self.num_classes, name="classifier")(
                sequence_output[:, 0].astype(jnp.float32))
        return out

    @classmethod
    def dino_b16(cls, num_classes=0, **kw):
        return cls(image_size=224, patch_size=16, hidden_size=768,
                   num_layers=12, num_heads=12, mlp_dim=3072,
                   num_classes=num_classes, **kw)
