"""Self-attention ops for the ODE-ViT vector field.

Two variants, both returning ``(out, attn_weights)`` with per-head maps
``[B, H, N, N]`` because JaSMin, attention distillation, and trajectory
videos consume the maps as first-class outputs:

* ``SoftmaxSelfAttention`` — standard scaled-dot-product MHA with a fused
  QKV projection and no biases (parity target:
  ``torch.nn.MultiheadAttention(bias=False, batch_first=True)`` as wrapped
  at /root/reference/models/ode_transformer_gpt.py:203-232). Returned maps
  are post-softmax, pre-dropout (torch convention).
* ``L2SelfAttention`` — Lipschitz-controlled attention with weights
  ``exp(-||q_i - k_j||^2 * scale)`` normalized by row sum (parity target:
  /root/reference/models/ode_transformer_gpt.py:12-63). Separate biased
  q/k/v/out projections; returned maps are post-dropout to match the
  reference's data flow.

TPU notes: all matmuls carry ``preferred_element_type=float32`` so the MXU
accumulates in f32 even under bf16 inputs; the L2 distance is computed via
the expanded form (one MXU matmul + two VPU reductions) instead of a
broadcasted [B,H,N,N,d] difference tensor, which would blow HBM.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from odevit_tpu.ops.init import spectral_xavier_normal


def _split_heads(x, num_heads):
    b, n, d = x.shape
    return x.reshape(b, n, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, n, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * hd)


class SoftmaxSelfAttention(nn.Module):
    """Fused-QKV softmax multi-head self-attention (bias-free)."""

    dim: int
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_bias: bool = False
    dtype: jnp.dtype | None = None
    spectral_init: bool = True

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        init = spectral_xavier_normal() if self.spectral_init else nn.initializers.xavier_normal()
        # Single fused projection [D, 3D]: one big MXU matmul per eval.
        w_qkv = self.param("qkv_kernel", init, (self.dim, 3 * self.dim))
        w_out = self.param("out_kernel", init, (self.dim, self.dim))

        dtype = self.dtype or x.dtype
        qkv = jnp.dot(x.astype(dtype), w_qkv.astype(dtype),
                      preferred_element_type=jnp.float32)
        if self.use_bias:
            qkv = qkv + self.param("qkv_bias", nn.initializers.zeros,
                                   (3 * self.dim,))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        head_dim = self.dim // self.num_heads
        q = _split_heads(q, self.num_heads) * (head_dim ** -0.5)
        k = _split_heads(k, self.num_heads)
        v = _split_heads(v, self.num_heads)

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1)

        # torch returns pre-dropout weights; dropout only feeds the value path.
        attn_for_values = attn
        if self.attn_drop > 0.0 and not deterministic:
            attn_for_values = nn.Dropout(rate=self.attn_drop)(
                attn, deterministic=False)

        out = jnp.einsum("bhqk,bhkd->bhqd", attn_for_values.astype(dtype),
                         v.astype(dtype), preferred_element_type=jnp.float32)
        out = _merge_heads(out).astype(dtype)
        out = jnp.dot(out, w_out.astype(dtype),
                      preferred_element_type=jnp.float32)
        if self.use_bias:
            out = out + self.param("out_bias", nn.initializers.zeros,
                                   (self.dim,))
        out = out.astype(dtype)
        if self.proj_drop > 0.0 and not deterministic:
            out = nn.Dropout(rate=self.proj_drop)(out, deterministic=False)
        return out, attn.astype(dtype)


class L2SelfAttention(nn.Module):
    """L2-distance attention: ``softmax-free`` exp(-dist^2) row-normalized."""

    dim: int
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype | None = None
    spectral_init: bool = True

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        kinit = spectral_xavier_normal() if self.spectral_init else nn.initializers.xavier_normal()
        dtype = self.dtype or x.dtype

        def proj(name, y):
            kernel = self.param(f"{name}_kernel", kinit, (self.dim, self.dim))
            bias = self.param(f"{name}_bias", nn.initializers.zeros, (self.dim,))
            return (jnp.dot(y.astype(dtype), kernel.astype(dtype),
                            preferred_element_type=jnp.float32)
                    + bias.astype(jnp.float32))

        q = _split_heads(proj("q", x), self.num_heads)
        k = _split_heads(proj("k", x), self.num_heads)
        v = _split_heads(proj("v", x), self.num_heads)

        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        # ||q - k||^2 = ||q||^2 + ||k||^2 - 2 q.k — expanded form keeps the
        # N x N interaction on the MXU instead of materializing [.., N, N, d].
        q2 = jnp.sum(q * q, axis=-1, keepdims=True)          # [B,H,N,1]
        k2 = jnp.sum(k * k, axis=-1)[:, :, None, :]          # [B,H,1,N]
        qk = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
        dist2 = q2 + k2 - 2.0 * qk

        attn = jnp.exp(-dist2 * scale)
        attn = attn / (jnp.sum(attn, axis=-1, keepdims=True) + 1e-8)
        if self.attn_drop > 0.0 and not deterministic:
            attn = nn.Dropout(rate=self.attn_drop)(attn, deterministic=False)

        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(dtype), v.astype(dtype),
                         preferred_element_type=jnp.float32)
        out = _merge_heads(out).astype(dtype)
        w_out = self.param("out_kernel", kinit, (self.dim, self.dim))
        b_out = self.param("out_bias", nn.initializers.zeros, (self.dim,))
        out = (jnp.dot(out, w_out.astype(dtype),
                       preferred_element_type=jnp.float32)
               + b_out).astype(dtype)
        if self.proj_drop > 0.0 and not deterministic:
            out = nn.Dropout(rate=self.proj_drop)(out, deterministic=False)
        return out, attn.astype(dtype)
