"""Patch embedding with CLS + register tokens (DINOv2-style registers).

Parity target: /root/reference/models/ode_transformer_gpt.py:86-182.

TPU-first design notes:
  * The stride=patch Conv2d is algebraically a space-to-depth reshape
    followed by one dense matmul; we implement it that way so the whole
    patchify lands on the MXU as a single [B*N, p*p*C] x [p*p*C, D] GEMM
    (XLA handles the same rewrite for convs, but the explicit form keeps
    the kernel layout trivially convertible from torch conv weights).
  * Inputs are NHWC (JAX convention). Use ``nchw_to_nhwc`` when feeding
    torch-style batches.
  * Token order without distillation token: [cls, patches..., registers...];
    with it: [cls, dist, patches..., registers...] (reference order).
  * ``pos_embed_register_tokens=False`` adds positional embeddings only to
    the first ``num_patches+1`` tokens; we then allocate the table at that
    size (the reference allocates the full size and slices — behaviorally
    identical, and the smaller table is what teacher grafting swaps in).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from odevit_tpu.ops.init import spectral_xavier_normal


def nchw_to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def patchify(images, patch_size):
    """[B, H, W, C] -> [B, (H/p)*(W/p), p*p*C] with torch-conv channel order.

    The per-patch feature vector is laid out as (C, ph, pw) flattened, i.e.
    channel-major, so that a torch conv weight [D, C, p, p] reshaped to
    [D, C*p*p] and transposed is the exact dense kernel.
    """
    b, h, w, c = images.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = images.reshape(b, gh, p, gw, p, c)
    # -> [B, gh, gw, C, p, p] so flatten order matches torch's (C, ph, pw)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, gh * gw, c * p * p)


class PatchEmbed(nn.Module):
    img_size: int = 32
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 192
    add_distillation_token: bool = False
    register_tokens: int = 4
    pos_embed_register_tokens: bool = True
    dtype: jnp.dtype | None = None
    spectral_init: bool = True

    @property
    def grid_size(self):
        return self.img_size // self.patch_size

    @property
    def num_patches(self):
        return self.grid_size * self.grid_size

    @property
    def num_prefix_tokens(self):
        return 2 if self.add_distillation_token else 1

    @property
    def seq_len(self):
        return self.num_prefix_tokens + self.num_patches + self.register_tokens

    @nn.compact
    def __call__(self, images, *, deterministic: bool = True):
        assert self.img_size % self.patch_size == 0
        d = self.embed_dim
        trunc02 = nn.initializers.truncated_normal(stddev=0.02)
        kinit = spectral_xavier_normal() if self.spectral_init else nn.initializers.xavier_normal()

        proj_kernel = self.param(
            "proj_kernel", kinit,
            (self.in_chans * self.patch_size * self.patch_size, d))
        proj_bias = self.param("proj_bias", nn.initializers.zeros, (d,))
        cls_token = self.param("cls_token", trunc02, (1, 1, d))
        reg = None
        if self.register_tokens > 0:
            reg = self.param("register_tokens", trunc02,
                             (self.register_tokens, d))
        dist_token = None
        if self.add_distillation_token:
            dist_token = self.param("dist_token", trunc02, (1, 1, d))

        pos_len = self.num_patches + 1
        if self.pos_embed_register_tokens:
            pos_len += self.register_tokens
        pos_embed = self.param("pos_embed", trunc02, (1, pos_len, d))

        dtype = self.dtype or images.dtype
        patches = patchify(images.astype(dtype), self.patch_size)
        tokens = jnp.dot(patches, proj_kernel.astype(dtype),
                         preferred_element_type=jnp.float32) + proj_bias
        tokens = tokens.astype(dtype)

        b = tokens.shape[0]
        parts = [jnp.broadcast_to(cls_token.astype(dtype), (b, 1, d))]
        if dist_token is not None:
            parts.append(jnp.broadcast_to(dist_token.astype(dtype), (b, 1, d)))
        parts.append(tokens)
        if reg is not None:
            parts.append(jnp.broadcast_to(reg.astype(dtype)[None],
                                          (b, self.register_tokens, d)))
        x = jnp.concatenate(parts, axis=1)

        n_pos = pos_embed.shape[1]
        x = x.at[:, :n_pos, :].add(pos_embed.astype(dtype))
        return x
