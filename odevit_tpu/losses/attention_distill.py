"""Attention-map distillation: DINO-style thresholded attention mass,
L1 and symmetrized-KL variants.

Parity targets: /root/reference/loss_trainer.py:80-117 (extract_mass),
:162-183 (L1), :185-254 (KL). The gaussian blur reproduces torchvision's
``gaussian_blur(kernel_size=(3,3), sigma=0.5)`` (separable kernel, reflect
padding).

TPU notes: the sort/scatter pair runs on small [B,H,196] rows — fine on
the VPU; the blur is a 3x3 depthwise conv expressed as one
``lax.conv_general_dilated`` over a (B*H, 1, h, w) layout.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    x = np.linspace(-(ksize - 1) / 2.0, (ksize - 1) / 2.0, ksize)
    pdf = np.exp(-0.5 * (x / sigma) ** 2)
    return (pdf / pdf.sum()).astype(np.float32)


def gaussian_blur_2d(x, ksize=3, sigma=0.5):
    """Blur the trailing two axes of ``[..., h, w]`` with reflect padding."""
    k1 = _gaussian_kernel1d(ksize, sigma)
    kernel = np.outer(k1, k1)[None, None]            # [1, 1, kh, kw]
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    flat = x.reshape((-1, 1, h, w)).astype(jnp.float32)
    pad = ksize // 2
    flat = jnp.pad(flat, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                   mode="reflect")
    out = jax.lax.conv_general_dilated(
        flat, jnp.asarray(kernel), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out.reshape(lead + (h, w))


def extract_mass(attn_rows, threshold=0.8, *, smooth=True, scale_factor=40,
                 return_mask=False):
    """Thresholded attention mass over CLS->patch rows.

    Args:
      attn_rows: [B, H, N] CLS-row attention over N patch tokens (N must be
        a perfect square).
      threshold: keep the top mass above this fraction.
      smooth: sigmoid soft mask + gaussian blur (hard binary mask otherwise).

    Returns (mean_over_heads [B,h,w], filtered [B,H,h,w], mask or None).
    """
    b, nh, n = attn_rows.shape
    side = int(n ** 0.5 + 0.5)
    a = attn_rows.astype(jnp.float32)

    idx = jnp.argsort(a, axis=-1)                     # ascending
    val = jnp.take_along_axis(a, idx, axis=-1)
    val = val / (jnp.sum(val, axis=-1, keepdims=True) + 1e-8)
    cumval = jnp.cumsum(val, axis=-1)

    if smooth:
        mask_sorted = jax.nn.sigmoid((cumval - (1.0 - threshold)) * scale_factor)
    else:
        mask_sorted = (cumval > (1.0 - threshold)).astype(jnp.float32)

    inv = jnp.argsort(idx, axis=-1)
    th_attn = jnp.take_along_axis(mask_sorted, inv, axis=-1)
    th_attn = th_attn.reshape(b, nh, side, side)

    attn_map = a.reshape(b, nh, side, side)
    filtered = attn_map * th_attn
    if smooth:
        filtered = gaussian_blur_2d(filtered, 3, 0.5)
    mean_over_heads = jnp.mean(filtered, axis=1)

    mask = jnp.mean(th_attn, axis=1) if return_mask else None
    return mean_over_heads, filtered, mask


def l1_attention_loss(student_attn, teacher_attn, *, lambda_param,
                      conjugate=False, student_threshold=0.5,
                      teacher_threshold=0.7):
    """L1 over extracted attention masses of the last student evaluation vs
    the teacher's last layer.

    Args:
      student_attn: [B, H, N, N] (registers already stripped); the CLS row
        excluding CLS->CLS is taken here.
      teacher_attn: [B, H, M, M] teacher last-layer attention, or
        precomputed [B, H, M-1] CLS->patch rows (the frozen-teacher cache
        stores only these — see train/teacher_cache.py).
    """
    s_rows = student_attn[:, :, 0, 1:]
    t_rows = (teacher_attn[:, :, 0, 1:] if teacher_attn.ndim == 4
              else teacher_attn)
    s_mean, _, _ = extract_mass(s_rows, threshold=student_threshold)
    t_mean, _, _ = extract_mass(t_rows, threshold=teacher_threshold)
    if conjugate:
        max_val = jnp.max(t_mean.reshape(t_mean.shape[0], -1), axis=-1)
        t_mean = max_val[:, None, None] - t_mean
    return jnp.sum(jnp.abs(s_mean - t_mean)) * lambda_param


def kl_attention_loss(student_attn, teacher_attn, *, lambda_param,
                      temperature=1.0, per_head=True, eps=1e-8,
                      student_threshold=0.5, teacher_threshold=0.7):
    """Symmetrized temperature-scaled KL on log-mass distributions.

    The teacher mass is conjugated (max - mass) unconditionally, matching
    the reference's always-on JaSMin-teacher ad-hoc (loss_trainer.py:209-213).
    ``teacher_attn`` may be the full [B, H, M, M] map or cached
    [B, H, M-1] CLS->patch rows.
    """
    s_rows = student_attn[:, :, 0, 1:]
    t_rows = (teacher_attn[:, :, 0, 1:] if teacher_attn.ndim == 4
              else teacher_attn)
    s_mean, s_filt, _ = extract_mass(s_rows, threshold=student_threshold)
    t_mean, t_filt, _ = extract_mass(t_rows, threshold=teacher_threshold)
    t_filt = 1.0 - t_filt
    max_val = jnp.max(t_mean.reshape(t_mean.shape[0], -1), axis=-1)
    t_mean = max_val[:, None, None] - t_mean

    def sym_kl(log_s_input, log_t_input, axis):
        ls = jax.nn.log_softmax(log_s_input / temperature, axis=axis)
        lt = jax.nn.log_softmax(log_t_input / temperature, axis=axis)
        t_prob = jnp.exp(lt)
        s_prob = jnp.exp(ls)
        kl_st = jnp.sum(t_prob * (lt - ls), axis=axis)
        kl_ts = jnp.sum(s_prob * (ls - lt), axis=axis)
        return 0.5 * (kl_st + kl_ts) * temperature ** 2

    if per_head:
        # [B, H, h, w] -> log-mass per head row, softmax over the spatial dim
        b, h = s_filt.shape[:2]
        log_s = jnp.sum(jnp.log(s_filt + eps), axis=3).reshape(b, h, -1)
        log_t = jnp.sum(jnp.log(t_filt + eps), axis=3).reshape(b, h, -1)
        kl = jnp.mean(sym_kl(log_s, log_t, axis=2))
    else:
        s_m = jnp.clip(s_mean, eps, None)
        t_m = jnp.clip(t_mean, eps, None)
        log_s = jnp.sum(jnp.log(s_m + eps), axis=1)   # [B, w]
        log_t = jnp.sum(jnp.log(t_m + eps), axis=1)
        kl = jnp.mean(sym_kl(log_s, log_t, axis=-1))
    return kl * lambda_param
