"""Fused Pallas kernel for the Macaron vector field.

One kernel per evaluation of the sequential macaron drift
(models/vector_field.MacaronVectorField; parity target
/root/reference/models/macaron.py:74-150):

    x1 = x  + 0.5*rs * FFN(LN1(x))
    x2 = x1 +     rs * Attn(LN2(x1))     (biased QKV/out softmax attention)
    x3 = x2 + 0.5*rs * FFN(LN3(x2))      (same FFN weights as the first half)
    dx = x3 * scaler

Same layout/dtype policy as kernels/vector_field.py (token padding to the
16-sublane granule, masked attention keys, f32 accumulation with bf16
activations at dtype=bfloat16, shared VMEM-resident weights across the
batch grid). The FFN weights are fetched once and used twice — the fusion
win is even larger than for the parallel field, whose two branches share
nothing.

Backward: custom_vjp recomputing through the XLA twin (the Macaron model
is the alternate family; its training path is not the headline hot loop).
Deterministic only — ViTMacaron exposes no attention maps and the
reference's macaron configs train without dropout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from odevit_tpu.kernels.vector_field import (TOKEN_PAD, _gelu,
                                             _interpret_default)

LN_EPS = 1e-6           # flax nn.LayerNorm default


def _macaron_kernel(x_ref, ln1s, ln1b, ln2s, ln2b, ln3s, ln3b,
                    wqkv_ref, qkvb_ref, wout_ref, outb_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref, rs_ref,
                    dx_ref, ctx_scratch, *,
                    num_heads: int, scaler: float, n_real: int,
                    block_b: int):
    rows, d = x_ref.shape
    n_pad = rows // block_b
    hd = d // num_heads
    qk_scale = hd ** -0.5
    dtype = x_ref.dtype
    f32 = jnp.float32
    rs = rs_ref[0, 0]

    def ln(xf, s_ref, b_ref):
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        c = xf - mu
        var = jnp.mean(c * c, axis=-1, keepdims=True)
        return ((c * jax.lax.rsqrt(var + LN_EPS)) * s_ref[0]
                + b_ref[0]).astype(dtype)

    def ffn(z):
        h = jnp.dot(z, w1_ref[:], preferred_element_type=f32) + b1_ref[0]
        h = _gelu(h).astype(dtype)
        return jnp.dot(h, w2_ref[:], preferred_element_type=f32) + b2_ref[0]

    xf = x_ref[:].astype(f32)
    x1 = xf + 0.5 * rs * ffn(ln(xf, ln1s, ln1b))

    qkv = (jnp.dot(ln(x1, ln2s, ln2b), wqkv_ref[:],
                   preferred_element_type=f32) + qkvb_ref[0]
           ).astype(dtype).reshape(block_b, n_pad, 3 * d)
    key_mask = (jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
                < n_real).astype(f32)[None]
    bdims = (((2,), (2,)), ((0,), (0,)))
    pdims = (((2,), (1,)), ((0,), (0,)))
    for hh in range(num_heads):
        q = qkv[:, :, hh * hd:(hh + 1) * hd].astype(f32) * qk_scale
        k = qkv[:, :, d + hh * hd:d + (hh + 1) * hd].astype(f32)
        v = qkv[:, :, 2 * d + hh * hd:2 * d + (hh + 1) * hd]
        s = jax.lax.dot_general(q, k, bdims, preferred_element_type=f32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s) * key_mask
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
        ctx_h = jax.lax.dot_general(p, v, pdims,
                                    preferred_element_type=f32)
        ctx_scratch[:, :, hh * hd:(hh + 1) * hd] = ctx_h.astype(dtype)

    attn_o = (jnp.dot(ctx_scratch[:].reshape(rows, d), wout_ref[:],
                      preferred_element_type=f32) + outb_ref[0])
    x2 = x1 + rs * attn_o
    x3 = x2 + 0.5 * rs * ffn(ln(x2, ln3s, ln3b))
    dx_ref[:] = (x3 * scaler).astype(dx_ref.dtype)


def _xla_macaron(x, ln1s, ln1b, ln2s, ln2b, ln3s, ln3b, wqkv, qkvb,
                 wout, outb, w1, b1, w2, b2, rs, *,
                 num_heads: int, scaler: float, n_real: int = 0):
    """Pure-XLA twin (same math/dtype policy); custom-vjp backward and
    numerics oracle."""
    b, n, d = x.shape
    hd = d // num_heads
    dtype = x.dtype
    f32 = jnp.float32
    rs = rs.reshape(())

    def ln(xf, s_, b_):
        mu = jnp.mean(xf, -1, keepdims=True)
        c = xf - mu
        var = jnp.mean(c * c, -1, keepdims=True)
        return ((c * jax.lax.rsqrt(var + LN_EPS)) * s_ + b_).astype(dtype)

    def ffn(z):
        h = jnp.dot(z, w1.astype(dtype), preferred_element_type=f32) + b1
        h = jax.nn.gelu(h, approximate=False).astype(dtype)
        return jnp.dot(h, w2.astype(dtype),
                       preferred_element_type=f32) + b2

    xf = x.astype(f32)
    x1 = xf + 0.5 * rs * ffn(ln(xf, ln1s, ln1b))
    qkv = (jnp.dot(ln(x1, ln2s, ln2b), wqkv.astype(dtype),
                   preferred_element_type=f32) + qkvb)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    heads = lambda t: t.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    q = heads(q) * hd ** -0.5
    k = heads(k)
    v = heads(v).astype(dtype)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=f32)
    if n_real and n_real < n:
        s = jnp.where((jnp.arange(n) < n_real)[None, None, None, :],
                      s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=f32)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, d).astype(dtype)
    attn_o = jnp.dot(ctx, wout.astype(dtype),
                     preferred_element_type=f32) + outb
    x2 = x1 + rs * attn_o
    x3 = x2 + 0.5 * rs * ffn(ln(x2, ln3s, ln3b))
    return (x3 * scaler).astype(dtype)


def _pallas_macaron(x, *tensors, num_heads, scaler, block_b, n_real):
    b, n, d = x.shape
    (ln1s, ln1b, ln2s, ln2b, ln3s, ln3b, wqkv, qkvb, wout, outb,
     w1, b1, w2, b2, rs) = tensors
    dh = w1.shape[-1]
    n_real = n_real or n
    n_pad = -(-n // TOKEN_PAD) * TOKEN_PAD
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    x2d = x.reshape(b * n_pad, d)
    wqkv, wout, w1, w2 = (w.astype(x.dtype) for w in (wqkv, wout, w1, w2))

    rows = block_b * n_pad
    mat = lambda i: (0, 0)
    vec = lambda w: pl.BlockSpec((1, w), mat, memory_space=pltpu.VMEM)
    kernel = functools.partial(_macaron_kernel, num_heads=num_heads,
                               scaler=scaler, n_real=n_real,
                               block_b=block_b)
    out = pl.pallas_call(
        kernel,
        grid=(b // block_b,),
        interpret=_interpret_default(),
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            vec(d), vec(d), vec(d), vec(d), vec(d), vec(d),
            pl.BlockSpec((d, 3 * d), mat, memory_space=pltpu.VMEM),
            vec(3 * d),
            pl.BlockSpec((d, d), mat, memory_space=pltpu.VMEM),
            vec(d),
            pl.BlockSpec((d, dh), mat, memory_space=pltpu.VMEM),
            vec(dh),
            pl.BlockSpec((dh, d), mat, memory_space=pltpu.VMEM),
            vec(d),
            pl.BlockSpec((1, 1), mat, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * n_pad, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_b, n_pad, d), x.dtype)],
    )(x2d, ln1s[None], ln1b[None], ln2s[None], ln2b[None], ln3s[None],
      ln3b[None], wqkv, qkvb[None].astype(jnp.float32), wout,
      outb[None].astype(jnp.float32), w1, b1[None].astype(jnp.float32),
      w2, b2[None].astype(jnp.float32),
      rs.reshape(1, 1).astype(jnp.float32))
    out = out.reshape(b, n_pad, d)
    return out[:, :n, :] if n_pad != n else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17, 18, 19))
def fused_macaron(x, ln1s, ln1b, ln2s, ln2b, ln3s, ln3b, wqkv, qkvb,
                  wout, outb, w1, b1, w2, b2, rs,
                  num_heads: int, scaler: float, block_b: int,
                  n_real: int = 0):
    """Fused Macaron evaluation; Pallas forward, XLA-twin backward."""
    return _pallas_macaron(x, ln1s, ln1b, ln2s, ln2b, ln3s, ln3b, wqkv,
                           qkvb, wout, outb, w1, b1, w2, b2, rs,
                           num_heads=num_heads, scaler=scaler,
                           block_b=block_b, n_real=n_real)


def _fused_macaron_fwd_wrap(x, ln1s, ln1b, ln2s, ln2b, ln3s, ln3b, wqkv,
                            qkvb, wout, outb, w1, b1, w2, b2, rs,
                            num_heads, scaler, block_b, n_real):
    out = fused_macaron(x, ln1s, ln1b, ln2s, ln2b, ln3s, ln3b, wqkv, qkvb,
                        wout, outb, w1, b1, w2, b2, rs, num_heads, scaler,
                        block_b, n_real)
    return out, (x, ln1s, ln1b, ln2s, ln2b, ln3s, ln3b, wqkv, qkvb, wout,
                 outb, w1, b1, w2, b2, rs)


def _fused_macaron_bwd(num_heads, scaler, block_b, n_real, residuals, g):
    ref = functools.partial(_xla_macaron, num_heads=num_heads,
                            scaler=scaler, n_real=n_real)
    _, vjp = jax.vjp(ref, *residuals)
    return vjp(g)


fused_macaron.defvjp(_fused_macaron_fwd_wrap, _fused_macaron_bwd)


def fused_macaron_from_params(x, vf_params, *, num_heads: int,
                              scaler: float, block_b: int = 16,
                              use_pallas: bool = True, n_real: int = 0):
    """Apply the fused Macaron kernel from a MacaronVectorField params
    subtree (params['vf'] of a ViTMacaron)."""
    a = vf_params["attn"]
    f = vf_params["ffn"]
    tensors = (
        vf_params["norm1"]["scale"], vf_params["norm1"]["bias"],
        vf_params["norm2"]["scale"], vf_params["norm2"]["bias"],
        vf_params["norm3"]["scale"], vf_params["norm3"]["bias"],
        a["qkv_kernel"], a["qkv_bias"], a["out_kernel"], a["out_bias"],
        f["fc1"]["kernel"], f["fc1"]["bias"],
        f["fc2"]["kernel"], f["fc2"]["bias"],
        vf_params["res_scale"])
    if use_pallas:
        b = x.shape[0]
        bb = block_b
        while b % bb:
            bb //= 2
        return fused_macaron(x, *tensors, num_heads, scaler, max(bb, 1),
                             n_real)
    return _xla_macaron(x, *tensors, num_heads=num_heads, scaler=scaler,
                        n_real=n_real)
