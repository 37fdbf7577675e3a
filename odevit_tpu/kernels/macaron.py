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

Backward: native Pallas kernel (_macaron_bwd_kernel) recomputing the
x -> x1 -> x2 -> x3 chain in VMEM and emitting all 16 cotangents in one
pass (shared-FFN weight bars accumulated twice, rs bar summed across the
three residual scalings); XLA-twin vjp fallback for shapes beyond the
tile estimate. Deterministic only — ViTMacaron exposes no attention maps
and the reference's macaron configs train without dropout. Measured on
the v5e at B=1024 CIFAR rk4x13: fused train step 2,521 img/s vs flax
1,378 (1.83x).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from odevit_tpu.kernels.vector_field import (TOKEN_PAD, _gelu,
                                             _interpret_default)
from odevit_tpu.kernels.vector_field_bwd import _gelu_grad

LN_EPS = 1e-6           # flax nn.LayerNorm default


def _macaron_kernel(x_ref, ln1s, ln1b, ln2s, ln2b, ln3s, ln3b,
                    wqkv_ref, qkvb_ref, wout_ref, outb_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref, rs_ref,
                    *refs, num_heads: int, scaler: float, n_real: int,
                    block_b: int, euler_dt: float = 0.0,
                    has_base: bool = False):
    # ref order: [base (if has_base)] (input), dx_ref (output), ctx_scratch
    refs = list(refs)
    base_ref = refs.pop(0) if has_base else None
    dx_ref, ctx_scratch = refs
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
    dx = x3 * scaler
    if has_base:
        # fused stage advance (rk4 3/8 route): emit base + c*dt*f(y),
        # base = XLA-combined earlier stage states — k_i never hit HBM
        dx = base_ref[:].astype(f32) + euler_dt * dx
    elif euler_dt:
        # fused Euler step: emit y + dt*f(y) directly
        dx = xf + euler_dt * dx
    dx_ref[:] = dx.astype(dx_ref.dtype)


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


def _pallas_macaron(x, *tensors, num_heads, scaler, block_b, n_real,
                    euler_dt: float = 0.0, base=None):
    b, n, d = x.shape
    (ln1s, ln1b, ln2s, ln2b, ln3s, ln3b, wqkv, qkvb, wout, outb,
     w1, b1, w2, b2, rs) = tensors
    dh = w1.shape[-1]
    n_real = n_real or n
    n_pad = -(-n // TOKEN_PAD) * TOKEN_PAD
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        if base is not None:
            base = jnp.pad(base, ((0, 0), (0, n_pad - n), (0, 0)))
    x2d = x.reshape(b * n_pad, d)
    wqkv, wout, w1, w2 = (w.astype(x.dtype) for w in (wqkv, wout, w1, w2))

    rows = block_b * n_pad
    mat = lambda i: (0, 0)
    vec = lambda w: pl.BlockSpec((1, w), mat, memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(_macaron_kernel, num_heads=num_heads,
                               scaler=scaler, n_real=n_real,
                               block_b=block_b, euler_dt=euler_dt,
                               has_base=base is not None)
    in_specs = [
        rowspec,
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
    ]
    operands = [x2d, ln1s[None], ln1b[None], ln2s[None], ln2b[None],
                ln3s[None], ln3b[None], wqkv,
                qkvb[None].astype(jnp.float32), wout,
                outb[None].astype(jnp.float32), w1,
                b1[None].astype(jnp.float32), w2,
                b2[None].astype(jnp.float32),
                rs.reshape(1, 1).astype(jnp.float32)]
    if base is not None:
        in_specs.append(rowspec)
        operands.append(base.reshape(b * n_pad, d).astype(x.dtype))
    out = pl.pallas_call(
        kernel,
        grid=(b // block_b,),
        interpret=_interpret_default(),
        in_specs=in_specs,
        out_specs=rowspec,
        out_shape=jax.ShapeDtypeStruct((b * n_pad, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_b, n_pad, d), x.dtype)],
    )(*operands)
    out = out.reshape(b, n_pad, d)
    return out[:, :n, :] if n_pad != n else out


def _macaron_bwd_kernel(x_ref, ln1s, ln1b, ln2s, ln2b, ln3s, ln3b,
                        wqkv_ref, qkvb_ref, wout_ref, outb_ref,
                        w1_ref, b1_ref, w2_ref, b2_ref, rs_ref, g_ref,
                        *refs, num_heads: int, scaler: float,
                        n_real: int, block_b: int):
    """Native backward for the Macaron evaluation: recomputes the
    x -> x1 -> x2 -> x3 chain in VMEM, then backpropagates through the
    second FFN half, the biased attention, and the first FFN half —
    LayerNorm vjps included, FFN weight cotangents accumulated TWICE
    (the halves share weights), rs cotangent summed from all three
    residual scalings. Deterministic softmax only (macaron trains
    without dropout and exposes no attention maps)."""
    (xbar_ref, s1bar, b1nbar, s2bar, b2nbar, s3bar, b3nbar,
     wqkvbar, qkvbbar, woutbar, outbbar,
     w1bar, b1bar, w2bar, b2bar, rsbar,
     ctx_scratch, qkvbar_scratch) = refs

    rows, d = x_ref.shape
    n_pad = rows // block_b
    hd = d // num_heads
    qk_scale = hd ** -0.5
    dtype = x_ref.dtype
    f32 = jnp.float32
    rs = rs_ref[0, 0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in (s1bar, b1nbar, s2bar, b2nbar, s3bar, b3nbar,
                  wqkvbar, qkvbbar, woutbar, outbbar,
                  w1bar, b1bar, w2bar, b2bar, rsbar):
            r[:] = jnp.zeros_like(r)

    def ln_fwd(xf, s_ref, b_ref):
        """Returns (z bf16, chat f32, rstd f32)."""
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        c = xf - mu
        var = jnp.mean(c * c, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + LN_EPS)
        chat = c * rstd
        z = (chat * s_ref[0] + b_ref[0]).astype(dtype)
        return z, chat, rstd

    def ln_bwd(z_bar, chat, rstd, s_ref, sbar_ref, bbar_ref):
        """Accumulates scale/bias bars; returns the input cotangent."""
        sbar_ref[:] += jnp.sum(z_bar * chat, axis=0, keepdims=True)
        bbar_ref[:] += jnp.sum(z_bar, axis=0, keepdims=True)
        u = z_bar * s_ref[0]
        return rstd * (u - jnp.mean(u, axis=-1, keepdims=True)
                       - chat * jnp.mean(u * chat, axis=-1,
                                         keepdims=True))

    def ffn_fwd(z):
        h1 = jnp.dot(z, w1_ref[:], preferred_element_type=f32) + b1_ref[0]
        h = _gelu(h1).astype(dtype)
        out = jnp.dot(h, w2_ref[:], preferred_element_type=f32) + b2_ref[0]
        return out, h1, h

    def ffn_bwd(out_bar, z, h1, h):
        """Accumulates the SHARED weight bars; returns z cotangent."""
        ob = out_bar.astype(dtype)
        w2bar[:] += jax.lax.dot_general(
            h, ob, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        b2bar[:] += jnp.sum(out_bar, axis=0, keepdims=True)
        h_bar = jax.lax.dot_general(ob, w2_ref[:],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)
        h1_bar = (h_bar * _gelu_grad(h1)).astype(dtype)
        w1bar[:] += jax.lax.dot_general(
            z, h1_bar, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        b1bar[:] += jnp.sum(h1_bar.astype(f32), axis=0, keepdims=True)
        return jax.lax.dot_general(h1_bar, w1_ref[:],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    # ---- forward chain recompute (all VMEM-resident) ----
    xf = x_ref[:].astype(f32)
    z1, chat1, rstd1 = ln_fwd(xf, ln1s, ln1b)
    f1, h1_1, h_1 = ffn_fwd(z1)
    x1 = xf + 0.5 * rs * f1

    z2, chat2, rstd2 = ln_fwd(x1, ln2s, ln2b)
    qkv = (jnp.dot(z2, wqkv_ref[:], preferred_element_type=f32)
           + qkvb_ref[0]).astype(dtype).reshape(block_b, n_pad, 3 * d)
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
        ctx_scratch[:, :, hh * hd:(hh + 1) * hd] = jax.lax.dot_general(
            p, v, pdims, preferred_element_type=f32).astype(dtype)
    ctx2d = ctx_scratch[:].reshape(rows, d)
    ao = (jnp.dot(ctx2d, wout_ref[:], preferred_element_type=f32)
          + outb_ref[0])
    x2 = x1 + rs * ao
    z3, chat3, rstd3 = ln_fwd(x2, ln3s, ln3b)
    f3, h1_3, h_3 = ffn_fwd(z3)

    # ---- backward chain ----
    x3_bar = g_ref[:].astype(f32) * scaler

    # stage 3: x3 = x2 + 0.5 rs F(L3(x2))
    rs_acc = 0.5 * jnp.sum(x3_bar * f3)
    z3_bar = ffn_bwd(0.5 * rs * x3_bar, z3, h1_3, h_3)
    x2_bar = x3_bar + ln_bwd(z3_bar, chat3, rstd3, ln3s, s3bar, b3nbar)

    # stage 2: x2 = x1 + rs ao
    rs_acc = rs_acc + jnp.sum(x2_bar * ao)
    ao_bar = rs * x2_bar
    outbbar[:] += jnp.sum(ao_bar, axis=0, keepdims=True)
    aod = ao_bar.astype(dtype)
    woutbar[:] += jax.lax.dot_general(
        ctx2d, aod, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    ctx_bar = jax.lax.dot_general(aod, wout_ref[:],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32
                                  ).reshape(block_b, n_pad, d)
    for hh in range(num_heads):
        q = qkv[:, :, hh * hd:(hh + 1) * hd].astype(f32) * qk_scale
        k = qkv[:, :, d + hh * hd:d + (hh + 1) * hd].astype(f32)
        v = qkv[:, :, 2 * d + hh * hd:2 * d + (hh + 1) * hd]
        s = jax.lax.dot_general(q, k, bdims, preferred_element_type=f32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s) * key_mask
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        pd = p.astype(dtype)
        cb_h = ctx_bar[:, :, hh * hd:(hh + 1) * hd].astype(dtype)
        p_bar = jax.lax.dot_general(cb_h, v, bdims,
                                    preferred_element_type=f32)
        v_bar = jax.lax.dot_general(
            pd, cb_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)
        s_bar = p * (p_bar - jnp.sum(p_bar * p, axis=-1, keepdims=True))
        s_bar = (s_bar * key_mask).astype(dtype)
        q_bar = jax.lax.dot_general(
            s_bar, k.astype(dtype), pdims,
            preferred_element_type=f32) * qk_scale
        k_bar = jax.lax.dot_general(
            s_bar, (q).astype(dtype),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)
        qkvbar_scratch[:, :, hh * hd:(hh + 1) * hd] = q_bar.astype(dtype)
        qkvbar_scratch[:, :, d + hh * hd:d + (hh + 1) * hd] = \
            k_bar.astype(dtype)
        qkvbar_scratch[:, :, 2 * d + hh * hd:2 * d + (hh + 1) * hd] = \
            v_bar.astype(dtype)
    qkv_bar2d = qkvbar_scratch[:].reshape(rows, 3 * d)
    qkvbbar[:] += jnp.sum(qkv_bar2d.astype(f32), axis=0, keepdims=True)
    wqkvbar[:] += jax.lax.dot_general(
        z2, qkv_bar2d, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    z2_bar = jax.lax.dot_general(qkv_bar2d, wqkv_ref[:],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)
    x1_bar = x2_bar + ln_bwd(z2_bar, chat2, rstd2, ln2s, s2bar, b2nbar)

    # stage 1: x1 = x + 0.5 rs F(L1(x))
    rs_acc = rs_acc + 0.5 * jnp.sum(x1_bar * f1)
    # Mosaic cannot store scalars to VMEM: accumulate as a [1,1] vector
    rsbar[:] += rs_acc.reshape(1, 1)
    z1_bar = ffn_bwd(0.5 * rs * x1_bar, z1, h1_1, h_1)
    x_bar = x1_bar + ln_bwd(z1_bar, chat1, rstd1, ln1s, s1bar, b1nbar)
    xbar_ref[:] = x_bar.astype(xbar_ref.dtype)


def macaron_bwd_block_b(b, n, d, dh, num_heads, requested=16):
    """Batch tile for the Macaron backward under its shape's scoped-VMEM
    plan (the chain holds ~2x the parallel field's live states); 0 when
    even one image does not fit (XLA-twin fallback)."""
    from odevit_tpu.kernels.vector_field import bwd_vmem_plan
    n_pad = -(-n // TOKEN_PAD) * TOKEN_PAD
    budget = bwd_vmem_plan(n, d, dh, num_heads)[1]
    weights = (3 * d * d + d * d + 2 * d * dh) * 6   # bf16 w + f32 bars
    # calibrated against Mosaic's stack accounting: the bb=16 CIFAR
    # frame measures 57.2M -> ~3.4M/img (the x->x1->x2 chain, two f32
    # hidden recomputes, qkv + per-head internals all live at once)
    per_img = (110 * n_pad * d + 24 * n_pad * dh + 48 * n_pad * n_pad)
    bb = max(requested, 1)
    while b % bb:
        bb //= 2
    while bb > 1 and weights + bb * per_img > budget:
        bb //= 2
    if weights + bb * per_img > budget:
        return 0
    return bb


def pallas_macaron_bwd(residuals, g, *, num_heads: int, scaler: float,
                       n_real: int):
    """Dispatch the native Macaron backward; cotangents for all 16
    operands. Falls back to the XLA-twin vjp when no tile fits."""
    (x, ln1s, ln1b, ln2s, ln2b, ln3s, ln3b, wqkv, qkvb, wout, outb,
     w1, b1, w2, b2, rs) = residuals
    b, n, d = x.shape
    dh = w1.shape[-1]
    n_real = n_real or n
    bb = macaron_bwd_block_b(b, n, d, dh, num_heads)
    if bb == 0:
        ref = functools.partial(_xla_macaron, num_heads=num_heads,
                                scaler=scaler, n_real=n_real)
        _, vjp = jax.vjp(ref, *residuals)
        return vjp(g)

    n_pad = -(-n // TOKEN_PAD) * TOKEN_PAD
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        x = jnp.pad(x, pad)
        g = jnp.pad(g, pad)
    x2d = x.reshape(b * n_pad, d)
    g2d = g.reshape(b * n_pad, d).astype(x.dtype)
    wqkv_c, wout_c, w1_c, w2_c = (w.astype(x.dtype)
                                  for w in (wqkv, wout, w1, w2))
    rows = bb * n_pad
    mat = lambda i: (0, 0)
    vec = lambda w: pl.BlockSpec((1, w), mat, memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    f32 = jnp.float32
    kernel = functools.partial(_macaron_bwd_kernel, num_heads=num_heads,
                               scaler=scaler, n_real=n_real, block_b=bb)
    outs = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        interpret=_interpret_default(),
        in_specs=[
            rowspec,
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
            rowspec,
        ],
        out_specs=(
            rowspec,
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
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * n_pad, d), f32),
            *(jax.ShapeDtypeStruct((1, d), f32) for _ in range(6)),
            jax.ShapeDtypeStruct((d, 3 * d), f32),
            jax.ShapeDtypeStruct((1, 3 * d), f32),
            jax.ShapeDtypeStruct((d, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((d, dh), f32),
            jax.ShapeDtypeStruct((1, dh), f32),
            jax.ShapeDtypeStruct((dh, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bb, n_pad, d), x.dtype),
            pltpu.VMEM((bb, n_pad, 3 * d), x.dtype),
        ],
    )(x2d, ln1s[None], ln1b[None], ln2s[None], ln2b[None], ln3s[None],
      ln3b[None], wqkv_c, qkvb[None].astype(f32), wout_c,
      outb[None].astype(f32), w1_c, b1[None].astype(f32), w2_c,
      b2[None].astype(f32), rs.reshape(1, 1).astype(f32), g2d)

    (xbar2d, s1b, b1n, s2b, b2n, s3b, b3n, wqkvb, qkvbb, woutb, outbb,
     w1b, b1b, w2b, b2b, rsb) = outs
    x_bar = xbar2d.reshape(b, n_pad, d)[:, :n, :].astype(residuals[0].dtype)
    return (x_bar, s1b[0], b1n[0], s2b[0], b2n[0], s3b[0], b3n[0],
            wqkvb, qkvbb[0], woutb, outbb[0],
            w1b, b1b[0], w2b, b2b[0], rsb.reshape(rs.shape))


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
    return pallas_macaron_bwd(residuals, g, num_heads=num_heads,
                              scaler=scaler,
                              n_real=n_real or residuals[0].shape[1])


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


def _macaron_tensors(vf_params):
    a = vf_params["attn"]
    f = vf_params["ffn"]
    return (
        vf_params["norm1"]["scale"], vf_params["norm1"]["bias"],
        vf_params["norm2"]["scale"], vf_params["norm2"]["bias"],
        vf_params["norm3"]["scale"], vf_params["norm3"]["bias"],
        a["qkv_kernel"], a["qkv_bias"], a["out_kernel"], a["out_bias"],
        f["fc1"]["kernel"], f["fc1"]["bias"],
        f["fc2"]["kernel"], f["fc2"]["bias"],
        vf_params["res_scale"])


def _macaron_block_b(b, requested):
    bb = max(requested, 1)
    while b % bb:
        bb //= 2
    return max(bb, 1)


def fused_macaron_euler_step_from_params(y, vf_params, *, num_heads: int,
                                         scaler: float, dt: float,
                                         block_b: int = 16,
                                         n_real: int = 0):
    """One fused Euler step, y + dt*f(y) emitted by the kernel.
    Inference-only (serving path; training integrates plain f evals)."""
    return _pallas_macaron(
        y, *_macaron_tensors(vf_params), num_heads=num_heads,
        scaler=scaler, block_b=_macaron_block_b(y.shape[0], block_b),
        n_real=n_real, euler_dt=dt)


def fused_macaron_rk4_step_from_params(y, vf_params, *, num_heads: int,
                                       scaler: float, dt: float,
                                       block_b: int = 16, n_real: int = 0):
    """One Kutta-3/8 rk4 step with fused stage advances — the k_i stage
    slopes never materialize in HBM (same rewrite as
    kernels/vector_field.fused_rk4_step_from_params):

        y2     = y + dt/3 * k1
        y3     = (2y - y2)                + dt   * k2
        y4     = (2y2 - y3)               + dt   * k3
        y_next = (-y/8 + 3/4*y3 + 3/8*y4) + dt/8 * k4

    Inference-only, like the fused Euler step."""
    tensors = _macaron_tensors(vf_params)
    bb = _macaron_block_b(y.shape[0], block_b)
    f32 = jnp.float32
    dtype = y.dtype

    def stage(y_i, base, c):
        return _pallas_macaron(y_i, *tensors, num_heads=num_heads,
                               scaler=scaler, block_b=bb, n_real=n_real,
                               euler_dt=c, base=base)

    def comb(*terms):
        # stage-state combinations accumulate in f32 (bf16 states would
        # leak rounding into the reconstructed dt*k_i terms)
        acc = sum(w * t.astype(f32) for w, t in terms)
        return acc.astype(dtype)

    y2 = stage(y, None, dt / 3.0)                      # euler-mode stage
    y3 = stage(y2, comb((2.0, y), (-1.0, y2)), dt)
    y4 = stage(y3, comb((2.0, y2), (-1.0, y3)), dt)
    return stage(y4, comb((-0.125, y), (0.75, y3), (0.375, y4)), dt / 8.0)
