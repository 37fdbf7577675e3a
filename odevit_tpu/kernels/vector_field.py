"""Fused Pallas vector-field kernel: one ODE function evaluation
(CenterNorm x2 + fused-QKV softmax attention + bias-free MLP + add) in a
single TPU kernel.

Why: profiling shows the XLA path is overhead/bandwidth-bound at CIFAR
shapes (~1% MXU, bf16 == f32 wall time): every sub-op round-trips
[B, N, D] activations (including the f32 MLP hidden, 4x wider) through
HBM, and the per-head batched attention lowers to many tiny padded ops.
This kernel keeps an entire evaluation resident in VMEM: HBM traffic per
eval drops to x-in + dx-out + weights (weights are grid-invariant blocks
-> fetched once and kept in VMEM across the batch grid).

Layout: the token axis is padded to a multiple of 128 (MXU/lane size).
Padded tokens are masked out of the attention keys, so real rows are
exactly equal to the unpadded computation; padded rows evolve
independently and are sliced away. CenterNorm/MLP are per-token, so
padding is invisible to them.

Scope: the softmax-attention ParallelVectorField forward (the hot path of
bench/inference and of the distillation student when diagnostics are
off), deterministic (no dropout), no attention-map output. Differentiable
via custom_vjp: the backward recomputes through the pure-XLA reference
implementation, so training can use the fast kernel forward with a
correct (slower) backward.

Numerics: centering + means + softmax + all matmul accumulation in f32;
activations stored bf16 between ops (matching the XLA path's dtype policy
at dtype=bfloat16). GELU uses an erf polynomial accurate to 1.5e-7
(Mosaic has no erf/erfc lowering).
"""

from __future__ import annotations

import functools
from typing import Any, Dict


def _interpret_default() -> bool:
    # Run the kernel in interpreter mode off-TPU (tests on the virtual
    # CPU mesh exercise identical code).
    import jax
    return jax.default_backend() != "tpu"

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Token-axis padding granularity: one bf16 sublane tile. Finer than the
# 128-lane size (attention scores just mask the padded keys) and measured
# 1.4x faster + 25x faster to compile than 128-padding at CIFAR shapes.
TOKEN_PAD = 16


def _erf(x):
    """Abramowitz-Stegun 7.1.26 (|err| <= 1.5e-7, far below bf16 eps)."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _vf_kernel(x_ref, cna_s_ref, cna_b_ref, cnm_s_ref, cnm_b_ref,
               wqkv_ref, wout_ref, w1_ref, w2_ref,
               *refs,
               num_heads: int, scaler: float, n_real: int, block_b: int,
               euler_dt: float = 0.0, emit_attn: bool = False,
               l2_attention: bool = False, has_bias: bool = False):
    # ref order: [qkvb, outb (if has_bias)] (inputs), dx_ref,
    #            [attn_ref (if emit_attn)] (outputs), ctx_scratch
    refs = list(refs)
    qkv_bias = refs.pop(0)[0] if has_bias else None
    out_bias = refs.pop(0)[0] if has_bias else None
    dx_ref = refs.pop(0)
    attn_ref = refs.pop(0) if emit_attn else None
    ctx_scratch = refs[-1]
    rows, d = x_ref.shape                  # rows = block_b * n_pad
    n_pad = rows // block_b
    hd = d // num_heads
    qk_scale = hd ** -0.5
    dtype = x_ref.dtype

    xf = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    cent = (xf - mean) * (d / (d - 1.0))
    cn_a = (cent * cna_s_ref[0] + cna_b_ref[0]).astype(dtype)
    cn_m = (cent * cnm_s_ref[0] + cnm_b_ref[0]).astype(dtype)

    # MLP branch: the f32 hidden lives only in registers/VMEM here.
    # (weights arrive pre-cast to the compute dtype)
    h = jnp.dot(cn_m, w1_ref[:], preferred_element_type=jnp.float32)
    h = _gelu(h).astype(dtype)
    mlp_o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)

    qkv32 = jnp.dot(cn_a, wqkv_ref[:], preferred_element_type=jnp.float32)
    if qkv_bias is not None:
        qkv32 = qkv32 + qkv_bias
    qkv = qkv32.astype(dtype).reshape(block_b, n_pad, 3 * d)

    # key mask: padded tokens never receive attention mass. Multiplicative
    # (0/1 on the exp'd scores) — jnp.where-style additive masks crash the
    # Mosaic lowering here.
    key_mask = (jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
                < n_real).astype(jnp.float32)[None]

    # Per-head batched matmuls over the whole tile: head slices live on
    # the lane axis (no transposes, no per-image loop).
    bdims = (((2,), (2,)), ((0,), (0,)))       # contract hd, batch TB
    pdims = (((2,), (1,)), ((0,), (0,)))       # [TB,N,N] x [TB,N,hd]
    for hh in range(num_heads):                # static, small
        q32 = qkv[:, :, hh * hd:(hh + 1) * hd].astype(jnp.float32)
        k = qkv[:, :, d + hh * hd:d + (hh + 1) * hd].astype(jnp.float32)
        v = qkv[:, :, 2 * d + hh * hd:2 * d + (hh + 1) * hd]
        if l2_attention:
            # exp(-||q-k||^2 * scale) row-normalized (no softmax);
            # expanded-form distance keeps the NxN interaction on the MXU
            qk = jax.lax.dot_general(q32, k, bdims,
                                     preferred_element_type=jnp.float32)
            q2 = jnp.sum(q32 * q32, axis=-1, keepdims=True)
            k2 = jnp.sum(k * k, axis=-1)[:, None, :]
            dist2 = q2 + k2 - 2.0 * qk
            e = jnp.exp(-dist2 * qk_scale) * key_mask
            p = (e / (jnp.sum(e, axis=-1, keepdims=True) + 1e-8)
                 ).astype(dtype)
        else:
            q = q32 * qk_scale
            s = jax.lax.dot_general(q, k, bdims,
                                    preferred_element_type=jnp.float32)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s) * key_mask
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
        ctx_h = jax.lax.dot_general(p, v, pdims,
                                    preferred_element_type=jnp.float32)
        ctx_scratch[:, :, hh * hd:(hh + 1) * hd] = ctx_h.astype(dtype)
        if emit_attn:
            attn_ref[:, hh, :, :] = p

    attn_o = jnp.dot(ctx_scratch[:].reshape(block_b * n_pad, d),
                     wout_ref[:],
                     preferred_element_type=jnp.float32)
    if out_bias is not None:
        attn_o = attn_o + out_bias
    dx = (mlp_o + attn_o) * scaler
    if euler_dt:
        # fused Euler step: emit y + dt*f(y) directly — saves one
        # state-sized elementwise pass (and its HBM round trip) per step
        dx = xf + euler_dt * dx
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _pallas_forward(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                    qkv_bias=None, out_bias=None, *,
                    num_heads: int, scaler: float, block_b: int,
                    n_real: int = 0, euler_dt: float = 0.0,
                    emit_attn: bool = False, l2_attention: bool = False):
    b, n, d = x.shape
    dh = w1.shape[-1]
    n_real = n_real or n
    n_pad = -(-n // TOKEN_PAD) * TOKEN_PAD
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    x2d = x.reshape(b * n_pad, d)
    # weights enter the kernel in the compute dtype (halves weight VMEM
    # at bf16; the f32 originals remain the custom-vjp residuals)
    wqkv, wout, w1, w2 = (w.astype(x.dtype) for w in (wqkv, wout, w1, w2))

    rows = block_b * n_pad
    grid = (b // block_b,)
    has_bias = qkv_bias is not None
    kernel = functools.partial(_vf_kernel, num_heads=num_heads,
                               scaler=scaler, n_real=n_real,
                               block_b=block_b, euler_dt=euler_dt,
                               emit_attn=emit_attn,
                               l2_attention=l2_attention,
                               has_bias=has_bias)
    mat = lambda i: (0, 0)

    out_specs = pl.BlockSpec((rows, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shapes = jax.ShapeDtypeStruct((b * n_pad, d), x.dtype)
    if emit_attn:
        out_specs = (out_specs,
                     pl.BlockSpec((block_b, num_heads, n_pad, n_pad),
                                  lambda i: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM))
        out_shapes = (out_shapes,
                      jax.ShapeDtypeStruct(
                          (b, num_heads, n_pad, n_pad), x.dtype))

    in_specs = [
        pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), mat, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), mat, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), mat, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), mat, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, 3 * d), mat, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, d), mat, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, dh), mat, memory_space=pltpu.VMEM),
        pl.BlockSpec((dh, d), mat, memory_space=pltpu.VMEM),
    ]
    operands = [x2d, cna_s[None], cna_b[None], cnm_s[None], cnm_b[None],
                wqkv, wout, w1, w2]
    if has_bias:
        in_specs += [pl.BlockSpec((1, 3 * d), mat, memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, d), mat, memory_space=pltpu.VMEM)]
        operands += [qkv_bias[None].astype(jnp.float32),
                     out_bias[None].astype(jnp.float32)]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=_interpret_default(),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((block_b, n_pad, d), x.dtype),
        ],
        # NOTE: no pl.CostEstimate here — supplying one sends this kernel
        # down a pathological XLA scheduling path (~300s compiles vs ~4s;
        # measured on v5e, jax 0.9).
    )(*operands)

    if emit_attn:
        out, attn = out
        out = out.reshape(b, n_pad, d)[:, :n, :]
        # padded QUERY rows carry garbage probabilities; slice to real
        return out, attn[:, :, :n, :n]
    out = out.reshape(b, n_pad, d)
    return out[:, :n, :] if n_pad != n else out


def _xla_reference(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                   qkv_bias=None, out_bias=None, *,
                   num_heads: int, scaler: float, n_real: int = 0,
                   return_attn: bool = False, l2_attention: bool = False):
    """Pure-XLA twin of the kernel (same math/dtype policy); used for the
    custom-vjp backward and for numerics tests. ``n_real < n`` masks the
    trailing (padded) tokens out of the attention keys."""
    b, n, d = x.shape
    hd = d // num_heads
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    cent = (xf - jnp.mean(xf, -1, keepdims=True)) * (d / (d - 1.0))
    cn_a = (cent * cna_s + cna_b).astype(dtype)
    cn_m = (cent * cnm_s + cnm_b).astype(dtype)

    h = jnp.dot(cn_m, w1.astype(dtype), preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h, approximate=False).astype(dtype)
    mlp_o = jnp.dot(h, w2.astype(dtype), preferred_element_type=jnp.float32)

    qkv = jnp.dot(cn_a, wqkv.astype(dtype),
                  preferred_element_type=jnp.float32)
    if qkv_bias is not None:
        qkv = qkv + qkv_bias
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)

    if l2_attention:
        q = heads(q)
        k = heads(k)
        v = heads(v).astype(dtype)
        qk = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
        d2 = (jnp.sum(q * q, -1, keepdims=True)
              + jnp.sum(k * k, -1)[:, :, None, :] - 2.0 * qk)
        e = jnp.exp(-d2 * hd ** -0.5)
        if n_real and n_real < n:
            e = e * (jnp.arange(n) < n_real)[None, None, None, :]
        p = (e / (jnp.sum(e, -1, keepdims=True) + 1e-8)).astype(dtype)
    else:
        q = heads(q) * hd ** -0.5
        k = heads(k)
        v = heads(v).astype(dtype)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        if n_real and n_real < n:
            key_mask = (jnp.arange(n) < n_real)
            s = jnp.where(key_mask[None, None, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                     preferred_element_type=jnp.float32)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, d).astype(dtype)
    attn_o = jnp.dot(ctx, wout.astype(dtype),
                     preferred_element_type=jnp.float32)
    if out_bias is not None:
        attn_o = attn_o + out_bias
    dx = ((mlp_o + attn_o) * scaler).astype(dtype)
    if return_attn:
        return dx, p
    return dx


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def fused_vf(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
             num_heads: int, scaler: float, block_b: int, n_real: int = 0):
    """Fused vector-field evaluation: dx = (MLP(CN(x)) + Attn(CN(x))) * c.

    Forward runs the Pallas kernel; backward recomputes via the XLA twin.
    ``x`` [B, N, D] with B % block_b == 0. ``n_real`` (when nonzero and
    < N) marks trailing tokens as padding: they get no attention mass and
    callers integrating a pre-padded trajectory should ignore them.
    """
    return _pallas_forward(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                           w1, w2, num_heads=num_heads, scaler=scaler,
                           block_b=block_b, n_real=n_real)


def _fused_vf_fwd(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                  num_heads, scaler, block_b, n_real):
    out = fused_vf(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                   num_heads, scaler, block_b, n_real)
    return out, (x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2)


def _fused_vf_bwd(num_heads, scaler, block_b, n_real, residuals, g):
    from odevit_tpu.kernels.vector_field_bwd import pallas_vf_bwd
    return pallas_vf_bwd(*residuals, g, num_heads=num_heads,
                         scaler=scaler, block_b=block_b, n_real=n_real)


fused_vf.defvjp(_fused_vf_fwd, _fused_vf_bwd)


def fused_vf_from_params(x, vf_params: Dict[str, Any], *, num_heads: int,
                         scaler: float, block_b: int = 16,
                         use_pallas: bool = True, n_real: int = 0):
    """Apply the fused kernel (or its XLA twin) from a ParallelVectorField
    params subtree (params['vf'])."""
    args = (x,
            vf_params["norm_attn"]["scale"], vf_params["norm_attn"]["bias"],
            vf_params["norm_mlp"]["scale"], vf_params["norm_mlp"]["bias"],
            vf_params["attn"]["qkv_kernel"], vf_params["attn"]["out_kernel"],
            vf_params["mlp"]["fc1_kernel"], vf_params["mlp"]["fc2_kernel"])
    if use_pallas:
        b = x.shape[0]
        bb = block_b
        while b % bb:
            bb //= 2
        return fused_vf(*args, num_heads, scaler, max(bb, 1), n_real)
    return _xla_reference(*args, num_heads=num_heads, scaler=scaler,
                          n_real=n_real)


def fused_euler_step_from_params(y, vf_params, *, num_heads: int,
                                 scaler: float, dt: float,
                                 block_b: int = 16, n_real: int = 0):
    """One fused Euler step: y_{t+1} = y + dt * f(y), single kernel.

    Inference-only (no custom_vjp; training integrates dx and lets the
    solver combine — the saved pass only matters on the serving path).
    """
    b = y.shape[0]
    bb = block_b
    while b % bb:
        bb //= 2
    return _pallas_forward(
        y, vf_params["norm_attn"]["scale"], vf_params["norm_attn"]["bias"],
        vf_params["norm_mlp"]["scale"], vf_params["norm_mlp"]["bias"],
        vf_params["attn"]["qkv_kernel"], vf_params["attn"]["out_kernel"],
        vf_params["mlp"]["fc1_kernel"], vf_params["mlp"]["fc2_kernel"],
        num_heads=num_heads, scaler=scaler, block_b=max(bb, 1),
        n_real=n_real, euler_dt=dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def fused_vf_attn(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                  num_heads: int, scaler: float, block_b: int,
                  n_real: int = 0):
    """Fused evaluation that ALSO returns the per-head attention maps
    [B, H, N, N] — the training-path variant (JaSMin and attention
    distillation consume the maps). Backward recomputes through the XLA
    twin with cotangents flowing into both outputs."""
    return _pallas_forward(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                           w1, w2, num_heads=num_heads, scaler=scaler,
                           block_b=block_b, n_real=n_real, emit_attn=True)


def _fused_vf_attn_fwd(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                       num_heads, scaler, block_b, n_real):
    out = fused_vf_attn(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                        num_heads, scaler, block_b, n_real)
    return out, (x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2)


def _fused_vf_attn_bwd(num_heads, scaler, block_b, n_real, residuals, g):
    from odevit_tpu.kernels.vector_field_bwd import pallas_vf_bwd
    g_dx, g_attn = g
    return pallas_vf_bwd(*residuals, g_dx, g_attn, num_heads=num_heads,
                         scaler=scaler, block_b=block_b, n_real=n_real)


fused_vf_attn.defvjp(_fused_vf_attn_fwd, _fused_vf_attn_bwd)


def fused_vf_attn_from_params(x, vf_params, *, num_heads: int,
                              scaler: float, block_b: int = 16,
                              use_pallas: bool = True, n_real: int = 0):
    args = (x,
            vf_params["norm_attn"]["scale"], vf_params["norm_attn"]["bias"],
            vf_params["norm_mlp"]["scale"], vf_params["norm_mlp"]["bias"],
            vf_params["attn"]["qkv_kernel"], vf_params["attn"]["out_kernel"],
            vf_params["mlp"]["fc1_kernel"], vf_params["mlp"]["fc2_kernel"])
    if use_pallas:
        b = x.shape[0]
        bb = block_b
        while b % bb:
            bb //= 2
        return fused_vf_attn(*args, num_heads, scaler, max(bb, 1), n_real)
    return _xla_reference(*args, num_heads=num_heads, scaler=scaler,
                          n_real=n_real, return_attn=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def fused_vf_l2(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                qkv_bias, out_bias,
                num_heads: int, scaler: float, block_b: int,
                n_real: int = 0):
    """Fused evaluation with L2-distance attention (exp(-||q-k||^2 scale)
    row-normalized; biased projections) — the reference's
    Lipschitz-controlled variant (L2SelfAttention)."""
    return _pallas_forward(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                           w1, w2, qkv_bias, out_bias,
                           num_heads=num_heads, scaler=scaler,
                           block_b=block_b, n_real=n_real,
                           l2_attention=True)


def _fused_vf_l2_fwd(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                     qkv_bias, out_bias, num_heads, scaler, block_b,
                     n_real):
    out = fused_vf_l2(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                      qkv_bias, out_bias, num_heads, scaler, block_b,
                      n_real)
    return out, (x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                 qkv_bias, out_bias)


def _fused_vf_l2_bwd(num_heads, scaler, block_b, n_real, residuals, g):
    ref = functools.partial(_xla_reference, num_heads=num_heads,
                            scaler=scaler, n_real=n_real,
                            l2_attention=True)
    _, vjp = jax.vjp(ref, *residuals)
    return vjp(g)


fused_vf_l2.defvjp(_fused_vf_l2_fwd, _fused_vf_l2_bwd)


def fused_vf_l2_from_params(x, vf_params, *, num_heads: int, scaler: float,
                            block_b: int = 16, use_pallas: bool = True,
                            n_real: int = 0):
    """Apply the L2-attention fused kernel from an L2 ParallelVectorField
    params subtree (separate q/k/v kernels + biases are fused here)."""
    a = vf_params["attn"]
    wqkv = jnp.concatenate([a["q_kernel"], a["k_kernel"], a["v_kernel"]],
                           axis=1)
    qkv_bias = jnp.concatenate([a["q_bias"], a["k_bias"], a["v_bias"]])
    args = (x,
            vf_params["norm_attn"]["scale"], vf_params["norm_attn"]["bias"],
            vf_params["norm_mlp"]["scale"], vf_params["norm_mlp"]["bias"],
            wqkv, a["out_kernel"],
            vf_params["mlp"]["fc1_kernel"], vf_params["mlp"]["fc2_kernel"],
            qkv_bias, a["out_bias"])
    if use_pallas:
        b = x.shape[0]
        bb = block_b
        while b % bb:
            bb //= 2
        return fused_vf_l2(*args, num_heads, scaler, max(bb, 1), n_real)
    return _xla_reference(*args, num_heads=num_heads, scaler=scaler,
                          n_real=n_real, l2_attention=True)
