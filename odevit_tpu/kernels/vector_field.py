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

Scope: the ParallelVectorField evaluation in every training/serving
flavor — softmax or L2-distance attention (biased projections for L2),
optional attention-map output, optional in-kernel JaSMin order
statistics (the maps never leave VMEM), optional in-kernel pltpu
dropout, optional fused Euler update for serving. Differentiable via
custom_vjp backed by the native backward kernel
(kernels/vector_field_bwd.py) under a shape-aware scoped-VMEM plan
(bwd_vmem_plan); shapes beyond the plan fall back to the XLA-twin vjp.

Numerics: centering + means + softmax + all matmul accumulation in f32;
activations stored bf16 between ops (matching the XLA path's dtype policy
at dtype=bfloat16). GELU uses an erf polynomial accurate to 1.5e-7
(Mosaic has no erf/erfc lowering).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import numpy as np


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


# Dropout mask sites (seed stream ids). Masks are seeded per
# (base_seed, site, IMAGE index) — never per grid block — so the backward
# kernel, which runs at a smaller batch tile, regenerates bit-identical
# masks by re-seeding with the same tuples.
DROP_SITE_H, DROP_SITE_MLP_OUT, DROP_SITE_ATTN_OUT, DROP_SITE_P = 0, 1, 2, 3


def _keep_mask(rate: float, shape):
    """Inverted-dropout keep mask (already scaled by 1/(1-rate)) from the
    current Mosaic prng stream."""
    bits = pltpu.prng_random_bits(shape)
    thresh = jnp.uint32(min(int(rate * 4294967296.0), 0xFFFFFFFF))
    keep = pltpu.bitcast(bits, jnp.uint32) >= thresh
    return keep.astype(jnp.float32) * (1.0 / (1.0 - rate))


_SEED_GOLD = 0x9E3779B9  # folds the site id into the seed word: Mosaic's
#                          prng_set_seed_32 accepts at most TWO values, so
#                          the stream id is (seed + GOLD*(site+1), image)


def _site_seed(seed, site: int):
    mix = (_SEED_GOLD * (site + 1)) & 0xFFFFFFFF
    return seed + jnp.int32(np.uint32(mix).astype(np.int32))


def _mask_2d(rate: float, seed, site: int, img0, block_b: int,
             n_pad: int, width: int):
    """[block_b * n_pad, width] keep mask, seeded per image."""
    s = _site_seed(seed, site)
    parts = []
    for bi in range(block_b):
        pltpu.prng_seed(s, img0 + bi)
        parts.append(_keep_mask(rate, (n_pad, width)))
    return parts[0] if block_b == 1 else jnp.concatenate(parts, axis=0)


def _mask_p(rate: float, seed, head: int, img0, block_b: int, n_pad: int):
    """[block_b, n_pad, n_pad] per-head attention-prob keep mask."""
    s = _site_seed(seed, DROP_SITE_P + head)
    parts = []
    for bi in range(block_b):
        pltpu.prng_seed(s, img0 + bi)
        parts.append(_keep_mask(rate, (n_pad, n_pad)))
    return jnp.stack(parts, axis=0)


def _mask_gen_kernel(seed_ref, mh_ref, mmo_ref, mao_ref, mp_ref, *,
                     attn_drop: float, proj_drop: float, mlp_drop: float,
                     num_heads: int, block_b: int, n_pad: int):
    """Standalone dropout-mask generator: reproduces exactly the masks the
    fused forward kernel draws (same per-(site, image) seeding), so an
    XLA backward can apply them when the fused backward kernel's weight
    accumulators don't fit VMEM (d >= ~768)."""
    seed = seed_ref[0]
    img0 = pl.program_id(0) * block_b
    dh = mh_ref.shape[-1]
    d = mmo_ref.shape[-1]
    if mlp_drop > 0.0:
        mh_ref[:] = _mask_2d(mlp_drop, seed, DROP_SITE_H, img0, block_b,
                             n_pad, dh)
        mmo_ref[:] = _mask_2d(mlp_drop, seed, DROP_SITE_MLP_OUT, img0,
                              block_b, n_pad, d)
    else:
        mh_ref[:] = jnp.ones_like(mh_ref)
        mmo_ref[:] = jnp.ones_like(mmo_ref)
    if proj_drop > 0.0:
        mao_ref[:] = _mask_2d(proj_drop, seed, DROP_SITE_ATTN_OUT, img0,
                              block_b, n_pad, d)
    else:
        mao_ref[:] = jnp.ones_like(mao_ref)
    if attn_drop > 0.0:
        for hh in range(num_heads):
            mp_ref[:, hh, :, :] = _mask_p(attn_drop, seed, hh, img0,
                                          block_b, n_pad)
    else:
        mp_ref[:] = jnp.ones_like(mp_ref)


def generate_dropout_masks(b, n, d, dh, num_heads, seed, *,
                           attn_drop: float, proj_drop: float,
                           mlp_drop: float, block_b: int = 4):
    """The fused forward's dropout masks as explicit arrays
    (mask_h [B,N,dh], mask_mo [B,N,D], mask_ao [B,N,D],
    mask_p [B,H,N,N]; all 1/(1-rate)-scaled, sliced to real tokens)."""
    n_pad = -(-n // TOKEN_PAD) * TOKEN_PAD
    while b % block_b:
        block_b //= 2
    block_b = max(block_b, 1)
    rows = block_b * n_pad
    kernel = functools.partial(
        _mask_gen_kernel, attn_drop=attn_drop, proj_drop=proj_drop,
        mlp_drop=mlp_drop, num_heads=num_heads, block_b=block_b,
        n_pad=n_pad)
    f32 = jnp.float32
    mh, mmo, mao, mp = pl.pallas_call(
        kernel,
        grid=(b // block_b,),
        interpret=_interpret_default(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((rows, dh), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, num_heads, n_pad, n_pad),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * n_pad, dh), f32),
            jax.ShapeDtypeStruct((b * n_pad, d), f32),
            jax.ShapeDtypeStruct((b * n_pad, d), f32),
            jax.ShapeDtypeStruct((b, num_heads, n_pad, n_pad), f32),
        ),
    )(jnp.asarray(seed, jnp.int32).reshape(1))
    shape3 = lambda m, w: m.reshape(b, n_pad, w)[:, :n]
    return (shape3(mh, dh), shape3(mmo, d), shape3(mao, d),
            mp[:, :, :n, :n])


def _vf_kernel(x_ref, cna_s_ref, cna_b_ref, cnm_s_ref, cnm_b_ref,
               wqkv_ref, wout_ref, w1_ref, w2_ref,
               *refs,
               num_heads: int, scaler: float, n_real: int, block_b: int,
               euler_dt: float = 0.0, emit_attn: bool = False,
               l2_attention: bool = False, has_bias: bool = False,
               attn_drop: float = 0.0, proj_drop: float = 0.0,
               mlp_drop: float = 0.0, has_seed: bool = False,
               emit_masks: bool = False, jas_kk: int = 0,
               has_base: bool = False, emit_resid: bool = False):
    # ref order: [seed (if has_seed)], [qkvb, outb (if has_bias)],
    #            [base (if has_base)] (inputs),
    #            dx_ref, [attn_ref (if emit_attn)], [jas_ref (if jas_k)],
    #            [rqkv_ref, rh1_ref (if emit_resid)],
    #            [mask refs (if emit_masks)] (outputs), ctx_scratch
    refs = list(refs)
    seed_ref = refs.pop(0) if has_seed else None
    qkv_bias = refs.pop(0)[0] if has_bias else None
    out_bias = refs.pop(0)[0] if has_bias else None
    base_ref = refs.pop(0) if has_base else None
    dx_ref = refs.pop(0)
    attn_ref = refs.pop(0) if emit_attn else None
    jas_ref = refs.pop(0) if jas_kk else None
    rqkv_ref = refs.pop(0) if emit_resid else None
    rh1_ref = refs.pop(0) if emit_resid else None
    if emit_masks:
        mh_ref, mmo_ref, mao_ref, mp_ref = refs[:4]
        refs = refs[4:]
    ctx_scratch = refs[-1]
    rows, d = x_ref.shape                  # rows = block_b * n_pad
    n_pad = rows // block_b
    hd = d // num_heads
    qk_scale = hd ** -0.5
    dtype = x_ref.dtype
    seed = seed_ref[0] if has_seed else None
    img0 = pl.program_id(0) * block_b if has_seed else None

    xf = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    cent = (xf - mean) * (d / (d - 1.0))
    cn_a = (cent * cna_s_ref[0] + cna_b_ref[0]).astype(dtype)
    cn_m = (cent * cnm_s_ref[0] + cnm_b_ref[0]).astype(dtype)

    # MLP branch: the f32 hidden lives only in registers/VMEM here.
    # (weights arrive pre-cast to the compute dtype)
    h = jnp.dot(cn_m, w1_ref[:], preferred_element_type=jnp.float32)
    if emit_resid:
        # pre-GELU hidden, compute-dtype: the stash-path backward reads
        # it instead of recomputing the fc1 matmul (residual stashing —
        # trades HBM traffic for recompute FLOPs)
        rh1_ref[:] = h.astype(dtype)
    h = _gelu(h).astype(dtype)
    if mlp_drop > 0.0:
        mask_h = _mask_2d(mlp_drop, seed, DROP_SITE_H, img0, block_b,
                          n_pad, h.shape[-1])
        h = (h.astype(jnp.float32) * mask_h).astype(dtype)
        if emit_masks:
            mh_ref[:] = mask_h
    mlp_o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    if mlp_drop > 0.0:
        mask_mo = _mask_2d(mlp_drop, seed, DROP_SITE_MLP_OUT, img0,
                           block_b, n_pad, d)
        mlp_o = mlp_o * mask_mo
        if emit_masks:
            mmo_ref[:] = mask_mo

    qkv32 = jnp.dot(cn_a, wqkv_ref[:], preferred_element_type=jnp.float32)
    if qkv_bias is not None:
        qkv32 = qkv32 + qkv_bias
    qkv = qkv32.astype(dtype).reshape(block_b, n_pad, 3 * d)
    if emit_resid:
        # post-bias, compute-dtype-rounded qkv — EXACTLY the tensor the
        # backward's in-kernel recompute produces (it also rounds qkv32
        # to the compute dtype before the head slicing)
        rqkv_ref[:] = qkv.reshape(rows, 3 * d)

    # key mask: padded tokens never receive attention mass. Multiplicative
    # (0/1 on the exp'd scores) — jnp.where-style additive masks crash the
    # Mosaic lowering here.
    key_mask = (jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
                < n_real).astype(jnp.float32)[None]

    # Per-head batched matmuls over the whole tile: head slices live on
    # the lane axis (no transposes, no per-image loop).
    bdims = (((2,), (2,)), ((0,), (0,)))       # contract hd, batch TB
    pdims = (((2,), (1,)), ((0,), (0,)))       # [TB,N,N] x [TB,N,hd]
    jas_ids = (jax.lax.broadcasted_iota(
        jnp.int32, (block_b, n_pad, n_pad), 2).astype(jnp.float32)
        if jas_kk else None)                   # hoisted: one VPU pass,
    #                                            not one per head
    # ids - n_pad, precomputed so the per-pass suppression mask is two
    # ops (mul+add): is_m*(ids-n_pad)+n_pad == ids*is_m+(1-is_m)*n_pad
    jas_ids_shift = jas_ids - float(n_pad) if jas_kk else None
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
        if emit_attn:
            # returned maps are PRE-dropout (torch MHA convention)
            attn_ref[:, hh, :, :] = p
        if jas_kk:
            # JaSMin order statistics IN VMEM: the [TB, N, N] map never
            # leaves the kernel. kk max-extraction passes on the same
            # bf16-rounded values the emitting path would hand XLA, so
            # the statistics match jasmin_order_stats(maps) exactly.
            # Suppression is arithmetic (-BIG at the first argmax
            # occurrence) — iota/min select exactly one column per pass.
            # All-f32 selection lanes: int32 index arithmetic lowers
            # ~4x slower on the VPU (measured 10.6 -> 2.6 ms/eval), and
            # bf16 comparisons are unsupported by the target.
            # (A tie-batched variant — remove ALL copies of the max per
            # pass, cover the spanned ranks in closed form — measured
            # SLOWER on-chip despite fewer NxN ops/pass: +4% at
            # d=768/k=2, +37% at d=192/k=10; the per-pass [TB,N] lane
            # rowsum it needs outweighs the saved selection ops. The
            # BACKWARD no longer reruns these passes either way — it
            # scatters by value from the saved statistics residual.)
            kk = jas_kk
            cur = p.astype(jnp.float32)
            jas_ref[:, hh, 4, :] = jnp.sum(
                jnp.clip(cur, 1e-12, 1.0), axis=-1)
            ids = jas_ids
            for j in range(kk):
                m = jnp.max(cur, axis=-1, keepdims=True)
                if j == 0:
                    jas_ref[:, hh, 0, :] = m[:, :, 0]
                if j == 1:
                    jas_ref[:, hh, 1, :] = m[:, :, 0]
                if j == kk - 2:
                    jas_ref[:, hh, 2, :] = m[:, :, 0]
                if j == kk - 1:
                    jas_ref[:, hh, 3, :] = m[:, :, 0]
                if j < kk - 1:
                    is_m = (cur >= m).astype(jnp.float32)
                    masked = is_m * jas_ids_shift + float(n_pad)
                    fidx = jnp.min(masked, axis=-1, keepdims=True)
                    first = (ids == fidx).astype(jnp.float32)
                    cur = cur - first * 1e30
        if attn_drop > 0.0:
            mask_p = _mask_p(attn_drop, seed, hh, img0, block_b, n_pad)
            p = (p.astype(jnp.float32) * mask_p).astype(dtype)
            if emit_masks:
                mp_ref[:, hh, :, :] = mask_p
        ctx_h = jax.lax.dot_general(p, v, pdims,
                                    preferred_element_type=jnp.float32)
        ctx_scratch[:, :, hh * hd:(hh + 1) * hd] = ctx_h.astype(dtype)

    attn_o = jnp.dot(ctx_scratch[:].reshape(block_b * n_pad, d),
                     wout_ref[:],
                     preferred_element_type=jnp.float32)
    if out_bias is not None:
        attn_o = attn_o + out_bias
    if proj_drop > 0.0:
        mask_ao = _mask_2d(proj_drop, seed, DROP_SITE_ATTN_OUT, img0,
                           block_b, n_pad, d)
        attn_o = attn_o * mask_ao
        if emit_masks:
            mao_ref[:] = mask_ao
    dx = (mlp_o + attn_o) * scaler
    if has_base:
        # fused stage advance (rk4 3/8 route): emit base + c*dt*f(y)
        # where base is a linear combination of earlier stage states
        # computed in XLA — the k_i stage slopes never hit HBM
        dx = base_ref[:].astype(jnp.float32) + euler_dt * dx
    elif euler_dt:
        # fused Euler step: emit y + dt*f(y) directly — saves one
        # state-sized elementwise pass (and its HBM round trip) per step
        dx = xf + euler_dt * dx
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _pallas_forward(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                    qkv_bias=None, out_bias=None, *,
                    num_heads: int, scaler: float, block_b: int,
                    n_real: int = 0, euler_dt: float = 0.0,
                    emit_attn: bool = False, l2_attention: bool = False,
                    seed=None, attn_drop: float = 0.0,
                    proj_drop: float = 0.0, mlp_drop: float = 0.0,
                    emit_masks: bool = False, jas_kk: int = 0,
                    base=None, emit_resid: bool = False):
    b, n, d = x.shape
    dh = w1.shape[-1]
    n_real = n_real or n
    n_pad = -(-n // TOKEN_PAD) * TOKEN_PAD
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        if base is not None:
            base = jnp.pad(base, ((0, 0), (0, n_pad - n), (0, 0)))
    x2d = x.reshape(b * n_pad, d)
    # weights enter the kernel in the compute dtype (halves weight VMEM
    # at bf16; the f32 originals remain the custom-vjp residuals)
    wqkv, wout, w1, w2 = (w.astype(x.dtype) for w in (wqkv, wout, w1, w2))

    has_drop = attn_drop > 0.0 or proj_drop > 0.0 or mlp_drop > 0.0
    has_seed = seed is not None and has_drop
    assert not (has_drop and not has_seed), \
        "dropout in the fused kernel needs a seed"
    assert not (emit_masks and not has_seed)

    rows = block_b * n_pad
    grid = (b // block_b,)
    has_bias = qkv_bias is not None
    kernel = functools.partial(_vf_kernel, num_heads=num_heads,
                               scaler=scaler, n_real=n_real,
                               block_b=block_b, euler_dt=euler_dt,
                               emit_attn=emit_attn,
                               l2_attention=l2_attention,
                               has_bias=has_bias,
                               attn_drop=attn_drop if has_seed else 0.0,
                               proj_drop=proj_drop if has_seed else 0.0,
                               mlp_drop=mlp_drop if has_seed else 0.0,
                               has_seed=has_seed, emit_masks=emit_masks,
                               jas_kk=jas_kk, has_base=base is not None,
                               emit_resid=emit_resid)
    mat = lambda i: (0, 0)

    out_specs = [pl.BlockSpec((rows, d), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((b * n_pad, d), x.dtype)]
    if emit_attn:
        out_specs.append(pl.BlockSpec((block_b, num_heads, n_pad, n_pad),
                                      lambda i: (i, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(
            (b, num_heads, n_pad, n_pad), x.dtype))
    if jas_kk:
        from odevit_tpu.losses.jasmin import JAS_ROWS
        out_specs.append(pl.BlockSpec(
            (block_b, num_heads, JAS_ROWS, n_pad),
            lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(
            (b, num_heads, JAS_ROWS, n_pad), jnp.float32))
    if emit_resid:
        out_specs += [
            pl.BlockSpec((rows, 3 * d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, dh), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((b * n_pad, 3 * d), x.dtype),
            jax.ShapeDtypeStruct((b * n_pad, dh), x.dtype),
        ]
    if emit_masks:
        out_specs += [
            pl.BlockSpec((rows, dh), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, num_heads, n_pad, n_pad),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((b * n_pad, dh), jnp.float32),
            jax.ShapeDtypeStruct((b * n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b * n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, num_heads, n_pad, n_pad),
                                 jnp.float32),
        ]

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
    if has_seed:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(seed, jnp.int32).reshape(1))
    if has_bias:
        in_specs += [pl.BlockSpec((1, 3 * d), mat, memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, d), mat, memory_space=pltpu.VMEM)]
        operands += [qkv_bias[None].astype(jnp.float32),
                     out_bias[None].astype(jnp.float32)]
    if base is not None:
        in_specs.append(pl.BlockSpec((rows, d), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(base.reshape(b * n_pad, d).astype(x.dtype))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=_interpret_default(),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=(tuple(out_shapes) if len(out_shapes) > 1
                   else out_shapes[0]),
        scratch_shapes=[
            pltpu.VMEM((block_b, n_pad, d), x.dtype),
        ],
        # NOTE: no pl.CostEstimate here — supplying one sends this kernel
        # down a pathological XLA scheduling path (~300s compiles vs ~4s;
        # measured on v5e, jax 0.9).
    )(*operands)

    if not isinstance(out, (tuple, list)):
        out = (out,)
    out = list(out)
    dx = out.pop(0).reshape(b, n_pad, d)[:, :n, :]
    results = [dx]
    if emit_attn:
        # padded QUERY rows carry garbage probabilities; slice to real
        results.append(out.pop(0)[:, :, :n, :n])
    if jas_kk:
        # query rows live on the LAST axis here; slice padded rows off
        results.append(out.pop(0)[:, :, :, :n])
    if emit_resid:
        # residuals stay in the PADDED 2-D row layout [b*n_pad, .]: the
        # backward re-pads x to the same n_pad, so rows align without a
        # slice/re-pad round trip
        results.append((out.pop(0), out.pop(0)))
    if emit_masks:
        results.append(tuple(out))      # (mask_h, mask_mo, mask_ao, mask_p)
    return results[0] if len(results) == 1 else tuple(results)


def _xla_reference(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                   qkv_bias=None, out_bias=None, *,
                   num_heads: int, scaler: float, n_real: int = 0,
                   return_attn: bool = False, l2_attention: bool = False,
                   masks=None):
    """Pure-XLA twin of the kernel (same math/dtype policy); used for the
    custom-vjp backward and for numerics tests. ``n_real < n`` masks the
    trailing (padded) tokens out of the attention keys. ``masks``
    (mask_h [B,N,dh], mask_mo [B,N,D], mask_ao [B,N,D],
    mask_p [B,H,N,N]; already 1/(1-rate)-scaled keep masks, or None per
    entry) reproduce the fused kernel's dropout exactly — used by the
    big-shape backward fallback."""
    b, n, d = x.shape
    hd = d // num_heads
    dtype = x.dtype
    mask_h = mask_mo = mask_ao = mask_p = None
    if masks is not None:
        mask_h, mask_mo, mask_ao, mask_p = masks
    xf = x.astype(jnp.float32)
    cent = (xf - jnp.mean(xf, -1, keepdims=True)) * (d / (d - 1.0))
    cn_a = (cent * cna_s + cna_b).astype(dtype)
    cn_m = (cent * cnm_s + cnm_b).astype(dtype)

    h = jnp.dot(cn_m, w1.astype(dtype), preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h, approximate=False).astype(dtype)
    if mask_h is not None:
        h = (h.astype(jnp.float32) * mask_h).astype(dtype)
    mlp_o = jnp.dot(h, w2.astype(dtype), preferred_element_type=jnp.float32)
    if mask_mo is not None:
        mlp_o = mlp_o * mask_mo

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
    p_used = p
    if mask_p is not None:
        p_used = (p.astype(jnp.float32) * mask_p).astype(dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p_used, v,
                     preferred_element_type=jnp.float32)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, d).astype(dtype)
    attn_o = jnp.dot(ctx, wout.astype(dtype),
                     preferred_element_type=jnp.float32)
    if out_bias is not None:
        attn_o = attn_o + out_bias
    if mask_ao is not None:
        attn_o = attn_o * mask_ao
    dx = ((mlp_o + attn_o) * scaler).astype(dtype)
    if return_attn:
        return dx, p          # pre-dropout maps (kernel convention)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def fused_vf_stash(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                   num_heads: int, scaler: float, block_b: int,
                   n_real: int = 0):
    """fused_vf with RESIDUAL STASHING (VERDICT r4 item 4): the forward
    additionally writes its post-bias compute-dtype qkv [B*n_pad, 3D] and
    pre-GELU hidden h1 [B*n_pad, dh] to HBM as extra vjp residuals, and
    the backward skips the two recompute matmuls (6*d^2 + 2*d*dh
    FLOPs/row, ~21%% of the backward kernels' compute at TS-Base) in
    exchange for the write+read HBM traffic. Deterministic softmax path
    only. qkv is exact (the recompute also rounds to the compute dtype);
    h1 matches to compute-dtype rounding (exact when dtype is f32 —
    on-chip bf16 runs see ~1e-3-relative deviation in the GELU-grad
    factor), so this variant is opt-in (see fast_steps stash flags)."""
    out = _pallas_forward(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                          w1, w2, num_heads=num_heads, scaler=scaler,
                          block_b=block_b, n_real=n_real, emit_resid=True)
    return out[0]


def _fused_vf_stash_fwd(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1,
                        w2, num_heads, scaler, block_b, n_real):
    dx, (rqkv, rh1) = _pallas_forward(
        x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
        num_heads=num_heads, scaler=scaler, block_b=block_b,
        n_real=n_real, emit_resid=True)
    return dx, (x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                rqkv, rh1)


def _fused_vf_stash_bwd(num_heads, scaler, block_b, n_real, residuals, g):
    from odevit_tpu.kernels.vector_field_bwd import pallas_vf_bwd
    *tensors, rqkv, rh1 = residuals
    return pallas_vf_bwd(*tensors, g, num_heads=num_heads,
                         scaler=scaler, block_b=block_b, n_real=n_real,
                         resid_qkv=rqkv, resid_h1=rh1)


fused_vf_stash.defvjp(_fused_vf_stash_fwd, _fused_vf_stash_bwd)


def fused_vf_from_params(x, vf_params: Dict[str, Any], *, num_heads: int,
                         scaler: float, block_b: int = 16,
                         use_pallas: bool = True, n_real: int = 0,
                         vmem_budget=None, stash: bool = False):
    """Apply the fused kernel (or its XLA twin) from a ParallelVectorField
    params subtree (params['vf']). ``vmem_budget`` overrides the tile
    chooser's VMEM budget — training steps pass their jit's raised
    scoped-limit plan so forward kernels tile as large as it allows.
    ``stash=True`` selects the residual-stashing variant (Pallas only)."""
    args = (x,
            vf_params["norm_attn"]["scale"], vf_params["norm_attn"]["bias"],
            vf_params["norm_mlp"]["scale"], vf_params["norm_mlp"]["bias"],
            vf_params["attn"]["qkv_kernel"], vf_params["attn"]["out_kernel"],
            vf_params["mlp"]["fc1_kernel"], vf_params["mlp"]["fc2_kernel"])
    if use_pallas:
        bb = auto_block_b(x.shape[0], x.shape[1], x.shape[2],
                          vf_params["mlp"]["fc1_kernel"].shape[-1],
                          num_heads, requested=block_b,
                          budget_override=vmem_budget, emit_resid=stash,
                          itemsize=jnp.dtype(x.dtype).itemsize)
        if stash:
            return fused_vf_stash(*args, num_heads, scaler, bb, n_real)
        return fused_vf(*args, num_heads, scaler, bb, n_real)
    return _xla_reference(*args, num_heads=num_heads, scaler=scaler,
                          n_real=n_real)


def fused_euler_step_from_params(y, vf_params, *, num_heads: int,
                                 scaler: float, dt: float,
                                 block_b: int = 16, n_real: int = 0,
                                 vmem_budget=None):
    """One fused Euler step: y_{t+1} = y + dt * f(y), single kernel.

    Inference-only (no custom_vjp; training integrates dx and lets the
    solver combine — the saved pass only matters on the serving path).
    """
    bb = auto_block_b(y.shape[0], y.shape[1], y.shape[2],
                      vf_params["mlp"]["fc1_kernel"].shape[-1],
                      num_heads, requested=block_b, extra_states=1,
                      budget_override=vmem_budget,
                      itemsize=jnp.dtype(y.dtype).itemsize)
    return _pallas_forward(
        y, vf_params["norm_attn"]["scale"], vf_params["norm_attn"]["bias"],
        vf_params["norm_mlp"]["scale"], vf_params["norm_mlp"]["bias"],
        vf_params["attn"]["qkv_kernel"], vf_params["attn"]["out_kernel"],
        vf_params["mlp"]["fc1_kernel"], vf_params["mlp"]["fc2_kernel"],
        num_heads=num_heads, scaler=scaler, block_b=bb,
        n_real=n_real, euler_dt=dt)


def _vf_euler_chain_kernel(x_ref, cna_s_ref, cna_b_ref, cnm_s_ref,
                           cnm_b_ref, wqkv_ref, wout_ref, w1_ref, w2_ref,
                           y_ref, ctx_scratch, *, num_heads: int,
                           scaler: float, n_real: int, block_b: int,
                           dt: float, chain: int):
    """``chain`` fused Euler steps in ONE kernel launch: the state makes
    a single HBM round trip per ``chain`` evaluations (the field is
    autonomous, so the weights in VMEM serve every chained step).
    Deterministic softmax serving path only — no dropout/maps/JaSMin."""
    rows, d = x_ref.shape
    n_pad = rows // block_b
    hd = d // num_heads
    qk_scale = hd ** -0.5
    dtype = x_ref.dtype
    key_mask = (jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
                < n_real).astype(jnp.float32)[None]
    bdims = (((2,), (2,)), ((0,), (0,)))
    pdims = (((2,), (1,)), ((0,), (0,)))

    xf = x_ref[:].astype(jnp.float32)
    for _ in range(chain):
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        cent = (xf - mean) * (d / (d - 1.0))
        cn_a = (cent * cna_s_ref[0] + cna_b_ref[0]).astype(dtype)
        cn_m = (cent * cnm_s_ref[0] + cnm_b_ref[0]).astype(dtype)

        h = jnp.dot(cn_m, w1_ref[:], preferred_element_type=jnp.float32)
        h = _gelu(h).astype(dtype)
        mlp_o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)

        qkv32 = jnp.dot(cn_a, wqkv_ref[:],
                        preferred_element_type=jnp.float32)
        qkv = qkv32.astype(dtype).reshape(block_b, n_pad, 3 * d)
        for hh in range(num_heads):
            q32 = qkv[:, :, hh * hd:(hh + 1) * hd].astype(jnp.float32)
            k = qkv[:, :, d + hh * hd:d + (hh + 1) * hd].astype(
                jnp.float32)
            v = qkv[:, :, 2 * d + hh * hd:2 * d + (hh + 1) * hd]
            q = q32 * qk_scale
            s = jax.lax.dot_general(q, k, bdims,
                                    preferred_element_type=jnp.float32)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s) * key_mask
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
            ctx_h = jax.lax.dot_general(p, v, pdims,
                                        preferred_element_type=jnp.float32)
            ctx_scratch[:, :, hh * hd:(hh + 1) * hd] = ctx_h.astype(dtype)

        attn_o = jnp.dot(ctx_scratch[:].reshape(block_b * n_pad, d),
                         wout_ref[:], preferred_element_type=jnp.float32)
        # round to the state dtype between steps so the chained kernel is
        # step-for-step identical to the scan of single fused-Euler steps
        xf = (xf + dt * ((mlp_o + attn_o) * scaler)).astype(
            dtype).astype(jnp.float32)
    y_ref[:] = xf.astype(dtype)


def fused_euler_chain_from_params(y, vf_params, *, num_heads: int,
                                  scaler: float, dt: float, chain: int,
                                  block_b: int = 16, n_real: int = 0,
                                  vmem_budget=None):
    """``chain`` Euler steps per kernel launch (serving fast path)."""
    b, n, d = y.shape
    dh = vf_params["mlp"]["fc1_kernel"].shape[-1]
    n_real = n_real or n
    n_pad = -(-n // TOKEN_PAD) * TOKEN_PAD
    if n_pad != n:
        y = jnp.pad(y, ((0, 0), (0, n_pad - n), (0, 0)))
    bb = auto_block_b(b, n, d, dh, num_heads, requested=block_b,
                      extra_states=1, budget_override=vmem_budget,
                      itemsize=jnp.dtype(y.dtype).itemsize)
    rows = bb * n_pad
    mat = lambda i: (0, 0)
    wqkv, wout, w1, w2 = (
        vf_params["attn"]["qkv_kernel"].astype(y.dtype),
        vf_params["attn"]["out_kernel"].astype(y.dtype),
        vf_params["mlp"]["fc1_kernel"].astype(y.dtype),
        vf_params["mlp"]["fc2_kernel"].astype(y.dtype))
    out = pl.pallas_call(
        functools.partial(_vf_euler_chain_kernel, num_heads=num_heads,
                          scaler=scaler, n_real=n_real, block_b=bb,
                          dt=dt, chain=chain),
        grid=(b // bb,),
        interpret=_interpret_default(),
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dh), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, d), mat, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * n_pad, d), y.dtype),
        scratch_shapes=[pltpu.VMEM((bb, n_pad, d), y.dtype)],
    )(y.reshape(b * n_pad, d),
      vf_params["norm_attn"]["scale"][None],
      vf_params["norm_attn"]["bias"][None],
      vf_params["norm_mlp"]["scale"][None],
      vf_params["norm_mlp"]["bias"][None],
      wqkv, wout, w1, w2)
    return out.reshape(b, n_pad, d)[:, :n, :]


def fused_rk4_step_from_params(y, vf_params, *, num_heads: int,
                               scaler: float, dt: float,
                               block_b: int = 16, n_real: int = 0,
                               vmem_budget=None):
    """One Kutta-3/8 rk4 step with every stage advance fused into the
    kernel — the k_i stage slopes never materialize in HBM.

    Rewrites torchdiffeq's "rk4" (core/integrators.make_step) so each
    vector-field call emits ``base + c*dt*f(y_i)`` directly, where the
    bases are stage-state combinations (exact in f32):

        y2     = y + dt/3 * k1
        y3     = (2y - y2)                       + dt   * k2
        y4     = (2y2 - y3)                      + dt   * k3
        y_next = (-y/8 + 3/4*y3 + 3/8*y4)        + dt/8 * k4

    Inference-only, like the fused Euler step (training keeps discrete
    stages so the native backward kernels see plain f evaluations).
    """
    bb = auto_block_b(y.shape[0], y.shape[1], y.shape[2],
                      vf_params["mlp"]["fc1_kernel"].shape[-1],
                      num_heads, requested=block_b, extra_states=2,
                      budget_override=vmem_budget,
                      itemsize=jnp.dtype(y.dtype).itemsize)

    def stage(y_i, base, c):
        return _pallas_forward(
            y_i, vf_params["norm_attn"]["scale"],
            vf_params["norm_attn"]["bias"],
            vf_params["norm_mlp"]["scale"], vf_params["norm_mlp"]["bias"],
            vf_params["attn"]["qkv_kernel"],
            vf_params["attn"]["out_kernel"],
            vf_params["mlp"]["fc1_kernel"], vf_params["mlp"]["fc2_kernel"],
            num_heads=num_heads, scaler=scaler, block_b=bb,
            n_real=n_real, euler_dt=c, base=base)

    f32 = jnp.float32
    dtype = y.dtype

    def comb(*terms):
        # base combinations accumulate in f32 (bf16 states would leak
        # rounding into the reconstructed dt*k_i terms)
        acc = sum(w * t.astype(f32) for w, t in terms)
        return acc.astype(dtype)

    y2 = stage(y, None, dt / 3.0)                      # euler-mode stage
    y3 = stage(y2, comb((2.0, y), (-1.0, y2)), dt)
    y4 = stage(y3, comb((2.0, y2), (-1.0, y3)), dt)
    return stage(y4, comb((-0.125, y), (0.75, y3), (0.375, y4)), dt / 8.0)


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
                              use_pallas: bool = True, n_real: int = 0,
                              vmem_budget=None):
    args = (x,
            vf_params["norm_attn"]["scale"], vf_params["norm_attn"]["bias"],
            vf_params["norm_mlp"]["scale"], vf_params["norm_mlp"]["bias"],
            vf_params["attn"]["qkv_kernel"], vf_params["attn"]["out_kernel"],
            vf_params["mlp"]["fc1_kernel"], vf_params["mlp"]["fc2_kernel"])
    if use_pallas:
        bb = auto_block_b(x.shape[0], x.shape[1], x.shape[2],
                          vf_params["mlp"]["fc1_kernel"].shape[-1],
                          num_heads, emit_attn=True, requested=block_b,
                          budget_override=vmem_budget,
                          itemsize=jnp.dtype(x.dtype).itemsize)
        return fused_vf_attn(*args, num_heads, scaler, bb, n_real)
    return _xla_reference(*args, num_heads=num_heads, scaler=scaler,
                          n_real=n_real, return_attn=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def fused_vf_jasmin(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                    num_heads: int, scaler: float, block_b: int,
                    n_real: int, jas_k: int):
    """Fused evaluation that returns (dx, jas_stats) where jas_stats is
    the [B, H, JAS_ROWS, N] JaSMin order-statistics tensor
    (losses.jasmin.jasmin_order_stats layout; query rows on the LAST
    axis). The [B, H, N, N] attention maps never leave VMEM — this is
    the JaSMin training fast path (the full-map variant spends ~half the
    training-forward wall time re-reading the maps from HBM for the
    top-k extraction; measured 167ms -> 87ms at B=1024 CIFAR). Feed the
    stats to losses.jasmin.jasmin_from_stats. Backward scatters the
    five statistic cotangents back into p-bar inside the backward
    kernel at recomputed argmax positions."""
    return _pallas_forward(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                           w1, w2, num_heads=num_heads, scaler=scaler,
                           block_b=block_b, n_real=n_real,
                           jas_kk=max(jas_k, 1) + 1)


def _fused_vf_jasmin_fwd(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1,
                         w2, num_heads, scaler, block_b, n_real, jas_k):
    out = fused_vf_jasmin(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1,
                          w2, num_heads, scaler, block_b, n_real, jas_k)
    # out[1] (the order statistics, [B,H,5,N] f32 — tiny next to x)
    # rides the residuals: the backward scatters the statistic
    # cotangents by VALUE instead of rerunning the extraction passes
    return out, (x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                 out[1])


def _fused_vf_jasmin_bwd(num_heads, scaler, block_b, n_real, jas_k,
                         residuals, g):
    from odevit_tpu.kernels.vector_field_bwd import pallas_vf_bwd
    *tensors, stats = residuals
    g_dx, g_jas = g
    return pallas_vf_bwd(*tensors, g_dx, num_heads=num_heads,
                         scaler=scaler, block_b=block_b, n_real=n_real,
                         g_jas=g_jas, jas_k=jas_k, jas_stats=stats)


fused_vf_jasmin.defvjp(_fused_vf_jasmin_fwd, _fused_vf_jasmin_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def fused_vf_jasmin_stash(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1,
                          w2, num_heads: int, scaler: float, block_b: int,
                          n_real: int, jas_k: int):
    """fused_vf_jasmin with residual stashing (see fused_vf_stash): the
    JaSMin-tail training evaluations keep the in-VMEM order statistics
    AND skip the backward's qkv/h1 recompute matmuls."""
    out = _pallas_forward(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                          w1, w2, num_heads=num_heads, scaler=scaler,
                          block_b=block_b, n_real=n_real,
                          jas_kk=max(jas_k, 1) + 1, emit_resid=True)
    return out[0], out[1]


def _fused_vf_jasmin_stash_fwd(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                               w1, w2, num_heads, scaler, block_b, n_real,
                               jas_k):
    dx, stats, (rqkv, rh1) = _pallas_forward(
        x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
        num_heads=num_heads, scaler=scaler, block_b=block_b,
        n_real=n_real, jas_kk=max(jas_k, 1) + 1, emit_resid=True)
    return (dx, stats), (x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1,
                         w2, stats, rqkv, rh1)


def _fused_vf_jasmin_stash_bwd(num_heads, scaler, block_b, n_real, jas_k,
                               residuals, g):
    from odevit_tpu.kernels.vector_field_bwd import pallas_vf_bwd
    *tensors, stats, rqkv, rh1 = residuals
    g_dx, g_jas = g
    return pallas_vf_bwd(*tensors, g_dx, num_heads=num_heads,
                         scaler=scaler, block_b=block_b, n_real=n_real,
                         g_jas=g_jas, jas_k=jas_k, jas_stats=stats,
                         resid_qkv=rqkv, resid_h1=rh1)


fused_vf_jasmin_stash.defvjp(_fused_vf_jasmin_stash_fwd,
                             _fused_vf_jasmin_stash_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(10, 11, 12, 13, 14, 15, 16, 17))
def fused_vf_jasmin_dropout(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                            w1, w2, seed, num_heads: int, scaler: float,
                            block_b: int, n_real: int, jas_k: int,
                            attn_drop: float, proj_drop: float,
                            mlp_drop: float):
    """fused_vf_jasmin with in-kernel dropout (statistics are computed
    on the PRE-dropout probabilities, matching the emitted-map
    convention); seed semantics as fused_vf_attn_dropout."""
    return _pallas_forward(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                           w1, w2, num_heads=num_heads, scaler=scaler,
                           block_b=block_b, n_real=n_real,
                           jas_kk=max(jas_k, 1) + 1,
                           seed=seed, attn_drop=attn_drop,
                           proj_drop=proj_drop, mlp_drop=mlp_drop)


def _fused_vf_jasmin_dropout_fwd(x, cna_s, cna_b, cnm_s, cnm_b, wqkv,
                                 wout, w1, w2, seed, num_heads, scaler,
                                 block_b, n_real, jas_k, attn_drop,
                                 proj_drop, mlp_drop):
    out = fused_vf_jasmin_dropout(
        x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2, seed,
        num_heads, scaler, block_b, n_real, jas_k, attn_drop, proj_drop,
        mlp_drop)
    return out, (x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                 seed, out[1])


def _fused_vf_jasmin_dropout_bwd(num_heads, scaler, block_b, n_real,
                                 jas_k, attn_drop, proj_drop, mlp_drop,
                                 residuals, g):
    import numpy as np
    from odevit_tpu.kernels.vector_field_bwd import pallas_vf_bwd
    *tensors, seed, stats = residuals
    g_dx, g_jas = g
    bars = pallas_vf_bwd(*tensors, g_dx, num_heads=num_heads,
                         scaler=scaler, block_b=block_b, n_real=n_real,
                         g_jas=g_jas, jas_k=jas_k, jas_stats=stats,
                         seed=seed,
                         attn_drop=attn_drop, proj_drop=proj_drop,
                         mlp_drop=mlp_drop)
    seed_bar = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return (*bars, seed_bar)


fused_vf_jasmin_dropout.defvjp(_fused_vf_jasmin_dropout_fwd,
                               _fused_vf_jasmin_dropout_bwd)


def fused_vf_jasmin_from_params(x, vf_params, *, num_heads: int,
                                scaler: float, jas_k: int,
                                block_b: int = 16, use_pallas: bool = True,
                                n_real: int = 0, seed=None,
                                drops=(0.0, 0.0, 0.0), vmem_budget=None,
                                stash: bool = False):
    """(dx, jas_stats) through the fused kernel (or the XLA twin +
    jasmin_order_stats for non-Pallas paths). Requires
    n >= max(jas_k, 1) + 1 real tokens (callers gate on this and fall
    back to the map-emitting path for tiny sequences). ``stash=True``
    selects the residual-stashing variant (Pallas, deterministic only)."""
    from odevit_tpu.losses.jasmin import jasmin_order_stats
    args = _vf_args(x, vf_params)
    has_drop = any(d > 0.0 for d in drops)
    if use_pallas:
        bb = auto_block_b(x.shape[0], x.shape[1], x.shape[2],
                          vf_params["mlp"]["fc1_kernel"].shape[-1],
                          num_heads, emit_jas=True, requested=block_b,
                          budget_override=vmem_budget,
                          emit_resid=stash and not has_drop,
                          itemsize=jnp.dtype(x.dtype).itemsize)
        if has_drop:
            return fused_vf_jasmin_dropout(
                *args, seed, num_heads, scaler, bb,
                n_real or x.shape[1], jas_k, *drops)
        if stash:
            return fused_vf_jasmin_stash(*args, num_heads, scaler, bb,
                                         n_real or x.shape[1], jas_k)
        return fused_vf_jasmin(*args, num_heads, scaler, bb,
                               n_real or x.shape[1], jas_k)
    assert not has_drop, "XLA jasmin path is deterministic-only"
    dx, attn = _xla_reference(*args, num_heads=num_heads, scaler=scaler,
                              n_real=n_real, return_attn=True)
    return dx, jasmin_order_stats(attn, jas_k)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(10, 11, 12, 13, 14, 15, 16))
def fused_vf_dropout(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                     seed, num_heads: int, scaler: float, block_b: int,
                     n_real: int, attn_drop: float, proj_drop: float,
                     mlp_drop: float):
    """fused_vf with in-kernel dropout (no attention-map output); see
    fused_vf_attn_dropout for the mask/seed semantics."""
    return _pallas_forward(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                           w1, w2, num_heads=num_heads, scaler=scaler,
                           block_b=block_b, n_real=n_real,
                           seed=seed, attn_drop=attn_drop,
                           proj_drop=proj_drop, mlp_drop=mlp_drop)


def _fused_vf_dropout_fwd(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                          w1, w2, seed, num_heads, scaler, block_b,
                          n_real, attn_drop, proj_drop, mlp_drop):
    out = fused_vf_dropout(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                           w1, w2, seed, num_heads, scaler, block_b,
                           n_real, attn_drop, proj_drop, mlp_drop)
    return out, (x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2, seed)


def _fused_vf_dropout_bwd(num_heads, scaler, block_b, n_real,
                          attn_drop, proj_drop, mlp_drop, residuals, g):
    import numpy as np
    from odevit_tpu.kernels.vector_field_bwd import pallas_vf_bwd
    *tensors, seed = residuals
    bars = pallas_vf_bwd(*tensors, g, num_heads=num_heads, scaler=scaler,
                         block_b=block_b, n_real=n_real, seed=seed,
                         attn_drop=attn_drop, proj_drop=proj_drop,
                         mlp_drop=mlp_drop)
    seed_bar = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return (*bars, seed_bar)


fused_vf_dropout.defvjp(_fused_vf_dropout_fwd, _fused_vf_dropout_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(10, 11, 12, 13, 14, 15, 16))
def fused_vf_attn_dropout(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                          w1, w2, seed,
                          num_heads: int, scaler: float, block_b: int,
                          n_real: int, attn_drop: float, proj_drop: float,
                          mlp_drop: float):
    """Attention-emitting fused evaluation WITH in-kernel dropout
    (inverted, torch semantics: probs after softmax, attn out after
    Wout, MLP hidden after GELU, MLP out after fc2; emitted maps are
    pre-dropout). ``seed`` is a traced int32 scalar; masks are seeded
    per (seed, site, image) so the backward kernel — which runs at a
    smaller batch tile — regenerates bit-identical masks. The rng
    stream is pltpu.prng (hardware prng), deliberately NOT the flax
    dropout stream: fixed-seed runs are reproducible against themselves,
    not bit-equal to the flax path (documented semantics)."""
    return _pallas_forward(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                           w1, w2, num_heads=num_heads, scaler=scaler,
                           block_b=block_b, n_real=n_real, emit_attn=True,
                           seed=seed, attn_drop=attn_drop,
                           proj_drop=proj_drop, mlp_drop=mlp_drop)


def _fused_vf_attn_dropout_fwd(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                               w1, w2, seed, num_heads, scaler, block_b,
                               n_real, attn_drop, proj_drop, mlp_drop):
    out = fused_vf_attn_dropout(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                                w1, w2, seed, num_heads, scaler, block_b,
                                n_real, attn_drop, proj_drop, mlp_drop)
    return out, (x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2, seed)


def _fused_vf_attn_dropout_bwd(num_heads, scaler, block_b, n_real,
                               attn_drop, proj_drop, mlp_drop,
                               residuals, g):
    import numpy as np
    from odevit_tpu.kernels.vector_field_bwd import pallas_vf_bwd
    *tensors, seed = residuals
    g_dx, g_attn = g
    bars = pallas_vf_bwd(*tensors, g_dx, g_attn, num_heads=num_heads,
                         scaler=scaler, block_b=block_b, n_real=n_real,
                         seed=seed, attn_drop=attn_drop,
                         proj_drop=proj_drop, mlp_drop=mlp_drop)
    seed_bar = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return (*bars, seed_bar)


fused_vf_attn_dropout.defvjp(_fused_vf_attn_dropout_fwd,
                             _fused_vf_attn_dropout_bwd)


def _vf_args(x, vf_params):
    return (x,
            vf_params["norm_attn"]["scale"], vf_params["norm_attn"]["bias"],
            vf_params["norm_mlp"]["scale"], vf_params["norm_mlp"]["bias"],
            vf_params["attn"]["qkv_kernel"], vf_params["attn"]["out_kernel"],
            vf_params["mlp"]["fc1_kernel"], vf_params["mlp"]["fc2_kernel"])


VMEM_BUDGET = 13 * 1024 * 1024   # of the 16MB/core; headroom for Mosaic

# The backward runs under a raised scoped-VMEM limit: the fused train
# steps compile with xla_tpu_scoped_vmem_limit_kib=32768 (v5e has 128MB
# VMEM/core; the 16MB scoped default is conservative), which both
# de-flakes the borderline tiles Mosaic's scheduler-sensitive stack
# accounting occasionally rejects at the 16MB default and unlocks the
# bb=8 tile that measures fastest at B=1024 CIFAR (3,002 img/s vs
# 2,871 at bb=4; flax 2,028). Only the backward dispatch budgets
# against it — forward kernels stay within the default so inference
# jits need no special compile options.
BWD_SCOPED_VMEM_KIB = 32 * 1024
BWD_VMEM_BUDGET = 24 * 1024 * 1024   # headroom under the raised limit;
# also keeps the CIFAR estimate at bb=8 (bb=16 measured slower: 2,943)

# Big-d shapes (ViT-Base: 28.3MB of f32 weight-grad accumulators alone)
# step up to a 64MB scoped limit so the native backward can run at bb=1
# instead of falling back to the XLA-twin vjp. v5e has 128MB VMEM/core;
# 64MB scoped leaves half for XLA's own buffers.
# Width-tiered cap on override-driven batch tiles. VMEM is not the only
# constraint: the Mosaic AOT compiler's memory/time blows up on wide
# multi-image tiles, and a full train step carries many kernels — tile
# classes that fit VMEM comfortably can still stall or OOM the compile
# helper. Measured on v5e (full train-step programs):
#   d=192  (CIFAR):    bb=16 compiles in minutes            -> cap 16
#   d=768  (ViT-Base): jas fwd bb=2 compiles (the committed
#          distillation evidence run); fwd/bwd bb=4 dies
#          (SIGKILL x2) and ratio-4 fwd bb=4 never finished
#          compiling in 30 min                               -> cap 2
#   dh=3072 (ratio-4): proven only at bb=1                   -> cap 1
def _tile_class_cap(d, dh):
    # keyed on the token width d (the CIFAR class d=192, dh=768 is
    # proven at bb=16, so dh alone must not demote it), with the very
    # wide ratio-4 hidden (dh>=2048) pinned to its only proven tile
    if dh >= 2048:
        return 1
    if d >= 512:
        return 2
    return 16

BWD_SCOPED_VMEM_KIB_BIG = 64 * 1024
# 62MB budget vs the 64MB limit: the estimate's weight term counts the
# bf16 working copies plus the f32 accumulators (6 bytes/param, matching
# the split-path estimates), which was measured ~4% conservative vs
# Mosaic's actual frame at TS-Base (estimate 68.8MiB vs 65.8MiB actual
# at the bb=2 tile the 64MB limit rejects) — so a 2MB margin suffices,
# and the round-2-proven bb=1 jas-emitting backward (est. 56.7MiB)
# stays admitted.
BWD_VMEM_BUDGET_BIG = 62 * 1024 * 1024


def _bwd_min_bytes(n, d, dh, num_heads, *, emit_attn=False,
                   emit_jas=False, itemsize=2):
    """Estimated VMEM bytes of the combined backward at bb=1 (the
    auto_block_b estimate specialized to one image). ``itemsize`` is the
    compute dtype's bytes/element — the coefficients are calibrated for
    bf16 (2), so f32 shapes scale the whole estimate by 2x (slightly
    conservative for the always-f32 accumulator parts, which is the safe
    direction: round 5's f32 CLI distill run OOM'd Mosaic's scoped VMEM
    because these estimates admitted bf16-sized tiles)."""
    n_pad = -(-n // TOKEN_PAD) * TOKEN_PAD
    weights = (3 * d * d + d * d + 2 * d * dh) * 2
    per_img = 16 * n_pad * d + 6 * n_pad * dh + 12 * n_pad * n_pad
    if emit_attn:
        per_img += num_heads * n_pad * n_pad * 2
    if emit_jas:
        per_img += 24 * n_pad * n_pad
    return (3 * weights + 2 * per_img + 2 * 3 * n_pad * d) * (itemsize / 2)


def bwd_vmem_plan(n, d, dh, num_heads, *, emit_attn=False,
                  emit_jas=False, itemsize=2):
    """(scoped_vmem_kib, bwd_budget_bytes) for this vector-field shape:
    the standard 32MB limit when the backward fits its 24MB budget at
    some tile, stepping up to 64MB when only that makes even a one-image
    tile feasible. Both the train-step jit (compiler options) and the
    dispatch (auto_block_b budget) derive from this one function, so
    they always agree."""
    need = _bwd_min_bytes(n, d, dh, num_heads, emit_attn=emit_attn,
                          emit_jas=emit_jas, itemsize=itemsize)
    if need <= BWD_VMEM_BUDGET:
        return BWD_SCOPED_VMEM_KIB, BWD_VMEM_BUDGET
    # bigger shapes get the 64MB limit regardless of whether the
    # combined kernel ultimately fits: the split fallback's chained
    # kernels budget against the same plan, and the XLA-twin fallback
    # is indifferent to the scoped limit
    return BWD_SCOPED_VMEM_KIB_BIG, BWD_VMEM_BUDGET_BIG


def bwd_compiler_options(n=None, d=None, dh=None, num_heads=None, *,
                         emit_attn=False, emit_jas=True, itemsize=2):
    """Compiler options every jit that differentiates through the fused
    kernel must pass (see make_fast_*_train_step). With the vector-field
    shape, picks the scoped limit from bwd_vmem_plan; without, returns
    the standard 32MB limit. Harmless for shapes that fall back to the
    XLA-twin vjp."""
    if d is None:
        return {"xla_tpu_scoped_vmem_limit_kib": BWD_SCOPED_VMEM_KIB}
    kib, _ = bwd_vmem_plan(n, d, dh, num_heads, emit_attn=emit_attn,
                           emit_jas=emit_jas, itemsize=itemsize)
    return {"xla_tpu_scoped_vmem_limit_kib": kib}


def fwd_vmem_plan(n, d, dh, num_heads, *, extra_states=0,
                  target_bb=8):
    """(scoped_vmem_kib | None, budget_bytes) for INFERENCE jits.

    Serving twin of ``bwd_vmem_plan``: picks the smallest scoped-VMEM
    tier at which the forward kernel's batch tile stops improving (up
    to ``target_bb`` images per tile). Returns ``(None, default)`` when
    the stock 16MB scoped limit already admits the best tile — most
    CIFAR-class shapes — so serving jits only pay a raised limit where
    it buys tile size (ViT-Base 224px: bb=1 -> 4). ``extra_states``
    counts additional [n, d] state copies the fused solver route keeps
    live per image (euler/chain: 1, stage-advance rk4: 3)."""
    def bb_at(budget):
        return auto_block_b(target_bb, n, d, dh, num_heads,
                            requested=target_bb, extra_states=extra_states,
                            budget_override=budget)
    tiers = ((None, VMEM_BUDGET),
             (BWD_SCOPED_VMEM_KIB, BWD_VMEM_BUDGET),
             (BWD_SCOPED_VMEM_KIB_BIG, BWD_VMEM_BUDGET_BIG))
    best = max(bb_at(budget) for _, budget in tiers)
    for kib, budget in tiers:
        if bb_at(budget) == best:
            return kib, budget
    return tiers[-1]


def fwd_compiler_options(n, d, dh, num_heads, *, extra_states=0):
    """Compiler options (possibly empty) a serving jit should pass to
    unlock the ``fwd_vmem_plan`` tile at this shape."""
    kib, _ = fwd_vmem_plan(n, d, dh, num_heads,
                           extra_states=extra_states)
    return {} if kib is None else {"xla_tpu_scoped_vmem_limit_kib": kib}


def auto_block_b(b, n, d, dh, num_heads, *, emit_attn=False,
                 emit_jas=False, requested=16, bwd=False,
                 budget_override=None, extra_states=0, emit_resid=False,
                 itemsize=2):
    """Largest batch tile (halving from ``requested``, dividing ``b``)
    whose estimated VMEM footprint fits. The estimate mirrors the
    kernel's live set: activations/qkv/hidden at 2B + f32 attention
    internals + the emitted maps; the backward roughly doubles the live
    intermediates (cotangents alongside recomputes) and budgets against
    the raised scoped limit (BWD_VMEM_BUDGET — see bwd_compiler_options).
    CIFAR shapes get 16 fwd / 8 bwd; big ViT-Base shapes (N=208, D=768)
    auto-shrink instead of OOMing Mosaic's scoped vmem."""
    n_pad = -(-n // TOKEN_PAD) * TOKEN_PAD
    weights = (3 * d * d + d * d + 2 * d * dh) * 2
    per_img = 16 * n_pad * d + 6 * n_pad * dh + 12 * n_pad * n_pad
    per_img += extra_states * 2 * n_pad * d   # fused-solver state copies
    if emit_attn:
        per_img += num_heads * n_pad * n_pad * 2
    if emit_jas:
        # f32 cur/first/iota temporaries of the in-kernel top-k passes
        per_img += 24 * n_pad * n_pad
    if emit_resid:
        # stash-variant output buffers: qkv [n_pad, 3d] + h1 [n_pad, dh]
        # in the compute dtype
        per_img += 2 * n_pad * (3 * d + dh)
    if bwd:
        per_img = 2 * per_img + 2 * 3 * n_pad * d    # qkv_bar scratch etc.
        weights *= 3     # bf16 working copies + f32 w_bar accumulators
    # coefficients are calibrated for bf16 compute; f32 shapes double
    # (conservative for the always-f32 parts — see _bwd_min_bytes)
    per_img *= itemsize / 2
    weights *= itemsize / 2
    # the jasmin-emitting paths run only under the train-step jits,
    # which raise the scoped-VMEM limit (bwd_compiler_options).
    # budget_override: training steps know their jit's raised limit and
    # pass the shape plan's budget so FORWARD kernels also tile against
    # it — the default budgets assume the conservative serving limits
    # (16MB default scoped vmem), which left the TS-Base forward at a
    # 4-8x smaller tile than its train jit allows
    if budget_override is not None:
        budget = budget_override
        # raised budgets must not select a tile class the Mosaic
        # compiler hasn't been shown to handle — see _tile_class_cap
        requested = min(requested, _tile_class_cap(d, dh))
    elif bwd:
        budget = bwd_vmem_plan(n, d, dh, num_heads, emit_attn=emit_attn,
                               emit_jas=emit_jas, itemsize=itemsize)[1]
        # same compile-cost class cap as the override branch: the
        # estimate admits bb=4 backward tiles at d=768 that the AOT
        # compiler cannot build (only bb<=2 classes are proven)
        requested = min(requested, _tile_class_cap(d, dh))
    elif emit_jas:
        budget = BWD_VMEM_BUDGET
    else:
        budget = VMEM_BUDGET
    bb = max(requested, 1)
    while b % bb:
        bb //= 2
    while bb > 1 and weights + bb * per_img > budget:
        bb //= 2
    bb = max(bb, 1)
    if bwd and weights + bb * per_img > budget:
        return 0      # can't fit even one image: caller must fall back
    return bb


def _fit_block(b, block_b):
    while b % block_b:
        block_b //= 2
    return max(block_b, 1)


def fused_vf_dropout_from_params(x, vf_params, seed, *, num_heads: int,
                                 scaler: float, drops, block_b: int = 16,
                                 n_real: int = 0, vmem_budget=None):
    """Dropout fused evaluation from a params subtree.
    ``drops`` = (attn_drop, proj_drop, mlp_drop)."""
    bb = auto_block_b(x.shape[0], x.shape[1], x.shape[2],
                      vf_params["mlp"]["fc1_kernel"].shape[-1],
                      num_heads, requested=block_b,
                      budget_override=vmem_budget,
                      itemsize=jnp.dtype(x.dtype).itemsize)
    return fused_vf_dropout(*_vf_args(x, vf_params), seed, num_heads,
                            scaler, bb, n_real, *drops)


def fused_vf_attn_dropout_from_params(x, vf_params, seed, *,
                                      num_heads: int, scaler: float,
                                      drops, block_b: int = 16,
                                      n_real: int = 0, vmem_budget=None):
    bb = auto_block_b(x.shape[0], x.shape[1], x.shape[2],
                      vf_params["mlp"]["fc1_kernel"].shape[-1],
                      num_heads, emit_attn=True, requested=block_b,
                      budget_override=vmem_budget,
                      itemsize=jnp.dtype(x.dtype).itemsize)
    return fused_vf_attn_dropout(*_vf_args(x, vf_params), seed, num_heads,
                                 scaler, bb, n_real, *drops)


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
    from odevit_tpu.kernels.vector_field_bwd import pallas_vf_bwd
    *tensors, qkv_bias, out_bias = residuals
    return pallas_vf_bwd(*tensors, g, num_heads=num_heads, scaler=scaler,
                         block_b=block_b, n_real=n_real,
                         qkv_bias=qkv_bias, out_bias=out_bias,
                         l2_attention=True)


fused_vf_l2.defvjp(_fused_vf_l2_fwd, _fused_vf_l2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15))
def fused_vf_l2_jasmin(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                       qkv_bias, out_bias, num_heads: int, scaler: float,
                       block_b: int, n_real: int, jas_k: int):
    """fused_vf_l2 that also returns the JaSMin order-statistics tensor
    (see fused_vf_jasmin) — the L2 training fast path."""
    return _pallas_forward(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                           w1, w2, qkv_bias, out_bias,
                           num_heads=num_heads, scaler=scaler,
                           block_b=block_b, n_real=n_real,
                           l2_attention=True,
                           jas_kk=max(jas_k, 1) + 1)


def _fused_vf_l2_jasmin_fwd(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                            w1, w2, qkv_bias, out_bias, num_heads,
                            scaler, block_b, n_real, jas_k):
    out = fused_vf_l2_jasmin(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout,
                             w1, w2, qkv_bias, out_bias, num_heads,
                             scaler, block_b, n_real, jas_k)
    return out, (x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                 qkv_bias, out_bias, out[1])


def _fused_vf_l2_jasmin_bwd(num_heads, scaler, block_b, n_real, jas_k,
                            residuals, g):
    from odevit_tpu.kernels.vector_field_bwd import pallas_vf_bwd
    *tensors, qkv_bias, out_bias, stats = residuals
    g_dx, g_jas = g
    return pallas_vf_bwd(*tensors, g_dx, num_heads=num_heads,
                         scaler=scaler, block_b=block_b, n_real=n_real,
                         g_jas=g_jas, jas_k=jas_k, jas_stats=stats,
                         qkv_bias=qkv_bias,
                         out_bias=out_bias, l2_attention=True)


fused_vf_l2_jasmin.defvjp(_fused_vf_l2_jasmin_fwd, _fused_vf_l2_jasmin_bwd)


def fused_vf_l2_jasmin_from_params(x, vf_params, *, num_heads: int,
                                   scaler: float, jas_k: int,
                                   block_b: int = 16,
                                   use_pallas: bool = True,
                                   n_real: int = 0, vmem_budget=None):
    """(dx, jas_stats) for the L2 vector field (see
    fused_vf_jasmin_from_params)."""
    from odevit_tpu.losses.jasmin import jasmin_order_stats
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
        bb = auto_block_b(x.shape[0], x.shape[1], x.shape[2],
                          vf_params["mlp"]["fc1_kernel"].shape[-1],
                          num_heads, emit_jas=True, requested=block_b,
                          budget_override=vmem_budget,
                          itemsize=jnp.dtype(x.dtype).itemsize)
        return fused_vf_l2_jasmin(*args, num_heads, scaler, bb,
                                  n_real or x.shape[1], jas_k)
    dx, attn = _xla_reference(*args, num_heads=num_heads, scaler=scaler,
                              n_real=n_real, return_attn=True,
                              l2_attention=True)
    return dx, jasmin_order_stats(attn, jas_k)


def fused_vf_l2_from_params(x, vf_params, *, num_heads: int, scaler: float,
                            block_b: int = 16, use_pallas: bool = True,
                            n_real: int = 0, vmem_budget=None):
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
        bb = auto_block_b(x.shape[0], x.shape[1], x.shape[2],
                          vf_params["mlp"]["fc1_kernel"].shape[-1],
                          num_heads, requested=block_b,
                          budget_override=vmem_budget,
                          itemsize=jnp.dtype(x.dtype).itemsize)
        return fused_vf_l2(*args, num_heads, scaler, bb, n_real)
    return _xla_reference(*args, num_heads=num_heads, scaler=scaler,
                          n_real=n_real, l2_attention=True)
