"""Hand-written backward kernel for the fused vector-field evaluation.

Closes the training-path gap: the custom-vjp previously recomputed the
pure-XLA twin in the backward (so remat'd training did forward work
twice plus an un-fused backward). This kernel recomputes the forward
intermediates IN VMEM and produces all cotangents in one pass:

  inputs:  x [R, D], norms, weights, dx_bar [R, D]
           (+ optional attn_bar [TB, H, NP, NP] from JaSMin/distillation)
  outputs: x_bar [R, D]  (blocked over the batch grid)
           w_bars (Wqkv, Wout, W1, W2) and norm bars (gamma/beta x2),
           ACCUMULATED across grid steps (constant-index output blocks;
           the TPU grid is sequential, so += is race-free).

Derivation sketch (per evaluation, lambda = drift scaler):
  dx = (MLP(cn_m) + Attn(cn_a)) * lambda
  MLP bwd:   h_bar = mo_bar W2^T; W2_bar += h^T mo_bar
             h1_bar = h_bar * gelu'(h1); W1_bar += cn_m^T h1_bar
             m_bar = h1_bar W1^T
  Attn bwd:  ctx_bar = ao_bar Wout^T; Wout_bar += ctx^T ao_bar
             per head: p_bar = ctx_bar v^T (+ attn_bar)
                       v_bar = p^T ctx_bar
                       s_bar = p * (p_bar - sum(p_bar * p, -1))
                       q_bar = s_bar k * tau;  k_bar = s_bar^T q * tau
             Wqkv_bar += cn_a^T [q_bar k_bar v_bar]
             a_bar = [q_bar k_bar v_bar] Wqkv^T
  CenterNorm bwd (c = s(x - mean), y = c*gamma + beta):
             c_bar = a_bar*gamma_a + m_bar*gamma_m
             gamma_bar += sum(a_bar * c); beta_bar += sum(a_bar)
             x_bar = s * (c_bar - mean(c_bar, -1))

Covers both attention variants: softmax and the L2-distance form
(exp(-||q-k||^2 tau) row-normalized, biased projections) — the
combined kernel takes l2_attention/has_bias flags and additionally
emits the bias cotangents. The split path remains softmax-only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from odevit_tpu.kernels.vector_field import (_gelu, _erf, TOKEN_PAD,
                                             _interpret_default,
                                             _mask_2d, _mask_p,
                                             DROP_SITE_H, DROP_SITE_MLP_OUT,
                                             DROP_SITE_ATTN_OUT)


def _gelu_grad(x):
    """d/dx [0.5 x (1 + erf(x/sqrt2))] = 0.5(1+erf(x/sqrt2))
    + x/sqrt(2 pi) exp(-x^2/2)."""
    c = 2.0 ** -0.5
    return (0.5 * (1.0 + _erf(x * c))
            + x * 0.3989422804014327 * jnp.exp(-0.5 * x * x))


def _jas_pbar(p, gj, st, kk, jas_tri, dtype):
    """JaSMin statistic cotangents scattered into the PRE-dropout p_bar.

    VALUE-BASED scatter (no extraction passes): the forward's statistics
    tensor rides the custom-vjp residuals, so rank r's cotangent lands
    directly on the column the XLA twin's stable first-occurrence
    extraction picks — the (r - count(p > v_r))-th leftmost column with
    p == v_r. Equality is exact: v_r was extracted from the same
    bf16-rounded f32 values this recompute reproduces. The within-ties
    ordinal comes from an MXU prefix-sum (eq @ upper-triangular ones,
    f32 accumulation — exact integer counts). The clipped-rowsum
    cotangent spreads over the row through the clip indicator.

    ``p`` [TB, N_q, N] f32 attention rows; ``gj``/``st`` [TB, 5, N_q]
    cotangents / order statistics; returns the p_bar contribution.
    """
    f32 = jnp.float32
    pj = p.astype(dtype).astype(f32)
    # match the XLA twin's jnp.clip subgradient exactly: 1 strictly
    # inside (1e-12, 1.0), 0.5 AT either boundary (JAX min/max
    # tie-splitting — bf16 rows round to exactly 1.0 on peaked heads,
    # so the boundary case is live), 0 outside
    lo = ((pj >= 1e-12).astype(f32) + (pj > 1e-12).astype(f32)) * 0.5
    hi = ((pj <= 1.0).astype(f32) + (pj < 1.0).astype(f32)) * 0.5
    pbar_jas = gj[:, 4, :][:, :, None] * (lo * hi)
    # stats rows 0..3 hold ranks (1, 2, kk-1, kk); coincident ranks
    # (k=1 -> (1, 2, 1, 2)) sum their cotangents first
    by_rank = {}
    for row_i, r in enumerate((1, 2, kk - 1, kk)):
        by_rank.setdefault(r, []).append(row_i)
    for r, rows_g in sorted(by_rank.items()):
        c = gj[:, rows_g[0], :]
        for ri in rows_g[1:]:
            c = c + gj[:, ri, :]
        v = st[:, rows_g[0], :][:, :, None]                 # [TB, N_q, 1]
        eq = (pj == v).astype(f32)
        gt = jnp.sum((pj > v).astype(f32), axis=-1)
        ord_ = jax.lax.dot_general(
            eq.astype(dtype), jas_tri,
            (((2,), (0,)), ((), ())),
            preferred_element_type=f32)                     # [TB, N_q, N]
        target = (ord_ == (float(r) - gt)[:, :, None]).astype(f32) * eq
        pbar_jas = pbar_jas + target * c[:, :, None]
    return pbar_jas


def _jas_tri_ones(n_pad, dtype):
    """Upper-triangular (i <= j) ones for the MXU prefix-sum of the
    JaSMin scatter; hoisted out of the head loop. 0/1 in the compute
    dtype is exact, and the f32-accumulated matmul counts are exact."""
    return ((jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
             <= jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1))
            .astype(dtype))


def _vf_bwd_kernel(x_ref, cna_s_ref, cna_b_ref, cnm_s_ref, cnm_b_ref,
                   wqkv_ref, wout_ref, w1_ref, w2_ref, g_ref,
                   *refs,
                   num_heads: int, scaler: float, n_real: int,
                   block_b: int, has_attn_bar: bool,
                   attn_drop: float = 0.0, proj_drop: float = 0.0,
                   mlp_drop: float = 0.0, has_seed: bool = False,
                   jas_kk: int = 0, l2_attention: bool = False,
                   has_bias: bool = False, has_resid: bool = False):
    refs = list(refs)
    gattn_ref = refs.pop(0) if has_attn_bar else None
    gjas_ref = refs.pop(0) if jas_kk else None
    stats_ref = refs.pop(0) if jas_kk else None
    seed_ref = refs.pop(0) if has_seed else None
    qkvb_ref = refs.pop(0) if has_bias else None
    outb_ref = refs.pop(0) if has_bias else None
    rqkv_ref = refs.pop(0) if has_resid else None
    rh1_ref = refs.pop(0) if has_resid else None
    (xbar_ref, wqkvbar_ref, woutbar_ref, w1bar_ref, w2bar_ref,
     cnasbar_ref, cnabbar_ref, cnmsbar_ref, cnmbbar_ref) = refs[:9]
    refs = refs[9:]
    if has_bias:
        qkvbbar_ref, outbbar_ref = refs[:2]
        refs = refs[2:]
    ctx_scratch, qkvbar_scratch = refs

    rows, d = x_ref.shape
    n_pad = rows // block_b
    hd = d // num_heads
    tau = hd ** -0.5
    dtype = x_ref.dtype
    f32 = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _():
        wqkvbar_ref[:] = jnp.zeros_like(wqkvbar_ref)
        woutbar_ref[:] = jnp.zeros_like(woutbar_ref)
        w1bar_ref[:] = jnp.zeros_like(w1bar_ref)
        w2bar_ref[:] = jnp.zeros_like(w2bar_ref)
        cnasbar_ref[:] = jnp.zeros_like(cnasbar_ref)
        cnabbar_ref[:] = jnp.zeros_like(cnabbar_ref)
        cnmsbar_ref[:] = jnp.zeros_like(cnmsbar_ref)
        cnmbbar_ref[:] = jnp.zeros_like(cnmbbar_ref)
        if has_bias:
            qkvbbar_ref[:] = jnp.zeros_like(qkvbbar_ref)
            outbbar_ref[:] = jnp.zeros_like(outbbar_ref)

    seed = seed_ref[0] if has_seed else None
    img0 = pl.program_id(0) * block_b if has_seed else None

    # ---- recompute forward intermediates (all VMEM-resident) ----
    xf = x_ref[:].astype(f32)
    cent = (xf - jnp.mean(xf, axis=-1, keepdims=True)) * (d / (d - 1.0))
    cn_a = (cent * cna_s_ref[0] + cna_b_ref[0]).astype(dtype)
    cn_m = (cent * cnm_s_ref[0] + cnm_b_ref[0]).astype(dtype)

    if has_resid:
        # residual-stashing route: the forward stashed the pre-GELU
        # hidden and the post-bias compute-dtype qkv — skip both
        # recompute matmuls (qkv is exact; h1 matches to compute-dtype
        # rounding, see fused_vf_stash)
        h1 = rh1_ref[:].astype(f32)
    else:
        h1 = jnp.dot(cn_m, w1_ref[:], preferred_element_type=f32)
    h = _gelu(h1).astype(dtype)
    mask_h = None
    if mlp_drop > 0.0:
        # regenerate the forward's dropout masks (same per-image seeds)
        mask_h = _mask_2d(mlp_drop, seed, DROP_SITE_H, img0, block_b,
                          n_pad, h.shape[-1])
        h = (h.astype(f32) * mask_h).astype(dtype)
    if has_resid:
        qkv = rqkv_ref[:].reshape(block_b, n_pad, 3 * d)
    else:
        qkv32 = jnp.dot(cn_a, wqkv_ref[:], preferred_element_type=f32)
        if has_bias:
            qkv32 = qkv32 + qkvb_ref[0]
        qkv = qkv32.astype(dtype).reshape(block_b, n_pad, 3 * d)

    key_mask = (jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
                < n_real).astype(f32)[None]
    bdims = (((2,), (2,)), ((0,), (0,)))      # contract last, batch TB
    pdims = (((2,), (1,)), ((0,), (0,)))      # [TB,N,N] x [TB,N,hd]

    g = g_ref[:].astype(f32) * scaler          # mo_bar == ao_bar (no drop)
    jas_tri = _jas_tri_ones(n_pad, dtype) if jas_kk else None

    # ---- MLP backward ----
    if mlp_drop > 0.0:
        g_mo = g * _mask_2d(mlp_drop, seed, DROP_SITE_MLP_OUT, img0,
                            block_b, n_pad, d)
        gd_mlp = g_mo.astype(dtype)
    else:
        gd_mlp = g.astype(dtype)
    h_bar = jax.lax.dot_general(gd_mlp, w2_ref[:],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)  # g @ W2^T
    w2bar_ref[:] += jax.lax.dot_general(
        h, gd_mlp, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)                          # h^T g
    if mask_h is not None:
        h_bar = h_bar * mask_h
    h1_bar = (h_bar * _gelu_grad(h1)).astype(dtype)
    m_bar = jax.lax.dot_general(h1_bar, w1_ref[:],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)  # @ W1^T
    w1bar_ref[:] += jax.lax.dot_general(
        cn_m, h1_bar, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)

    # ---- attention backward (per head, batched over the tile) ----
    if proj_drop > 0.0:
        g_ao = g * _mask_2d(proj_drop, seed, DROP_SITE_ATTN_OUT, img0,
                            block_b, n_pad, d)
        gd_attn = g_ao.astype(dtype)
    else:
        gd_attn = g.astype(dtype)
    if has_bias:
        outbbar_ref[:] += jnp.sum(gd_attn.astype(f32), axis=0,
                                  keepdims=True)
    ctx_bar = jax.lax.dot_general(gd_attn, wout_ref[:],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32
                                  ).reshape(block_b, n_pad, d)
    for hh in range(num_heads):
        q = qkv[:, :, hh * hd:(hh + 1) * hd].astype(f32)
        k = qkv[:, :, d + hh * hd:d + (hh + 1) * hd].astype(f32)
        v = qkv[:, :, 2 * d + hh * hd:2 * d + (hh + 1) * hd]
        if l2_attention:
            # exp(-||q-k||^2 tau) row-normalized (matches the forward's
            # expanded-form distance)
            qk = jax.lax.dot_general(q, k, bdims,
                                     preferred_element_type=f32)
            q2 = jnp.sum(q * q, axis=-1, keepdims=True)
            k2 = jnp.sum(k * k, axis=-1)[:, None, :]
            e = jnp.exp(-(q2 + k2 - 2.0 * qk) * tau) * key_mask
            esum = jnp.sum(e, axis=-1, keepdims=True) + 1e-8
            p = e / esum
        else:
            s = jax.lax.dot_general(q * tau, k, bdims,
                                    preferred_element_type=f32)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s) * key_mask
            p = e / jnp.sum(e, axis=-1, keepdims=True)
        if attn_drop > 0.0:
            mask_p = _mask_p(attn_drop, seed, hh, img0, block_b, n_pad)
            p_used = (p * mask_p).astype(dtype)
        else:
            mask_p = None
            p_used = p.astype(dtype)

        cb_h = ctx_bar[:, :, hh * hd:(hh + 1) * hd].astype(dtype)
        # recompute ctx_h for Wout_bar accumulation
        ctx_scratch[:, :, hh * hd:(hh + 1) * hd] = jax.lax.dot_general(
            p_used, v, pdims,
            preferred_element_type=f32).astype(dtype)

        p_bar = jax.lax.dot_general(cb_h, v, bdims,
                                    preferred_element_type=f32)
        if mask_p is not None:
            p_bar = p_bar * mask_p        # through the dropout multiply
        if has_attn_bar:
            # the emitted maps are PRE-dropout: their cotangent adds to
            # the pre-dropout p_bar directly
            p_bar = p_bar + gattn_ref[:, hh, :, :].astype(f32)
        if jas_kk:
            p_bar = p_bar + _jas_pbar(p, gjas_ref[:, hh], stats_ref[:, hh],
                                      jas_kk, jas_tri, dtype)
        v_bar = jax.lax.dot_general(
            p_used, cb_h,
            (((1,), (1,)), ((0,), (0,))),                 # p^T @ cb_h
            preferred_element_type=f32)
        if l2_attention:
            # p = e/(sum e + eps): e_bar = (p_bar - <p_bar, p>)/esum;
            # dist2 = q^2 + k^2 - 2 q.k with e = exp(-dist2 tau)
            e_bar = (p_bar - jnp.sum(p_bar * p, axis=-1, keepdims=True)
                     ) / esum
            d2b = (-tau) * e * e_bar
            d2b_d = d2b.astype(dtype)
            q_bar = (2.0 * q * jnp.sum(d2b, axis=-1, keepdims=True)
                     - 2.0 * jax.lax.dot_general(
                         d2b_d, k.astype(dtype), pdims,
                         preferred_element_type=f32))
            k_bar = (2.0 * k * jnp.sum(d2b, axis=1)[:, :, None]
                     - 2.0 * jax.lax.dot_general(
                         d2b_d, q.astype(dtype),
                         (((1,), (1,)), ((0,), (0,))),    # d2b^T q
                         preferred_element_type=f32))
        else:
            s_bar = p * (p_bar - jnp.sum(p_bar * p, axis=-1,
                                         keepdims=True))
            s_bar = (s_bar * key_mask).astype(dtype)
            q_bar = jax.lax.dot_general(
                s_bar, k.astype(dtype), pdims,
                preferred_element_type=f32) * tau
            k_bar = jax.lax.dot_general(
                s_bar, (q * tau).astype(dtype),
                (((1,), (1,)), ((0,), (0,))),             # s_bar^T q tau
                preferred_element_type=f32)
        qkvbar_scratch[:, :, hh * hd:(hh + 1) * hd] = q_bar.astype(dtype)
        qkvbar_scratch[:, :, d + hh * hd:d + (hh + 1) * hd] = \
            k_bar.astype(dtype)
        qkvbar_scratch[:, :, 2 * d + hh * hd:2 * d + (hh + 1) * hd] = \
            v_bar.astype(dtype)

    ctx2d = ctx_scratch[:].reshape(rows, d)
    woutbar_ref[:] += jax.lax.dot_general(
        ctx2d, gd_attn, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)

    qkv_bar2d = qkvbar_scratch[:].reshape(rows, 3 * d)
    if has_bias:
        qkvbbar_ref[:] += jnp.sum(qkv_bar2d.astype(f32), axis=0,
                                  keepdims=True)
    a_bar = jax.lax.dot_general(qkv_bar2d, wqkv_ref[:],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)
    wqkvbar_ref[:] += jax.lax.dot_general(
        cn_a, qkv_bar2d, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)

    # ---- CenterNorm backward ----
    cnasbar_ref[:] += jnp.sum(a_bar * cent, axis=0, keepdims=True)
    cnabbar_ref[:] += jnp.sum(a_bar, axis=0, keepdims=True)
    cnmsbar_ref[:] += jnp.sum(m_bar * cent, axis=0, keepdims=True)
    cnmbbar_ref[:] += jnp.sum(m_bar, axis=0, keepdims=True)

    c_bar = a_bar * cna_s_ref[0] + m_bar * cnm_s_ref[0]
    x_bar = (d / (d - 1.0)) * (c_bar - jnp.mean(c_bar, axis=-1,
                                                keepdims=True))
    xbar_ref[:] = x_bar.astype(xbar_ref.dtype)


def _mlp_bwd_kernel(x_ref, cnm_s_ref, cnm_b_ref, w1_ref, w2_ref, g_ref,
                    *refs, scaler: float, block_b: int, dh_chunk: int,
                    mlp_drop: float = 0.0, has_seed: bool = False,
                    has_resid: bool = False):
    """MLP-branch backward only (split-kernel path): recomputes cn_m and
    the hidden in column chunks of ``dh_chunk`` so the [rows, dh] f32
    intermediates never live whole — the chunk is the only hidden-width
    buffer resident, which is what lets this kernel run at a 2-4x larger
    batch tile than the combined kernel. Emits the MLP contribution to
    x_bar (exact: CenterNorm's backward is linear, so the attention
    kernel's contribution adds outside)."""
    refs = list(refs)
    rh1_ref = refs.pop(0) if has_resid else None
    seed_ref = refs.pop(0) if has_seed else None
    xbar_ref, w1bar_ref, w2bar_ref, cnmsbar_ref, cnmbbar_ref = refs

    rows, d = x_ref.shape
    n_pad = rows // block_b
    dh = w1_ref.shape[-1]
    dtype = x_ref.dtype
    f32 = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _():
        w1bar_ref[:] = jnp.zeros_like(w1bar_ref)
        w2bar_ref[:] = jnp.zeros_like(w2bar_ref)
        cnmsbar_ref[:] = jnp.zeros_like(cnmsbar_ref)
        cnmbbar_ref[:] = jnp.zeros_like(cnmbbar_ref)

    seed = seed_ref[0] if has_seed else None
    img0 = pl.program_id(0) * block_b if has_seed else None

    xf = x_ref[:].astype(f32)
    cent = (xf - jnp.mean(xf, axis=-1, keepdims=True)) * (d / (d - 1.0))
    cn_m = (cent * cnm_s_ref[0] + cnm_b_ref[0]).astype(dtype)

    g = g_ref[:].astype(f32) * scaler
    if mlp_drop > 0.0:
        mask_h = _mask_2d(mlp_drop, seed, DROP_SITE_H, img0, block_b,
                          n_pad, dh)
        g = g * _mask_2d(mlp_drop, seed, DROP_SITE_MLP_OUT, img0,
                         block_b, n_pad, d)
    else:
        mask_h = None
    gd = g.astype(dtype)

    m_bar = jnp.zeros((rows, d), f32)
    for c0 in range(0, dh, dh_chunk):
        cols = slice(c0, c0 + dh_chunk)
        if has_resid:
            # stashed pre-GELU hidden (see fused_vf_stash): read the
            # chunk instead of recomputing the fc1 matmul columns
            h1_c = rh1_ref[:, cols].astype(f32)
        else:
            h1_c = jnp.dot(cn_m, w1_ref[:, cols],
                           preferred_element_type=f32)
        h_c = _gelu(h1_c)
        if mask_h is not None:
            h_c = h_c * mask_h[:, cols]
        w2bar_ref[cols, :] += jax.lax.dot_general(
            h_c.astype(dtype), gd, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)                   # h^T g
        h_bar_c = jax.lax.dot_general(gd, w2_ref[cols, :],
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=f32)
        if mask_h is not None:
            h_bar_c = h_bar_c * mask_h[:, cols]
        h1_bar_c = (h_bar_c * _gelu_grad(h1_c)).astype(dtype)
        m_bar += jax.lax.dot_general(h1_bar_c, w1_ref[:, cols],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=f32)
        w1bar_ref[:, cols] += jax.lax.dot_general(
            cn_m, h1_bar_c, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    cnmsbar_ref[:] += jnp.sum(m_bar * cent, axis=0, keepdims=True)
    cnmbbar_ref[:] += jnp.sum(m_bar, axis=0, keepdims=True)
    c_bar = m_bar * cnm_s_ref[0]
    xbar_ref[:] = (d / (d - 1.0)) * (
        c_bar - jnp.mean(c_bar, axis=-1, keepdims=True))


def _attn_bwd_kernel(x_ref, cna_s_ref, cna_b_ref, wqkv_ref, wout_ref,
                     g_ref, xbarm_ref, *refs, num_heads: int,
                     scaler: float, n_real: int, block_b: int,
                     has_attn_bar: bool, attn_drop: float = 0.0,
                     proj_drop: float = 0.0, has_seed: bool = False,
                     jas_kk: int = 0, has_resid: bool = False):
    """Attention-branch backward (split-kernel path); same math as the
    attention half of _vf_bwd_kernel, incl. the optional JaSMin
    order-statistics scatter (jas_kk > 0 — this is what lets the
    TS-Base distill step use the split path; the MLP branch is
    jas-oblivious). Takes the MLP kernel's x_bar contribution as an
    INPUT and emits the summed x_bar: the data dependency forces XLA to
    schedule the two kernels sequentially, so their scoped-VMEM stack
    frames never coexist — concurrent pallas calls in one computation
    share the 16MB scoped budget (measured: two ~8.4M kernels scheduled
    together OOM at 16.7M)."""
    refs = list(refs)
    gattn_ref = refs.pop(0) if has_attn_bar else None
    gjas_ref = refs.pop(0) if jas_kk else None
    stats_ref = refs.pop(0) if jas_kk else None
    rqkv_ref = refs.pop(0) if has_resid else None
    seed_ref = refs.pop(0) if has_seed else None
    (xbar_ref, wqkvbar_ref, woutbar_ref, cnasbar_ref, cnabbar_ref) = refs[:5]
    ctx_scratch, qkvbar_scratch = refs[5:]

    rows, d = x_ref.shape
    n_pad = rows // block_b
    hd = d // num_heads
    tau = hd ** -0.5
    dtype = x_ref.dtype
    f32 = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _():
        wqkvbar_ref[:] = jnp.zeros_like(wqkvbar_ref)
        woutbar_ref[:] = jnp.zeros_like(woutbar_ref)
        cnasbar_ref[:] = jnp.zeros_like(cnasbar_ref)
        cnabbar_ref[:] = jnp.zeros_like(cnabbar_ref)

    seed = seed_ref[0] if has_seed else None
    img0 = pl.program_id(0) * block_b if has_seed else None

    xf = x_ref[:].astype(f32)
    cent = (xf - jnp.mean(xf, axis=-1, keepdims=True)) * (d / (d - 1.0))
    cn_a = (cent * cna_s_ref[0] + cna_b_ref[0]).astype(dtype)
    if has_resid:
        # stashed compute-dtype qkv (exact — see fused_vf_stash); cn_a
        # is still recomputed above for the Wqkv weight-grad
        qkv = rqkv_ref[:].reshape(block_b, n_pad, 3 * d)
    else:
        qkv = jnp.dot(cn_a, wqkv_ref[:], preferred_element_type=f32
                      ).astype(dtype).reshape(block_b, n_pad, 3 * d)

    key_mask = (jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
                < n_real).astype(f32)[None]
    bdims = (((2,), (2,)), ((0,), (0,)))
    pdims = (((2,), (1,)), ((0,), (0,)))

    g = g_ref[:].astype(f32) * scaler
    jas_tri = _jas_tri_ones(n_pad, dtype) if jas_kk else None
    if proj_drop > 0.0:
        g = g * _mask_2d(proj_drop, seed, DROP_SITE_ATTN_OUT, img0,
                         block_b, n_pad, d)
    gd_attn = g.astype(dtype)
    ctx_bar = jax.lax.dot_general(gd_attn, wout_ref[:],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32
                                  ).reshape(block_b, n_pad, d)
    for hh in range(num_heads):
        q = qkv[:, :, hh * hd:(hh + 1) * hd].astype(f32)
        k = qkv[:, :, d + hh * hd:d + (hh + 1) * hd].astype(f32)
        v = qkv[:, :, 2 * d + hh * hd:2 * d + (hh + 1) * hd]
        s = jax.lax.dot_general(q * tau, k, bdims,
                                preferred_element_type=f32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s) * key_mask
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if attn_drop > 0.0:
            mask_p = _mask_p(attn_drop, seed, hh, img0, block_b, n_pad)
            p_used = (p * mask_p).astype(dtype)
        else:
            mask_p = None
            p_used = p.astype(dtype)

        cb_h = ctx_bar[:, :, hh * hd:(hh + 1) * hd].astype(dtype)
        ctx_scratch[:, :, hh * hd:(hh + 1) * hd] = jax.lax.dot_general(
            p_used, v, pdims, preferred_element_type=f32).astype(dtype)

        p_bar = jax.lax.dot_general(cb_h, v, bdims,
                                    preferred_element_type=f32)
        if mask_p is not None:
            p_bar = p_bar * mask_p
        if has_attn_bar:
            p_bar = p_bar + gattn_ref[:, hh, :, :].astype(f32)
        if jas_kk:
            p_bar = p_bar + _jas_pbar(p, gjas_ref[:, hh], stats_ref[:, hh],
                                      jas_kk, jas_tri, dtype)
        v_bar = jax.lax.dot_general(
            p_used, cb_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)
        s_bar = p * (p_bar - jnp.sum(p_bar * p, axis=-1, keepdims=True))
        s_bar = (s_bar * key_mask).astype(dtype)
        q_bar = jax.lax.dot_general(
            s_bar, k.astype(dtype), pdims,
            preferred_element_type=f32) * tau
        k_bar = jax.lax.dot_general(
            s_bar, (q * tau).astype(dtype),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)
        qkvbar_scratch[:, :, hh * hd:(hh + 1) * hd] = q_bar.astype(dtype)
        qkvbar_scratch[:, :, d + hh * hd:d + (hh + 1) * hd] = \
            k_bar.astype(dtype)
        qkvbar_scratch[:, :, 2 * d + hh * hd:2 * d + (hh + 1) * hd] = \
            v_bar.astype(dtype)

    ctx2d = ctx_scratch[:].reshape(rows, d)
    woutbar_ref[:] += jax.lax.dot_general(
        ctx2d, gd_attn, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)

    qkv_bar2d = qkvbar_scratch[:].reshape(rows, 3 * d)
    a_bar = jax.lax.dot_general(qkv_bar2d, wqkv_ref[:],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)
    wqkvbar_ref[:] += jax.lax.dot_general(
        cn_a, qkv_bar2d, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)

    cnasbar_ref[:] += jnp.sum(a_bar * cent, axis=0, keepdims=True)
    cnabbar_ref[:] += jnp.sum(a_bar, axis=0, keepdims=True)
    c_bar = a_bar * cna_s_ref[0]
    xbar_ref[:] = xbarm_ref[:] + (d / (d - 1.0)) * (
        c_bar - jnp.mean(c_bar, axis=-1, keepdims=True))


def _xla_bwd_fallback(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                      g_dx, g_attn, *, num_heads, scaler, n_real,
                      seed, attn_drop, proj_drop, mlp_drop,
                      g_jas=None, jas_k: int = 0, qkv_bias=None,
                      out_bias=None, l2_attention: bool = False):
    from odevit_tpu.kernels.vector_field import (_xla_reference,
                                                 generate_dropout_masks)
    from odevit_tpu.losses.jasmin import jasmin_order_stats
    b, n, d = x.shape
    has_drop = (seed is not None
                and (attn_drop > 0.0 or proj_drop > 0.0 or mlp_drop > 0.0))
    masks = None
    if has_drop:
        masks = generate_dropout_masks(
            b, n, d, w1.shape[-1], num_heads, seed,
            attn_drop=attn_drop, proj_drop=proj_drop, mlp_drop=mlp_drop)
    want_attn = g_attn is not None or g_jas is not None
    has_bias = qkv_bias is not None

    def f(x_, cna_s_, cna_b_, cnm_s_, cnm_b_, wqkv_, wout_, w1_, w2_,
          *biases):
        out = _xla_reference(x_, cna_s_, cna_b_, cnm_s_, cnm_b_, wqkv_,
                             wout_, w1_, w2_, *biases,
                             num_heads=num_heads,
                             scaler=scaler, n_real=n_real,
                             return_attn=want_attn, masks=masks,
                             l2_attention=l2_attention)
        if g_jas is not None:
            dx_, attn_ = out
            return dx_, jasmin_order_stats(attn_, jas_k)
        return out

    operands = (x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2)
    if has_bias:
        operands = operands + (qkv_bias, out_bias)
    _, vjp = jax.vjp(f, *operands)
    if g_jas is not None:
        g = (g_dx, g_jas)
    elif g_attn is not None:
        g = (g_dx, g_attn)
    else:
        g = g_dx
    return vjp(g)


def _split_tiles(b, n, d, dh, num_heads, *, has_attn_bar: bool,
                 has_drop: bool, requested: int = 16,
                 emit_jas: bool = False, has_resid: bool = False,
                 itemsize: int = 2):
    """(mlp_block_b, dh_chunk, attn_block_b) for the split backward, or
    None when even 1-image tiles don't fit. Estimates mirror each
    kernel's live set (see kernel docstrings). Each kernel gets the full
    raised budget of the shape's scoped-VMEM plan: the two are chained
    through x_bar, so their stack frames never coexist. Tiles are capped
    to the shape's proven Mosaic compile-cost class (_tile_class_cap),
    like the combined dispatch."""
    from odevit_tpu.kernels.vector_field import (TOKEN_PAD, bwd_vmem_plan,
                                                 _tile_class_cap)
    VMEM_BUDGET = bwd_vmem_plan(n, d, dh, num_heads,
                                emit_attn=has_attn_bar,
                                emit_jas=emit_jas, itemsize=itemsize)[1]
    # estimate coefficients are calibrated for bf16 compute; f32 shapes
    # scale 2x (see _bwd_min_bytes — the round-5 f32 CLI distill OOM)
    scale = itemsize / 2
    n_pad = -(-n // TOKEN_PAD) * TOKEN_PAD
    # each split kernel is a d-class program: the attention kernel never
    # touches dh, and the MLP kernel's hidden is chunked — the dh>=2048
    # pin of the COMBINED cap (driven by the whole-evaluation program)
    # does not apply to the halves
    requested = min(requested, _tile_class_cap(d, d))

    # ---- MLP kernel: batch tile x hidden chunk ----
    w_mlp = 12 * d * dh
    base = 24 * n_pad * d + (4 * n_pad * dh + 4 * n_pad * d
                             if has_drop else 0)
    if has_resid:
        base += 2 * n_pad * dh           # stashed h1 input (compute dtype)
    chunks = [c for c in (dh, 1024, 768, 512, 384, 256, 128)
              if c <= dh and dh % c == 0]
    mlp_bb = dh_chunk = 0
    for bb in _halvings(b, requested):
        for c in chunks:
            if (w_mlp + bb * (base + 12 * n_pad * c)) * scale \
                    <= VMEM_BUDGET:
                mlp_bb, dh_chunk = bb, c
                break
        if mlp_bb:
            break

    # ---- attention kernel ----
    w_attn = 24 * d * d
    per = 54 * n_pad * d + 28 * n_pad * n_pad
    if has_attn_bar:
        per += 2 * num_heads * n_pad * n_pad
    if emit_jas:
        # gjas/stats inputs are tiny ([bb, H, 5, n]); the scatter's
        # in-kernel f32 temporaries (eq/ord/target per head) dominate
        per += 24 * n_pad * n_pad
    if has_drop:
        per += 4 * n_pad * n_pad
    if has_resid:
        per += 6 * n_pad * d             # stashed qkv input (compute dtype)
    attn_bb = 0
    for bb in _halvings(b, requested):
        if (w_attn + bb * per) * scale <= VMEM_BUDGET:
            attn_bb = bb
            break
    if not (mlp_bb and attn_bb):
        return None
    return mlp_bb, dh_chunk, attn_bb


def _halvings(b, requested):
    bb = max(requested, 1)
    while b % bb:
        bb //= 2
    while bb >= 1:
        yield bb
        bb //= 2


def _pallas_vf_bwd_split(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1,
                         w2, g_dx, g_attn, tiles, *, num_heads: int,
                         scaler: float, n_real: int, seed=None,
                         attn_drop: float = 0.0, proj_drop: float = 0.0,
                         mlp_drop: float = 0.0, g_jas=None,
                         jas_stats=None, jas_k: int = 0,
                         resid_qkv=None, resid_h1=None):
    """Split-kernel backward: one MLP-branch kernel + one attention-branch
    kernel, each at its own (larger) batch tile; x_bar contributions add
    exactly (CenterNorm backward is linear in the branch cotangents).
    The JaSMin order-statistics cotangent (``g_jas``/``jas_stats``)
    routes into the attention kernel only."""
    from odevit_tpu.kernels.vector_field import TOKEN_PAD
    mlp_bb, dh_chunk, attn_bb = tiles
    b, n, d = x.shape
    dh = w1.shape[-1]
    f32 = jnp.float32
    has_jas = g_jas is not None

    n_pad = -(-n // TOKEN_PAD) * TOKEN_PAD
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        x = jnp.pad(x, pad)
        g_dx = jnp.pad(g_dx, pad)
        if g_attn is not None:
            g_attn = jnp.pad(g_attn, ((0, 0), (0, 0), (0, n_pad - n),
                                      (0, n_pad - n)))
        if has_jas:
            # query rows ride the LAST axis of the statistics tensor
            g_jas = jnp.pad(g_jas, ((0, 0), (0, 0), (0, 0),
                                    (0, n_pad - n)))
            jas_stats = jnp.pad(jas_stats, ((0, 0), (0, 0), (0, 0),
                                            (0, n_pad - n)))
    x2d = x.reshape(b * n_pad, d)
    g2d = g_dx.reshape(b * n_pad, d).astype(x.dtype)
    wqkv_c, wout_c, w1_c, w2_c = (w.astype(x.dtype)
                                  for w in (wqkv, wout, w1, w2))
    has_seed = seed is not None and (attn_drop > 0.0 or proj_drop > 0.0
                                     or mlp_drop > 0.0)
    seed_op = (jnp.asarray(seed, jnp.int32).reshape(1) if has_seed
               else None)
    mat = lambda i: (0, 0)
    row_spec = lambda rows: pl.BlockSpec((rows, d), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, d), mat, memory_space=pltpu.VMEM)

    has_resid = resid_qkv is not None

    # ---- MLP branch ----
    rows_m = mlp_bb * n_pad
    mlp_kernel = functools.partial(
        _mlp_bwd_kernel, scaler=scaler, block_b=mlp_bb,
        dh_chunk=dh_chunk,
        mlp_drop=mlp_drop if has_seed else 0.0, has_seed=has_seed,
        has_resid=has_resid)
    in_specs = [row_spec(rows_m), vec, vec,
                pl.BlockSpec((d, dh), mat, memory_space=pltpu.VMEM),
                pl.BlockSpec((dh, d), mat, memory_space=pltpu.VMEM),
                row_spec(rows_m)]
    operands = [x2d, cnm_s[None], cnm_b[None], w1_c, w2_c, g2d]
    if has_resid:
        in_specs.append(pl.BlockSpec((rows_m, dh), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(resid_h1)
    if has_seed:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(seed_op)
    mlp_outs = pl.pallas_call(
        mlp_kernel,
        grid=(b // mlp_bb,),
        interpret=_interpret_default(),
        in_specs=in_specs,
        out_specs=(row_spec(rows_m),
                   pl.BlockSpec((d, dh), mat, memory_space=pltpu.VMEM),
                   pl.BlockSpec((dh, d), mat, memory_space=pltpu.VMEM),
                   vec, vec),
        out_shape=(jax.ShapeDtypeStruct((b * n_pad, d), f32),
                   jax.ShapeDtypeStruct((d, dh), f32),
                   jax.ShapeDtypeStruct((dh, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32)),
    )(*operands)
    xbar_m, w1_bar, w2_bar, cnms_bar, cnmb_bar = mlp_outs

    # ---- attention branch ----
    rows_a = attn_bb * n_pad
    attn_kernel = functools.partial(
        _attn_bwd_kernel, num_heads=num_heads, scaler=scaler,
        n_real=n_real, block_b=attn_bb,
        has_attn_bar=g_attn is not None,
        attn_drop=attn_drop if has_seed else 0.0,
        proj_drop=proj_drop if has_seed else 0.0, has_seed=has_seed,
        jas_kk=(max(jas_k, 1) + 1) if has_jas else 0,
        has_resid=has_resid)
    in_specs = [row_spec(rows_a), vec, vec,
                pl.BlockSpec((d, 3 * d), mat, memory_space=pltpu.VMEM),
                pl.BlockSpec((d, d), mat, memory_space=pltpu.VMEM),
                row_spec(rows_a), row_spec(rows_a)]
    operands = [x2d, cna_s[None], cna_b[None], wqkv_c, wout_c, g2d,
                xbar_m]
    if g_attn is not None:
        in_specs.append(pl.BlockSpec(
            (attn_bb, num_heads, n_pad, n_pad),
            lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM))
        operands.append(g_attn.astype(x.dtype))
    if has_jas:
        from odevit_tpu.losses.jasmin import JAS_ROWS
        jas_spec = pl.BlockSpec(
            (attn_bb, num_heads, JAS_ROWS, n_pad),
            lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        in_specs += [jas_spec, jas_spec]
        operands += [g_jas.astype(jnp.float32),
                     jas_stats.astype(jnp.float32)]
    if has_resid:
        in_specs.append(pl.BlockSpec((rows_a, 3 * d), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(resid_qkv)
    if has_seed:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(seed_op)
    attn_outs = pl.pallas_call(
        attn_kernel,
        grid=(b // attn_bb,),
        interpret=_interpret_default(),
        in_specs=in_specs,
        out_specs=(row_spec(rows_a),
                   pl.BlockSpec((d, 3 * d), mat, memory_space=pltpu.VMEM),
                   pl.BlockSpec((d, d), mat, memory_space=pltpu.VMEM),
                   vec, vec),
        out_shape=(jax.ShapeDtypeStruct((b * n_pad, d), f32),
                   jax.ShapeDtypeStruct((d, 3 * d), f32),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32)),
        scratch_shapes=[
            pltpu.VMEM((attn_bb, n_pad, d), x.dtype),
            pltpu.VMEM((attn_bb, n_pad, 3 * d), x.dtype),
        ],
    )(*operands)
    xbar_sum, wqkv_bar, wout_bar, cnas_bar, cnab_bar = attn_outs

    x_bar = xbar_sum.reshape(b, n_pad, d)[:, :n, :].astype(x.dtype)
    return (x_bar, cnas_bar[0], cnab_bar[0], cnms_bar[0], cnmb_bar[0],
            wqkv_bar, wout_bar, w1_bar, w2_bar)


def pallas_vf_bwd(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                  g_dx, g_attn=None, *, num_heads: int, scaler: float,
                  block_b: int, n_real: int = 0, seed=None,
                  attn_drop: float = 0.0, proj_drop: float = 0.0,
                  mlp_drop: float = 0.0, g_jas=None, jas_k: int = 0,
                  jas_stats=None, qkv_bias=None, out_bias=None,
                  l2_attention: bool = False,
                  resid_qkv=None, resid_h1=None):
    """Backward pass of the fused evaluation.

    Args mirror the forward; ``g_dx`` is the dx cotangent [B, N, D] and
    ``g_attn`` the optional attention-map cotangent [B, H, N, N].
    ``g_jas`` is the optional cotangent of the JaSMin order-statistics
    output [B, H, JAS_ROWS, N] (fused_vf_jasmin; query rows on the last
    axis) — scattered back into p-bar in-kernel. With a
    ``seed`` + nonzero drop rates, the forward's per-image dropout masks
    are regenerated in-kernel (identical streams regardless of tile
    size). Returns cotangents for (x, cna_s, cna_b, cnm_s, cnm_b, wqkv,
    wout, w1, w2) in f32.

    Dispatch: the COMBINED kernel when it fits a tile (in-situ scoped
    VMEM is what binds, and one kernel per evaluation is what Mosaic
    accounts most predictably — split variants with larger per-kernel
    tiles exceeded the 16MB scoped limit inside the transposed loop
    regardless of their standalone footprints until they were chained;
    chained, they still don't beat the combined kernel's locality). The
    caller's jit must raise the scoped limit (bwd_compiler_options):
    under it, combined bb=8 measures 3,002 img/s at B=1024 CIFAR with
    remat off vs flax's 2,028 (1.48x; 1.57x vs the 1,918 flax
    re-measure). The SPLIT path (per-branch kernels chained through
    x_bar, chunked MLP hidden) is the middle fallback for shapes where
    the combined kernel's live set can't fit even one image; the
    XLA-twin vjp is the last resort (ViT-Base: the f32 weight-grad
    accumulators alone exceed VMEM).
    """
    from odevit_tpu.kernels.vector_field import auto_block_b

    b, n, d = x.shape
    dh = w1.shape[-1]
    n_real = n_real or n
    has_drop = attn_drop > 0.0 or proj_drop > 0.0 or mlp_drop > 0.0
    has_jas = g_jas is not None
    assert not has_jas or jas_stats is not None, \
        "jas backward needs the forward's order-statistics residual"
    has_bias = qkv_bias is not None
    assert not (l2_attention and has_drop), \
        "native L2 backward is deterministic-only (no L2 dropout kernel)"
    has_resid = resid_qkv is not None
    assert has_resid == (resid_h1 is not None), \
        "stash residuals come as a (qkv, h1) pair"
    assert not (has_resid and (has_drop or has_bias or l2_attention)), \
        "residual stashing is softmax/deterministic/bias-free only"
    # the backward holds ~2-3x the forward's live intermediates
    # (recompute + cotangents); size the tile from the VMEM estimate
    itemsize = jnp.dtype(x.dtype).itemsize
    combined_bb = auto_block_b(b, n, d, dh, num_heads,
                               emit_attn=g_attn is not None,
                               emit_jas=has_jas,
                               requested=block_b, bwd=True,
                               itemsize=itemsize)
    # Split dispatch (per-branch kernels chained through x_bar):
    #  * always when the combined kernel can't fit one image;
    #  * ALSO at big-d shapes where the combined kernel is pinned to
    #    bb=1 but the halves each fit a >=2 tile — at TS-Base (d=768,
    #    ratio-4) the MLP weight-grad accumulators (18.9MB f32) leave
    #    the attention kernel's frame and both halves tile at bb=2
    #    (VERDICT r3 item 4a: the bwd is 48% of the step at bb=1).
    # The bias/L2 variants keep the combined kernel (CIFAR-class shapes;
    # no split twin implemented).
    if not has_bias and not l2_attention:
        tiles = None
        if combined_bb == 0 or (combined_bb == 1 and d >= 512):
            tiles = _split_tiles(b, n, d, dh, num_heads,
                                 has_attn_bar=g_attn is not None,
                                 has_drop=has_drop, requested=block_b,
                                 emit_jas=has_jas, has_resid=has_resid,
                                 itemsize=itemsize)
        if tiles is not None and (combined_bb == 0
                                  or min(tiles[0], tiles[2]) >= 2):
            return _pallas_vf_bwd_split(
                x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2, g_dx,
                g_attn, tiles, num_heads=num_heads, scaler=scaler,
                n_real=n_real, seed=seed, attn_drop=attn_drop,
                proj_drop=proj_drop, mlp_drop=mlp_drop,
                g_jas=g_jas, jas_stats=jas_stats, jas_k=jas_k,
                resid_qkv=resid_qkv, resid_h1=resid_h1)
    block_b = combined_bb
    if block_b == 0:
        # Big-d shapes (ViT-Base: the f32 weight-grad accumulators alone
        # exceed VMEM): backward through the XLA twin, which tiles weight
        # grads freely. Dropout masks are regenerated bit-identically by
        # the standalone Pallas mask kernel.
        return _xla_bwd_fallback(
            x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2, g_dx,
            g_attn, num_heads=num_heads, scaler=scaler, n_real=n_real,
            seed=seed, attn_drop=attn_drop, proj_drop=proj_drop,
            mlp_drop=mlp_drop, g_jas=g_jas, jas_k=jas_k,
            qkv_bias=qkv_bias, out_bias=out_bias,
            l2_attention=l2_attention)
    n_pad = -(-n // TOKEN_PAD) * TOKEN_PAD
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        x = jnp.pad(x, pad)
        g_dx = jnp.pad(g_dx, pad)
        if g_attn is not None:
            g_attn = jnp.pad(g_attn, ((0, 0), (0, 0), (0, n_pad - n),
                                      (0, n_pad - n)))
        if has_jas:
            # query rows ride the LAST axis of the statistics tensor
            g_jas = jnp.pad(g_jas, ((0, 0), (0, 0), (0, 0),
                                    (0, n_pad - n)))
            jas_stats = jnp.pad(jas_stats, ((0, 0), (0, 0), (0, 0),
                                            (0, n_pad - n)))
    x2d = x.reshape(b * n_pad, d)
    g2d = g_dx.reshape(b * n_pad, d).astype(x.dtype)
    wqkv_c, wout_c, w1_c, w2_c = (w.astype(x.dtype)
                                  for w in (wqkv, wout, w1, w2))

    has_drop = attn_drop > 0.0 or proj_drop > 0.0 or mlp_drop > 0.0
    has_seed = seed is not None and has_drop
    assert not (has_drop and not has_seed), \
        "dropout in the fused backward needs the forward's seed"

    rows = block_b * n_pad
    grid = (b // block_b,)
    mat = lambda i: (0, 0)
    kernel = functools.partial(
        _vf_bwd_kernel, num_heads=num_heads, scaler=scaler,
        n_real=n_real, block_b=block_b,
        has_attn_bar=g_attn is not None,
        attn_drop=attn_drop if has_seed else 0.0,
        proj_drop=proj_drop if has_seed else 0.0,
        mlp_drop=mlp_drop if has_seed else 0.0,
        has_seed=has_seed,
        jas_kk=(max(jas_k, 1) + 1) if has_jas else 0,
        l2_attention=l2_attention, has_bias=has_bias,
        has_resid=has_resid)

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
        pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x2d, cna_s[None], cna_b[None], cnm_s[None], cnm_b[None],
                wqkv_c, wout_c, w1_c, w2_c, g2d]
    if g_attn is not None:
        in_specs.append(pl.BlockSpec(
            (block_b, num_heads, n_pad, n_pad),
            lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM))
        operands.append(g_attn.astype(x.dtype))
    if has_jas:
        from odevit_tpu.losses.jasmin import JAS_ROWS
        jas_spec = pl.BlockSpec(
            (block_b, num_heads, JAS_ROWS, n_pad),
            lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        in_specs += [jas_spec, jas_spec]
        operands += [g_jas.astype(jnp.float32),
                     jas_stats.astype(jnp.float32)]
    if has_seed:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(seed, jnp.int32).reshape(1))
    if has_bias:
        in_specs += [pl.BlockSpec((1, 3 * d), mat, memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, d), mat, memory_space=pltpu.VMEM)]
        operands += [qkv_bias[None].astype(jnp.float32),
                     out_bias[None].astype(jnp.float32)]
    if has_resid:
        in_specs += [pl.BlockSpec((rows, 3 * d), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((rows, dh), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
        operands += [resid_qkv, resid_h1]

    f32 = jnp.float32
    out_specs = (
        pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, 3 * d), mat, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, d), mat, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, dh), mat, memory_space=pltpu.VMEM),
        pl.BlockSpec((dh, d), mat, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), mat, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), mat, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), mat, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), mat, memory_space=pltpu.VMEM),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((b * n_pad, d), f32),
        jax.ShapeDtypeStruct((d, 3 * d), f32),
        jax.ShapeDtypeStruct((d, d), f32),
        jax.ShapeDtypeStruct((d, dh), f32),
        jax.ShapeDtypeStruct((dh, d), f32),
        jax.ShapeDtypeStruct((1, d), f32),
        jax.ShapeDtypeStruct((1, d), f32),
        jax.ShapeDtypeStruct((1, d), f32),
        jax.ShapeDtypeStruct((1, d), f32),
    )
    if has_bias:
        out_specs = out_specs + (
            pl.BlockSpec((1, 3 * d), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), mat, memory_space=pltpu.VMEM),
        )
        out_shapes = out_shapes + (
            jax.ShapeDtypeStruct((1, 3 * d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
        )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=_interpret_default(),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((block_b, n_pad, d), x.dtype),
            pltpu.VMEM((block_b, n_pad, 3 * d), x.dtype),
        ],
    )(*operands)

    (xbar2d, wqkv_bar, wout_bar, w1_bar, w2_bar,
     cnas_bar, cnab_bar, cnms_bar, cnmb_bar) = outs[:9]
    x_bar = xbar2d.reshape(b, n_pad, d)[:, :n, :].astype(x.dtype)
    bars = (x_bar, cnas_bar[0], cnab_bar[0], cnms_bar[0], cnmb_bar[0],
            wqkv_bar, wout_bar, w1_bar, w2_bar)
    if has_bias:
        qkvb_bar, outb_bar = outs[9:]
        bars = bars + (qkvb_bar[0], outb_bar[0])
    return bars
