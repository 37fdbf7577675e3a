"""Fused-kernel training steps (scaffolding for a native backward).

Runs each solver evaluation through the attention-emitting Pallas kernel
(fused_vf_attn) with JaSMin folded per evaluation, inside a remat'd
lax.scan; numerics match the flax step exactly (tested).

STATUS (measured, v5e, authoritative record in ARCHITECTURE.md): with
the native Pallas backward kernel (kernels/vector_field_bwd.py, all 9
cotangents parity-tested vs the XLA vjp), the in-kernel JaSMin order
statistics, auto-remat, and the shape-aware scoped-VMEM plan, this
fused step leads the flax path at every measured config: 3,691 vs
1,910 img/s @ B=1024 rk4x13 CIFAR (1.93x), 2,690 vs 1,993 @ B=256
(1.35x), 160.3 vs 94.1 @ TS-Base euler-36 (1.70x); dropout configs
widen the gap further (5.9x at CIFAR drop 0.3).

Constraints (asserted): softmax attention, no time conditioning.
Dropout (attn/proj/mlp) IS supported: in-kernel pltpu hardware prng with
per-(evaluation, site, image) seeding — see fused_vf_attn_dropout. The
masks are reproducible at a fixed rng but are a different stream than
the flax path's nn.Dropout (cross-path numerics tests therefore compare
at drop=0, and dropout correctness is verified on-TPU against the XLA
twin fed the kernels' emitted masks — benchmarks/tpu_dropout_check.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from odevit_tpu.core.integrators import make_step
from odevit_tpu.kernels.vector_field import (fused_vf_attn_from_params,
                                             fused_vf_jasmin_from_params)
from odevit_tpu.losses.classification import cross_entropy
from odevit_tpu.losses.jasmin import (jasmin_from_stats, jasmin_map_loss,
                                      jasmin_trajectory_window)
from odevit_tpu.models.fast_forward import _patch_embed_module
from odevit_tpu.models.vector_field import drift_scaler
from odevit_tpu.train.steps import _accuracy, optax_global_norm


def _xla_dropout_eval(y, vf_params, seed, *, num_heads, scaler, n_real,
                      drops, want_attn):
    """One vector-field evaluation with dropout as explicit XLA-side rbg
    masks through the kernel's XLA twin. Used at shapes where the native
    backward kernel (and hence the in-kernel pltpu dropout) cannot fit
    VMEM (d >= ~768). rbg is the cheap hardware-friendly generator —
    threefry mask generation at ViT-Base shapes costs more than the
    matmuls it masks."""
    from odevit_tpu.kernels.vector_field import _vf_args, _xla_reference
    b, n, d = y.shape
    dh = vf_params["mlp"]["fc1_kernel"].shape[-1]
    attn_drop, proj_drop, mlp_drop = drops
    key = jax.random.key(seed, impl="rbg")

    def mask(site, shape, rate):
        keep = jax.random.bernoulli(jax.random.fold_in(key, site),
                                    1.0 - rate, shape)
        return keep.astype(jnp.float32) * (1.0 / (1.0 - rate))

    masks = (
        mask(0, (b, n, dh), mlp_drop) if mlp_drop > 0.0 else None,
        mask(1, (b, n, d), mlp_drop) if mlp_drop > 0.0 else None,
        mask(2, (b, n, d), proj_drop) if proj_drop > 0.0 else None,
        mask(3, (b, num_heads, n, n), attn_drop)
        if attn_drop > 0.0 else None,
    )
    return _xla_reference(*_vf_args(y, vf_params), num_heads=num_heads,
                          scaler=scaler, n_real=n_real,
                          return_attn=want_attn, masks=masks)


HBM_RESIDUAL_BUDGET = 8 * 1024 ** 3   # half of a v5e's 16GB


def _model_itemsize(model) -> int:
    """Bytes/element of the model's compute dtype (flax ``dtype=None``
    means f32 inputs stay f32 — the CLI training path)."""
    import jax.numpy as _jnp
    return _jnp.dtype(model.dtype or _jnp.float32).itemsize


def _fused_jit_kwargs(model=None):
    """Extra jax.jit kwargs for steps that differentiate through the
    fused kernel: on TPU, raise the scoped-VMEM limit so the backward
    kernel can run its measured-fastest tile (and the borderline tiles
    stop being scheduler-flaky). With a ``model``, the limit steps up to
    64MB at big-d shapes whose weight-grad accumulators exceed the 32MB
    plan (ViT-Base: native bb=1 backward instead of the XLA-twin vjp).
    CPU/interpret runs take no options — the flag is TPU-only."""
    import jax
    if jax.default_backend() != "tpu":
        return {}
    from odevit_tpu.kernels.vector_field import bwd_compiler_options
    if model is None:
        return {"compiler_options": bwd_compiler_options()}
    n = ((model.img_size // model.patch_size) ** 2 + 1
         + getattr(model, "register_tokens", 0)
         + (1 if model.add_distillation_token else 0))
    # emit_attn=True: the distill step's attention-map tail budgets its
    # tiles via bwd_vmem_plan(emit_attn=True); the jit's scoped limit
    # must derive from the same (maximal) plan inputs or wide-head
    # configs could pick the 56MB budget tier under a 32MB limit
    return {"compiler_options": bwd_compiler_options(
        n, model.embed_dim, int(model.embed_dim * model.mlp_ratio),
        model.num_heads, emit_attn=True, emit_jas=True,
        itemsize=_model_itemsize(model))}


def _fwd_budget(model, n: int):
    """VMEM budget the train-step jit's scoped limit affords the FORWARD
    kernels (same bwd_vmem_plan inputs as _fused_jit_kwargs, so the
    budget and the compiled limit always agree)."""
    from odevit_tpu.kernels.vector_field import bwd_vmem_plan
    return bwd_vmem_plan(n, model.embed_dim,
                         int(model.embed_dim * model.mlp_ratio),
                         model.num_heads, emit_attn=True,
                         emit_jas=True,
                         itemsize=_model_itemsize(model))[1]


def _auto_remat(model, batch: int, n: int, remat,
                stats_path: bool = False) -> bool:
    """Fused-path remat policy. Remat inside the scan body is HARMFUL
    here unless activations don't fit: (a) it recomputes the forward
    kernel once more per evaluation, and (b) the recompute's scoped VMEM
    stacks with the backward kernels' in the same transposed loop body —
    at B=1024 CIFAR shapes that sum exceeds Mosaic's 16MB limit
    (measured: 17.3M). Without remat the scan saves each evaluation's
    input (bf16 [B, N_pad, D]) plus the JaSMin tail's attention maps as
    vjp residuals in HBM; this estimates that footprint and only keeps
    remat when it would not fit comfortably."""
    if remat is not None:
        return bool(remat)
    from odevit_tpu.core.integrators import num_stages
    from odevit_tpu.kernels.vector_field import TOKEN_PAD
    n_pad = -(-n // TOKEN_PAD) * TOKEN_PAD
    evals = (model.num_eval_steps - 1) * num_stages(model.solver)
    tail = min(int(0.85 * model.num_eval_steps) * num_stages(model.solver),
               evals)
    d = model.embed_dim
    if stats_path:
        # JaSMin rides as [B, H, 5, N] order statistics, not full maps;
        # x2: the stats are saved both as the jasmin_from_stats residual
        # and as the fused kernel's own vjp residual (the backward
        # scatters statistic cotangents by value instead of re-running
        # the extraction passes)
        tail_bytes = 2 * tail * batch * model.num_heads * 5 * n_pad * 4
    else:
        tail_bytes = tail * 2 * batch * model.num_heads * n_pad * n_pad * 2
    bytes_ = evals * batch * n_pad * d * 2 + tail_bytes
    return bytes_ > HBM_RESIDUAL_BUDGET


def fast_free_forward(model, params, pixels, labels, *, jasmin_k: int,
                      use_pallas: bool = True, block_b: int = 16,
                      rng=None, remat=None, stash: bool = False):
    """CE + JaSMin forward through the fused kernel; returns (loss, aux).

    With nonzero model drop rates and an ``rng``, runs the in-kernel
    dropout variants (pltpu hardware prng; per-evaluation seeds derived
    from ``rng``). The dropout stream is reproducible against itself at a
    fixed rng but is NOT bit-equal to the flax path's nn.Dropout stream
    (different generators — documented semantics). Without ``rng`` the
    deterministic kernels run and drop rates must be zero.

    ``stash=True`` (deterministic softmax Pallas path only) selects the
    residual-stashing kernels: forwards write qkv/h1 to HBM and the
    backward skips its recompute matmuls (VERDICT r4 item 4). Adds
    ~(6d+2dh)*N bytes/eval of vjp residuals — callers own the HBM math.
    """
    assert not model.time_conditioning
    l2 = bool(model.l2_attention)
    drops = (float(model.attn_drop), float(model.proj_drop),
             float(model.mlp_drop))
    has_drop = any(d > 0.0 for d in drops) and rng is not None
    if any(d > 0.0 for d in drops) and rng is None:
        raise ValueError("model has dropout; pass rng= (or use the flax "
                         "path for deterministic eval)")
    assert not (l2 and has_drop), \
        "the fused L2 path is deterministic-only (use the flax step)"
    if has_drop:
        assert use_pallas, "in-kernel dropout requires the Pallas path"
        assert model.solver in ("euler", "rk4"), model.solver

    pe = _patch_embed_module(model)
    tokens = pe.apply({"params": params["patch_embed"]}, pixels)
    n = tokens.shape[1]
    scaler = drift_scaler(model.emulate_depth, model.time_interval)
    # JaSMin via in-kernel order statistics whenever the sequence is
    # long enough for the k+1 extraction passes (tiny models fall back
    # to the map-emitting path; the L2 fast path requires the stats
    # route — it has no map-emitting training wrapper)
    stats_ok = n >= max(jasmin_k, 1) + 1
    assert stats_ok or not l2, "L2 fast path needs n > jasmin_k + 1"
    # residual stashing: deterministic softmax Pallas evaluations only
    use_stash = bool(stash) and use_pallas and not l2 and not has_drop

    def f(t, y):
        if l2:
            from odevit_tpu.kernels.vector_field import \
                fused_vf_l2_jasmin_from_params
            dx, st = fused_vf_l2_jasmin_from_params(
                y, params["vf"], num_heads=model.num_heads,
                scaler=scaler, jas_k=jasmin_k, block_b=block_b,
                use_pallas=use_pallas, n_real=n,
                vmem_budget=vmem_budget)
            return dx, jasmin_from_stats(st, jasmin_k)
        if stats_ok:
            dx, st = fused_vf_jasmin_from_params(
                y, params["vf"], num_heads=model.num_heads,
                scaler=scaler, jas_k=jasmin_k, block_b=block_b,
                use_pallas=use_pallas, n_real=n,
                vmem_budget=vmem_budget, stash=use_stash)
            return dx, jasmin_from_stats(st, jasmin_k)
        dx, attn = fused_vf_attn_from_params(
            y, params["vf"], num_heads=model.num_heads, scaler=scaler,
            block_b=block_b, use_pallas=use_pallas, n_real=n,
            vmem_budget=vmem_budget)
        return dx, jasmin_map_loss(attn, k=jasmin_k)

    from odevit_tpu.core.integrators import num_stages
    from odevit_tpu.kernels.vector_field import (
        fused_vf_from_params, fused_vf_dropout_from_params,
        fused_vf_attn_dropout_from_params)

    step = make_step(model.solver, has_aux=True)
    ts = np.linspace(0.0, model.time_interval, model.num_eval_steps)

    def f_plain(t, y):
        if l2:
            from odevit_tpu.kernels.vector_field import \
                fused_vf_l2_from_params
            dx = fused_vf_l2_from_params(
                y, params["vf"], num_heads=model.num_heads,
                scaler=scaler, block_b=block_b, use_pallas=use_pallas,
                n_real=n)
        else:
            dx = fused_vf_from_params(
                y, params["vf"], num_heads=model.num_heads,
                scaler=scaler, block_b=block_b, use_pallas=use_pallas,
                n_real=n, vmem_budget=vmem_budget, stash=use_stash)
        return dx, jnp.zeros(())

    # --- dropout variants: explicit per-stage seeds -------------------
    # eval seed = step_seed + GOLD*(stage+1), GOLD = 0x9E3779B9 (int32
    # wraparound is fine — prng_seed hashes its inputs; mix precomputed
    # per stage in numpy to avoid int32-overflow warnings).
    GOLD = [jnp.int32(np.uint32((0x9E3779B9 * k) & 0xFFFFFFFF)
                      .astype(np.int32)) for k in range(1, 6)]

    # shape-dependent dropout engine: the pltpu in-kernel prng needs the
    # native backward kernel, whose f32 weight-grad accumulators only fit
    # VMEM up to ~d=512; beyond that, dropout runs as XLA-side rbg masks
    # through the kernel's XLA twin (same fused scan structure, fast
    # hardware rng, differentiable end to end)
    if has_drop:
        from odevit_tpu.kernels.vector_field import auto_block_b
        pltpu_drop = auto_block_b(
            pixels.shape[0], n, model.embed_dim,
            int(model.embed_dim * model.mlp_ratio), model.num_heads,
            emit_attn=True, bwd=True,
            itemsize=_model_itemsize(model)) > 0

    def vf_drop(y, eval_seed, with_jasmin):
        if not pltpu_drop:
            out = _xla_dropout_eval(
                y, params["vf"], eval_seed, num_heads=model.num_heads,
                scaler=scaler, n_real=n, drops=drops,
                want_attn=with_jasmin)
            if with_jasmin:
                dx, attn = out
                return dx, jasmin_map_loss(attn, k=jasmin_k)
            return out, jnp.zeros(())
        if with_jasmin:
            if stats_ok:
                dx, st = fused_vf_jasmin_from_params(
                    y, params["vf"], num_heads=model.num_heads,
                    scaler=scaler, jas_k=jasmin_k, block_b=block_b,
                    n_real=n, seed=eval_seed, drops=drops,
                    vmem_budget=vmem_budget)
                return dx, jasmin_from_stats(st, jasmin_k)
            dx, attn = fused_vf_attn_dropout_from_params(
                y, params["vf"], eval_seed, num_heads=model.num_heads,
                scaler=scaler, drops=drops, block_b=block_b, n_real=n,
                vmem_budget=vmem_budget)
            return dx, jasmin_map_loss(attn, k=jasmin_k)
        dx = fused_vf_dropout_from_params(
            y, params["vf"], eval_seed, num_heads=model.num_heads,
            scaler=scaler, drops=drops, block_b=block_b, n_real=n,
            vmem_budget=vmem_budget)
        return dx, jnp.zeros(())

    def step_drop(y, dt, seed_step, with_jasmin):
        """One solver step with per-stage dropout seeds (euler / Kutta
        3/8-rule rk4 — the same tableau as core.integrators)."""
        es = lambda s: seed_step + GOLD[s]
        ax = lambda a, c, k: (a + dt * c * k).astype(a.dtype)
        if model.solver == "euler":
            k1, j1 = vf_drop(y, es(0), with_jasmin)
            return ax(y, 1.0, k1), jnp.stack([j1])
        third = 1.0 / 3.0
        k1, j1 = vf_drop(y, es(0), with_jasmin)
        k2, j2 = vf_drop(ax(y, third, k1), es(1), with_jasmin)
        k3, j3 = vf_drop((y + dt * (-third * k1 + k2)).astype(y.dtype),
                         es(2), with_jasmin)
        k4, j4 = vf_drop((y + dt * (k1 - k2 + k3)).astype(y.dtype),
                         es(3), with_jasmin)
        y_next = (y + dt * (0.125 * k1 + 0.375 * k2 + 0.375 * k3
                            + 0.125 * k4)).astype(y.dtype)
        return y_next, jnp.stack([j1, j2, j3, j4])

    use_remat = _auto_remat(model, pixels.shape[0], n, remat,
                            stats_path=stats_ok)
    # forward kernels may tile against the train jit's raised
    # scoped-VMEM plan — but only when remat is off (a remat'd forward
    # recompute shares the transposed loop's scoped frame with the
    # backward kernel, so it must keep the conservative default budget)
    vmem_budget = None if use_remat else _fwd_budget(model, n)

    def body_of(fn):
        def body(y, t_dt):
            t, dt = t_dt
            y_next, jas_stages = step(fn, y, t, dt)
            return y_next, jas_stages
        if use_remat:
            body = jax.checkpoint(body, prevent_cse=False)
        return body

    def drop_body_of(with_jasmin):
        def body(y, x):
            dt, seed_step = x
            y_next, jas_stages = step_drop(y, dt, seed_step, with_jasmin)
            return y_next, jas_stages
        if use_remat:
            body = jax.checkpoint(body, prevent_cse=False)
        return body

    # JaSMin scores only the last int(0.85 T) evaluations: run the head
    # of the trajectory without any map emission / reduction at all.
    stages = num_stages(model.solver)
    num_steps = model.num_eval_steps - 1
    window = max(1, min(int(0.85 * model.num_eval_steps),
                        num_steps * stages))
    tail = max(1, -(-window // stages))
    head = num_steps - tail

    ts_j = jnp.asarray(ts, jnp.float32)
    t_all, dt_all = ts_j[:-1], ts_j[1:] - ts_j[:-1]
    y_mid = tokens
    if has_drop:
        step_seeds = jax.random.randint(
            rng, (num_steps,), jnp.iinfo(jnp.int32).min,
            jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        if head > 0:
            y_mid, _ = jax.lax.scan(
                drop_body_of(False), tokens,
                (dt_all[:head], step_seeds[:head]))
        y_final, jas = jax.lax.scan(
            drop_body_of(True), y_mid,
            (dt_all[head:], step_seeds[head:]))
    else:
        if head > 0:
            y_mid, _ = jax.lax.scan(body_of(f_plain), tokens,
                                    (t_all[:head], dt_all[:head]))
        y_final, jas = jax.lax.scan(body_of(f), y_mid,
                                    (t_all[head:], dt_all[head:]))

    cls_final = y_final[:, 0].astype(jnp.float32)
    logits = cls_final @ params["head"]["kernel"] + params["head"]["bias"]
    ce = cross_entropy(logits, labels, label_smoothing=0.05)
    jas_loss = jasmin_trajectory_window(jas, model.num_eval_steps)
    return ce + jas_loss, {"logits": logits, "ce": ce,
                           "jasmin_loss": jas_loss}


def fast_distill_forward(model, params, pixels, labels, t_states,
                         t_attn_last, *, jasmin_k: int, temperature: float,
                         lambda_param: float, mse_full_path: bool = True,
                         use_distillation: bool = True,
                         use_kl_loss: bool = False, supervise: bool = False,
                         use_pallas: bool = True, block_b: int = 16,
                         rng=None, remat=None, sum_loss_scale: float = 1.0,
                         stash: bool = False):
    """Distillation-student forward through the fused kernel.

    The TS hot loop (loss_trainer.py:305-371) at TS-Base shapes: the
    student trajectory runs as segmented fused-kernel euler scans, the
    control-point CLS states are collected at the (static) segment
    boundaries — no [T, B, N, D] trajectory ever materializes in HBM,
    unlike the flax path's output_control_points — JaSMin keeps its
    tail-split, and the final evaluation emits the attention map for the
    L1/KL attention loss. Returns (loss, metrics_aux).

    ``t_states``: teacher hidden states [12, B, Nt, D] (layers 1..12,
    stop-gradiented); ``t_attn_last``: teacher last-layer attention.
    Dropout follows fast_free_forward's seed semantics (rng required
    when the model has nonzero drop rates).
    """
    from odevit_tpu.kernels.vector_field import (
        fused_vf_from_params, fused_vf_dropout_from_params,
        fused_vf_attn_dropout_from_params)
    from odevit_tpu.losses.attention_distill import (kl_attention_loss,
                                                     l1_attention_loss)
    from odevit_tpu.losses.control_points import \
        proportional_control_points
    from odevit_tpu.losses.trajectory import trajectory_mse

    assert not model.l2_attention and not model.time_conditioning
    assert model.solver == "euler", \
        "fused distillation path integrates the reference's euler grid"
    drops = (float(model.attn_drop), float(model.proj_drop),
             float(model.mlp_drop))
    has_drop = any(d > 0.0 for d in drops) and rng is not None
    if any(d > 0.0 for d in drops) and rng is None:
        raise ValueError("model has dropout; pass rng=")

    pe = _patch_embed_module(model)
    tokens = pe.apply({"params": params["patch_embed"]}, pixels)
    n = tokens.shape[1]
    reg = model.register_tokens
    scaler = drift_scaler(model.emulate_depth, model.time_interval)
    T = model.num_eval_steps
    num_steps = T - 1
    dt = float(model.time_interval) / num_steps

    # in-kernel pltpu dropout only where the native backward fits VMEM;
    # big-d shapes use XLA-side rbg masks through the twin (see
    # _xla_dropout_eval)
    pltpu_drop = False
    if has_drop:
        from odevit_tpu.kernels.vector_field import auto_block_b
        pltpu_drop = auto_block_b(
            pixels.shape[0], n, model.embed_dim,
            int(model.embed_dim * model.mlp_ratio), model.num_heads,
            emit_attn=True, bwd=True,
            itemsize=_model_itemsize(model)) > 0

    # static plan: control-point boundaries + jasmin tail
    cps = proportional_control_points(T, temperature)       # state indices
    window = max(1, min(int(0.85 * T), num_steps))
    tail_start = num_steps - window          # steps >= tail_start score
    cp_set = set(int(i) for i in cps)

    if has_drop:
        step_seeds = jax.random.randint(
            rng, (num_steps,), jnp.iinfo(jnp.int32).min,
            jnp.iinfo(jnp.int32).max, dtype=jnp.int32)

    def eval_plain(y, seed):
        if has_drop and not pltpu_drop:
            return _xla_dropout_eval(
                y, params["vf"], seed, num_heads=model.num_heads,
                scaler=scaler, n_real=n, drops=drops, want_attn=False)
        if has_drop:
            return fused_vf_dropout_from_params(
                y, params["vf"], seed, num_heads=model.num_heads,
                scaler=scaler, drops=drops, block_b=block_b, n_real=n,
                vmem_budget=vmem_budget)
        return fused_vf_from_params(
            y, params["vf"], num_heads=model.num_heads, scaler=scaler,
            block_b=block_b, use_pallas=use_pallas, n_real=n,
            vmem_budget=vmem_budget, stash=use_stash)

    def eval_attn(y, seed):
        if has_drop and not pltpu_drop:
            return _xla_dropout_eval(
                y, params["vf"], seed, num_heads=model.num_heads,
                scaler=scaler, n_real=n, drops=drops, want_attn=True)
        if has_drop:
            return fused_vf_attn_dropout_from_params(
                y, params["vf"], seed, num_heads=model.num_heads,
                scaler=scaler, drops=drops, block_b=block_b, n_real=n,
                vmem_budget=vmem_budget)
        return fused_vf_attn_from_params(
            y, params["vf"], num_heads=model.num_heads, scaler=scaler,
            block_b=block_b, use_pallas=use_pallas, n_real=n,
            vmem_budget=vmem_budget)

    # jasmin tail evals via in-kernel order statistics (maps stay in
    # VMEM); the XLA-rbg dropout path keeps the map route (its twin
    # computes maps anyway)
    stats_ok = (n >= max(jasmin_k, 1) + 1
                and not (has_drop and not pltpu_drop))
    # residual stashing: deterministic softmax Pallas evaluations only
    use_stash = bool(stash) and use_pallas and not has_drop

    def eval_jas(y, seed):
        if not stats_ok:
            dx, attn = eval_attn(y, seed)
            return dx, jasmin_map_loss(attn, k=jasmin_k)
        dx, st = fused_vf_jasmin_from_params(
            y, params["vf"], num_heads=model.num_heads, scaler=scaler,
            jas_k=jasmin_k, block_b=block_b, use_pallas=use_pallas,
            n_real=n, seed=seed if has_drop else None,
            drops=drops if has_drop else (0.0, 0.0, 0.0),
            vmem_budget=vmem_budget, stash=use_stash)
        return dx, jasmin_from_stats(st, jasmin_k)

    use_remat = _auto_remat(model, pixels.shape[0], n, remat,
                            stats_path=stats_ok)
    vmem_budget = None if use_remat else _fwd_budget(model, n)

    def body(with_jasmin):
        def _body(y, seed):
            if with_jasmin:
                dx, jas = eval_jas(y, seed)
            else:
                dx = eval_plain(y, seed)
                jas = jnp.zeros(())
            return (y + dt * dx).astype(y.dtype), jas
        if use_remat:
            _body = jax.checkpoint(_body, prevent_cse=False)
        return _body

    # segment the step range at jasmin-tail entry and at control points;
    # states[i] is reached after step i-1
    breaks = sorted({0, num_steps, tail_start}
                    | {i for i in cp_set if 0 < i <= num_steps})
    segments = [(a, b) for a, b in zip(breaks[:-1], breaks[1:])]

    y = tokens
    state_at = {0: tokens}
    jas_parts = []
    for a, b_ in segments:
        with_jasmin = a >= tail_start
        is_last = b_ == num_steps
        length = b_ - a - (1 if is_last else 0)
        seeds = (step_seeds[a:a + length] if has_drop
                 else jnp.zeros((length,), jnp.int32))
        if length > 0:
            y, jas = jax.lax.scan(body(with_jasmin), y, seeds)
            if with_jasmin:
                jas_parts.append(jas)
        if is_last:
            # final evaluation outside the scan: its attention map feeds
            # the attention-distillation loss
            seed_l = (step_seeds[num_steps - 1] if has_drop
                      else jnp.zeros((), jnp.int32))
            dx, last_attn = eval_attn(y, seed_l)
            if num_steps - 1 >= tail_start:
                jas_parts.append(
                    jasmin_map_loss(last_attn, k=jasmin_k)[None])
            y = (y + dt * dx).astype(y.dtype)
        if b_ in cp_set:
            state_at[b_] = y
    state_at[num_steps] = y

    cls_points = jnp.stack([state_at[int(i)][:, 0] for i in cps], axis=0)
    jas_evals = jnp.concatenate(jas_parts)
    jasmin = jasmin_trajectory_window(jas_evals, T)

    cls_final = y[:, 0].astype(jnp.float32)
    logits = cls_final @ params["head"]["kernel"] + params["head"]["bias"]

    # losses (semantics of train.steps.make_distill_train_step)
    mse, mse_parts = trajectory_mse(
        cls_points[:, :, None, :], t_states[:, :, :1],
        full_path=mse_full_path)
    rep = mse
    metrics = {"mse_loss": mse, **mse_parts}
    if use_distillation:
        s_attn = last_attn[:, :, :n - reg, :n - reg] if reg else last_attn
        if use_kl_loss:
            kl = kl_attention_loss(s_attn, t_attn_last,
                                   lambda_param=lambda_param,
                                   temperature=temperature)
        else:
            # the L1 loss SUMS over the batch (reference parity); under
            # the shard_map DP wrapper each shard sees batch/P samples,
            # so the term is scaled by P to make pmean over shards
            # reproduce the global-batch sum (all other terms are
            # per-sample means, where pmean is already exact)
            kl = l1_attention_loss(s_attn, t_attn_last,
                                   lambda_param=lambda_param
                                   ) * sum_loss_scale
        ok = jnp.isfinite(kl)
        rep = rep + jnp.where(ok, kl, 0.0)
        metrics["kl_loss"] = kl
        metrics["kl_nonfinite"] = 1.0 - ok.astype(jnp.float32)
    rep = rep * lambda_param

    loss = rep + jasmin
    ce = cross_entropy(logits, labels, label_smoothing=0.05)
    if supervise:
        loss = loss + ce
    metrics.update({"jasmin_loss": jasmin, "supervision_loss": ce,
                    "loss": loss})
    return loss, {"metrics": metrics, "logits": logits}


def make_fast_distill_train_step(
        student, teacher, tx, *, lambda_param: float, jasmin_k: int = 10,
        mse_full_path: bool = True, use_distillation: bool = True,
        use_kl_loss: bool = False, temperature: float = 30.0,
        lr_schedule: Optional[Callable] = None,
        preprocess_fn: Optional[Callable] = None, use_pallas: bool = True,
        block_b: int = 16, donate: bool = True, remat=None, mesh=None,
        data_axis: str = "data", teacher_cache: bool = False,
        stash: bool = False):
    """Fused-kernel drop-in for train.steps.make_distill_train_step (the
    TS-Base hot loop). Teacher forward stays pure flax/XLA (a standard
    ViT-B — already MXU-shaped); the student fwd+bwd runs through the
    Pallas kernels.

    With ``teacher_cache=True`` the step's second argument is a
    precomputed target cache (train/teacher_cache.build_teacher_cache)
    instead of the teacher params, the batch must carry ``index``, and
    the in-step teacher forward disappears entirely.

    With ``mesh``, the step runs data-parallel via shard_map over
    ``data_axis`` (same design as make_fast_free_train_step): teacher +
    student forward/backward on the local batch shard, grads/metrics
    pmean'd over ICI, replicated optimizer update. Pallas kernels see
    local shapes only, so tiles and the scoped-VMEM plan are unchanged.
    """

    has_drop = any(float(d) > 0.0 for d in
                   (student.attn_drop, student.proj_drop,
                    student.mlp_drop))

    def step(state, teacher_params, batch, rng, supervise: bool):
        rng = jax.random.fold_in(rng, state.step)
        if has_drop and mesh is not None:
            # independent dropout masks per data shard
            rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        pixels, labels = batch["pixel_values"], batch["labels"]
        if preprocess_fn is not None:
            pixels = preprocess_fn(pixels)

        if teacher_cache:
            from odevit_tpu.train.teacher_cache import gather_targets
            t_states, t_attn_last = gather_targets(teacher_params,
                                                   batch["index"])
        else:
            t_out = teacher.apply({"params": teacher_params}, pixels)
            t_states = jax.lax.stop_gradient(t_out["hidden_states"][1:])
            t_attn_last = jax.lax.stop_gradient(t_out["attentions"][-1])

        def loss_fn(params):
            return fast_distill_forward(
                student, params, pixels, labels, t_states, t_attn_last,
                jasmin_k=jasmin_k, temperature=temperature,
                lambda_param=lambda_param, mse_full_path=mse_full_path,
                use_distillation=use_distillation,
                use_kl_loss=use_kl_loss, supervise=supervise,
                use_pallas=use_pallas, block_b=block_b,
                rng=rng if has_drop else None, remat=remat,
                sum_loss_scale=(float(mesh.shape[data_axis])
                                if mesh is not None else 1.0),
                stash=stash)

        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        metrics = dict(aux["metrics"])
        metrics["acc"] = _accuracy(aux["logits"], batch["labels"])
        if mesh is not None:
            grads = jax.lax.pmean(grads, data_axis)
            metrics = jax.lax.pmean(metrics, data_axis)
        new_state = state.apply_gradients(grads, tx)
        metrics["grad_norm"] = optax_global_norm(grads)
        metrics["nonfinite"] = 1.0 - jnp.isfinite(
            metrics["loss"]).astype(jnp.float32)
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, static_argnames=("supervise",),
                       donate_argnums=(0,) if donate else (),
                       **_fused_jit_kwargs(student))

    from jax.sharding import PartitionSpec as P

    def make_sharded(sup: bool):
        def f(state, teacher_params, batch, rng):
            return step(state, teacher_params, batch, rng, sup)
        sharded = jax.shard_map(
            f, mesh=mesh,
            in_specs=(P(), P(), P(data_axis), P()),
            out_specs=(P(), P()), check_vma=False)
        return jax.jit(sharded, donate_argnums=(0,) if donate else (),
                       **_fused_jit_kwargs(student))

    jits = {True: make_sharded(True), False: make_sharded(False)}

    def dispatch(state, teacher_params, batch, rng, supervise: bool):
        return jits[bool(supervise)](state, teacher_params, batch, rng)

    return dispatch


def make_fast_macaron_train_step(model, tx, *,
                                 lr_schedule: Optional[Callable] = None,
                                 preprocess_fn: Optional[Callable] = None,
                                 use_pallas: bool = True,
                                 block_b: int = 16, donate: bool = True,
                                 mesh=None, data_axis: str = "data"):
    """Fused free-training step for ViTMacaron (CE only — the macaron
    family exposes no attention maps/JaSMin, mirroring the reference):
    forward through fast_forward_macaron (fused Macaron kernel inside
    the solver scan), backward through the native Macaron kernel
    (kernels/macaron.pallas_macaron_bwd). Deterministic — macaron
    configs train without dropout; nonzero drop rates must use the flax
    step.

    With ``mesh``, runs data-parallel via shard_map over ``data_axis``
    (local-shard kernels + pmean'd grads/metrics), mirroring
    make_fast_free_train_step."""
    from odevit_tpu.models.fast_forward import fast_forward_macaron

    assert all(float(d) == 0.0 for d in
               (model.attn_drop, model.proj_drop, model.mlp_drop)), \
        "fused macaron step is deterministic-only"

    def step(state, batch, rng):
        pixels = (preprocess_fn(batch["pixel_values"]) if preprocess_fn
                  else batch["pixel_values"])

        def loss_fn(params):
            out = fast_forward_macaron(model, params, pixels,
                                       block_b=block_b,
                                       use_pallas=use_pallas,
                                       differentiable=True)
            loss = cross_entropy(out["logits"], batch["labels"])
            return loss, out["logits"]

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        acc = _accuracy(logits, batch["labels"])
        if mesh is not None:
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)
            acc = jax.lax.pmean(acc, data_axis)
        new_state = state.apply_gradients(grads, tx)
        metrics = {"loss": loss, "jasmin_loss": jnp.zeros(()),
                   "acc": acc, "grad_norm": optax_global_norm(grads)}
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else (),
                       **_fused_jit_kwargs(model))

    from jax.sharding import PartitionSpec as P
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(data_axis), P()),
        out_specs=(P(), P()), check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,) if donate else (),
                   **_fused_jit_kwargs(model))


def fused_free_qualifies(model, *, use_jasmin: bool = True,
                         jasmin_k: int = 10) -> bool:
    """True when the fused free-training step supports this model
    config: softmax-attention ViTODE without time conditioning, JaSMin
    on, sequence long enough for the in-kernel/map JaSMin tail, and (for
    nonzero drop rates) a solver whose in-kernel dropout staging exists.
    Callers additionally gate on a TPU backend — off-TPU the kernels run
    in interpreter mode and the flax path is faster."""
    if not use_jasmin:
        return False
    if getattr(model, "time_conditioning", False):
        return False
    has_drop = any(float(d) > 0.0 for d in
                   (model.attn_drop, model.proj_drop, model.mlp_drop))
    if getattr(model, "l2_attention", False):
        # fused L2 is deterministic-only and requires the stats route,
        # which needs n >= jasmin_k + 2 for its k+1 extraction passes
        # (fast_free_forward asserts this at step-build time otherwise)
        n = ((model.img_size // model.patch_size) ** 2 + 1
             + getattr(model, "register_tokens", 0)
             + (1 if model.add_distillation_token else 0))
        return not has_drop and n >= max(jasmin_k, 1) + 1
    if has_drop and model.solver not in ("euler", "rk4"):
        return False
    return True


def make_fast_free_train_step(model, tx, *, jasmin_k: int = 10,
                              lr_schedule: Optional[Callable] = None,
                              preprocess_fn: Optional[Callable] = None,
                              use_pallas: bool = True,
                              block_b: int = 16, donate: bool = True,
                              remat=None, mesh=None,
                              data_axis: str = "data",
                              stash: bool = False):
    """Drop-in fused alternative to make_free_train_step.

    With ``mesh``, the step runs data-parallel via shard_map over
    ``data_axis``: each device runs the fused kernels on its local batch
    shard, gradients/metrics are mean-reduced over ICI (psum), and the
    replicated optimizer update is computed identically everywhere —
    Pallas kernels see only local shapes, so the single-chip tiles (and
    the scoped-VMEM budget) are unchanged. The dropout rng folds in the
    device's data-axis index so shards draw independent masks.
    """

    has_drop = any(float(d) > 0.0 for d in
                   (model.attn_drop, model.proj_drop, model.mlp_drop))

    def step(state, batch, rng):
        if has_drop:
            rng = jax.random.fold_in(rng, state.step)
            if mesh is not None:
                rng = jax.random.fold_in(
                    rng, jax.lax.axis_index(data_axis))
        pixels = (preprocess_fn(batch["pixel_values"]) if preprocess_fn
                  else batch["pixel_values"])

        def loss_fn(params):
            return fast_free_forward(model, params, pixels,
                                     batch["labels"], jasmin_k=jasmin_k,
                                     use_pallas=use_pallas,
                                     block_b=block_b,
                                     rng=rng if has_drop else None,
                                     remat=remat, stash=stash)

        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        acc = _accuracy(aux["logits"], batch["labels"])
        if mesh is not None:
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)
            acc = jax.lax.pmean(acc, data_axis)
            jl = jax.lax.pmean(aux["jasmin_loss"], data_axis)
        else:
            jl = aux["jasmin_loss"]
        new_state = state.apply_gradients(grads, tx)
        metrics = {"loss": loss, "jasmin_loss": jl, "acc": acc,
                   "grad_norm": optax_global_norm(grads)}
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else (),
                       **_fused_jit_kwargs(model))

    from jax.sharding import PartitionSpec as P
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(data_axis), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,) if donate else (),
                   **_fused_jit_kwargs(model))
