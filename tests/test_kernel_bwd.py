"""Native backward kernel: cotangent parity with the XLA-vjp reference."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from odevit_tpu.kernels.vector_field import (_xla_reference,
                                             fused_vf_from_params,
                                             fused_vf_attn_from_params)
from tests.test_kernels import make_params


def flat_args(params, d):
    return (params["norm_attn"]["scale"], params["norm_attn"]["bias"],
            params["norm_mlp"]["scale"], params["norm_mlp"]["bias"],
            params["attn"]["qkv_kernel"], params["attn"]["out_kernel"],
            params["mlp"]["fc1_kernel"], params["mlp"]["fc2_kernel"])


@pytest.mark.parametrize("n", [17, 32])
def test_bwd_kernel_matches_xla_vjp(n):
    d, heads = 64, 2
    params = make_params(d, heads)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, n, d)), jnp.float32)

    def loss_pallas(x, *ws):
        p = {"norm_attn": {"scale": ws[0], "bias": ws[1]},
             "norm_mlp": {"scale": ws[2], "bias": ws[3]},
             "attn": {"qkv_kernel": ws[4], "out_kernel": ws[5]},
             "mlp": {"fc1_kernel": ws[6], "fc2_kernel": ws[7]}}
        out = fused_vf_from_params(x, p, num_heads=heads, scaler=3.0,
                                   block_b=4)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    def loss_xla(x, *ws):
        out = _xla_reference(x, *ws, num_heads=heads, scaler=3.0)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    ws = flat_args(params, d)
    gp = jax.grad(loss_pallas, argnums=tuple(range(9)))(x, *ws)
    gx = jax.grad(loss_xla, argnums=tuple(range(9)))(x, *ws)
    names = ["x", "cna_s", "cna_b", "cnm_s", "cnm_b", "wqkv", "wout",
             "w1", "w2"]
    for name, a, b in zip(names, gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3, err_msg=name)


def test_bwd_kernel_with_attention_cotangent():
    """Gradient flows through BOTH outputs (dx and attention maps)."""
    d, heads = 64, 2
    params = make_params(d, heads)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 17, d)), jnp.float32)
    ws = flat_args(params, d)

    def loss_pallas(x, *ws):
        p = {"norm_attn": {"scale": ws[0], "bias": ws[1]},
             "norm_mlp": {"scale": ws[2], "bias": ws[3]},
             "attn": {"qkv_kernel": ws[4], "out_kernel": ws[5]},
             "mlp": {"fc1_kernel": ws[6], "fc2_kernel": ws[7]}}
        dx, attn = fused_vf_attn_from_params(x, p, num_heads=heads,
                                             scaler=2.0, block_b=4)
        return (jnp.sum(dx.astype(jnp.float32) ** 2)
                + jnp.sum(jnp.log(attn.astype(jnp.float32) + 1e-6)))

    def loss_xla(x, *ws):
        dx, attn = _xla_reference(x, *ws, num_heads=heads, scaler=2.0,
                                  return_attn=True)
        return (jnp.sum(dx.astype(jnp.float32) ** 2)
                + jnp.sum(jnp.log(attn.astype(jnp.float32) + 1e-6)))

    gp = jax.grad(loss_pallas, argnums=tuple(range(9)))(x, *ws)
    gx = jax.grad(loss_xla, argnums=tuple(range(9)))(x, *ws)
    for i, (a, b) in enumerate(zip(gp, gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-2, err_msg=str(i))


def _ws(params):
    return flat_args(params, None)


def test_bwd_dispatch_ladder():
    """Dispatch ordering: combined kernel at CIFAR shapes (the known
    in-situ-safe config), split kernels at mid-size shapes where the
    combined live set can't fit one image, XLA twin at ViT-Base."""
    from odevit_tpu.kernels.vector_field_bwd import _split_tiles
    from odevit_tpu.kernels.vector_field import auto_block_b

    # CIFAR (d=192, r=4, heads=3, n=69): combined fits at the measured-
    # fastest bb=8 under the raised scoped limit
    assert auto_block_b(1024, 69, 192, 768, 3, emit_attn=True,
                        requested=16, bwd=True) == 8
    # ViT-Base (d=768, r=4, n=208): the 64MB scoped-VMEM plan fits the
    # combined kernel at bb=1 (the TS-Base training path)
    from odevit_tpu.kernels.vector_field import bwd_vmem_plan
    assert bwd_vmem_plan(208, 768, 3072, 12, emit_attn=True)[0] == 65536
    assert auto_block_b(64, 208, 768, 3072, 12, emit_attn=True,
                        requested=16, bwd=True) == 1
    # long-sequence mid-width (d=512, r=4, n=720): combined can't fit
    # one image even under the 64MB plan; the chained split kernels can
    assert auto_block_b(64, 720, 512, 2048, 8, emit_attn=True,
                        requested=16, bwd=True) == 0
    assert _split_tiles(64, 720, 512, 2048, 8, has_attn_bar=True,
                        has_drop=False, requested=16) is not None
    # beyond even the split kernels (d=1280): XLA-twin fallback
    assert auto_block_b(64, 208, 1280, 5120, 16, emit_attn=True,
                        requested=16, bwd=True) == 0
    assert _split_tiles(64, 208, 1280, 5120, 16, has_attn_bar=True,
                        has_drop=False, requested=16) is None
    # TS-Base JaSMin route (r4): the combined kernel is pinned to bb=1
    # by the ratio-4 weight-grad accumulators, but the split halves each
    # tile at bb=2 (the d-class cap) — incl. with the jas cotangent, so
    # the distill step's backward dispatches to the split path. Measured
    # on-chip: a TIE at B=64 (343.9 vs 344.0 ms) — kept for the faster
    # compile (108s vs 174s) and the headroom class; see NOTES_ROUND4.
    assert auto_block_b(64, 197, 768, 3072, 12, emit_jas=True,
                        requested=16, bwd=True) == 1
    assert _split_tiles(64, 197, 768, 3072, 12, has_attn_bar=False,
                        has_drop=False, requested=16,
                        emit_jas=True) == (2, 3072, 2)
    assert _split_tiles(64, 197, 768, 3072, 12, has_attn_bar=True,
                        has_drop=False, requested=16) == (2, 3072, 2)


def test_bwd_tile_requested_independent_and_fwd_budget():
    """Round-3 regression guards for the train-jit VMEM budget work.

    (a) The TS-Base combined backward must land at bb=1 regardless of
    the forward's (now larger) block_b flowing in as ``requested`` —
    the on-chip repro showed bb=2's real frame at 65.8MiB > the 64MiB
    scoped limit, admitted only because the weight term undercounted
    the f32 accumulators (4 instead of 6 bytes/param).
    (b) Tiles never leave their shape's PROVEN Mosaic compile-cost
    class (_tile_class_cap): d=192 up to bb=16, d=768 up to bb=2,
    dh>=2048 pinned at bb=1 — bigger VMEM budgets admit tiles the AOT
    compiler was measured to stall or OOM on (full train-step programs
    at d=768 bb=4 died twice; ratio-4 fwd bb=4 never finished a 30-min
    compile), so the budget must not select them.
    (c) CIFAR tiles are unchanged by the recalibration.
    """
    from odevit_tpu.kernels.vector_field import (auto_block_b,
                                                 bwd_vmem_plan)

    n, d, dh, h = 197, 768, 3072, 12
    for req in (1, 2, 4, 8, 16):
        for kw in ({}, {"emit_jas": True}, {"emit_attn": True}):
            assert auto_block_b(64, n, d, dh, h, requested=req,
                                bwd=True, **kw) == 1, (req, kw)
    budget = bwd_vmem_plan(n, d, dh, h, emit_attn=True, emit_jas=True)[1]
    assert auto_block_b(64, n, d, dh, h, requested=16,
                        budget_override=budget) == 1   # dh>=2048 class
    assert auto_block_b(64, 207, 768, 768, 12, requested=16,
                        budget_override=budget) == 2   # ratio-1 student
    assert auto_block_b(64, 207, 768, 768, 12, requested=16,
                        bwd=True) == 2                 # bwd same class
    assert auto_block_b(64, n, d, dh, h, requested=16) == 1  # serving
    # CIFAR: bwd bb=8 (measured-fastest), fwd bb=16, either budget
    cifar = (65, 192, 768, 3)
    assert auto_block_b(1024, *cifar, requested=16, bwd=True,
                        emit_jas=True) == 8
    cbud = bwd_vmem_plan(*cifar, emit_attn=True, emit_jas=True)[1]
    assert auto_block_b(1024, *cifar, requested=16) == 16
    assert auto_block_b(1024, *cifar, requested=16,
                        budget_override=cbud) == 16


def test_split_bwd_matches_xla_vjp():
    """The split path (one MLP-branch kernel with a chunked hidden + one
    attention-branch kernel) must produce the same nine cotangents as
    the XLA vjp."""
    from odevit_tpu.kernels.vector_field_bwd import _pallas_vf_bwd_split
    from odevit_tpu.kernels.vector_field import _xla_reference

    d, heads, n, b = 64, 2, 17, 16
    params = make_params(d, heads)
    ws = flat_args(params, d)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    g_dx = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    g_attn = jnp.asarray(rng.standard_normal((b, heads, n, n)), jnp.float32)

    for ga in (None, g_attn):
        bars = _pallas_vf_bwd_split(x, *ws, g_dx, ga, (8, 128, 8),
                                    num_heads=heads, scaler=3.0, n_real=n)

        def f(x_, *ws_):
            return _xla_reference(x_, *ws_, num_heads=heads, scaler=3.0,
                                  n_real=n, return_attn=ga is not None)

        _, vjp = jax.vjp(f, x, *ws)
        ref = vjp((g_dx, ga) if ga is not None else g_dx)
        names = ["x", "cna_s", "cna_b", "cnm_s", "cnm_b", "wqkv", "wout",
                 "w1", "w2"]
        for name, a, r in zip(names, bars, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=5e-4, rtol=5e-3, err_msg=name)


def test_split_bwd_dropout_matches_combined():
    """With a seed + drop rates, the split kernels regenerate the same
    per-(site, image) masks as the combined kernel (seeding is tile-size
    independent), so their cotangents must agree. TPU-only: pltpu's
    prng primitives have no CPU-interpret lowering (same reason the
    forward dropout check lives in benchmarks/tpu_dropout_check.py)."""
    if jax.default_backend() != "tpu":
        pytest.skip("in-kernel pltpu prng requires a TPU backend")
    from odevit_tpu.kernels.vector_field_bwd import (_pallas_vf_bwd_split,
                                                     pallas_vf_bwd)
    from odevit_tpu.kernels import vector_field_bwd as VB
    from odevit_tpu.kernels import vector_field as VF

    d, heads, n, b = 64, 2, 17, 8
    params = make_params(d, heads)
    ws = flat_args(params, d)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    g_dx = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    g_attn = jnp.asarray(rng.standard_normal((b, heads, n, n)), jnp.float32)
    kw = dict(num_heads=heads, scaler=2.0, n_real=n, seed=1234,
              attn_drop=0.2, proj_drop=0.1, mlp_drop=0.15)

    split = _pallas_vf_bwd_split(x, *ws, g_dx, g_attn, (4, 128, 4), **kw)
    # force the combined kernel (block 2) through the public dispatcher
    orig_split, orig_auto = VB._split_tiles, VF.auto_block_b
    VB._split_tiles = lambda *a, **k: None
    VF.auto_block_b = lambda *a, **k: 2
    try:
        comb = pallas_vf_bwd(x, *ws, g_dx, g_attn, block_b=2, **kw)
    finally:
        VB._split_tiles, VF.auto_block_b = orig_split, orig_auto
    for i, (a, c) in enumerate(zip(split, comb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-4, rtol=2e-3, err_msg=str(i))


def test_l2_bias_bwd_matches_xla_vjp():
    """Native L2-attention backward (biased projections): all 11
    cotangents vs the XLA-twin vjp."""
    from odevit_tpu.kernels.vector_field import fused_vf_l2, _xla_reference

    B, N, D, H, DH = 4, 21, 32, 2, 64
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)

    def w(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)

    args = (x, w(D), w(D), w(D), w(D), w(D, 3 * D), w(D, D), w(D, DH),
            w(DH, D), w(3 * D), w(D))
    probe = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)

    def loss_native(*a):
        return jnp.sum(fused_vf_l2(*a, H, 2.0, 2, N - 4) * probe)

    def loss_twin(*a):
        return jnp.sum(_xla_reference(*a, num_heads=H, scaler=2.0,
                                      n_real=N - 4, l2_attention=True)
                       * probe)

    gn = jax.grad(loss_native, argnums=tuple(range(11)))(*args)
    gt = jax.grad(loss_twin, argnums=tuple(range(11)))(*args)
    for i, (a, b) in enumerate(zip(gn, gt)):
        denom = np.linalg.norm(np.asarray(b, np.float32)) + 1e-12
        rel = np.linalg.norm(np.asarray(a - b, np.float32)) / denom
        assert rel < 1e-5, (i, rel)


def test_macaron_bwd_matches_xla_vjp():
    """Native Macaron backward: all 16 cotangents (x, 3x LN scale/bias,
    biased QKV/out, shared FFN weights/biases, res_scale) vs the
    XLA-twin vjp."""
    from odevit_tpu.kernels.macaron import fused_macaron, _xla_macaron

    B, N, D, H, DH = 4, 19, 32, 2, 64
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)

    def w(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)

    args = (x, w(D) + 1, w(D), w(D) + 1, w(D), w(D) + 1, w(D),
            w(D, 3 * D), w(3 * D), w(D, D), w(D),
            w(D, DH), w(DH), w(DH, D), w(D), jnp.asarray(0.7))
    probe = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)

    def loss_native(*a):
        return jnp.sum(fused_macaron(*a, H, 2.0, 2, N - 3) * probe)

    def loss_twin(*a):
        return jnp.sum(_xla_macaron(*a, num_heads=H, scaler=2.0,
                                    n_real=N - 3) * probe)

    gn = jax.grad(loss_native, argnums=tuple(range(16)))(*args)
    gt = jax.grad(loss_twin, argnums=tuple(range(16)))(*args)
    for i, (a, b) in enumerate(zip(gn, gt)):
        denom = np.linalg.norm(np.ravel(np.asarray(b, np.float32))) + 1e-9
        rel = (np.linalg.norm(np.ravel(np.asarray(a - b, np.float32)))
               / denom)
        assert rel < 5e-5, (i, rel)


def test_stash_bwd_matches_plain():
    """Residual-stashing variant (fused_vf_stash): the backward reads the
    forward's stashed qkv/h1 instead of recomputing — cotangents must
    match the recomputing kernel (exactly at f32, where the stash incurs
    no rounding)."""
    from odevit_tpu.kernels.vector_field import fused_vf, fused_vf_stash

    d, heads = 64, 2
    params = make_params(d, heads)
    ws = flat_args(params, d)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((8, 17, d)), jnp.float32)

    def loss(fn):
        def inner(x, *ws):
            out = fn(x, *ws, heads, 3.0, 4, 17)
            return jnp.sum(jnp.sin(out.astype(jnp.float32)))
        return inner

    gs = jax.grad(loss(fused_vf_stash), argnums=tuple(range(9)))(x, *ws)
    gp = jax.grad(loss(fused_vf), argnums=tuple(range(9)))(x, *ws)
    names = ["x", "cna_s", "cna_b", "cnm_s", "cnm_b", "wqkv", "wout",
             "w1", "w2"]
    for name, a, b in zip(names, gs, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5, err_msg=name)


def test_stash_jasmin_bwd_matches_plain():
    """fused_vf_jasmin_stash: gradient through BOTH outputs (dx and the
    JaSMin order statistics) matches the recomputing jasmin kernel."""
    from odevit_tpu.kernels.vector_field import (fused_vf_jasmin,
                                                 fused_vf_jasmin_stash)

    d, heads, k = 64, 2, 2
    params = make_params(d, heads)
    ws = flat_args(params, d)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((4, 17, d)), jnp.float32)

    def loss(fn):
        def inner(x, *ws):
            dx, st = fn(x, *ws, heads, 2.0, 4, 17, k)
            return (jnp.sum(dx.astype(jnp.float32) ** 2)
                    + jnp.sum(jnp.log(st.astype(jnp.float32) + 1e-3)))
        return inner

    gs = jax.grad(loss(fused_vf_jasmin_stash),
                  argnums=tuple(range(9)))(x, *ws)
    gp = jax.grad(loss(fused_vf_jasmin), argnums=tuple(range(9)))(x, *ws)
    for i, (a, b) in enumerate(zip(gs, gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5, err_msg=str(i))


def test_stash_split_bwd_matches_xla_vjp():
    """The SPLIT backward with stashed residuals (the TS-Base training
    route the stash targets) produces the same nine cotangents as the
    XLA vjp."""
    from odevit_tpu.kernels.vector_field import (_pallas_forward,
                                                 _xla_reference)
    from odevit_tpu.kernels.vector_field_bwd import _pallas_vf_bwd_split

    d, heads, n, b = 64, 2, 17, 16
    params = make_params(d, heads)
    ws = flat_args(params, d)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    g_dx = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)

    _, (rqkv, rh1) = _pallas_forward(x, *ws, num_heads=heads, scaler=3.0,
                                     block_b=4, n_real=n, emit_resid=True)
    bars = _pallas_vf_bwd_split(x, *ws, g_dx, None, (8, 128, 8),
                                num_heads=heads, scaler=3.0, n_real=n,
                                resid_qkv=rqkv, resid_h1=rh1)

    def f(x_, *ws_):
        return _xla_reference(x_, *ws_, num_heads=heads, scaler=3.0,
                              n_real=n)

    _, vjp = jax.vjp(f, x, *ws)
    ref = vjp(g_dx)
    names = ["x", "cna_s", "cna_b", "cnm_s", "cnm_b", "wqkv", "wout",
             "w1", "w2"]
    for name, a, r in zip(names, bars, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-4, rtol=5e-3, err_msg=name)


def test_stash_fast_distill_forward_matches_plain():
    """End-to-end: fast_distill_forward(stash=True) produces the same
    loss and gradients as the recomputing path at f32."""
    import flax.linen as fnn
    from odevit_tpu.models.vit_ode import ViTODE
    from odevit_tpu.train.fast_steps import fast_distill_forward

    model = ViTODE(img_size=16, patch_size=4, embed_dim=64, num_heads=2,
                   mlp_ratio=2.0, num_classes=7, emulate_depth=12.0,
                   time_interval=1.0, num_eval_steps=7, solver="euler",
                   register_tokens=1, dtype=jnp.float32)
    rng = np.random.default_rng(8)
    pixels = jnp.asarray(rng.standard_normal((4, 16, 16, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 7, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), pixels)["params"]
    nt = (16 // 4) ** 2 + 1
    t_states = jnp.asarray(rng.standard_normal((12, 4, nt, 64)),
                           jnp.float32)
    t_attn = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((4, 2, nt, nt)), jnp.float32), axis=-1)

    def run(stash):
        def loss_fn(p):
            return fast_distill_forward(
                model, p, pixels, labels, t_states, t_attn,
                jasmin_k=2, temperature=3.0, lambda_param=0.5,
                stash=stash)[0]
        return jax.value_and_grad(loss_fn)(params)

    (l_p, g_p), (l_s, g_s) = run(False), run(True)
    np.testing.assert_allclose(float(l_s), float(l_p), rtol=1e-6)
    flat_p = jax.tree_util.tree_leaves(g_p)
    flat_s = jax.tree_util.tree_leaves(g_s)
    for a, b in zip(flat_s, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
