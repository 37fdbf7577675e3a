"""On-TPU correctness check for in-kernel dropout (fused vector field).

pltpu.prng_* has no CPU interpret-mode lowering, so the dropout kernels
can't run in the pytest suite (which forces the CPU platform); this
script is the on-hardware gate. Checks, at f32 so tolerances are tight:

  1. fwd-vs-twin: the kernel with emit_masks on returns its actual keep
     masks; an XLA twin fed those masks must reproduce dx (and the
     pre-dropout attention maps) to ~1e-5.
  2. mask statistics: keep rate ~= 1-p per site; values in {0, 1/(1-p)}.
  3. bwd-vs-twin: the custom-vjp cotangents (backward kernel regenerating
     masks at its own, smaller tile) must match jax.vjp of the
     mask-closed twin — this proves the per-image seeding makes fwd and
     bwd streams identical across different block sizes.
  4. determinism: same seed => bit-identical outputs.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/tpu_dropout_check.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from odevit_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import json

import numpy as np
import jax
import jax.numpy as jnp

# the XLA twin must not run at the TPU's default-bf16 matmul precision —
# the kernel's dot_generals accumulate in f32
jax.config.update("jax_default_matmul_precision", "highest")


def xla_twin_with_masks(x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2,
                        masks, *, num_heads, scaler, n_real):
    """The kernel's math with the kernel's own (scaled) keep masks."""
    mask_h, mask_mo, mask_ao, mask_p = masks
    b, n, d = x.shape
    hd = d // num_heads
    xf = x.astype(jnp.float32)
    cent = (xf - jnp.mean(xf, -1, keepdims=True)) * (d / (d - 1.0))
    cn_a = cent * cna_s + cna_b
    cn_m = cent * cnm_s + cnm_b

    h = jax.nn.gelu(cn_m @ w1, approximate=False)
    h = h * mask_h.reshape(b, n, -1)
    mlp_o = (h @ w2) * mask_mo.reshape(b, n, d)

    qkv = cn_a @ wqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    heads = lambda t: t.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    q, k, v = heads(q) * hd ** -0.5, heads(k), heads(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    if n_real < n:
        s = jnp.where((jnp.arange(n) < n_real)[None, None, None, :],
                      s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    p_used = p * mask_p
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p_used, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, d)
    attn_o = (ctx @ wout) * mask_ao.reshape(b, n, d)
    return (mlp_o + attn_o) * scaler, p


def run_checks():
    """Run all on-chip dropout-semantics checks; returns the results dict
    (asserts on any violation). Called by bench.py's parity gate so the
    pltpu-prng mask contract is driver-visible every round."""
    from odevit_tpu.kernels.vector_field import (
        _pallas_forward, fused_vf_attn_dropout, TOKEN_PAD)

    assert jax.default_backend() == "tpu", \
        f"needs the real TPU (got {jax.default_backend()})"

    rng = np.random.default_rng(0)
    b, n, d, heads, dh = 16, 21, 64, 2, 128
    n_pad = -(-n // TOKEN_PAD) * TOKEN_PAD
    drops = (0.2, 0.1, 0.3)               # attn, proj, mlp
    scaler = 12.0
    f32 = jnp.float32

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.2, f32)

    x = mk(b, n, d)
    cna_s, cna_b, cnm_s, cnm_b = mk(d), mk(d), mk(d), mk(d)
    wqkv, wout, w1, w2 = mk(d, 3 * d), mk(d, d), mk(d, dh), mk(dh, d)
    seed = jnp.asarray(12345, jnp.int32)
    args = (x, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2)

    results = {}

    # --- 1. forward vs twin ------------------------------------------
    fwd = jax.jit(lambda *a: _pallas_forward(
        *a, num_heads=heads, scaler=scaler, block_b=8, n_real=n,
        emit_attn=True, seed=seed, attn_drop=drops[0],
        proj_drop=drops[1], mlp_drop=drops[2], emit_masks=True))
    dx_k, attn_k, masks = fwd(*args)

    x_pad = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    dx_t, p_t = xla_twin_with_masks(
        x_pad, cna_s, cna_b, cnm_s, cnm_b, wqkv, wout, w1, w2, masks,
        num_heads=heads, scaler=scaler, n_real=n)
    err_fwd = float(jnp.max(jnp.abs(dx_k - dx_t[:, :n])))
    err_attn = float(jnp.max(jnp.abs(attn_k - p_t[:, :, :n, :n])))
    results["fwd_max_abs_err"] = err_fwd
    results["attn_max_abs_err"] = err_attn
    assert err_fwd < 1e-4, err_fwd
    assert err_attn < 1e-5, err_attn

    # --- 2. mask statistics ------------------------------------------
    for name, m, rate in (("h", masks[0], drops[2]),
                          ("mlp_out", masks[1], drops[2]),
                          ("attn_out", masks[2], drops[1]),
                          ("p", masks[3], drops[0])):
        vals = np.unique(np.asarray(m))
        assert len(vals) <= 2 and vals[0] == 0.0, (name, vals)
        assert abs(float(vals[-1]) - 1.0 / (1.0 - rate)) < 1e-5, (name, vals)
        keep = float((np.asarray(m) > 0).mean())
        results[f"keep_rate_{name}"] = round(keep, 4)
        assert abs(keep - (1.0 - rate)) < 0.02, (name, keep)

    # --- 3. backward vs twin (different bwd tile regenerates masks) ---
    def kernel_loss(xx, *ws):
        dx, attn = fused_vf_attn_dropout(xx, *ws, seed, heads, scaler, 8,
                                         n, *drops)
        return (jnp.sum(dx * dx) + jnp.sum(attn[:, :, 0, :])), None

    def twin_loss(xx, *ws):
        xx = jnp.pad(xx, ((0, 0), (0, n_pad - n), (0, 0)))
        dx, p = xla_twin_with_masks(xx, *ws, masks, num_heads=heads,
                                    scaler=scaler, n_real=n)
        dx = dx[:, :n]
        p = p[:, :, :n, :n]
        return jnp.sum(dx * dx) + jnp.sum(p[:, :, 0, :])

    gk = jax.jit(jax.grad(lambda *a: kernel_loss(*a)[0],
                          argnums=tuple(range(9))))(*args)
    gt = jax.jit(jax.grad(twin_loss, argnums=tuple(range(9))))(*args)
    names = ("x", "cna_s", "cna_b", "cnm_s", "cnm_b",
             "wqkv", "wout", "w1", "w2")
    for nm, a_, b_ in zip(names, gk, gt):
        scale = float(jnp.max(jnp.abs(b_))) + 1e-6
        err = float(jnp.max(jnp.abs(a_ - b_))) / scale
        results[f"bwd_rel_err_{nm}"] = round(err, 7)
        assert err < 1e-4, (nm, err)

    # --- 5. split-vs-combined backward (mask regeneration across both
    # kernel decompositions and tile sizes must be bit-compatible) ----
    from odevit_tpu.kernels import vector_field as VF
    from odevit_tpu.kernels import vector_field_bwd as VB

    g_dx = mk(b, n, d)
    g_attn = mk(b, heads, n, n)
    kw = dict(num_heads=heads, scaler=scaler, n_real=n, seed=seed,
              attn_drop=drops[0], proj_drop=drops[1], mlp_drop=drops[2])
    split = jax.jit(lambda *a: VB._pallas_vf_bwd_split(
        *a[:10], a[10], (8, 128, 4), **kw))(*args, g_dx, g_attn)
    orig_split, orig_auto = VB._split_tiles, VF.auto_block_b
    VB._split_tiles = lambda *a, **k: None
    VF.auto_block_b = lambda *a, **k: 2
    try:
        comb = jax.jit(lambda *a: VB.pallas_vf_bwd(
            *a[:10], a[10], block_b=2, **kw))(*args, g_dx, g_attn)
    finally:
        VB._split_tiles, VF.auto_block_b = orig_split, orig_auto
    for nm, a_, c_ in zip(names, split, comb):
        scale = float(jnp.max(jnp.abs(c_))) + 1e-6
        err = float(jnp.max(jnp.abs(a_ - c_))) / scale
        results[f"split_rel_err_{nm}"] = round(err, 7)
        assert err < 1e-4, (nm, err)

    # --- 4. determinism ----------------------------------------------
    dx2, attn2, masks2 = fwd(*args)
    assert bool((dx_k == dx2).all()) and bool((attn_k == attn2).all())
    assert all(bool((m1 == m2).all()) for m1, m2 in zip(masks, masks2))
    results["deterministic"] = True

    results["ok"] = True
    return results


def main():
    print(json.dumps(run_checks()))


if __name__ == "__main__":
    main()
