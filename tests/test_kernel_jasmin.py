"""Parity of the in-kernel JaSMin order-statistics path.

The training fast path computes JaSMin from a [B, H, JAS_ROWS, N]
statistics tensor emitted by the fused kernel (maps never leave VMEM);
these tests pin it to the map-emitting route: same loss value, same
cotangents for all 9 operands, same dropout semantics. Reference
anchor for the loss math: /root/reference/models/utils.py:23-61
(jasmin_loss/g_k), already golden-tested in test_reference_parity.py
via losses.jasmin.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odevit_tpu.kernels.vector_field import (fused_vf_attn,
                                             fused_vf_attn_dropout,
                                             fused_vf_jasmin,
                                             fused_vf_jasmin_dropout)
from odevit_tpu.losses.jasmin import (jasmin_from_stats, jasmin_map_loss,
                                      jasmin_order_stats)

B, N, D, H, DH = 4, 21, 32, 2, 64


def _operands(dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, N, D)), dtype)

    def w(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)

    return (x, w(D), w(D), w(D), w(D), w(D, 3 * D), w(D, D), w(D, DH),
            w(DH, D))


@pytest.mark.parametrize("k", [0, 1, 3, 10])
def test_stats_match_maps(k):
    args = _operands()
    dx_a, attn = fused_vf_attn(*args, H, 1.0, 2, N)
    dx_j, st = fused_vf_jasmin(*args, H, 1.0, 2, N, k)
    np.testing.assert_allclose(dx_a, dx_j, rtol=0, atol=0)
    np.testing.assert_allclose(st, jasmin_order_stats(attn, k),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(jasmin_from_stats(st, k),
                               jasmin_map_loss(attn, k=k),
                               rtol=1e-6, atol=1e-7)


def test_stats_match_maps_bf16():
    args = _operands(jnp.bfloat16)
    _, attn = fused_vf_attn(*args, H, 1.0, 2, N)
    _, st = fused_vf_jasmin(*args, H, 1.0, 2, N, 10)
    np.testing.assert_allclose(
        np.asarray(jasmin_from_stats(st, 10)),
        np.asarray(jasmin_map_loss(attn, k=10)), rtol=1e-5)


@pytest.mark.parametrize("k", [0, 10])
def test_grad_parity_all_operands(k):
    args = _operands()

    def loss_maps(*a):
        dx, attn = fused_vf_attn(*a, H, 1.0, 2, N)
        return jnp.sum(dx * 0.01) + jasmin_map_loss(attn, k=k)

    def loss_stats(*a):
        dx, st = fused_vf_jasmin(*a, H, 1.0, 2, N, k)
        return jnp.sum(dx * 0.01) + jasmin_from_stats(st, k)

    ga = jax.grad(loss_maps, argnums=tuple(range(9)))(*args)
    gs = jax.grad(loss_stats, argnums=tuple(range(9)))(*args)
    for a, s in zip(ga, gs):
        denom = np.linalg.norm(np.asarray(a, np.float32)) + 1e-12
        rel = np.linalg.norm(np.asarray(a - s, np.float32)) / denom
        assert rel < 1e-5, rel


def test_dropout_stats_are_predropout():
    """Statistics from the dropout kernel must equal statistics of the
    PRE-dropout maps the attn-dropout kernel emits (same seed)."""
    if jax.default_backend() != "tpu":
        pytest.skip("in-kernel pltpu prng requires a TPU backend")
    args = _operands(jnp.bfloat16)
    seed = jnp.int32(123)
    drops = (0.2, 0.1, 0.1)
    _, attn = fused_vf_attn_dropout(*args, seed, H, 1.0, 2, N, *drops)
    _, st = fused_vf_jasmin_dropout(*args, seed, H, 1.0, 2, N, 10, *drops)
    np.testing.assert_allclose(
        np.asarray(jasmin_from_stats(st, 10)),
        np.asarray(jasmin_map_loss(attn, k=10)), rtol=1e-5)


def test_dropout_grad_parity():
    if jax.default_backend() != "tpu":
        pytest.skip("in-kernel pltpu prng requires a TPU backend")
    args = _operands(jnp.bfloat16)
    seed = jnp.int32(7)
    drops = (0.2, 0.1, 0.1)

    def loss_maps(*a):
        dx, attn = fused_vf_attn_dropout(*a, seed, H, 1.0, 2, N, *drops)
        return (jnp.sum(dx.astype(jnp.float32) * 0.01)
                + jasmin_map_loss(attn, k=10))

    def loss_stats(*a):
        dx, st = fused_vf_jasmin_dropout(*a, seed, H, 1.0, 2, N, 10,
                                         *drops)
        return (jnp.sum(dx.astype(jnp.float32) * 0.01)
                + jasmin_from_stats(st, 10))

    ga = jax.grad(loss_maps, argnums=tuple(range(9)))(*args)
    gs = jax.grad(loss_stats, argnums=tuple(range(9)))(*args)
    for a, s in zip(ga, gs):
        denom = np.linalg.norm(np.asarray(a, np.float32)) + 1e-12
        rel = np.linalg.norm(np.asarray(a - s, np.float32)) / denom
        assert rel < 2e-5, rel


def test_padded_tokens_ignored():
    """n_real < N: padded query rows must not contribute to the loss or
    receive/emit gradient."""
    args = _operands()
    n_real = N - 5
    # zero the padded tokens so both paths see identical inputs
    x = args[0].at[:, n_real:, :].set(0.0)
    args = (x,) + args[1:]
    dx_a, attn = fused_vf_attn(*args, H, 1.0, 2, n_real)
    _, st = fused_vf_jasmin(*args, H, 1.0, 2, n_real, 10)
    la = jasmin_map_loss(attn[:, :, :n_real, :n_real], k=10)
    ls = jasmin_from_stats(st[..., :n_real], 10)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(la), rtol=2e-5)


@pytest.mark.parametrize("k", [1, 10])
@pytest.mark.parametrize("ties", [False, True])
def test_split_bwd_jas_matches_combined(k, ties):
    """The SPLIT backward path with the JaSMin statistics cotangent
    (the TS-Base bb=2 route, VERDICT r4) must produce the same nine
    cotangents as the COMBINED kernel — incl. exactly-tied attention
    columns. The statistics come from the kernel FORWARD
    (fused_vf_jasmin), matching the real custom-vjp pipeline: the
    value-equality scatter is only exact against the kernel's own
    recomputed p (an XLA-forward p can differ at ulp level, which is
    why the XLA twin is not the reference here; combined<->XLA parity
    is pinned by test_grad_parity_* above)."""
    from odevit_tpu.kernels import vector_field as VF
    from odevit_tpu.kernels import vector_field_bwd as VB
    from odevit_tpu.kernels.vector_field_bwd import (_pallas_vf_bwd_split,
                                                     pallas_vf_bwd)

    args = list(_operands(seed=5))
    if ties:
        x = np.array(args[0], np.float32)
        x[:, 5:13] = x[:, 4:5]
        args[0] = jnp.asarray(x)
    x, *ws = args
    rng = np.random.default_rng(7)
    g_dx = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    _, st = fused_vf_jasmin(x, *ws, H, 1.5, 2, N, k)
    g_jas = jnp.asarray(rng.standard_normal(st.shape), jnp.float32)

    # g_attn stays None: the custom-vjp routes pass either the map
    # cotangent or the jas cotangent, never both (see vector_field.py)
    got = _pallas_vf_bwd_split(
        x, *ws, g_dx, None, (2, DH, 2), num_heads=H, scaler=1.5,
        n_real=N, g_jas=g_jas, jas_stats=st, jas_k=k)
    orig_split, orig_auto = VB._split_tiles, VF.auto_block_b
    VB._split_tiles = lambda *a, **kw: None
    VF.auto_block_b = lambda *a, **kw: 2
    try:
        want = pallas_vf_bwd(
            x, *ws, g_dx, None, num_heads=H, scaler=1.5, block_b=2,
            n_real=N, g_jas=g_jas, jas_stats=st, jas_k=k)
    finally:
        VB._split_tiles, VF.auto_block_b = orig_split, orig_auto
    names = ["x", "cna_s", "cna_b", "cnm_s", "cnm_b", "wqkv",
             "wout", "w1", "w2"]
    for name, a, w in zip(names, got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   atol=2e-4, rtol=2e-3,
                                   err_msg=f"{name} ties={ties}")


@pytest.mark.parametrize("k", [1, 3, 10])
def test_grad_parity_tied_columns(k):
    """Repeated tokens make attention columns tie EXACTLY (identical
    keys give identical scores, so ties straddle the bookkept ranks).
    The backward's value/ordinal scatter must land each rank's
    cotangent on the same column as the map path's stable
    first-occurrence extraction (torch stable-sort semantics)."""
    args = list(_operands(seed=3))
    x = np.array(args[0], np.float32)
    x[:, 5:13] = x[:, 4:5]     # 9 identical tokens
    x[:, 15:18] = x[:, 14:15]  # 4 more
    args[0] = jnp.asarray(x)
    args = tuple(args)

    def loss_maps(*a):
        dx, attn = fused_vf_attn(*a, H, 1.0, 2, N)
        return jnp.sum(dx * 0.01) + jasmin_map_loss(attn, k=k)

    def loss_stats(*a):
        dx, st = fused_vf_jasmin(*a, H, 1.0, 2, N, k)
        return jnp.sum(dx * 0.01) + jasmin_from_stats(st, k)

    ga = jax.grad(loss_maps, argnums=tuple(range(9)))(*args)
    gs = jax.grad(loss_stats, argnums=tuple(range(9)))(*args)
    for a, s in zip(ga, gs):
        denom = np.linalg.norm(np.asarray(a, np.float32)) + 1e-12
        rel = np.linalg.norm(np.asarray(a - s, np.float32)) / denom
        assert rel < 1e-5, rel
