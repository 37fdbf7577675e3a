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
