"""Fast inference path parity: fused-kernel forward vs flax forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from odevit_tpu.models.vit_ode import ViTODE
from odevit_tpu.models.fast_forward import fast_forward


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_fast_forward_matches_flax(solver):
    m = ViTODE(img_size=16, patch_size=4, embed_dim=32, num_heads=2,
               mlp_ratio=2.0, num_classes=7, emulate_depth=4,
               time_interval=1.0, num_eval_steps=5, solver=solver,
               register_tokens=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)

    want = m.apply(v, x)["logits"]
    got = fast_forward(m, v["params"], x, block_b=4)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-3)
    got_xla = fast_forward(m, v["params"], x, use_pallas=False)["logits"]
    np.testing.assert_allclose(np.asarray(got_xla), np.asarray(want),
                               atol=5e-4, rtol=5e-3)


def test_fast_forward_dist_token():
    m = ViTODE(img_size=16, patch_size=4, embed_dim=32, num_heads=2,
               num_classes=5, num_eval_steps=4, solver="euler",
               register_tokens=0, add_distillation_token=True)
    x = jnp.ones((2, 16, 16, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(v, x)
    got = fast_forward(m, v["params"], x, block_b=2)
    np.testing.assert_allclose(np.asarray(got["logits"]),
                               np.asarray(want["logits"]), atol=5e-4,
                               rtol=5e-3)
    np.testing.assert_allclose(np.asarray(got["logits_dist"]),
                               np.asarray(want["logits_dist"]), atol=5e-4,
                               rtol=5e-3)


def test_fast_forward_dopri5():
    m = ViTODE(img_size=16, patch_size=4, embed_dim=32, num_heads=2,
               mlp_ratio=2.0, num_classes=7, emulate_depth=4,
               time_interval=1.0, num_eval_steps=5, solver="dopri5",
               register_tokens=2)
    fine = ViTODE(img_size=16, patch_size=4, embed_dim=32, num_heads=2,
                  mlp_ratio=2.0, num_classes=7, emulate_depth=4,
                  time_interval=1.0, num_eval_steps=101, solver="rk4",
                  register_tokens=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 3)).astype(np.float32))
    v = fine.init(jax.random.PRNGKey(0), x)
    want = fine.apply(v, x)["logits"]
    got = fast_forward(m, v["params"], x, block_b=4)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-3, rtol=5e-2)


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_fast_forward_macaron_fused_steps(solver):
    """Macaron serving routes uniform euler/rk4 grids through the fused
    stage-advance kernels (kernels/macaron.py); parity vs the flax model."""
    from odevit_tpu.models.macaron import ViTMacaron
    m = ViTMacaron(img_size=16, patch_size=4, embed_dim=32, num_heads=2,
                   mlp_ratio=2.0, num_classes=7, emulate_depth=12.0,
                   time_interval=1.0, num_eval_steps=5, solver=solver)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(v, x)["logits"]
    got = fast_forward(m, v["params"], x, block_b=4)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-3)


def test_fast_forward_l2_attention():
    m = ViTODE(img_size=16, patch_size=4, embed_dim=32, num_heads=2,
               mlp_ratio=2.0, num_classes=7, emulate_depth=4,
               time_interval=1.0, num_eval_steps=5, solver="rk4",
               register_tokens=2, l2_attention=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(v, x)["logits"]
    got = fast_forward(m, v["params"], x, block_b=4)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-3)
