"""Fused training step: loss/grad parity with the flax step."""

import numpy as np
import jax
import jax.numpy as jnp

from odevit_tpu.models.vit_ode import ViTODE
from odevit_tpu.train.state import (all_trainable, create_train_state,
                                    make_optimizer)
from odevit_tpu.train.steps import make_free_train_step
from odevit_tpu.train.fast_steps import (fast_free_forward,
                                         make_fast_free_train_step)


def setup():
    m = ViTODE(img_size=16, patch_size=4, embed_dim=32, num_heads=2,
               mlp_ratio=2.0, num_classes=7, emulate_depth=4,
               time_interval=1.0, num_eval_steps=5, solver="rk4",
               register_tokens=2, remat=True)
    rng = np.random.default_rng(0)
    batch = {"pixel_values": jnp.asarray(
                 rng.standard_normal((8, 16, 16, 3)).astype(np.float32)),
             "labels": jnp.asarray(rng.integers(0, 7, 8))}
    v = m.init(jax.random.PRNGKey(0), batch["pixel_values"])
    return m, v["params"], batch


def test_fast_forward_loss_matches_flax():
    m, params, batch = setup()
    loss, aux = fast_free_forward(m, params, batch["pixel_values"],
                                  batch["labels"], jasmin_k=2)
    out = m.apply({"params": params}, batch["pixel_values"],
                  batch["labels"], output_attentions=True, jasmin_k=2)
    want = float(out["loss"] + out["jasmin_loss"])
    np.testing.assert_allclose(float(loss), want, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(aux["logits"]),
                               np.asarray(out["logits"]), atol=1e-4,
                               rtol=1e-3)


def test_fast_step_grads_match_flax_step():
    m, params, batch = setup()
    tx = make_optimizer(1e-3, trainable_mask=all_trainable(params))

    s_flax = create_train_state(params, tx)
    flax_step = make_free_train_step(m, tx, jasmin_k=2, donate=False)
    s_flax, m_flax = flax_step(s_flax, batch, jax.random.PRNGKey(1))

    s_fast = create_train_state(params, tx)
    fast_step = make_fast_free_train_step(m, tx, jasmin_k=2, donate=False)
    s_fast, m_fast = fast_step(s_fast, batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m_fast["loss"]), float(m_flax["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m_fast["grad_norm"]),
                               float(m_flax["grad_norm"]), rtol=1e-2)
    for a, b in zip(jax.tree_util.tree_leaves(s_fast.params),
                    jax.tree_util.tree_leaves(s_flax.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-3)
