"""Fused training step: loss/grad parity with the flax step."""

import numpy as np
import jax
import jax.numpy as jnp

from odevit_tpu.models.vit_ode import ViTODE
from odevit_tpu.teacher.vit import ViTTeacher
from odevit_tpu.train.state import (all_trainable, create_train_state,
                                    make_optimizer)
from odevit_tpu.train.steps import (make_distill_train_step,
                                    make_free_train_step)
from odevit_tpu.train.fast_steps import (fast_free_forward,
                                         make_fast_distill_train_step,
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


def test_xla_dropout_eval_semantics():
    """The big-shape dropout engine (XLA rbg masks through the twin):
    deterministic at fixed seed, inverted-dropout keep statistics,
    drop->0 limit equals the deterministic twin, grads finite."""
    from odevit_tpu.kernels.vector_field import fused_vf_from_params
    from odevit_tpu.train.fast_steps import _xla_dropout_eval
    d, heads = 64, 2
    rng = np.random.default_rng(5)
    p = {
        "norm_attn": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
        "norm_mlp": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
        "attn": {"qkv_kernel": jnp.asarray(
                     rng.standard_normal((d, 3 * d)) * 0.1, jnp.float32),
                 "out_kernel": jnp.asarray(
                     rng.standard_normal((d, d)) * 0.1, jnp.float32)},
        "mlp": {"fc1_kernel": jnp.asarray(
                    rng.standard_normal((d, 2 * d)) * 0.1, jnp.float32),
                "fc2_kernel": jnp.asarray(
                    rng.standard_normal((2 * d, d)) * 0.1, jnp.float32)},
    }
    x = jnp.asarray(rng.standard_normal((4, 17, d)), jnp.float32)
    seed = jnp.asarray(9, jnp.int32)
    kw = dict(num_heads=heads, scaler=2.0, n_real=17)

    a1, p1 = _xla_dropout_eval(x, p, seed, drops=(0.2, 0.1, 0.3),
                               want_attn=True, **kw)
    a2, p2 = _xla_dropout_eval(x, p, seed, drops=(0.2, 0.1, 0.3),
                               want_attn=True, **kw)
    assert bool((a1 == a2).all()) and bool((p1 == p2).all())
    a3 = _xla_dropout_eval(x, p, seed + 1, drops=(0.2, 0.1, 0.3),
                           want_attn=False, **kw)
    assert not bool((a1 == a3).all())

    # emitted maps are pre-dropout probability rows
    np.testing.assert_allclose(np.asarray(jnp.sum(p1, -1)), 1.0, atol=1e-5)

    # zero rates reduce to the deterministic evaluation
    a0 = _xla_dropout_eval(x, p, seed, drops=(0.0, 0.0, 0.0),
                           want_attn=False, **kw)
    det = fused_vf_from_params(x, p, num_heads=heads, scaler=2.0,
                               use_pallas=False)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(det), atol=1e-6)

    g = jax.grad(lambda x: jnp.sum(_xla_dropout_eval(
        x, p, seed, drops=(0.2, 0.1, 0.3), want_attn=False, **kw) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_fast_distill_step_matches_flax_step():
    """The fused distillation step (segmented control-point collection,
    tail-split jasmin, last-eval attention loss) reproduces
    make_distill_train_step at drop=0."""
    m = ViTODE(img_size=16, patch_size=4, embed_dim=32, num_heads=2,
               mlp_ratio=2.0, num_classes=7, emulate_depth=12.0,
               time_interval=1.0, num_eval_steps=7, solver="euler",
               register_tokens=2, remat=True)
    teacher = ViTTeacher(image_size=16, patch_size=4, hidden_size=32,
                         num_layers=12, num_heads=2, mlp_dim=64,
                         num_classes=7)
    rng = np.random.default_rng(3)
    batch = {"pixel_values": jnp.asarray(
                 rng.standard_normal((8, 16, 16, 3)).astype(np.float32)),
             "labels": jnp.asarray(rng.integers(0, 7, 8))}
    params = m.init(jax.random.PRNGKey(0), batch["pixel_values"])["params"]
    tparams = teacher.init(jax.random.PRNGKey(1),
                           batch["pixel_values"])["params"]
    tx = make_optimizer(1e-3, trainable_mask=all_trainable(params))
    kw = dict(lambda_param=0.5, jasmin_k=2, mse_full_path=True,
              use_distillation=True, temperature=30.0, donate=False)

    s_flax = create_train_state(params, tx)
    flax_step = make_distill_train_step(m, teacher, tx, **kw)
    s_flax, m_flax = flax_step(s_flax, tparams, batch,
                               jax.random.PRNGKey(2), supervise=True)

    s_fast = create_train_state(params, tx)
    fast_step = make_fast_distill_train_step(m, teacher, tx, **kw)
    s_fast, m_fast = fast_step(s_fast, tparams, batch,
                               jax.random.PRNGKey(2), supervise=True)

    for key in ("loss", "mse_loss", "kl_loss", "jasmin_loss",
                "supervision_loss", "acc"):
        np.testing.assert_allclose(float(m_fast[key]), float(m_flax[key]),
                                   rtol=2e-4, atol=1e-6, err_msg=key)
    np.testing.assert_allclose(float(m_fast["grad_norm"]),
                               float(m_flax["grad_norm"]), rtol=1e-2)
    for a, b in zip(jax.tree_util.tree_leaves(s_fast.params),
                    jax.tree_util.tree_leaves(s_flax.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-3)


def test_fast_step_l2_grads_match_flax_step():
    """The L2-attention fused training path (fused_vf_l2_jasmin +
    native L2/bias backward kernel) must reproduce the flax step."""
    m = ViTODE(img_size=16, patch_size=4, embed_dim=32, num_heads=2,
               mlp_ratio=2.0, num_classes=7, emulate_depth=4,
               time_interval=1.0, num_eval_steps=5, solver="rk4",
               register_tokens=2, remat=False, l2_attention=True)
    rng = np.random.default_rng(0)
    batch = {"pixel_values": jnp.asarray(
                 rng.standard_normal((8, 16, 16, 3)).astype(np.float32)),
             "labels": jnp.asarray(rng.integers(0, 7, 8))}
    params = m.init(jax.random.PRNGKey(0), batch["pixel_values"])["params"]
    tx = make_optimizer(1e-3, trainable_mask=all_trainable(params))

    s_flax = create_train_state(params, tx)
    flax_step = make_free_train_step(m, tx, jasmin_k=2, donate=False)
    s_flax, m_flax = flax_step(s_flax, batch, jax.random.PRNGKey(1))

    s_fast = create_train_state(params, tx)
    fast_step = make_fast_free_train_step(m, tx, jasmin_k=2, donate=False)
    s_fast, m_fast = fast_step(s_fast, batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m_fast["loss"]), float(m_flax["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_fast.params),
                    jax.tree_util.tree_leaves(s_flax.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-3)


def test_fast_macaron_step_matches_flax_step():
    """Adam amplifies f32 accumulation-order noise on near-zero bias
    grads, hence the 2e-4 atol (loss/grad-norm agree to 7 digits)."""
    """The fused Macaron training step (fast_forward_macaron + native
    Macaron backward) must reproduce the flax step."""
    from odevit_tpu.models.macaron import ViTMacaron
    from odevit_tpu.train.fast_steps import make_fast_macaron_train_step

    m = ViTMacaron(img_size=16, patch_size=4, embed_dim=32, num_heads=2,
                   mlp_ratio=2.0, num_classes=7, emulate_depth=4,
                   time_interval=4.0, num_eval_steps=5, solver="rk4",
                   learn_ivp=True, remat=False)
    rng = np.random.default_rng(0)
    batch = {"pixel_values": jnp.asarray(
                 rng.standard_normal((8, 16, 16, 3)).astype(np.float32)),
             "labels": jnp.asarray(rng.integers(0, 7, 8))}
    params = m.init(jax.random.PRNGKey(0), batch["pixel_values"])["params"]
    tx = make_optimizer(1e-3, trainable_mask=all_trainable(params))

    s_flax = create_train_state(params, tx)
    flax_step = make_free_train_step(m, tx, use_jasmin=False,
                                     donate=False)
    s_flax, m_flax = flax_step(s_flax, batch, jax.random.PRNGKey(1))

    s_fast = create_train_state(params, tx)
    fast_step = make_fast_macaron_train_step(m, tx, donate=False)
    s_fast, m_fast = fast_step(s_fast, batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m_fast["loss"]), float(m_flax["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_fast.params),
                    jax.tree_util.tree_leaves(s_flax.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=5e-3)
