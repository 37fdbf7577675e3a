"""Model-level tests: output surface parity, shapes, semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from odevit_tpu.models.vit_ode import ViTODE, analytic_bound_from_variables
from odevit_tpu.models.macaron import ViTMacaron
from odevit_tpu.core.integrators import nfe


def tiny_model(**kw):
    defaults = dict(img_size=16, patch_size=4, embed_dim=32, num_heads=2,
                    mlp_ratio=2.0, num_classes=10, emulate_depth=4,
                    time_interval=1.0, num_eval_steps=6, solver="euler",
                    register_tokens=2)
    defaults.update(kw)
    return ViTODE(**defaults)


@pytest.fixture(scope="module")
def model_and_params():
    m = tiny_model()
    x = jnp.ones((2, 16, 16, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    return m, variables, x


def test_forward_minimal(model_and_params):
    m, v, x = model_and_params
    out = m.apply(v, x)
    assert set(out) == {"logits"}
    assert out["logits"].shape == (2, 10)
    assert bool(jnp.isfinite(out["logits"]).all())


def test_forward_full_surface(model_and_params):
    m, v, x = model_and_params
    labels = jnp.array([1, 2])
    out = m.apply(v, x, labels,
                  output_hidden_states=True, output_control_points=True,
                  output_attentions=True, output_attention_trajectory=True,
                  output_stability_bounds=True, jasmin_k=2)
    n = 1 + 16 + 2   # cls + patches + registers
    assert out["states"].shape == (6, 2, n, 32)
    np.testing.assert_allclose(
        np.asarray(out["states"][0, :, 0]),
        np.asarray(out["states"][0, :, 0]))  # defined at t=0
    # registers stripped from maps
    assert out["attentions"].shape == (2, 2, n - 2, n - 2)
    assert out["attentions_register_tokens"].shape == (2, 2, 2, n)
    # one map per function evaluation (euler: T-1)
    assert out["attention_trajectory"].shape == (5, 2, 2, n - 2, n - 2)
    assert out["control_points"].shape == (12, 2, n - 2, 32)
    assert out["jasmin_loss"].shape == ()
    assert out["loss"].shape == ()
    fd = out["finite_difference_upper_bound"]
    assert fd["batched_upper_bound"].shape == (2,)
    assert fd["global_upper_bound"].shape == ()
    # analytic bound from weights
    ab = analytic_bound_from_variables(v, embed_dim=32, num_eval_steps=6)
    assert np.isfinite(float(ab))


def test_rk4_trajectory_eval_counts():
    m = tiny_model(solver="rk4", num_eval_steps=4, register_tokens=0)
    x = jnp.ones((1, 16, 16, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x, output_attentions=True,
                  output_attention_trajectory=True)
    assert out["attention_trajectory"].shape[0] == nfe("rk4", 4)


def test_l2_attention_variant():
    m = tiny_model(l2_attention=True)
    x = jnp.ones((2, 16, 16, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x, output_attentions=True)
    rows = np.asarray(out["attentions"]).sum(-1)
    # rows of the (register-stripped) map no longer sum to 1 exactly, but
    # the full map rows did; just check positivity and finiteness here.
    assert (np.asarray(out["attentions"]) >= 0).all()
    assert np.isfinite(rows).all()


def test_dropout_trains_stochastically():
    m = tiny_model(attn_drop=0.2, mlp_drop=0.2, proj_drop=0.2)
    x = jnp.ones((2, 16, 16, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    o1 = m.apply(v, x, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = m.apply(v, x, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(2)})
    o3 = m.apply(v, x)
    assert not np.allclose(np.asarray(o1["logits"]), np.asarray(o2["logits"]))
    assert np.isfinite(np.asarray(o3["logits"])).all()


def test_time_conditioning_starts_at_identity():
    m0 = tiny_model()
    m1 = tiny_model(time_conditioning=True)
    x = jnp.ones((2, 16, 16, 3))
    v0 = m0.init(jax.random.PRNGKey(0), x)
    v1 = m1.init(jax.random.PRNGKey(0), x)
    # FiLM head is zero-init: the conditioned field must equal the
    # autonomous one at init (same rng -> same shared params).
    o0 = m0.apply(v0, x)["logits"]
    o1 = m1.apply(v1, x)["logits"]
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               atol=1e-5, rtol=1e-5)


def test_remat_matches_nonremat_forward_and_grad():
    x = jnp.ones((2, 16, 16, 3))
    labels = jnp.array([0, 1])
    outs = []
    for remat in (False, True):
        m = tiny_model(remat=remat, solver="rk4")
        v = m.init(jax.random.PRNGKey(0), x)

        def loss_fn(params):
            out = m.apply({"params": params}, x, labels)
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(v["params"])
        gnorm = jnp.sqrt(sum(jnp.sum(g ** 2)
                             for g in jax.tree_util.tree_leaves(grads)))
        outs.append((float(loss), float(gnorm)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-6)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5)


def test_distillation_token():
    m = tiny_model(add_distillation_token=True)
    x = jnp.ones((2, 16, 16, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out["logits_dist"].shape == (2, 10)


def test_param_count_tiny_free_config():
    """README.md:57 row: the 0.5M-param CIFAR-10 free-training model."""
    m = ViTODE.tiny_cifar(num_classes=10)
    x = jnp.ones((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    n = sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))
    assert 0.4e6 < n < 0.7e6, n


def test_macaron_forward():
    m = ViTMacaron(img_size=16, patch_size=4, embed_dim=32, num_heads=2,
                   mlp_ratio=2.0, num_classes=10, num_eval_steps=5,
                   solver="euler", learn_ivp=True,
                   add_distillation_token=True)
    x = jnp.ones((2, 16, 16, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x, jnp.array([0, 1]), output_hidden_states=True,
                  output_control_points=True)
    assert out["logits"].shape == (2, 10)
    assert out["logits_dist"].shape == (2, 10)
    assert out["states"].shape[0] == 5
    assert out["control_points"].shape[0] == 12
    assert np.isfinite(float(out["loss"]))


def test_custom_t_grid():
    m = tiny_model()
    x = jnp.ones((1, 16, 16, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x, output_hidden_states=True,
                  t_grid=jnp.linspace(0.0, 1.0, 9))
    assert out["states"].shape[0] == 9
