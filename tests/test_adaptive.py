"""Adaptive dopri5 solver tests: accuracy, tolerance scaling, NFE
adaptivity, jit/grid semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from odevit_tpu.core.adaptive import odeint_dopri5


def test_exponential_decay_accuracy():
    f = lambda t, y: -1.3 * y
    ts = jnp.linspace(0.0, 2.0, 5)
    states, info = odeint_dopri5(f, jnp.ones(3), ts, rtol=1e-6, atol=1e-8)
    exact = np.exp(-1.3 * np.asarray(ts))[:, None] * np.ones(3)
    np.testing.assert_allclose(np.asarray(states), exact, rtol=1e-5)
    assert not bool(info["max_steps_hit"])
    assert int(info["nfe"]) > 0


def test_tolerance_controls_error_and_nfe():
    f = lambda t, y: jnp.cos(3.0 * t) * y            # mildly oscillatory
    ts = jnp.array([0.0, 3.0])
    y0 = jnp.ones(2)
    exact = np.exp(np.sin(9.0) / 3.0)

    errs, nfes = [], []
    for rtol in (1e-3, 1e-7):
        states, info = odeint_dopri5(f, y0, ts, rtol=rtol, atol=rtol * 1e-2,
                                     max_steps_per_segment=256)
        errs.append(abs(float(states[-1, 0]) - exact))
        nfes.append(int(info["nfe"]))
    assert errs[1] < errs[0]
    assert nfes[1] > nfes[0]          # tighter tolerance -> more work


def test_jit_and_grid_states():
    f = lambda t, y: -y

    @jax.jit
    def run(y0):
        return odeint_dopri5(f, y0, jnp.linspace(0.0, 1.0, 9))

    states, info = run(jnp.ones(4))
    assert states.shape == (9, 4)
    np.testing.assert_allclose(np.asarray(states[0]), np.ones(4))
    np.testing.assert_allclose(
        np.asarray(states[-1]), np.exp(-1.0) * np.ones(4), rtol=1e-4)


def test_max_steps_flag():
    # brutally stiff + tiny budget -> flag trips, no hang
    f = lambda t, y: -4000.0 * y
    states, info = odeint_dopri5(f, jnp.ones(1), jnp.array([0.0, 1.0]),
                                 rtol=1e-9, atol=1e-12,
                                 max_steps_per_segment=4)
    assert bool(info["max_steps_hit"])


def test_model_integration_matches_fixed_grid():
    """dopri5 on the ViTODE vector field agrees with a fine fixed grid."""
    from odevit_tpu.models.vit_ode import ViTODE
    from odevit_tpu.models.vector_field import ParallelVectorField
    from odevit_tpu.core.integrators import odeint
    from odevit_tpu.ops.patch_embed import PatchEmbed

    d, heads = 32, 2
    vf = ParallelVectorField(dim=d, num_heads=heads, mlp_ratio=2.0,
                             emulate_depth=4.0, time_interval=1.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 9, d)).astype(np.float32))
    v = vf.init(jax.random.PRNGKey(0), x, 0.0)

    def f(t, y):
        return vf.apply(v, y, t)[0]

    ts = jnp.linspace(0.0, 1.0, 3)
    adaptive, info = odeint_dopri5(f, x, ts, rtol=1e-6, atol=1e-8)
    fine, _ = odeint(f, x, jnp.linspace(0.0, 1.0, 201), method="rk4")
    np.testing.assert_allclose(np.asarray(adaptive[-1]),
                               np.asarray(fine[-1]), atol=1e-4, rtol=1e-4)
