"""Integrator tests: closed-form ODEs, convergence order, aux capture,
remat gradient equivalence, NFE accounting."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from odevit_tpu.core.integrators import (
    odeint, nfe, num_stages, flatten_eval_axis)


def exp_decay(lmbda):
    return lambda t, y: lmbda * y


@pytest.mark.parametrize("method,order,grids", [
    ("euler", 1, (8, 16)), ("midpoint", 2, (8, 16)), ("heun", 2, (8, 16)),
    ("rk4", 4, (2, 4)), ("rk4_classical", 4, (2, 4)),
])
def test_convergence_order_linear_ode(method, order, grids):
    lmbda = -0.7
    y0 = jnp.array([1.0, 2.0])
    t1 = 1.0
    errs = []
    for steps in grids:
        ts = jnp.linspace(0.0, t1, steps + 1)
        states, _ = odeint(exp_decay(lmbda), y0, ts, method=method)
        exact = np.asarray(y0) * np.exp(lmbda * t1)
        errs.append(np.abs(np.asarray(states[-1]) - exact).max())
    observed_order = np.log2(errs[0] / errs[1])
    assert observed_order > order - 0.35, (errs, observed_order)


def test_states_shape_and_initial_condition():
    ts = jnp.linspace(0.0, 1.0, 5)
    y0 = jnp.ones((2, 3))
    states, _ = odeint(exp_decay(-1.0), y0, ts, method="euler")
    assert states.shape == (5, 2, 3)
    np.testing.assert_allclose(np.asarray(states[0]), np.asarray(y0))


def test_rk4_is_three_eighths_rule():
    # One step of dy/dt = t^3 from 0 with dt=1 integrates exactly to 1/4
    # for any 4th-order method; distinguish 3/8 from classical via t^4:
    # 3/8 rule: dt*(k1 + 3 k2 + 3 k3 + k4)/8 with nodes 0, 1/3, 2/3, 1.
    f = lambda t, y: t ** 4 + 0.0 * y
    ts = jnp.array([0.0, 1.0])
    got38, _ = odeint(f, jnp.array(0.0), ts, method="rk4")
    # nodes 0,1/3,2/3,1 weights 1/8,3/8,3/8,1/8 on t^4:
    want38 = (0 + 3 * (1 / 3) ** 4 + 3 * (2 / 3) ** 4 + 1) / 8
    np.testing.assert_allclose(float(got38[-1]), want38, rtol=1e-6)

    gotc, _ = odeint(f, jnp.array(0.0), ts, method="rk4_classical")
    wantc = (0 + 2 * 0.5 ** 4 + 2 * 0.5 ** 4 + 1) / 6
    np.testing.assert_allclose(float(gotc[-1]), wantc, rtol=1e-6)
    assert abs(want38 - wantc) > 1e-3  # the test actually discriminates


@pytest.mark.parametrize("method", ["euler", "midpoint", "rk4"])
def test_aux_capture_per_evaluation(method):
    calls = num_stages(method)

    def f(t, y):
        return -y, {"t": t, "norm": jnp.sum(y ** 2)}

    ts = jnp.linspace(0.0, 1.0, 7)
    states, aux = odeint(f, jnp.ones(3), ts, method=method, has_aux=True)
    assert aux["t"].shape == (6, calls)
    flat = flatten_eval_axis(aux)
    assert flat["t"].shape == (6 * calls,)
    assert flat["t"].shape[0] == nfe(method, 7)
    # first evaluation of each step happens at the grid time
    np.testing.assert_allclose(np.asarray(aux["t"][:, 0]),
                               np.asarray(ts[:-1]), atol=1e-6)


def test_remat_grads_match_nonremat():
    w = jnp.array(0.3)

    def loss(w, remat):
        f = lambda t, y: jnp.sin(w * y) - 0.1 * y
        ts = jnp.linspace(0.0, 2.0, 17)
        states, _ = odeint(f, jnp.ones(4), ts, method="rk4", remat=remat)
        return jnp.sum(states[-1] ** 2)

    g0 = jax.grad(lambda w: loss(w, False))(w)
    g1 = jax.grad(lambda w: loss(w, True))(w)
    np.testing.assert_allclose(float(g0), float(g1), rtol=1e-6)


def test_return_states_false_returns_final_only():
    ts = jnp.linspace(0.0, 1.0, 9)
    full, _ = odeint(exp_decay(-2.0), jnp.ones(2), ts, method="rk4")
    final, _ = odeint(exp_decay(-2.0), jnp.ones(2), ts, method="rk4",
                      return_states=False)
    np.testing.assert_allclose(np.asarray(final), np.asarray(full[-1]),
                               rtol=1e-6)


def test_pytree_state():
    y0 = {"a": jnp.ones(2), "b": jnp.zeros((2, 2))}

    def f(t, y):
        return {"a": -y["a"], "b": y["b"] + 1.0}

    ts = jnp.linspace(0.0, 1.0, 5)
    states, _ = odeint(f, y0, ts, method="midpoint")
    assert states["a"].shape == (5, 2)
    assert states["b"].shape == (5, 2, 2)
