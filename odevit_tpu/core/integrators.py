"""Fixed-grid ODE integrators as ``lax.scan`` loops.

TPU-native replacement for the reference's ``torchdiffeq.odeint`` calls
(/root/reference/models/ode_transformer_gpt.py:571-578). Everything is a
single ``lax.scan`` over the time grid — static trip count, static shapes,
one compiled step body — with optional ``jax.checkpoint`` on the step body
for O(1)-in-time activation memory during backprop (the reference
backpropagates through the full unrolled solver and stores every
activation).

Methods and per-step function-evaluation (NFE) counts:
  * ``euler``          — 1 eval/step
  * ``midpoint``       — 2 evals/step
  * ``heun``           — 2 evals/step
  * ``rk4``            — 4 evals/step, Kutta's 3/8 rule. torchdiffeq's
                         ``method="rk4"`` is the 3/8 variant, so this is the
                         parity method for the reference.
  * ``rk4_classical``  — 4 evals/step, classical RK4 tableau.

The vector field ``f(t, y)`` may return either ``dy`` or ``(dy, aux)``
(set ``has_aux=True``). Aux outputs are collected per *function
evaluation* — the reference appends one attention map per solver
evaluation (ode_transformer_gpt.py:323-328) — and returned stacked as a
pytree with leading axes ``[num_steps, num_stages, ...]``; use
:func:`flatten_eval_axis` for the flat eval-ordered view.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

METHOD_STAGES = {
    "euler": 1,
    "midpoint": 2,
    "heun": 2,
    "rk4": 4,
    "rk4_classical": 4,
}


def num_stages(method: str) -> int:
    try:
        return METHOD_STAGES[method]
    except KeyError:
        raise ValueError(
            f"unknown method {method!r}; options: {sorted(METHOD_STAGES)}")


def nfe(method: str, num_grid_points: int) -> int:
    """Total vector-field evaluations for a T-point grid."""
    return num_stages(method) * (num_grid_points - 1)


def _axpy(y, dt, k, alpha=1.0):
    """y + dt * alpha * k over a pytree, preserving y's dtype (an f32 time
    grid must not promote a bf16 state — the scan carry dtype is fixed)."""
    return jax.tree_util.tree_map(
        lambda a, b: (a + dt * alpha * b).astype(a.dtype), y, k)


def _lc(y, dt, terms):
    """y + dt * sum(c_i * k_i) over a pytree, preserving y's dtype."""
    def add(a, *ks):
        acc = a
        for c, k in zip([t[0] for t in terms], ks):
            acc = acc + dt * c * k
        return acc.astype(a.dtype)
    return jax.tree_util.tree_map(add, y, *[t[1] for t in terms])


def make_step(method: str, has_aux: bool = False) -> Callable:
    """Build ``step(f, y, t, dt) -> (y_next, aux_stages)``.

    ``aux_stages`` is a pytree whose leaves have a leading stage axis
    (length = num_stages) when ``has_aux``; otherwise ``None``.
    """

    def call(f, t, y):
        out = f(t, y)
        if has_aux:
            dy, aux = out
        else:
            dy, aux = out, None
        return dy, aux

    def stack_aux(auxes):
        if not has_aux:
            return None
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *auxes)

    if method == "euler":
        def step(f, y, t, dt):
            k1, a1 = call(f, t, y)
            return _axpy(y, dt, k1), stack_aux([a1])
    elif method == "midpoint":
        def step(f, y, t, dt):
            k1, a1 = call(f, t, y)
            k2, a2 = call(f, t + dt * 0.5, _axpy(y, dt, k1, 0.5))
            return _axpy(y, dt, k2), stack_aux([a1, a2])
    elif method == "heun":
        def step(f, y, t, dt):
            k1, a1 = call(f, t, y)
            k2, a2 = call(f, t + dt, _axpy(y, dt, k1))
            return _lc(y, dt, [(0.5, k1), (0.5, k2)]), stack_aux([a1, a2])
    elif method == "rk4":
        # Kutta 3/8 rule (torchdiffeq's "rk4").
        def step(f, y, t, dt):
            third = 1.0 / 3.0
            k1, a1 = call(f, t, y)
            k2, a2 = call(f, t + dt * third, _axpy(y, dt, k1, third))
            k3, a3 = call(f, t + dt * 2.0 * third,
                          _lc(y, dt, [(-third, k1), (1.0, k2)]))
            k4, a4 = call(f, t + dt,
                          _lc(y, dt, [(1.0, k1), (-1.0, k2), (1.0, k3)]))
            y_next = _lc(y, dt, [(0.125, k1), (0.375, k2),
                                 (0.375, k3), (0.125, k4)])
            return y_next, stack_aux([a1, a2, a3, a4])
    elif method == "rk4_classical":
        def step(f, y, t, dt):
            k1, a1 = call(f, t, y)
            k2, a2 = call(f, t + dt * 0.5, _axpy(y, dt, k1, 0.5))
            k3, a3 = call(f, t + dt * 0.5, _axpy(y, dt, k2, 0.5))
            k4, a4 = call(f, t + dt, _axpy(y, dt, k3))
            sixth = 1.0 / 6.0
            y_next = _lc(y, dt, [(sixth, k1), (2 * sixth, k2),
                                 (2 * sixth, k3), (sixth, k4)])
            return y_next, stack_aux([a1, a2, a3, a4])
    else:
        raise ValueError(
            f"unknown method {method!r}; options: {sorted(METHOD_STAGES)}")

    return step


def odeint(
    f: Callable,
    y0: Any,
    ts: jnp.ndarray,
    method: str = "rk4",
    *,
    has_aux: bool = False,
    remat: bool = False,
    return_states: bool = True,
) -> Tuple[Any, Any]:
    """Integrate ``dy/dt = f(t, y)`` over the grid ``ts``.

    Returns ``(states, aux)`` where ``states`` has a leading time axis of
    length ``len(ts)`` with ``states[0] == y0`` (torchdiffeq convention),
    or just the final state if ``return_states=False`` (the fast inference
    path — no trajectory materialized in HBM). ``aux`` leaves have leading
    axes ``[len(ts)-1, num_stages, ...]``.
    """
    step = make_step(method, has_aux=has_aux)

    def body(y, t_dt):
        t, dt = t_dt
        y_next, aux = step(f, y, t, dt)
        ys = (y_next if return_states else None, aux)
        return y_next, ys

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)

    dts = ts[1:] - ts[:-1]
    y_final, (tail, aux) = jax.lax.scan(body, y0, (ts[:-1], dts))

    if return_states:
        states = jax.tree_util.tree_map(
            lambda first, rest: jnp.concatenate([first[None], rest], axis=0),
            y0, tail)
        return states, aux
    return y_final, aux


def flatten_eval_axis(aux):
    """[T-1, S, ...] -> [(T-1)*S, ...]: flat function-evaluation ordering,
    matching the reference's per-evaluation attention_trajectory list."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:]), aux)
