"""Adaptive Dormand-Prince (dopri5) integration under jit.

The reference pins fixed-grid euler/rk4, but torchdiffeq's default solver
is dopri5; this provides the TPU-native equivalent as extended
capability: embedded RK5(4) with FSAL, a PI step-size controller, and a
*bounded* ``lax.while_loop`` per grid segment (XLA needs static trip
bounds; steps beyond ``max_steps`` just stop refining — the ``nfe``/
``max_steps_hit`` outputs expose it).

States are evaluated exactly at the requested grid points by clamping
steps to segment boundaries (no dense-output interpolation needed).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# Dormand-Prince 5(4) tableau
_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_B5 = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784,
                11 / 84, 0.0])
_B4 = np.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
                -92097 / 339200, 187 / 2100, 1 / 40])

SAFETY, MIN_FACTOR, MAX_FACTOR, ORDER = 0.9, 0.2, 10.0, 5.0


def _error_ratio(err, y0, y1, rtol, atol):
    """RMS of err/scale over every leaf of the state pytree."""
    def leaf(e, a, b):
        scale = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b)
                                          ).astype(jnp.float32)
        r = e.astype(jnp.float32) / scale
        return jnp.sum(r * r), r.size

    parts = jax.tree_util.tree_map(leaf, err, y0, y1)
    leaves = jax.tree_util.tree_leaves(parts, is_leaf=lambda x:
                                       isinstance(x, tuple))
    total = sum(p[0] for p in leaves)
    count = sum(p[1] for p in leaves)
    return jnp.sqrt(total / count)


def _lc(y, dt, coeffs, ks):
    """y + dt * sum(c_i k_i), accumulated in f32, cast back to y's dtype
    (the carry dtype must be stable under jit; bf16 states stay bf16)."""
    def add(yl, *kls):
        acc = yl.astype(jnp.float32)
        for c, kl in zip(coeffs, kls):
            acc = acc + dt * c * kl.astype(jnp.float32)
        return acc.astype(yl.dtype)
    return jax.tree_util.tree_map(add, y, *ks)


def _dopri_step(f, t, y, f0, dt):
    """One embedded step. Returns (y5, f_new (FSAL), err estimate)."""
    ks = [f0]
    for i in range(1, 7):
        yi = _lc(y, dt, _A[i], ks[:len(_A[i])])
        ks.append(f(t + dt * _C[i], yi))
    y5 = _lc(y, dt, _B5, ks)
    err = jax.tree_util.tree_map(
        lambda *kls: sum(dt * (b5 - b4) * kl.astype(jnp.float32)
                         for b5, b4, kl in zip(_B5, _B4, kls)),
        *ks)
    return y5, ks[6], err       # ks[6] = f(t+dt, y5): FSAL


def odeint_dopri5(f: Callable, y0, ts, *, rtol: float = 1e-5,
                  atol: float = 1e-6, max_steps_per_segment: int = 64,
                  first_step: float = None):
    """Integrate dy/dt = f(t, y) adaptively, reporting states at ``ts``.

    Returns (states [T, ...], info) where info = {"nfe", "max_steps_hit"}.
    """
    ts = jnp.asarray(ts, jnp.float32)
    dt0 = jnp.asarray(first_step if first_step is not None
                      else (ts[1] - ts[0]) / 8.0, jnp.float32)

    def segment(carry, t_pair):
        y, f0, dt, nfe, hit = carry
        t_start, t_end = t_pair

        def cond(s):
            t, _, _, _, steps, _ = s
            return (t < t_end - 1e-9) & (steps < max_steps_per_segment)

        def body(s):
            t, y, f0, dt, steps, nfe = s
            dt_c = jnp.minimum(dt, t_end - t)
            y5, f_new, err = _dopri_step(f, t, y, f0, dt_c)
            ratio = _error_ratio(err, y, y5, rtol, atol)
            accept = ratio <= 1.0
            factor = jnp.clip(SAFETY * (ratio + 1e-12) ** (-1.0 / ORDER),
                              MIN_FACTOR, MAX_FACTOR)
            t = jnp.where(accept, t + dt_c, t)
            y = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, b, a), y, y5)
            f0 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, b, a), f0, f_new)
            dt = dt_c * factor
            return (t, y, f0, dt, steps + 1, nfe + 6)

        t, y, f0, dt, steps, nfe = jax.lax.while_loop(
            cond, body, (t_start, y, f0, dt, 0, nfe))
        hit = hit | (steps >= max_steps_per_segment)
        return (y, f0, dt, nfe, hit), y

    f0 = f(ts[0], y0)
    init = (y0, f0, dt0, jnp.asarray(1, jnp.int32), jnp.asarray(False))
    (_, _, _, nfe, hit), tail = jax.lax.scan(
        segment, init, (ts[:-1], ts[1:]))
    states = jax.tree_util.tree_map(
        lambda first, rest: jnp.concatenate([first[None], rest], axis=0),
        y0, tail)
    return states, {"nfe": nfe, "max_steps_hit": hit}
