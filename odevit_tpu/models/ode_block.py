"""ODEBlock: integrate a flax vector-field module over a time grid.

This is the flax-lifted counterpart of :mod:`odevit_tpu.core.integrators`
(which operates on pure functions). Parameters are broadcast across the
scan (one set of weights evaluated at every solver step — the continuous-
depth idea), dropout RNGs are split per step so the stochastic ODE seen in
train mode has fresh noise at every evaluation, and ``nn.remat`` on the
step body gives O(1)-in-time activation memory for backprop (the reference
stores all activations of the unrolled solver).

Aux collection (replaces the reference's mutable
``attention_trajectory`` side channel, ode_transformer_gpt.py:323-328):
``eval_aux_fn(attn) -> pytree`` is applied to the attention map of every
function evaluation inside the scan; its (small) outputs are the scan ys.
This lets JaSMin run as a per-evaluation scalar without ever materializing
the [E, B, H, N, N] trajectory — unless the caller explicitly asks for it
by returning the map itself.

``eval_aux_tail_steps``: JaSMin only scores the last ``int(0.85 T)``
evaluations (ode_transformer_gpt.py:615), so when the consumer only needs
the tail, the integration splits into a cheap head scan (no aux work) and
a tail scan that computes it — the per-evaluation reduction is the
dominant cost of JaSMin training, and ~3/4 of it is skipped for rk4
grids. Aux leading axes become [tail_steps, S].
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from odevit_tpu.core.integrators import make_step


class ODEBlock(nn.Module):
    vf: nn.Module
    method: str = "rk4"
    remat: bool = True

    @nn.compact
    def __call__(self, y0, ts, *, deterministic: bool = True,
                 eval_aux_fn: Optional[Callable] = None,
                 collect_states: bool = True,
                 carry_attention: bool = False,
                 eval_aux_tail_steps: Optional[int] = None):
        """Returns (states, eval_aux, last_attn).

        states: [T, B, N, D] with states[0] == y0 (or just the final state
          [B, N, D] when collect_states=False).
        eval_aux: pytree with leading axes [T-1, S] ([tail_steps, S] when
          ``eval_aux_tail_steps`` is set; None if no aux_fn).
        last_attn: attention map of the final function evaluation (None
          unless carry_attention).
        """
        step = make_step(self.method, has_aux=True)

        def make_body(with_aux: bool):
            def body(vf_mod, carry, t_dt):
                y = carry[0]
                t, dt = t_dt

                def f(tt, yy):
                    dy, attn = vf_mod(yy, tt, deterministic=deterministic)
                    aux = (eval_aux_fn(attn) if with_aux else None,
                           attn if carry_attention else None)
                    return dy, aux

                y_next, stage_aux = step(f, y, t, dt)
                eval_aux, attns = stage_aux
                new_carry = (y_next,)
                if carry_attention:
                    new_carry = (y_next, attns[-1])
                ys = (y_next if collect_states else None, eval_aux)
                return new_carry, ys

            if self.remat:
                body = nn.remat(body, prevent_cse=False)
            return nn.scan(body, variable_broadcast="params",
                           split_rngs={"params": False, "dropout": True},
                           in_axes=0, out_axes=0)

        carry0 = (y0,)
        if carry_attention:
            b, n = y0.shape[0], y0.shape[1]
            h = self.vf.num_heads
            carry0 = (y0, jnp.zeros((b, h, n, n), y0.dtype))

        num_steps = int(ts.shape[0]) - 1
        tail = num_steps
        if eval_aux_fn is not None and eval_aux_tail_steps is not None:
            tail = max(1, min(eval_aux_tail_steps, num_steps))
        head = num_steps - tail if eval_aux_fn is not None else 0

        t_all, dt_all = ts[:-1], ts[1:] - ts[:-1]
        states_parts = []
        if head > 0:
            scan_head = make_body(with_aux=False)
            carry0, (tail_states_h, _) = scan_head(
                self.vf, carry0, (t_all[:head], dt_all[:head]))
            if collect_states:
                states_parts.append(tail_states_h)
        scan_tail = make_body(with_aux=eval_aux_fn is not None)
        final_carry, (tail_states, eval_aux) = scan_tail(
            self.vf, carry0, (t_all[head:], dt_all[head:]))
        if collect_states:
            states_parts.append(tail_states)

        last_attn = final_carry[1] if carry_attention else None
        if collect_states:
            states = jnp.concatenate([y0[None]] + states_parts, axis=0)
            return states, eval_aux, last_attn
        return final_carry[0], eval_aux, last_attn
