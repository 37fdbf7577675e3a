"""Model initialization helpers.

``model.init`` executes the forward eagerly; on TPU that dispatches (and
individually compiles) hundreds of tiny ops — ~60s for even the tiny
model. Initializing on the CPU backend is near-instant (and lets the
spectral initializer use host numpy SVDs), after which the params are
transferred once to the target device/sharding.
"""

from __future__ import annotations

import numpy as np
import jax


def init_on_cpu(model, rng, *args, device=None, shardings=None, **kwargs):
    """Run ``model.init`` on CPU and move the result to ``device`` (default:
    first default-backend device) or to a shardings pytree."""
    cpu = jax.local_devices(backend="cpu")[0]
    host_args = jax.tree_util.tree_map(
        lambda a: np.asarray(a) if hasattr(a, "shape") else a, args)
    with jax.default_device(cpu):
        variables = model.init(rng, *host_args, **kwargs)
    if shardings is not None:
        return jax.tree_util.tree_map(jax.device_put, variables, shardings)
    return jax.device_put(variables, device or jax.devices()[0])
