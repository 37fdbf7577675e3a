"""Training-throughput harness: images/sec for the free training step
(full fwd+bwd+optimizer, one jit program).

Measurement notes for the tunneled-TPU runtime (v5e, jax 0.9):
  * first use of any freshly device_put buffer costs ~1-3s (tunnel
    upload/first-touch) — measure the SECOND pass over the batch set;
    the real input pipeline masks this with prefetch;
  * build per-step PRNG keys from host integers; re-submitting a
    long-lived key buffer across queued steps stalls dispatch;
  * even so, training-step wall times vary up to 10x run-to-run under
    the tunnel (inference timings are stable) — treat these numbers as
    upper bounds; best observed steady state: ~107ms/step @ B=256
    (2.4k img/s) without JaSMin, ~186ms (1.4k img/s) with.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def bench_free(batch=256, jasmin=True, iters=10):
    import jax
    import jax.numpy as jnp
    from odevit_tpu.models.vit_ode import ViTODE
    from odevit_tpu.utils.init_utils import init_on_cpu
    from odevit_tpu.data.pipeline import make_preprocess
    from odevit_tpu.train.state import (all_trainable, create_train_state,
                                        make_optimizer)
    from odevit_tpu.train.steps import make_free_train_step

    rng = np.random.default_rng(0)
    data = {"pixel_values": jax.device_put(rng.integers(
                0, 256, (batch, 32, 32, 3), dtype=np.uint8)),
            "labels": jax.device_put(rng.integers(0, 100, batch)
                                     .astype(np.int32))}
    pre = make_preprocess(None, dtype=jnp.bfloat16)
    m = ViTODE(img_size=32, patch_size=4, embed_dim=192, num_heads=3,
               mlp_ratio=4.0, num_classes=100, emulate_depth=12.0,
               time_interval=1.0, num_eval_steps=13, solver="rk4",
               register_tokens=4, pos_embed_register_tokens=False,
               remat=True, dtype=jnp.bfloat16)
    p = init_on_cpu(m, jax.random.PRNGKey(0),
                    pre(data["pixel_values"][:2]))["params"]
    tx = make_optimizer(1e-4, trainable_mask=all_trainable(p))
    state = create_train_state(p, tx)
    step = make_free_train_step(m, tx, use_jasmin=jasmin, jasmin_k=10,
                                preprocess_fn=pre, donate=False)
    state, mm = step(state, data, jax.random.PRNGKey(1))
    jax.block_until_ready(mm["loss"])
    t0 = time.perf_counter()
    outs = []
    for _ in range(iters):
        state, mm = step(state, data, jax.random.PRNGKey(1))
        outs.append(mm["loss"])
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    return {"mode": "free_train", "batch": batch, "jasmin": jasmin,
            "step_ms": round(dt * 1e3, 1),
            "images_per_sec": round(batch / dt, 1), "nfe": 48}


if __name__ == "__main__":
    for jasmin in (True, False):
        print(json.dumps(bench_free(jasmin=jasmin)))
