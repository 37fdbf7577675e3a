"""Epoch-level training/eval loops.

Mirrors the reference's loop surface (train.py / test.py): per-iteration
metrics under ``train/*`` every ``log_every`` batches, epoch means under
``train_epoch/*``, validation under ``val/*``, stability bounds under
``Bounds/*`` at logging cadence (opt-in diagnostics, not per step).
The hot loop stays fully on device: the jitted step returns device
scalars; the host only aggregates at logging boundaries.
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Callable, Optional

import jax
import numpy as np


def _acc_into(store, metrics):
    for k, v in metrics.items():
        store[k].append(v)


def _means(store):
    return {k: float(np.mean([float(jax.device_get(x)) for x in v]))
            for k, v in store.items()}


def train_epoch(loader, state, step_fn, rng, *, epoch: int = 0,
                logger=None, log_every: int = 100,
                step_kwargs: Optional[dict] = None,
                bounds_fn: Optional[Callable] = None,
                prefix: str = "train"):
    """Run one epoch; returns (state, epoch_mean_metrics)."""
    step_kwargs = step_kwargs or {}
    epoch_store = defaultdict(list)
    iter_store = defaultdict(list)
    t0 = time.time()
    seen = 0
    import jax as _jax
    # Per-step keys are built from HOST integers: re-submitting any
    # long-lived device buffer (the epoch rng key — even as fold_in input)
    # across queued executions trips a ~15x async-dispatch stall in the
    # tunneled TPU runtime (measured 1.5s vs 106ms/step). PRNGKey(int)
    # takes a host scalar, so every submission uses fresh buffers; it
    # also gives per-batch rng hygiene on top of the in-step fold by
    # state.step.
    try:
        seed0 = int(np.asarray(_jax.random.key_data(rng)).ravel()[-1])
    except Exception:
        seed0 = int(np.asarray(rng).ravel()[-1])
    for batch_idx, batch in enumerate(loader):
        step_rng = _jax.random.PRNGKey(
            (seed0 + epoch * 100003 + batch_idx) % (2 ** 31))
        state, metrics = step_fn(state, batch, step_rng, **step_kwargs)
        _acc_into(epoch_store, metrics)
        _acc_into(iter_store, metrics)
        seen += int(np.asarray(jax.device_get(batch["labels"])).shape[0])

        if logger and (batch_idx + 1) % log_every == 0:
            rec = {f"{prefix}/{k}": v for k, v in _means(iter_store).items()}
            if bounds_fn is not None:
                for k, v in bounds_fn(state).items():
                    rec[f"Bounds/{k}"] = float(jax.device_get(v))
            rec[f"{prefix}/epoch"] = epoch
            logger.log(rec)
            iter_store = defaultdict(list)

    means = _means(epoch_store)
    dt = time.time() - t0
    means["images_per_sec"] = seen / dt if dt > 0 else 0.0
    if logger:
        rec = {f"{prefix}_epoch/{k}": v for k, v in means.items()}
        rec[f"{prefix}_epoch/epoch"] = epoch
        logger.log(rec)
    return state, means


def evaluate(loader, params, eval_step, *, logger=None, mode: str = "val"):
    store = defaultdict(list)
    for batch in loader:
        metrics = eval_step(params, batch)
        _acc_into(store, metrics)
    means = _means(store)
    if logger:
        logger.log({f"{mode}/{k}": v for k, v in means.items()})
    print(f"[{mode}] " + "  ".join(f"{k}={v:.4f}"
                                   for k, v in sorted(means.items())))
    return means
