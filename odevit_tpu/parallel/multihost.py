"""Multi-host / multi-slice initialization helpers.

The reference is single-GPU; this is the new-capability scaling story
(SURVEY.md section 5): one ``data`` axis over ICI within a slice and an
optional ``dcn`` axis across slices. On a single host these helpers
degrade to the local mesh, so the same training script runs anywhere.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks; no-op on a
    single process (so scripts are host-count agnostic)."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    if process_id is None:
        process_id = int(os.environ.get("PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_multislice_mesh(num_model: int = 1) -> Mesh:
    """(dcn, data, model) mesh: 'dcn' spans slices (data-parallel over the
    datacenter network — gradients only), 'data'/'model' stay on ICI.
    Falls back to a 1-slice mesh on single-slice/host setups."""
    devices = jax.devices()
    try:
        from jax.experimental import mesh_utils
        num_slices = max(getattr(d, "slice_index", 0)
                         for d in devices) + 1
    except Exception:
        num_slices = 1
    if num_slices > 1:
        from jax.experimental import mesh_utils
        per_slice = len(devices) // num_slices
        arr = mesh_utils.create_hybrid_device_mesh(
            (per_slice // num_model, num_model),
            (num_slices, 1))
        return Mesh(arr.reshape(num_slices, per_slice // num_model,
                                num_model),
                    axis_names=("dcn", "data", "model"))
    arr = np.array(devices).reshape(1, len(devices) // num_model, num_model)
    return Mesh(arr, axis_names=("dcn", "data", "model"))


def process_local_batch_slice(global_batch: int) -> slice:
    """Which rows of the global batch this host should feed (per-host data
    loading for multi-host jit)."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return slice(i * per, (i + 1) * per)
