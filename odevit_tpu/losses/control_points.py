"""Control-point selection: map the 12 teacher layers onto the T-step
student trajectory.

The teacher's per-layer CLS displacement magnitudes (measured offline on
DINO ViT-B/16) are softmaxed at a temperature, scaled by T, rounded and
cumulatively summed to produce trajectory indices; the last index is
clamped to T-1. Parity targets:
/root/reference/models/ode_transformer_gpt.py:347-350,470-488 and
models/macaron.py:166-167,244-259.

TPU note: temperature and T are static config, so the indices are computed
in numpy at trace time and baked into the compiled program as a static
gather — no device computation at all.
"""

from __future__ import annotations

import numpy as np

# Mean L2 displacement between consecutive hidden states of a trained
# DINO ViT-B/16, per layer (measured constants from the reference model).
VIT_LAYER_DISPLACEMENTS = np.array(
    [19.99450625, 12.949505, 5.35348687, 4.86699219, 4.81463781, 4.52093875,
     5.21054063, 5.69734125, 6.1311925, 6.05176188, 6.4614325, 53.514895],
    dtype=np.float32)

# Same measurement for the Macaron variant's teacher.
MACARON_LAYER_DISPLACEMENTS = np.array(
    [19.9335, 12.61485625, 13.10309922, 14.70024375, 15.15418125,
     17.1821, 14.34054062, 18.23386562, 23.4014875, 14.24714063,
     29.36258125, 171.6232875],
    dtype=np.float32)


def proportional_control_points(
    num_eval_steps: int,
    temperature: float,
    displacements: np.ndarray = VIT_LAYER_DISPLACEMENTS,
    clamp_last: bool = True,
) -> np.ndarray:
    """Static trajectory indices for the teacher-layer control points.

    softmax(displacements / temperature) * T, rounded (half-to-even, as
    torch.round), cumsum; with ``clamp_last`` the final index is forced to
    T-1 (ViTNeuralODE behavior; the Macaron variant leaves it unclamped).
    All indices are clipped into [0, T-1] so the gather is always valid —
    the reference would raise on out-of-range cumsums; clipping preserves
    every in-range value.
    """
    x = displacements.astype(np.float32) / np.float32(temperature)
    e = np.exp(x - np.max(x))
    probs = e / e.sum()
    steps = np.round(probs * num_eval_steps)
    idx = np.cumsum(steps).astype(np.int64)
    if clamp_last:
        idx[-1] = num_eval_steps - 1
    return np.clip(idx, 0, num_eval_steps - 1)
