"""Native (C++) input-pipeline core with compile-on-demand + numpy fallback.

``assemble_batch(images, indices, augment=..., seed=...)`` gathers a
uint8 batch (and optionally applies pad-4 random-crop + horizontal flip)
through a multithreaded C++ kernel (batcher.cpp) bound via ctypes. If no
compiler/.so is available it silently falls back to a numpy
implementation with identical semantics (same per-sample RNG streams), so
everything works — just slower — on minimal systems.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "batcher.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    so_path = os.path.join(_HERE, "libodevit_data.so")
    if not os.path.exists(so_path) or (
            os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", "-pthread", _SRC, "-o", so_path]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception as e:                      # no compiler / failure
            print(f"[native] build failed ({e}); using numpy fallback")
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as e:
        print(f"[native] dlopen failed ({e}); using numpy fallback")
        return None
    lib.odevit_assemble_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_uint64, ctypes.c_int32]
    lib.odevit_assemble_batch.restype = None
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _LIB = _build_lib()
            _TRIED = True
        return _LIB


def _splitmix_stream(seed: int, i: int, n: int) -> np.ndarray:
    """First n outputs of the C++ SplitMix64 stream for sample i."""
    state = (seed * 0x9E3779B97F4A7C15 + i) & 0xFFFFFFFFFFFFFFFF
    out = np.empty(n, np.uint64)
    for j in range(n):
        state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        out[j] = z ^ (z >> 31)
    return out


def _numpy_assemble(images, indices, augment, pad, seed):
    batch = images[indices]
    if not augment:
        return batch
    b, h, w, c = batch.shape
    out = np.zeros_like(batch)
    padded = np.zeros((h + 2 * pad, w + 2 * pad, c), np.uint8)
    for i in range(b):
        r = _splitmix_stream(seed, i, 3)
        oy = int(r[0] % (2 * pad + 1)) - pad
        ox = int(r[1] % (2 * pad + 1)) - pad
        flip = (r[2] % 2) == 1
        img = batch[i][:, ::-1] if flip else batch[i]
        padded[:] = 0
        padded[pad:pad + h, pad:pad + w] = img
        out[i] = padded[pad + oy:pad + oy + h, pad + ox:pad + ox + w]
    return out


def assemble_batch(images: np.ndarray, indices: np.ndarray, *,
                   augment: bool = False, pad: int = 4, seed: int = 0,
                   num_threads: int = 0) -> np.ndarray:
    """Gather (+augment) a uint8 batch: [B, h, w, c]."""
    images = np.ascontiguousarray(images, np.uint8)
    indices = np.ascontiguousarray(indices, np.int64)
    b = indices.shape[0]
    _, h, w, c = images.shape
    lib = get_lib()
    if lib is None:
        return _numpy_assemble(images, indices, augment, pad, seed)
    out = np.empty((b, h, w, c), np.uint8)
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, 16)
    lib.odevit_assemble_batch(
        images.ctypes.data_as(ctypes.c_void_p),
        indices.ctypes.data_as(ctypes.c_void_p),
        b, h, w, c, out.ctypes.data_as(ctypes.c_void_p),
        1 if augment else 0, pad, seed & 0xFFFFFFFFFFFFFFFF, num_threads)
    return out
