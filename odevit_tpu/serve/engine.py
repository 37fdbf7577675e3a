"""Micro-batching serving engine over the fused inference path.

The reference has no serving story (research scripts only); production
deployment on TPU wants the opposite of its per-call eager model:
static shapes compiled once, requests coalesced into MXU-sized batches,
uint8 across the host→device boundary, and the fused serving kernels
(chained Euler / stage-advance rk4, models/fast_forward.py) doing one
HBM round trip per solver segment.

Design:
  * a fixed ladder of batch buckets, each precompiled (jit cache) at
    engine start — no compile stalls in the request path;
  * one dispatcher thread drains a queue, coalesces pending requests up
    to the largest bucket, pads to the smallest bucket that fits, runs,
    and resolves per-request futures;
  * device work is serialized by the dispatcher (a TPU chip runs one
    program at a time anyway); submit() is thread-safe and returns a
    concurrent.futures.Future.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


class ServingEngine:
    """Batched inference over ``fast_forward`` with shape-bucketing.

    Args:
      model: ViTODE / ViTMacaron config carrier.
      params: trained params pytree (device-resident after first use).
      batch_buckets: ascending ladder of compiled batch sizes.
      preprocess: optional jittable uint8->float fn folded into the
        compiled program (data/pipeline.make_preprocess).
      max_delay_ms: how long the dispatcher waits to coalesce more
        requests once it holds at least one (latency/throughput knob).
    """

    def __init__(self, model, params, *, batch_buckets: Sequence[int] =
                 (1, 8, 32, 128), preprocess=None, max_delay_ms: float = 2.0,
                 use_pallas: Optional[bool] = None, warmup: bool = True):
        from odevit_tpu.models.fast_forward import (fast_forward,
                                                    serving_vmem_plan)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.model = model
        self.params = jax.device_put(params)
        self.buckets = tuple(sorted(set(int(b) for b in batch_buckets)))
        self.max_delay_s = max_delay_ms / 1e3

        # big shapes (ViT-Base 224px) are tile-starved under the stock
        # 16MB scoped-VMEM limit; compile the buckets with the shape's
        # forward plan so the fused kernels tile as large as VMEM allows
        opts, budget = serving_vmem_plan(model) if use_pallas else ({},
                                                                    None)

        def run(params, images):
            x = preprocess(images) if preprocess is not None else images
            return fast_forward(model, params, x, use_pallas=use_pallas,
                                vmem_budget=budget)["logits"]

        self._run = jax.jit(run, compiler_options=opts or None)
        self._queue: "queue.Queue" = queue.Queue()
        self._stats = {"requests": 0, "images": 0, "batches": 0,
                       "padded_images": 0, "failed_requests": 0,
                       "latency_ms_sum": 0.0}
        self._stats_lock = threading.Lock()
        self._stop = threading.Event()
        img = model.img_size
        self._sample_shape = (img, img, model.in_chans)
        # the dtype the buckets are compiled at; submit() coerces floats
        # and rejects everything else so a request can never trigger a
        # fresh compile in the hot path
        self._in_dtype = np.uint8 if preprocess is not None else np.float32
        if warmup:
            for b in self.buckets:
                x = jnp.zeros((b, *self._sample_shape), self._in_dtype)
                jax.block_until_ready(self._run(self.params, x))
        self._thread = threading.Thread(target=self._dispatch, daemon=True)
        self._thread.start()

    # -------------------------------------------------- public surface
    def submit(self, images) -> Future:
        """Enqueue [b, H, W, C] images; resolves to [b, num_classes]
        logits (numpy). Thread-safe."""
        if self._stop.is_set():
            raise RuntimeError("engine closed")
        images = np.asarray(images)
        assert images.shape[1:] == self._sample_shape, \
            f"expected (*, {self._sample_shape}), got {images.shape}"
        if images.dtype != self._in_dtype:
            if self._in_dtype == np.float32 and (
                    np.issubdtype(images.dtype, np.floating)
                    or np.issubdtype(images.dtype, np.integer)):
                # integer inputs (e.g. raw uint8 images with no
                # preprocess) cast safely to f32 — keep old callers
                # working without a recompile (ADVICE r3)
                images = images.astype(np.float32)
            else:
                raise TypeError(
                    f"engine compiled for {np.dtype(self._in_dtype).name} "
                    f"inputs, got {images.dtype.name}")
        fut: Future = Future()
        self._queue.put((images, fut, time.perf_counter()))
        # TOCTOU vs close(): the put can land after close() drained the
        # queue (that future would never resolve) — re-check and fail it
        # here; done() guards on both sides make double-resolution safe
        if self._stop.is_set():
            try:
                fut.set_exception(RuntimeError("engine closed"))
            except Exception:                               # noqa: BLE001
                pass  # dispatcher/close resolved it first
        return fut

    def stats(self) -> dict:
        with self._stats_lock:
            s = dict(self._stats)
        if s["requests"]:
            s["mean_latency_ms"] = s["latency_ms_sum"] / s["requests"]
        return s

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5.0)
        # fail any requests still queued so callers don't hang
        while True:
            try:
                _, fut, _ = self._queue.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(RuntimeError("engine closed"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ----------------------------------------------------- dispatcher
    def _dispatch(self):
        max_b = self.buckets[-1]
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            pending = [first]
            total = first[0].shape[0]
            deadline = time.perf_counter() + self.max_delay_s
            # coalesce until the largest bucket is full or the delay
            # budget is spent
            while total < max_b:
                wait = deadline - time.perf_counter()
                if wait <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=wait)
                except queue.Empty:
                    break
                pending.append(nxt)
                total += nxt[0].shape[0]
            # a failing device run must not kill the dispatcher: resolve
            # the affected futures with the error and keep serving —
            # otherwise every later submit() hangs forever
            try:
                self._run_batch(pending, total)
            except Exception as e:                        # noqa: BLE001
                with self._stats_lock:
                    self._stats["failed_requests"] += len(pending)
                for _, fut, _ in pending:
                    if not fut.done():
                        fut.set_exception(e)

    def _run_batch(self, pending, total):
        images = np.concatenate([p[0] for p in pending], axis=0)
        done, padded, outs = 0, 0, []
        # oversized coalesced batches run in max-bucket chunks; each
        # tail takes the smallest bucket that fits it
        while done < total:
            remaining = total - done
            bucket = next((b for b in self.buckets if b >= remaining),
                          self.buckets[-1])
            take = min(remaining, bucket)
            chunk = images[done:done + take]
            if take < bucket:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[:1], bucket - take, axis=0)],
                    axis=0)
                padded += bucket - take
            logits = self._run(self.params, jnp.asarray(chunk))
            outs.append(np.asarray(logits)[:take])
            done += take
        logits = np.concatenate(outs, axis=0)
        now = time.perf_counter()
        with self._stats_lock:
            self._stats["batches"] += 1
            self._stats["images"] += total
            self._stats["padded_images"] += padded
            for imgs, fut, t0 in pending:
                self._stats["requests"] += 1
                self._stats["latency_ms_sum"] += (now - t0) * 1e3
        off = 0
        for imgs, fut, _ in pending:
            # a caller may have cancelled its future; set_result would
            # raise InvalidStateError and poison the rest of the batch
            if not fut.done():
                fut.set_result(logits[off:off + imgs.shape[0]])
            off += imgs.shape[0]
