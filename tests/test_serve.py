"""Serving engine: bucketed micro-batching returns the same logits as a
direct fused forward, under concurrent submission."""

import threading

import numpy as np
import jax
import jax.numpy as jnp

from odevit_tpu.models.vit_ode import ViTODE
from odevit_tpu.models.fast_forward import fast_forward
from odevit_tpu.serve.engine import ServingEngine


def setup():
    m = ViTODE(img_size=16, patch_size=4, embed_dim=32, num_heads=2,
               mlp_ratio=2.0, num_classes=7, emulate_depth=4,
               time_interval=1.0, num_eval_steps=5, solver="rk4",
               register_tokens=2)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    return m, params, rng


def test_engine_matches_direct_forward():
    m, params, rng = setup()
    with ServingEngine(m, params, batch_buckets=(2, 4, 8),
                       max_delay_ms=1.0, use_pallas=False) as eng:
        for b in (1, 3, 8, 11):   # odd sizes, incl. > max bucket
            x = rng.standard_normal((b, 16, 16, 3)).astype(np.float32)
            got = eng.submit(x).result(timeout=60)
            want = np.asarray(fast_forward(m, params, jnp.asarray(x),
                                           use_pallas=False)["logits"])
            assert got.shape == (b, 7)
            np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
        s = eng.stats()
        assert s["requests"] == 4 and s["images"] == 23
        assert s["mean_latency_ms"] > 0


def test_engine_concurrent_submits():
    m, params, rng = setup()
    xs = [rng.standard_normal((i % 3 + 1, 16, 16, 3)).astype(np.float32)
          for i in range(12)]
    wants = [np.asarray(fast_forward(m, params, jnp.asarray(x),
                                     use_pallas=False)["logits"])
             for x in xs]
    with ServingEngine(m, params, batch_buckets=(4, 16),
                       max_delay_ms=5.0, use_pallas=False) as eng:
        futs = [None] * len(xs)

        def worker(i):
            futs[i] = eng.submit(xs[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(xs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, f in enumerate(futs):
            np.testing.assert_allclose(f.result(timeout=60), wants[i],
                                       atol=2e-5, rtol=1e-4)
        s = eng.stats()
        assert s["requests"] == 12
        # coalescing happened: fewer device batches than requests
        assert s["batches"] <= s["requests"]


def test_engine_rejects_bad_shape():
    m, params, _ = setup()
    with ServingEngine(m, params, batch_buckets=(2,), max_delay_ms=0.5,
                       use_pallas=False) as eng:
        try:
            eng.submit(np.zeros((1, 8, 8, 3), np.float32))
            raised = False
        except AssertionError:
            raised = True
        assert raised


def test_engine_survives_failing_run():
    """A device-run failure resolves the affected futures with the
    exception and the dispatcher keeps serving; submit() after close()
    raises instead of enqueueing into a dead queue."""
    m, params, rng = setup()
    with ServingEngine(m, params, batch_buckets=(2, 4), max_delay_ms=0.5,
                       use_pallas=False) as eng:
        good_run = eng._run
        calls = {"n": 0}

        def flaky(params, images):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected device failure")
            return good_run(params, images)

        eng._run = flaky
        x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
        f1 = eng.submit(x)
        try:
            f1.result(timeout=60)
            raised = False
        except RuntimeError as e:
            raised = "injected device failure" in str(e)
        assert raised
        # the dispatcher survived: the next request succeeds
        got = eng.submit(x).result(timeout=60)
        assert got.shape == (2, 7)
        assert eng.stats()["failed_requests"] == 1
    try:
        eng.submit(x)
        raised = False
    except RuntimeError:
        raised = True
    assert raised


def test_engine_dtype_guard():
    """Float AND integer inputs coerce to the compiled f32 buckets
    (uint8 is a safe cast — ADVICE r3); incoercible dtypes are rejected
    rather than compiling a fresh program mid-request."""
    m, params, rng = setup()
    with ServingEngine(m, params, batch_buckets=(2,), max_delay_ms=0.5,
                       use_pallas=False) as eng:
        x64 = rng.standard_normal((2, 16, 16, 3))       # float64
        got = eng.submit(x64).result(timeout=60)
        want = np.asarray(fast_forward(
            m, params, jnp.asarray(x64.astype(np.float32)),
            use_pallas=False)["logits"])
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
        u8 = rng.integers(0, 256, (2, 16, 16, 3)).astype(np.uint8)
        got = eng.submit(u8).result(timeout=60)
        want = np.asarray(fast_forward(
            m, params, jnp.asarray(u8.astype(np.float32)),
            use_pallas=False)["logits"])
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
        try:
            eng.submit(np.zeros((1, 16, 16, 3), np.complex64))
            raised = False
        except TypeError:
            raised = True
        assert raised


def test_engine_cancelled_future_does_not_poison_batch():
    """A caller-cancelled future must not make set_result raise and take
    down the rest of its coalesced batch (ADVICE r3)."""
    m, params, rng = setup()
    # long coalesce delay so both requests land in one device batch and
    # we can cancel before the dispatcher runs it
    with ServingEngine(m, params, batch_buckets=(4,), max_delay_ms=200.0,
                       use_pallas=False) as eng:
        x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
        f1 = eng.submit(x)
        f2 = eng.submit(x)
        assert f1.cancel()  # not yet running: cancellable
        got = f2.result(timeout=60)
        assert got.shape == (1, 7)
        assert eng.stats()["failed_requests"] == 0


def test_engine_submit_close_race_resolves_future():
    """If close() drains the queue between submit()'s stop-check and its
    put(), the orphaned future must still resolve (ADVICE r3 TOCTOU).
    Simulated by running close() from inside the queue.put seam."""
    m, params, rng = setup()
    eng = ServingEngine(m, params, batch_buckets=(2,), max_delay_ms=0.5,
                        use_pallas=False)
    orig_put = eng._queue.put

    def put_then_close(item):
        # close() finishes (stop set, queue drained) before the put
        # lands — the exact interleaving the TOCTOU fix covers
        eng.close()
        orig_put(item)

    eng._queue.put = put_then_close
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    fut = eng.submit(x)
    try:
        fut.result(timeout=10)   # either a real result...
    except RuntimeError as e:    # ...or "engine closed" — never a hang
        assert "engine closed" in str(e)


def test_serving_vmem_plan_tiers():
    """CIFAR-class shapes keep the stock scoped limit (no compile
    options, identical tiles); the ratio-1 TS student at 224px (the
    reference's FLOPs-notebook serving shape) steps up a tier so its
    fused serving kernels tile at bb=2 instead of 1. The ratio-4
    ViT-Base stays at the stock plan: its larger tiles sit in the
    compile-cost class the area cap rejects, so a raised limit buys
    nothing and the plan says so."""
    import jax.numpy as jnp
    from odevit_tpu.models.vit_ode import ViTODE
    from odevit_tpu.models.fast_forward import serving_vmem_plan
    from odevit_tpu.kernels.vector_field import auto_block_b

    cifar = ViTODE(img_size=32, patch_size=4, embed_dim=192, num_heads=3,
                   mlp_ratio=4.0, num_classes=100, emulate_depth=12.0,
                   time_interval=1.0, num_eval_steps=49, solver="euler",
                   register_tokens=4, dtype=jnp.bfloat16)
    assert serving_vmem_plan(cifar) == ({}, None)

    base4 = ViTODE(img_size=224, patch_size=16, embed_dim=768,
                   num_heads=12, mlp_ratio=4.0, num_classes=100,
                   emulate_depth=12.0, time_interval=1.0,
                   num_eval_steps=25, solver="euler", register_tokens=0,
                   dtype=jnp.bfloat16)
    assert serving_vmem_plan(base4) == ({}, None)

    ts1 = ViTODE(img_size=224, patch_size=16, embed_dim=768,
                 num_heads=12, mlp_ratio=1.0, num_classes=100,
                 emulate_depth=12.0, time_interval=1.0,
                 num_eval_steps=25, solver="euler", register_tokens=10,
                 dtype=jnp.bfloat16)
    opts, budget = serving_vmem_plan(ts1)
    assert opts == {"xla_tpu_scoped_vmem_limit_kib": 32 * 1024}
    assert auto_block_b(8, 207, 768, 768, 12, requested=16,
                        extra_states=1, budget_override=budget) == 2
    assert auto_block_b(8, 207, 768, 768, 12, requested=16,
                        extra_states=1) == 1
