"""Frozen-teacher target cache: cached steps reproduce the live-teacher
steps exactly (same math, gather instead of recompute)."""

import numpy as np
import jax
import jax.numpy as jnp

from odevit_tpu.models.vit_ode import ViTODE
from odevit_tpu.teacher.vit import ViTTeacher
from odevit_tpu.train.state import (all_trainable, create_train_state,
                                    make_optimizer)
from odevit_tpu.train.steps import make_distill_train_step
from odevit_tpu.train.fast_steps import make_fast_distill_train_step
from odevit_tpu.train.teacher_cache import (build_teacher_cache,
                                            cache_nbytes, gather_targets)


def setup(n=12, batch=8):
    m = ViTODE(img_size=16, patch_size=4, embed_dim=32, num_heads=2,
               mlp_ratio=2.0, num_classes=7, emulate_depth=12.0,
               time_interval=1.0, num_eval_steps=7, solver="euler",
               register_tokens=2, remat=True)
    teacher = ViTTeacher(image_size=16, patch_size=4, hidden_size=32,
                         num_layers=12, num_heads=2, mlp_dim=64,
                         num_classes=7)
    rng = np.random.default_rng(3)
    images = rng.standard_normal((n, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 7, n).astype(np.int32)
    idx = rng.permutation(n)[:batch].astype(np.int32)
    batch_d = {"pixel_values": jnp.asarray(images[idx]),
               "labels": jnp.asarray(labels[idx]),
               "index": jnp.asarray(idx)}
    params = m.init(jax.random.PRNGKey(0), batch_d["pixel_values"])["params"]
    tparams = teacher.init(jax.random.PRNGKey(1),
                           batch_d["pixel_values"])["params"]
    return m, teacher, params, tparams, images, batch_d


def test_cache_contents_match_live_forward():
    _, teacher, _, tparams, images, batch = setup()
    cache = build_teacher_cache(teacher, tparams, images, batch_size=5)
    assert cache["t_cls"].shape == (12, 12, 32)
    assert cache["t_rows"].shape == (12, 2, 16)
    assert cache_nbytes(cache) > 0

    out = teacher.apply({"params": tparams},
                        jnp.asarray(images[np.asarray(batch["index"])]))
    t_states, t_rows = gather_targets(cache, batch["index"])
    want_states = out["hidden_states"][1:][:, :, :1]
    np.testing.assert_allclose(np.asarray(t_states),
                               np.asarray(want_states), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(t_rows),
        np.asarray(out["attentions"][-1][:, :, 0, 1:]), atol=1e-5)


def _run_pair(make, m, teacher, params, tparams, images, batch, **kw):
    tx = make_optimizer(1e-3, trainable_mask=all_trainable(params))
    common = dict(lambda_param=0.5, jasmin_k=2, mse_full_path=True,
                  use_distillation=True, temperature=30.0, donate=False,
                  **kw)
    live = make(m, teacher, tx, **common)
    s1, m1 = live(create_train_state(params, tx), tparams, batch,
                  jax.random.PRNGKey(2), supervise=True)

    cache = build_teacher_cache(teacher, tparams, images, batch_size=6)
    cached = make(m, teacher, tx, teacher_cache=True, **common)
    s2, m2 = cached(create_train_state(params, tx), cache, batch,
                    jax.random.PRNGKey(2), supervise=True)
    return (s1, m1), (s2, m2)


def _assert_pair_close(a, b):
    (s1, m1), (s2, m2) = a, b
    for k in ("loss", "mse_loss", "kl_loss", "jasmin_loss", "grad_norm"):
        np.testing.assert_allclose(float(m2[k]), float(m1[k]), rtol=1e-4,
                                   atol=1e-5, err_msg=k)
    for x, y in zip(jax.tree_util.tree_leaves(s2.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-5, rtol=1e-4)


def test_flax_step_cached_matches_live():
    m, teacher, params, tparams, images, batch = setup()
    a, b = _run_pair(make_distill_train_step, m, teacher, params, tparams,
                     images, batch)
    _assert_pair_close(a, b)


def test_fused_step_cached_matches_live():
    m, teacher, params, tparams, images, batch = setup()
    a, b = _run_pair(make_fast_distill_train_step, m, teacher, params,
                     tparams, images, batch, remat=False)
    _assert_pair_close(a, b)


def test_fused_step_cached_dp_matches_single_device():
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("data",))
    m, teacher, params, tparams, images, batch = setup(n=16, batch=8)
    a, b = _run_pair(make_fast_distill_train_step, m, teacher, params,
                     tparams, images, batch, remat=False)
    tx = make_optimizer(1e-3, trainable_mask=all_trainable(params))
    cache = build_teacher_cache(teacher, tparams, images, batch_size=8)
    dp = make_fast_distill_train_step(
        m, teacher, tx, lambda_param=0.5, jasmin_k=2, mse_full_path=True,
        use_distillation=True, temperature=30.0, donate=False,
        remat=False, teacher_cache=True, mesh=mesh)
    s3, m3 = dp(create_train_state(params, tx), cache, batch,
                jax.random.PRNGKey(2), supervise=True)
    (s1, m1), _ = a, b
    for k in ("loss", "mse_loss", "kl_loss", "jasmin_loss"):
        np.testing.assert_allclose(float(m3[k]), float(m1[k]), rtol=1e-4,
                                   atol=1e-5, err_msg=k)
    for x, y in zip(jax.tree_util.tree_leaves(s3.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-5, rtol=1e-4)


def test_loader_with_indices_roundtrip():
    from odevit_tpu.data.pipeline import ArrayLoader
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (20, 8, 8, 3)).astype(np.uint8)
    labels = rng.integers(0, 5, 20).astype(np.int32)
    loader = ArrayLoader(images, labels, batch_size=8, shuffle=True,
                         with_indices=True)
    seen = []
    for b in loader:
        idx = np.asarray(b["index"])
        np.testing.assert_array_equal(np.asarray(b["pixel_values"]),
                                      images[idx])
        np.testing.assert_array_equal(np.asarray(b["labels"]), labels[idx])
        seen.extend(idx.tolist())
    assert len(set(seen)) == len(seen)   # no duplicate samples in an epoch
