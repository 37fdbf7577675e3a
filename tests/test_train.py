"""Training-engine tests: overfit smoke, freeze masks, curriculum swap,
distillation step, eval step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from odevit_tpu.models.vit_ode import ViTODE
from odevit_tpu.teacher.vit import ViTTeacher
from odevit_tpu.teacher.convert import (graft_teacher_into_student,
                                        GRAFT_FROZEN_PATHS)
from odevit_tpu.train.state import (TrainState, all_trainable,
                                    create_train_state, freeze_paths,
                                    make_optimizer)
from odevit_tpu.train.steps import (make_distill_train_step, make_eval_step,
                                    make_free_train_step,
                                    make_one_sample_loss_step)
from odevit_tpu.train.schedules import cosine_hard_restarts_with_warmup


def tiny_student(**kw):
    d = dict(img_size=16, patch_size=4, embed_dim=24, num_heads=2,
             mlp_ratio=2.0, num_classes=5, emulate_depth=4,
             time_interval=1.0, num_eval_steps=6, solver="euler",
             register_tokens=2, pos_embed_register_tokens=False)
    d.update(kw)
    return ViTODE(**d)


def fixed_batch(key=0, b=16, img=16, classes=5):
    rng = np.random.default_rng(key)
    return {"pixel_values": jnp.asarray(
                rng.standard_normal((b, img, img, 3)).astype(np.float32)),
            "labels": jnp.asarray(rng.integers(0, classes, b))}


def test_free_train_overfits_one_batch():
    """The reference's de-facto correctness check: overfit a fixed batch
    (main_classification_ode_distillation_one_sample.py harness)."""
    m = tiny_student()
    batch = fixed_batch()
    v = m.init(jax.random.PRNGKey(0), batch["pixel_values"])
    sched = cosine_hard_restarts_with_warmup(3e-3, 5, 400, 1)
    tx = make_optimizer(sched, weight_decay=5e-2, clip_norm=1.0,
                        trainable_mask=all_trainable(v["params"]))
    state = create_train_state(v["params"], tx)
    step = make_free_train_step(m, tx, jasmin_k=2, lr_schedule=sched,
                                donate=False)

    rng = jax.random.PRNGKey(1)
    first_loss = None
    for i in range(60):
        state, metrics = step(state, batch, rng)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    final_loss = float(metrics["loss"])
    final_acc = float(metrics["acc"])
    assert final_loss < first_loss * 0.8, (first_loss, final_loss)
    assert final_acc >= 0.9, final_acc
    assert np.isfinite(float(metrics["grad_norm"]))
    assert float(metrics["lr"]) > 0


def test_frozen_params_do_not_move():
    m = tiny_student()
    batch = fixed_batch()
    v = m.init(jax.random.PRNGKey(0), batch["pixel_values"])
    mask = freeze_paths(v["params"], GRAFT_FROZEN_PATHS)
    tx = make_optimizer(1e-2, weight_decay=5e-2, clip_norm=1.0,
                        trainable_mask=mask)
    state = create_train_state(v["params"], tx)
    step = make_free_train_step(m, tx, jasmin_k=2, donate=False)
    s0 = jax.tree_util.tree_map(np.asarray, state.params)
    for _ in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(1))
    s1 = jax.tree_util.tree_map(np.asarray, state.params)
    np.testing.assert_array_equal(s1["patch_embed"]["proj_kernel"],
                                  s0["patch_embed"]["proj_kernel"])
    np.testing.assert_array_equal(s1["head"]["kernel"], s0["head"]["kernel"])
    assert not np.array_equal(s1["patch_embed"]["pos_embed"],
                              s0["patch_embed"]["pos_embed"])
    assert not np.array_equal(s1["vf"]["mlp"]["fc1_kernel"],
                              s0["vf"]["mlp"]["fc1_kernel"])


def test_curriculum_unfreeze_reuses_opt_state():
    m = tiny_student()
    batch = fixed_batch()
    v = m.init(jax.random.PRNGKey(0), batch["pixel_values"])
    mask_frozen = freeze_paths(v["params"], GRAFT_FROZEN_PATHS)
    mask_open = freeze_paths(v["params"], GRAFT_FROZEN_PATHS[:2])
    tx0 = make_optimizer(1e-3, trainable_mask=mask_frozen)
    tx1 = make_optimizer(1e-3, trainable_mask=mask_open)
    state = create_train_state(v["params"], tx0)
    step0 = make_free_train_step(m, tx0, jasmin_k=2, donate=False)
    step1 = make_free_train_step(m, tx1, jasmin_k=2, donate=False)
    state, _ = step0(state, batch, jax.random.PRNGKey(1))
    head0 = np.asarray(state.params["head"]["kernel"])
    state, _ = step1(state, batch, jax.random.PRNGKey(1))  # same opt_state
    head1 = np.asarray(state.params["head"]["kernel"])
    assert not np.array_equal(head0, head1)  # head now moves


def test_head_rewarm_group_scale():
    """Curriculum head LR re-warmup (VERDICT r3 item 7): with
    group_scale=(head_mask, ramp), the head's update is suppressed right
    after the unfreeze and ramps toward the full schedule, while other
    params are untouched; the frozen/open optimizers keep identical
    opt_state structure (zero-cost curriculum swap)."""
    m = tiny_student()
    batch = fixed_batch()
    v = m.init(jax.random.PRNGKey(0), batch["pixel_values"])
    mask_frozen = freeze_paths(v["params"], GRAFT_FROZEN_PATHS)
    mask_open = freeze_paths(v["params"], GRAFT_FROZEN_PATHS[:2])
    head_mask = jax.tree_util.tree_map(
        lambda o, f: o and not f, mask_open, mask_frozen)
    unfreeze, rewarm = 2, 4

    def ramp(count):
        return jnp.clip((count - unfreeze) / rewarm, 0.0, 1.0)

    tx0 = make_optimizer(1e-2, trainable_mask=mask_frozen,
                         group_scale=(head_mask, ramp))
    tx1 = make_optimizer(1e-2, trainable_mask=mask_open,
                         group_scale=(head_mask, ramp))
    state = create_train_state(v["params"], tx0)
    assert jax.tree_util.tree_structure(state.opt_state) == \
        jax.tree_util.tree_structure(tx1.init(v["params"]))

    step0 = make_free_train_step(m, tx0, jasmin_k=2, donate=False)
    step1 = make_free_train_step(m, tx1, jasmin_k=2, donate=False)
    # steps 0,1: frozen phase (ramp value irrelevant, head grads zeroed)
    for _ in range(unfreeze):
        state, _ = step0(state, batch, jax.random.PRNGKey(1))
    head_at_unfreeze = np.asarray(state.params["head"]["kernel"])
    vf_before = np.asarray(state.params["vf"]["mlp"]["fc1_kernel"])
    # step 2: head just unfroze; ramp(2) == 0 -> head still pinned,
    # everything else moves at full LR
    state, _ = step1(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(
        np.asarray(state.params["head"]["kernel"]), head_at_unfreeze)
    assert not np.array_equal(
        np.asarray(state.params["vf"]["mlp"]["fc1_kernel"]), vf_before)
    # later steps: ramp > 0 -> head moves, by growing increments
    deltas = []
    for _ in range(3):
        prev = np.asarray(state.params["head"]["kernel"])
        state, _ = step1(state, batch, jax.random.PRNGKey(1))
        deltas.append(np.abs(
            np.asarray(state.params["head"]["kernel"]) - prev).max())
    assert deltas[0] > 0
    assert deltas[-1] > deltas[0] * 1.5   # ramp visibly increasing


@pytest.fixture(scope="module")
def distill_setup():
    student = tiny_student(num_eval_steps=8)
    teacher = ViTTeacher(image_size=16, patch_size=4, hidden_size=24,
                         num_layers=12, num_heads=2, mlp_dim=48,
                         num_classes=5)
    batch = fixed_batch()
    sv = student.init(jax.random.PRNGKey(0), batch["pixel_values"])
    tv = teacher.init(jax.random.PRNGKey(1), batch["pixel_values"])
    grafted = graft_teacher_into_student(
        sv["params"],
        {"patch_kernel": tv["params"]["patch_kernel"],
         "cls_token": tv["params"]["cls_token"],
         "position_embeddings": tv["params"]["position_embeddings"],
         "classifier": tv["params"]["classifier"]})
    return student, teacher, grafted, tv["params"], batch


def test_distill_step_runs_and_freezes(distill_setup):
    student, teacher, sp, tp, batch = distill_setup
    mask = freeze_paths(sp, GRAFT_FROZEN_PATHS)
    tx = make_optimizer(1e-3, trainable_mask=mask)
    state = create_train_state(sp, tx)
    step = make_distill_train_step(
        student, teacher, tx, lambda_param=0.5, jasmin_k=2,
        mse_full_path=True, use_distillation=True, donate=False)

    s0 = jax.tree_util.tree_map(np.asarray, state.params)
    state, metrics = step(state, tp, batch, jax.random.PRNGKey(2),
                          supervise=False)
    for key in ("loss", "mse_loss", "kl_loss", "jasmin_loss",
                "supervision_loss", "acc", "mse_loss_t@0", "mse_loss_t@11"):
        assert key in metrics, key
        assert np.isfinite(float(metrics[key])), key
    assert float(metrics["nonfinite"]) == 0.0
    assert float(metrics["kl_nonfinite"]) == 0.0
    s1 = jax.tree_util.tree_map(np.asarray, state.params)
    np.testing.assert_array_equal(s1["head"]["kernel"], s0["head"]["kernel"])
    # supervised variant (second static specialization)
    state, m2 = step(state, tp, batch, jax.random.PRNGKey(3), supervise=True)
    assert float(m2["loss"]) > 0


def test_one_sample_loss_step(distill_setup):
    student, teacher, sp, tp, batch = distill_setup
    tx = make_optimizer(1e-3, trainable_mask=all_trainable(sp))
    state = create_train_state(sp, tx)
    step = make_one_sample_loss_step(
        student, teacher, tx, lambda_param=0.6, mse_full_path=False,
        use_mse_loss=True, use_distillation=False, use_supervision=True,
        donate=False)
    state, metrics = step(state, tp, batch, jax.random.PRNGKey(0))
    for key in ("loss", "mse_loss", "student_target_loss", "jasmin_loss"):
        assert np.isfinite(float(metrics[key])), key


def test_eval_step(distill_setup):
    student, _, sp, _, batch = distill_setup
    ev = make_eval_step(student)
    metrics = ev(sp, batch)
    for key in ("loss", "acc@1", "acc@3", "acc@5"):
        assert np.isfinite(float(metrics[key])), key
    assert 0.0 <= float(metrics["acc@1"]) <= float(metrics["acc@3"]) \
        <= float(metrics["acc@5"]) <= 1.0


def test_gradient_accumulation():
    m = tiny_student()
    batch = fixed_batch()
    v = m.init(jax.random.PRNGKey(0), batch["pixel_values"])
    tx = make_optimizer(1e-3, trainable_mask=all_trainable(v["params"]),
                        accumulate_steps=4)
    state = create_train_state(v["params"], tx)
    step = make_free_train_step(m, tx, jasmin_k=2, donate=False)
    p0 = np.asarray(state.params["head"]["kernel"])
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(1))
        np.testing.assert_array_equal(
            np.asarray(state.params["head"]["kernel"]), p0,
            err_msg=f"params moved during accumulation at micro-step {i}")
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(state.params["head"]["kernel"]), p0)


def test_eval_step_fast_path_matches_flax():
    from odevit_tpu.train.steps import make_eval_step
    m = tiny_student()
    batch = fixed_batch()
    v = m.init(jax.random.PRNGKey(0), batch["pixel_values"])
    slow = make_eval_step(m)(v["params"], batch)
    fast = make_eval_step(m, use_fast_path=True)(v["params"], batch)
    for k in ("loss", "acc@1", "acc@3", "acc@5"):
        np.testing.assert_allclose(float(fast[k]), float(slow[k]),
                                   rtol=5e-3, atol=1e-3, err_msg=k)


def test_preprocess_resize_inside_step():
    """uint8 batch at native res, model at a larger res: the in-step
    device-side resize path."""
    from odevit_tpu.data.pipeline import make_preprocess
    m = ViTODE(img_size=32, patch_size=8, embed_dim=24, num_heads=2,
               mlp_ratio=2.0, num_classes=5, num_eval_steps=4,
               solver="euler", register_tokens=0)
    pre = make_preprocess(image_size=32)
    rng = np.random.default_rng(0)
    batch = {"pixel_values": jnp.asarray(rng.integers(
                 0, 256, (4, 16, 16, 3)).astype(np.uint8)),
             "labels": jnp.asarray(rng.integers(0, 5, 4))}
    v = m.init(jax.random.PRNGKey(0), pre(batch["pixel_values"]))
    tx = make_optimizer(1e-3, trainable_mask=all_trainable(v["params"]))
    state = create_train_state(v["params"], tx)
    step = make_free_train_step(m, tx, jasmin_k=2, preprocess_fn=pre,
                                donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_recover_roundtrip_with_distill_state(tmp_path):
    """recover_training path: save a distill state, restore into a fresh
    one, training resumes from the restored step."""
    from odevit_tpu.ckpt.checkpoint import CheckpointManager
    m = tiny_student()
    batch = fixed_batch()
    v = m.init(jax.random.PRNGKey(0), batch["pixel_values"])
    mask = freeze_paths(v["params"], GRAFT_FROZEN_PATHS)
    tx = make_optimizer(1e-3, trainable_mask=mask)
    state = create_train_state(v["params"], tx)
    step = make_free_train_step(m, tx, jasmin_k=2, donate=False)
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    cm = CheckpointManager(str(tmp_path), "resume")
    assert cm.save(state, metric=0.5)
    fresh = create_train_state(v["params"], tx)
    restored, meta = cm.restore(fresh)
    assert int(restored.step) == 3 and meta["best_metric"] == 0.5
    restored, metrics = step(restored, batch, jax.random.PRNGKey(9))
    assert int(restored.step) == 4
    assert np.isfinite(float(metrics["loss"]))


def test_recover_resumes_at_checkpoint_epoch(tmp_path):
    """A recovered run must resume the epoch loop where the checkpoint
    left off (epoch = step // steps_per_epoch + 1), not replay from 1 —
    otherwise the curriculum unfreeze and LR schedule would be mistimed
    after a VM restart."""
    from odevit_tpu.ckpt.checkpoint import CheckpointManager
    m = tiny_student()
    batch = fixed_batch()
    v = m.init(jax.random.PRNGKey(0), batch["pixel_values"])
    tx = make_optimizer(1e-3, trainable_mask=all_trainable(v["params"]))
    state = create_train_state(v["params"], tx)
    step = make_free_train_step(m, tx, jasmin_k=2, donate=False)
    steps_per_epoch = 4
    for i in range(2 * steps_per_epoch):          # two complete epochs
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    cm = CheckpointManager(str(tmp_path), "resume_epoch")
    assert cm.save(state, metric=0.1)
    fresh = create_train_state(v["params"], tx)
    restored, _ = cm.restore(fresh)
    start_epoch = int(jax.device_get(restored.step)) \
        // max(1, steps_per_epoch) + 1
    assert start_epoch == 3
