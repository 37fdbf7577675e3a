"""Teacher-student trajectory distillation entry (parity:
/root/reference/main_classification_ode_distillation.py).

Grafts the frozen DINO teacher's patch projection / CLS / head into the
ViTODE student (pos-embed shared trainable), then trains with the fused
distillation criterion: full-path trajectory MSE on control points +
L1 attention distillation + JaSMin (+ CE after the curriculum epoch, when
the head also unfreezes). AdamW(1e-4, wd 5e-2), cosine hard restarts,
5% warmup, epochs//100 cycles, best-accuracy checkpointing each epoch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from odevit_tpu.ckpt.checkpoint import CheckpointManager
from odevit_tpu.cli import common
from odevit_tpu.data.pipeline import make_preprocess
from odevit_tpu.teacher.convert import (GRAFT_FROZEN_PATHS,
                                        graft_teacher_into_student)
from odevit_tpu.train.loops import evaluate, train_epoch
from odevit_tpu.train.schedules import cosine_hard_restarts_with_warmup
from odevit_tpu.train.state import (create_train_state, freeze_paths,
                                    make_optimizer)
from odevit_tpu.train.steps import (make_distill_train_step, make_eval_step)
from odevit_tpu.utils.init_utils import init_on_cpu

CURRICULUM_EPOCH = 200   # reference default (main_classification_ode_distillation.py:211-213); override with
#                          setup.dict.curriculum_epoch (additive key, for short evidence runs)


def build_teacher_and_student(cfg, num_classes, sample_pixels):
    """Student + teacher + grafted params + frozen-path list."""
    from odevit_tpu.teacher.vit import ViTTeacher

    student = common.build_student(
        dict(cfg.modeling.student.inputs, num_classes=num_classes), "vit")
    teacher, teacher_params = common.load_teacher(
        str(cfg.modeling.teacher.get("checkpoint_path", "")), num_classes)
    if teacher_params is None:
        print("[teacher] WARNING: using a randomly initialized teacher "
              "(no checkpoint / HF cache); distillation targets are noise")
        teacher = ViTTeacher(
            image_size=student.img_size, patch_size=student.patch_size,
            hidden_size=student.embed_dim, num_layers=12,
            num_heads=student.num_heads,
            mlp_dim=4 * student.embed_dim, num_classes=num_classes)
        teacher_params = init_on_cpu(
            teacher, jax.random.PRNGKey(7), sample_pixels)["params"]

    sv = init_on_cpu(student, jax.random.PRNGKey(0), sample_pixels)
    grafted = graft_teacher_into_student(
        sv["params"],
        {"patch_kernel": teacher_params["patch_kernel"],
         "cls_token": teacher_params["cls_token"],
         "position_embeddings": teacher_params["position_embeddings"],
         **({"classifier": teacher_params["classifier"]}
            if "classifier" in teacher_params else {})})
    print("Initializing student with teacher's patch embedding and head "
          "weights...")
    return student, teacher, grafted, teacher_params


def main(cfg):
    logger = common.make_logger(cfg)
    mesh, bshard = common.setup_mesh_and_sharding()
    train_data, val_data, num_classes = common.build_datasets(cfg)
    train_loader, val_loader = common.build_loaders(
        cfg, train_data, val_data, bshard,
        with_indices=bool(cfg.setup.dict.get("cache_teacher", False)))

    img_size = int(cfg.modeling.student.inputs.img_size)
    preprocess = make_preprocess(image_size=img_size)
    sample = next(iter(train_loader))
    sample_pixels = preprocess(jnp.asarray(sample["pixel_values"][:2]))

    student, teacher, params, teacher_params = build_teacher_and_student(
        cfg, num_classes, sample_pixels)
    params = common.replicate(params, mesh)
    teacher_params = common.replicate(teacher_params, mesh)

    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"Training Model with a total parameters of {n_params/1e6:.3f} "
          "Millions")

    sd = cfg.setup.dict
    epochs = int(sd.epochs)
    steps_per_epoch = len(train_loader)
    total_steps = epochs * steps_per_epoch
    sched = cosine_hard_restarts_with_warmup(
        1e-4, int(0.05 * total_steps), total_steps, max(1, epochs // 100))

    curriculum = bool(sd.get("curriculum", False))
    curriculum_epoch = int(sd.get("curriculum_epoch",
                                  CURRICULUM_EPOCH))
    mask_frozen = freeze_paths(params, GRAFT_FROZEN_PATHS)
    mask_open = freeze_paths(params, GRAFT_FROZEN_PATHS[:2])
    # head LR re-warmup (r3 evidence: the epoch-200 unfreeze dropped val
    # 0.998 -> 0.813 when the grafted head hit the full LR at once):
    # ramp the head's update scale 0 -> 1 over `head_rewarm_epochs`
    # starting at the unfreeze step. Identical transform in both phase
    # optimizers keeps the opt_state swap zero-cost.
    group_scale = None
    rewarm_epochs = int(sd.get("head_rewarm_epochs", 10))
    if curriculum and epochs > curriculum_epoch and rewarm_epochs > 0:
        unfreeze_step = (curriculum_epoch - 1) * steps_per_epoch
        rewarm_steps = max(1, rewarm_epochs * steps_per_epoch)

        def head_rewarm(count):
            return jnp.clip((count - unfreeze_step) / rewarm_steps,
                            0.0, 1.0)

        # head params = frozen under mask_frozen but trainable under
        # mask_open (exactly the curriculum-opened group)
        head_mask = jax.tree_util.tree_map(
            lambda open_t, frozen_t: open_t and not frozen_t,
            mask_open, mask_frozen)
        group_scale = (head_mask, head_rewarm)
    tx_frozen = make_optimizer(sched, weight_decay=5e-2, clip_norm=1.0,
                               trainable_mask=mask_frozen,
                               group_scale=group_scale)
    tx_open = make_optimizer(sched, weight_decay=5e-2, clip_norm=1.0,
                             trainable_mask=mask_open,
                             group_scale=group_scale)
    state = create_train_state(params, tx_frozen)

    ckpt = CheckpointManager(
        cfg.get("checkpoint_dir", "checkpoints"),
        str(cfg.modeling.student.get("checkpoint_name", "edo_distill")))
    start_epoch = 1
    if cfg.select("finetunne.recover_training", False):
        ref = str(cfg.finetunne.checkpoint)
        if ckpt.exists():
            state, meta = ckpt.restore(state)
            # resume where the checkpoint left off: the optimizer step
            # counter is the source of truth (the LR schedule and the
            # curriculum unfreeze both key off epochs-elapsed, so a
            # recovery must not replay them from epoch 1)
            start_epoch = int(jax.device_get(state.step)) \
                // max(1, steps_per_epoch) + 1
            print(f"Recovering training from checkpoint: step "
                  f"{meta.get('step')} -> resuming at epoch {start_epoch}")
        elif ref.endswith(".pt"):
            from odevit_tpu.ckpt.checkpoint import \
                load_reference_vitode_checkpoint
            imported = load_reference_vitode_checkpoint(
                ref, embed_dim=student.embed_dim,
                l2_attention=student.l2_attention)
            state = state.replace(params=jax.device_put(imported))
            print(f"Recovering training from reference checkpoint: {ref}")

    # fused Pallas distillation step (euler-grid students; 1.3-2.3x the
    # flax step on a v5e at TS-Base shapes): auto on TPU when the config
    # qualifies; `modeling.student.dict.fused: true|false` overrides
    from odevit_tpu.train.fast_steps import (fused_free_qualifies,
                                             make_fast_distill_train_step)
    fused_cfg = sd.get("fused", "auto")
    # Pallas steps: single device or data-only mesh (shard_map DP);
    # model>1 meshes keep the flax/GSPMD path
    mesh_ok, dp_mesh = common.fused_mesh_gate(mesh)
    fused = (fused_free_qualifies(student)
             and student.solver == "euler"
             and jax.default_backend() == "tpu"
             if fused_cfg == "auto" else bool(fused_cfg)) and mesh_ok
    if bool(fused_cfg) and fused_cfg != "auto" and not mesh_ok:
        print("[train] fused=True requested but the mesh has model>1; "
              "keeping the flax/GSPMD path")
    if fused:
        print("[train] fused Pallas distillation step selected"
              + (f" (DP x{dp_mesh.shape['data']})"
                 if dp_mesh is not None else ""))

    # frozen-teacher target cache (`setup.dict.cache_teacher: true`):
    # precompute the per-sample CLS trajectory + last-attention rows once
    # and delete the teacher forward from every step. Targets come from
    # clean images, so augmentation is refused unless "force"d (see
    # train/teacher_cache.py).
    ct_cfg = sd.get("cache_teacher", False)
    cache_teacher = bool(ct_cfg)
    if cache_teacher and bool(cfg.data.dataset.get("augment", False)) \
            and ct_cfg != "force":
        print("[teacher-cache] augmentation is on and cache_teacher is "
              "not 'force'; keeping the live teacher forward")
        cache_teacher = False
    teacher_pack = teacher_params
    if cache_teacher:
        imgs = getattr(train_loader, "images", None)
        if imgs is None:
            print("[teacher-cache] loader holds no in-memory images "
                  "(ImageFolder); keeping the live teacher forward")
            cache_teacher = False
        else:
            import time as _time
            from odevit_tpu.train.teacher_cache import (build_teacher_cache,
                                                        cache_nbytes)
            t0 = _time.perf_counter()
            teacher_pack = common.replicate(
                build_teacher_cache(
                    teacher, teacher_params, imgs, preprocess=preprocess,
                    batch_size=int(cfg.data.collator.get(
                        "val", {"batch_size": 256}).get("batch_size", 256))),
                mesh)
            print(f"[teacher-cache] {imgs.shape[0]} samples, "
                  f"{cache_nbytes(teacher_pack) / 2**20:.0f} MB in "
                  f"{_time.perf_counter() - t0:.1f}s")

    def make_step(tx):
        make = (make_fast_distill_train_step if fused
                else make_distill_train_step)
        kw = {"mesh": dp_mesh} if fused else {}
        return make(
            student, teacher, tx,
            lambda_param=float(sd.lambda_param),
            jasmin_k=int(sd.get("jasmin_k", 10)),
            mse_full_path=bool(sd.get("mse_full_path", True)),
            use_distillation=bool(sd.get("use_distillation", True)),
            use_kl_loss=bool(sd.get("use_kl_loss", False)),
            temperature=float(sd.get("temperature", 30.0)),
            lr_schedule=sched, preprocess_fn=preprocess,
            teacher_cache=cache_teacher, **kw)

    step_frozen = make_step(tx_frozen)
    step_open = make_step(tx_open)
    eval_step = make_eval_step(student, preprocess_fn=preprocess)

    use_supervision = bool(sd.get("use_supervision", True))
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    log_every = int(sd.get("log_every", 100))

    for epoch in range(start_epoch, epochs):
        head_open = curriculum and epoch >= curriculum_epoch
        step = step_open if head_open else step_frozen
        supervise = use_supervision and epoch > curriculum_epoch

        def step_fn(state, batch, rng, _step=step, _sup=supervise):
            return _step(state, teacher_pack, batch, rng, supervise=_sup)

        state, tm = train_epoch(train_loader, state, step_fn, rng,
                                epoch=epoch, logger=logger,
                                log_every=log_every)
        if tm.get("nonfinite", 0.0) > 0:
            raise ValueError("Loss is NaN or Inf!")
        print(f"Loss Epoch: {epoch} Value: {tm['loss']:.4f} "
              f"(mse {tm['mse_loss']:.4f}, jasmin {tm['jasmin_loss']:.4f}, "
              f"{tm['images_per_sec']:.0f} img/s)")
        val = evaluate(val_loader, state.params, eval_step, logger=logger)
        if ckpt.save(state, metric=val["acc@1"],
                     lr=float(sched(state.step))):
            print(f"Model Updated: val acc {val['acc@1']:.4f}")
    ckpt.wait()   # drain the async save before process exit
    print("End of training")
    if logger:
        logger.finish()
    return state


if __name__ == "__main__":
    main(common.load_config(common.parse_args()))
