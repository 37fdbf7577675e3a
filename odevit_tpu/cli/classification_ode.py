"""Free ODE-ViT training entry (parity:
/root/reference/main_classification_ode.py).

CE(label smoothing 0.05, from the model) + JaSMin, AdamW(1e-4, wd 5e-2),
cosine-hard-restarts with 10% warmup and epochs//100 cycles, frozen DINO
CLS-token graft when teacher weights are available, per-epoch eval with
best-accuracy checkpointing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from odevit_tpu.ckpt.checkpoint import CheckpointManager
from odevit_tpu.cli import common
from odevit_tpu.data.pipeline import make_preprocess
from odevit_tpu.train.loops import evaluate, train_epoch
from odevit_tpu.train.schedules import cosine_hard_restarts_with_warmup
from odevit_tpu.train.state import (create_train_state, freeze_paths,
                                    all_trainable, make_optimizer)
from odevit_tpu.train.steps import make_eval_step, make_free_train_step
from odevit_tpu.utils.init_utils import init_on_cpu
from odevit_tpu.models.vit_ode import analytic_bound_from_variables


def main(cfg):
    logger = common.make_logger(cfg)
    mesh, bshard = common.setup_mesh_and_sharding()
    train_data, val_data, num_classes = common.build_datasets(cfg)
    train_loader, val_loader = common.build_loaders(cfg, train_data,
                                                    val_data, bshard)

    model_type = cfg.modeling.get("type", "vit")
    inputs = dict(cfg.modeling.inputs)
    inputs.setdefault("num_classes", num_classes)
    model = common.build_student(inputs, model_type)
    preprocess = make_preprocess(image_size=model.img_size)

    sample = next(iter(train_loader))
    variables = init_on_cpu(model, jax.random.PRNGKey(0),
                            preprocess(jnp.asarray(
                                sample["pixel_values"][:2])))
    params = common.replicate(variables["params"], mesh)

    frozen = []
    teacher, teacher_params = common.load_teacher(
        str(cfg.modeling.get("base", "")), num_classes)
    if teacher_params is not None and model_type == "vit" and \
            teacher_params["cls_token"].shape[-1] == model.embed_dim:
        # graft + freeze the DINO cls token (main_classification_ode.py:96-97)
        params = dict(params)
        pe = dict(params["patch_embed"])
        pe["cls_token"] = common.replicate(
            jnp.array(teacher_params["cls_token"]), mesh)
        params["patch_embed"] = pe
        frozen.append(("patch_embed", "cls_token"))
        print("[graft] frozen DINO cls token")

    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"Training Model with a total parameters of {n_params/1e6:.3f} "
          "Millions")
    if logger:
        logger.log({"model_parameters": n_params})

    epochs = int(cfg.setup.dict.epochs)
    steps_per_epoch = len(train_loader)
    total_steps = epochs * steps_per_epoch
    sched = cosine_hard_restarts_with_warmup(
        1e-4, int(0.1 * total_steps), total_steps,
        max(1, epochs // 100))
    accum = max(1, int(cfg.setup.dict.get("accumulation_steps", 1)))
    mask = freeze_paths(params, frozen) if frozen else all_trainable(params)
    tx = make_optimizer(sched, weight_decay=5e-2, clip_norm=1.0,
                        trainable_mask=mask, accumulate_steps=accum)
    state = create_train_state(params, tx)

    ckpt = CheckpointManager(cfg.get("checkpoint_dir", "checkpoints"),
                             str(cfg.modeling.get("checkpoint_name",
                                                  "vit_ode")))
    start_epoch = 1
    if cfg.get("infer_from_checkpoint", False) and ckpt.exists():
        state, meta = ckpt.restore(state)
        # resume at the epoch implied by the optimizer step counter so
        # the LR schedule position and epoch numbering stay consistent
        start_epoch = int(jax.device_get(state.step)) \
            // max(1, steps_per_epoch) + 1
        print(f"[ckpt] restored step {meta.get('step')} "
              f"best {meta.get('best_metric')} "
              f"-> resuming at epoch {start_epoch}")

    jasmin_k = int(cfg.setup.dict.get("jasmin",
                                      cfg.setup.dict.get("jasmin_k", 10)))
    # fused Pallas training path (1.93x the flax step on a v5e at CIFAR
    # shapes): auto-selected on TPU when the config qualifies;
    # `setup.dict.fused: true|false` overrides
    from odevit_tpu.train.fast_steps import (fused_free_qualifies,
                                             make_fast_free_train_step,
                                             make_fast_macaron_train_step)
    use_jasmin = model_type == "vit"
    fused_cfg = cfg.setup.dict.get("fused", "auto")
    # Pallas custom calls can't be auto-partitioned by GSPMD: fused steps
    # need a single device or a data-only mesh (shard_map DP wrapper);
    # any model>1 mesh keeps the flax/GSPMD path even when fused=True
    mesh_ok, dp_mesh = common.fused_mesh_gate(mesh)
    if bool(fused_cfg) and fused_cfg != "auto" and not mesh_ok:
        print("[train] fused=True requested but the mesh has model>1; "
              "Pallas steps cannot shard over 'model' — keeping the "
              "flax/GSPMD path")
    if model_type == "macaron":
        det = all(float(d) == 0.0 for d in
                  (model.attn_drop, model.proj_drop, model.mlp_drop))
        fused = (det and jax.default_backend() == "tpu"
                 if fused_cfg == "auto" else bool(fused_cfg)) and mesh_ok
        if fused:
            print("[train] fused Pallas macaron training step selected"
                  + (f" (DP x{dp_mesh.shape['data']})"
                     if dp_mesh is not None else ""))
            step_fn = make_fast_macaron_train_step(
                model, tx, lr_schedule=sched, preprocess_fn=preprocess,
                mesh=dp_mesh)
        else:
            step_fn = make_free_train_step(model, tx, jasmin_k=jasmin_k,
                                           use_jasmin=False,
                                           lr_schedule=sched,
                                           preprocess_fn=preprocess)
    else:
        if fused_cfg == "auto":
            fused = (fused_free_qualifies(model, use_jasmin=use_jasmin,
                                          jasmin_k=jasmin_k)
                     and jax.default_backend() == "tpu")
        else:
            fused = bool(fused_cfg)
        fused = fused and mesh_ok
        if fused:
            print("[train] fused Pallas training step selected"
                  + (f" (DP x{dp_mesh.shape['data']})"
                     if dp_mesh is not None else ""))
            step_fn = make_fast_free_train_step(
                model, tx, jasmin_k=jasmin_k, lr_schedule=sched,
                preprocess_fn=preprocess, mesh=dp_mesh)
        else:
            step_fn = make_free_train_step(model, tx, jasmin_k=jasmin_k,
                                           use_jasmin=use_jasmin,
                                           lr_schedule=sched,
                                           preprocess_fn=preprocess)
    eval_step = make_eval_step(model, preprocess_fn=preprocess)

    def bounds_fn(state):
        return {"second_derivative": analytic_bound_from_variables(
            {"params": state.params}, embed_dim=model.embed_dim,
            num_eval_steps=model.num_eval_steps,
            l2_attention=model.l2_attention, R=jasmin_k)}

    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    log_every = int(cfg.setup.dict.get("log_every", 100))
    bounds = bounds_fn if model_type == "vit" else None
    for epoch in range(start_epoch, epochs):
        state, train_metrics = train_epoch(
            train_loader, state, step_fn, rng, epoch=epoch, logger=logger,
            log_every=log_every, bounds_fn=bounds)
        print(f"Loss Epoch: {epoch} Value: {train_metrics['loss']:.4f} "
              f"({train_metrics['images_per_sec']:.0f} img/s)")
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
