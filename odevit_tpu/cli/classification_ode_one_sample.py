"""One-sample overfit harness (parity:
/root/reference/main_classification_ode_distillation_one_sample.py +
train.py:111-182): overfit a single fixed batch with the combined loss,
printing stability bounds every epoch, eval every 100 epochs. This is the
reference's de-facto integration test for the distillation machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from odevit_tpu.cli import common
from odevit_tpu.cli.classification_ode_distillation import \
    build_teacher_and_student
from odevit_tpu.data.pipeline import make_preprocess
from odevit_tpu.losses.bounds import finite_difference_upper_bound
from odevit_tpu.models.vit_ode import analytic_bound_from_variables
from odevit_tpu.train.loops import evaluate
from odevit_tpu.teacher.convert import GRAFT_FROZEN_PATHS
from odevit_tpu.train.schedules import cosine_hard_restarts_with_warmup
from odevit_tpu.train.state import (create_train_state, freeze_paths,
                                    make_optimizer)
from odevit_tpu.train.steps import make_eval_step, make_one_sample_loss_step


def main(cfg):
    logger = common.make_logger(cfg)
    mesh, bshard = common.setup_mesh_and_sharding()
    train_data, val_data, num_classes = common.build_datasets(cfg)
    train_loader, val_loader = common.build_loaders(cfg, train_data,
                                                    val_data, bshard)

    img_size = int(cfg.modeling.student.inputs.img_size)
    preprocess = make_preprocess(image_size=img_size)
    batch = next(iter(train_loader))      # the one fixed batch
    sample_pixels = preprocess(jnp.asarray(batch["pixel_values"][:2]))
    student, teacher, params, teacher_params = build_teacher_and_student(
        cfg, num_classes, sample_pixels)
    params = common.replicate(params, mesh)
    teacher_params = common.replicate(teacher_params, mesh)

    sd = cfg.setup.dict
    epochs = int(sd.epochs)
    sched = cosine_hard_restarts_with_warmup(1e-4, int(0.05 * epochs),
                                             epochs, max(1, epochs // 100))
    # The one-sample variant freezes the grafted patch-proj/CLS/head AND
    # the pos-embed (main_classification_ode_distillation_one_sample.py:
    # 73-89) — unlike the full distillation run, where pos-embed stays
    # trainable.
    frozen = GRAFT_FROZEN_PATHS + (("patch_embed", "pos_embed"),)
    tx = make_optimizer(sched, weight_decay=5e-2, clip_norm=1.0,
                        trainable_mask=freeze_paths(params, frozen))
    state = create_train_state(params, tx)

    step = make_one_sample_loss_step(
        student, teacher, tx,
        lambda_param=float(sd.lambda_param),
        temperature=float(sd.get("temperature", 4.0)),
        jasmin_k=int(sd.get("jasmin_k", 1)),
        mse_full_path=bool(sd.get("mse_full_path", False)),
        use_mse_loss=bool(sd.get("use_mse_loss", True)),
        use_distillation=bool(sd.get("use_distillation", False)),
        use_supervision=bool(sd.get("use_supervision", True)),
        preprocess_fn=preprocess)
    eval_step = make_eval_step(student, preprocess_fn=preprocess)

    states_fn = jax.jit(lambda p, px: student.apply(
        {"params": p}, preprocess(px), output_hidden_states=True)["states"])

    rng = jax.random.PRNGKey(0)
    for epoch in range(1, epochs):
        state, metrics = step(state, teacher_params, batch,
                              jax.random.fold_in(rng, epoch))
        loss = float(metrics["loss"])
        acc = float(metrics["acc"])
        print(f"Epoch {epoch}: Loss {loss:.4f}, Accuracy {acc:.4f}")
        ab = analytic_bound_from_variables(
            {"params": state.params}, embed_dim=student.embed_dim,
            num_eval_steps=student.num_eval_steps,
            l2_attention=student.l2_attention,
            R=int(sd.get("jasmin_k", 1)))
        print(f"Upper bound: {float(ab):.8f}")
        fd = finite_difference_upper_bound(
            states_fn(state.params, batch["pixel_values"]), 0.5,
            1.0 / student.num_eval_steps)
        print("Finite Difference Upper Bound global_upper_bound: "
              f"{float(fd['global_upper_bound']):.8f}")
        if logger:
            logger.log({f"train/{k}": v for k, v in metrics.items()})
        if epoch % 100 == 0:
            evaluate(val_loader, state.params, eval_step, logger=logger)
    if logger:
        logger.finish()
    return state


if __name__ == "__main__":
    main(common.load_config(common.parse_args()))
