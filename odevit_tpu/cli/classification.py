"""Baseline/teacher fine-tuning entry (parity:
/root/reference/main_classification.py, minus its stray exit() at :144):
fine-tune a ViT-B/16 classifier (head-only or full) to produce teacher
checkpoints for the distillation recipes. AdamW(1e-5, wd 1e-4) + cosine
warmup; saves best-accuracy checkpoints in our orbax layout (consumable by
``load_teacher``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from odevit_tpu.ckpt.checkpoint import CheckpointManager
from odevit_tpu.cli import common
from odevit_tpu.data.pipeline import make_preprocess
from odevit_tpu.losses.classification import cross_entropy, topk_accuracies
from odevit_tpu.train.loops import evaluate, train_epoch
from odevit_tpu.train.schedules import cosine_with_warmup
from odevit_tpu.train.state import (all_trainable, create_train_state,
                                    freeze_paths, make_optimizer)
from odevit_tpu.utils.init_utils import init_on_cpu


def main(cfg):
    logger = common.make_logger(cfg)
    mesh, bshard = common.setup_mesh_and_sharding()
    train_data, val_data, num_classes = common.build_datasets(cfg)
    train_loader, val_loader = common.build_loaders(cfg, train_data,
                                                    val_data, bshard)

    from odevit_tpu.teacher.vit import ViTTeacher
    teacher, params = common.load_teacher("", num_classes)
    model = teacher or ViTTeacher.dino_b16(num_classes=num_classes)
    preprocess = make_preprocess(image_size=model.image_size)
    sample = next(iter(train_loader))
    pixels = preprocess(jnp.asarray(sample["pixel_values"][:2]))
    init_params = init_on_cpu(model, jax.random.PRNGKey(0), pixels)["params"]
    if params is not None:
        # pretrained backbone + fresh classifier of the right width
        params = dict(params)
        params["classifier"] = init_params["classifier"]
    else:
        print("[teacher] training from random init (no pretrained backbone)")
        params = init_params
    params = common.replicate(params, mesh)

    classifier_only = bool(cfg.setup.dict.get("classifier_only", False))
    if classifier_only:
        mask = jax.tree_util.tree_map(lambda _: False, params)
        mask = dict(mask)
        mask["classifier"] = jax.tree_util.tree_map(lambda _: True,
                                                    params["classifier"])
    else:
        mask = all_trainable(params)

    epochs = int(cfg.setup.dict.epochs)
    total = epochs * len(train_loader)
    # additive key: the reference hardcodes 1e-5 (right for fine-tuning a
    # pretrained backbone); training from random init — the only option
    # in a zero-egress image — needs a real lr
    lr = float(cfg.setup.dict.get("lr", 1e-5))
    sched = cosine_with_warmup(lr, int(0.1 * total), total)
    tx = make_optimizer(sched, weight_decay=1e-4, clip_norm=1.0,
                        trainable_mask=mask)
    state = create_train_state(params, tx)

    def step(state, batch, rng):
        px = preprocess(batch["pixel_values"])

        def loss_fn(p):
            logits = model.apply({"params": p}, px,
                                 output_hidden_states=False,
                                 output_attentions=False)["logits"]
            return cross_entropy(logits, batch["labels"]), logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, tx)
        acc = jnp.mean((jnp.argmax(logits, -1) == batch["labels"])
                       .astype(jnp.float32))
        return new_state, {"loss": loss, "acc": acc, "lr": sched(state.step)}

    step = jax.jit(step)

    def eval_step(p, batch):
        px = preprocess(batch["pixel_values"])
        logits = model.apply({"params": p}, px, output_hidden_states=False,
                             output_attentions=False)["logits"]
        return {"loss": cross_entropy(logits, batch["labels"]),
                **topk_accuracies(logits, batch["labels"])}

    eval_step = jax.jit(eval_step)

    ckpt = CheckpointManager(cfg.get("checkpoint_dir", "checkpoints"),
                             str(cfg.modeling.get("checkpoint_name",
                                                  "teacher")))
    rng = jax.random.PRNGKey(0)
    for epoch in range(1, epochs):
        state, tm = train_epoch(train_loader, state, step, rng, epoch=epoch,
                                logger=logger,
                                log_every=int(cfg.setup.dict.get(
                                    "log_every", 100)))
        print(f"Loss Epoch: {epoch} Value: {tm['loss']:.4f}")
        val = evaluate(val_loader, state.params, eval_step, logger=logger)
        if ckpt.save(state, metric=val["acc@1"]):
            print(f"Model Updated: val acc {val['acc@1']:.4f}")
    ckpt.wait()   # drain the async save before process exit
    print("End of training")
    if logger:
        logger.finish()
    return state


if __name__ == "__main__":
    main(common.load_config(common.parse_args()))
