"""End-to-end CLI tests: every entry point runs its main() on tiny
synthetic configs (CPU), exercising config loading, data fallback, model
build, train loop, eval, and checkpointing."""

import os

import pytest

from odevit_tpu.cli import common

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs", "classification")


def make_args(config, overrides):
    import argparse
    return argparse.Namespace(config_file=config, config_path=CONFIG_DIR,
                              override=overrides)


TINY = [
    "setup.dict.epochs=2",
    "setup.dict.log_every=2",
    "data.dataset.train_size=64",
    "data.dataset.val_size=32",
    "data.collator.train.batch_size=16",
    "data.collator.val.batch_size=16",
]
TINY_MODEL_FREE = [
    "modeling.inputs.embed_dim=32",
    "modeling.inputs.num_heads=2",
    "modeling.inputs.num_eval_steps=4",
    "modeling.inputs.register_tokens=2",
]
TINY_MODEL_STUDENT = [
    "modeling.student.inputs.embed_dim=32",
    "modeling.student.inputs.num_heads=2",
    "modeling.student.inputs.num_eval_steps=6",
    "modeling.student.inputs.register_tokens=2",
]


def test_free_training_main(tmp_path):
    from odevit_tpu.cli.classification_ode import main
    cfg = common.load_config(make_args(
        "smoke_free", TINY + TINY_MODEL_FREE
        + [f"checkpoint_dir={tmp_path}"]))
    state = main(cfg)
    assert int(state.step) == 4          # range(1,2) -> 1 epoch x 4 batches
    assert os.path.exists(tmp_path / "smoke_free" / "meta.json")


def test_free_training_macaron(tmp_path):
    from odevit_tpu.cli.classification_ode import main
    cfg = common.load_config(make_args(
        "smoke_free", TINY + [
            "modeling.type=macaron",
            "modeling.inputs.embed_dim=32",
            "modeling.inputs.num_heads=2",
            "modeling.inputs.num_eval_steps=4",
            f"checkpoint_dir={tmp_path}"]))
    # macaron config surface: drop the vit-only keys
    inputs = dict(cfg.modeling.inputs)
    for k in ("register_tokens", "pos_embed_register_tokens",
              "l2_attention"):
        inputs.pop(k, None)
    cfg.modeling.inputs = type(cfg.modeling.inputs)(inputs)
    state = main(cfg)
    assert int(state.step) > 0


def test_distillation_main(tmp_path):
    from odevit_tpu.cli.classification_ode_distillation import main
    cfg = common.load_config(make_args(
        "smoke_distill", TINY + TINY_MODEL_STUDENT
        + [f"checkpoint_dir={tmp_path}"]))
    state = main(cfg)
    assert int(state.step) > 0
    assert os.path.exists(tmp_path / "smoke_distill" / "meta.json")


def test_one_sample_main(tmp_path):
    from odevit_tpu.cli.classification_ode_one_sample import main
    cfg = common.load_config(make_args(
        "smoke_distill", TINY + TINY_MODEL_STUDENT
        + ["setup.dict.epochs=3", f"checkpoint_dir={tmp_path}"]))
    state = main(cfg)
    assert int(state.step) == 2


def test_config_override_surface():
    cfg = common.load_config(make_args(
        "experiment_classification_edo_distillation", []))
    # the reference's exact key paths resolve
    assert cfg.setup.dict.lambda_param == 0.5
    assert cfg.modeling.student.inputs.num_eval_steps == 36
    assert cfg.data.collator.train.batch_size == 64
    assert cfg.finetunne.recover_training is False


def test_build_student_dtype_coercion():
    """Additive `inputs.dtype` key: string names map to jnp dtypes
    (bfloat16) or None (float32 = flax inherit-input default)."""
    import jax.numpy as jnp
    from odevit_tpu.cli.common import build_student

    base = dict(img_size=32, patch_size=4, embed_dim=64, num_heads=2,
                num_classes=10)
    assert build_student(dict(base, dtype="bfloat16")).dtype == jnp.bfloat16
    assert build_student(dict(base, dtype="bf16")).dtype == jnp.bfloat16
    assert build_student(dict(base, dtype="float32")).dtype is None
    assert build_student(base).dtype is None
