"""Shared CLI plumbing: argparse surface, dataset/loader/model/teacher
construction from the reference's YAML key paths."""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

import numpy as np
import jax

from odevit_tpu.config.loader import ConfigNode, compose, initialize
from odevit_tpu.data.cifar import load_dataset
from odevit_tpu.data.imagefolder import ImageFolder
from odevit_tpu.data.pipeline import (ArrayLoader, make_preprocess,
                                      synthetic_dataset)
from odevit_tpu.models.macaron import ViTMacaron
from odevit_tpu.models.vit_ode import ViTODE
from odevit_tpu.parallel.mesh import batch_sharding, make_mesh
from odevit_tpu.utils.logging import MetricLogger

NUM_CLASSES = {"cifar10": 10, "cifar100": 100, "synthetic": 10}


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config_file", required=True,
                        help="Yaml config file name (without extension)")
    parser.add_argument("-cp", "--config_path", required=True,
                        help="path where the yaml configs are stored")
    parser.add_argument("-o", "--override", action="append", default=[],
                        help="dotted config overrides, e.g. setup.dict.epochs=2")
    return parser.parse_args(argv)


def load_config(args) -> ConfigNode:
    # every entry point gets the persistent XLA compile cache: recovered
    # runs and config re-runs skip straight past the (minutes-long,
    # remote) TPU compiles
    from odevit_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    with initialize(version_base="1.3.2", config_path=args.config_path):
        cfg = compose(config_name=args.config_file,
                      overrides=args.override)
    # TPU-native replacement for the reference's manual NaN guards
    # (loss_trainer.py:360-362): flip on JAX's NaN checker from config.
    if cfg.get("debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    return cfg


def make_logger(cfg) -> Optional[MetricLogger]:
    wandb_cfg = cfg.select("setup.wandb", ConfigNode())
    config = dict(cfg.select("setup.dict", ConfigNode()))
    return MetricLogger(project=wandb_cfg.get("project", "odevit"),
                        group=wandb_cfg.get("group", ""),
                        name=wandb_cfg.get("name", None),
                        config=config,
                        use_wandb=bool(cfg.get("log_wandb", False)))


def build_datasets(cfg) -> Tuple[tuple, tuple, int]:
    """Returns ((train_imgs, train_labels)|folder, (val...), num_classes).

    Dataset names: cifar10 / cifar100 / synthetic / anything else ->
    ImageFolder at <path>/train, <path>/val (the reference's branching,
    main_classification_ode.py:69-85). Falls back to synthetic data with a
    loud warning when the path is absent, so every entry point runs
    anywhere.
    """
    name = cfg.data.dataset.name
    path = cfg.data.dataset.get("dataset_path", "")
    if name in ("cifar10", "cifar100"):
        try:
            train = load_dataset(name, path, train=True)
            val = load_dataset(name, path, train=False)
            return train, val, NUM_CLASSES[name]
        except (FileNotFoundError, OSError) as e:
            print(f"[data] {name} not found at {path!r} ({e}); "
                  f"falling back to synthetic data")
            name = "synthetic"
    if name == "synthetic":
        n_cls = int(cfg.data.dataset.get("num_classes",
                                         NUM_CLASSES["synthetic"]))
        img = int(cfg.data.dataset.get("image_size", 32))
        # `jitter: N` places each sample's class template at a random
        # cyclic offset (translation-invariant class signal) — the
        # variant where crop/flip augmentation is label-preserving
        jit = int(cfg.data.dataset.get("jitter", 0))
        train = synthetic_dataset(int(cfg.data.dataset.get("train_size", 512)),
                                  img, n_cls, seed=0, jitter=jit)
        val = synthetic_dataset(int(cfg.data.dataset.get("val_size", 256)),
                                img, n_cls, seed=1, jitter=jit)
        return train, val, n_cls
    train = ImageFolder(os.path.join(path, "train"))
    val = ImageFolder(os.path.join(path, "val"))
    return (train, None), (val, None), train.num_classes


def build_loaders(cfg, train_data, val_data, sharding=None,
                  with_indices=False):
    tr_kw = dict(cfg.data.collator.train)
    va_kw = dict(cfg.data.collator.get("val", ConfigNode(batch_size=256)))
    # `data.dataset.augment: true` turns on the native batcher's pad-4
    # random-crop + horizontal-flip augmentation (train split only;
    # C++/numpy paths are seeded-parity-tested, tests/test_native.py)
    augment = bool(cfg.data.dataset.get("augment", False))
    aug_pad = int(cfg.data.dataset.get("augment_pad", 4))

    def mk(data, kw, seed, augment=False, with_indices=False):
        images, labels = data
        return ArrayLoader(
            images, labels,
            batch_size=int(kw.get("batch_size", 64)),
            shuffle=bool(kw.get("shuffle", True)),
            drop_last=True,   # static shapes on TPU
            seed=seed, sharding=sharding,
            augment=augment, augment_pad=aug_pad,
            with_indices=with_indices)

    return (mk(train_data, tr_kw, 0, augment=augment,
               with_indices=with_indices),
            mk(val_data, va_kw, 1))


def build_student(cfg_inputs, model_type: str = "vit"):
    inputs = dict(cfg_inputs)
    inputs["emulate_depth"] = float(inputs.get("emulate_depth", 12.0))
    # additive key (docs/MIGRATING.md): `inputs.dtype: bfloat16|float32`
    # selects the compute dtype. The reference trains f32 (the default
    # here too); bf16 is the idiomatic TPU training dtype — params stay
    # f32, activations/matmuls run bf16, and the kernel dispatch picks
    # the larger bf16 tiles (see auto_block_b's itemsize scaling).
    if isinstance(inputs.get("dtype"), str):
        import jax.numpy as jnp
        inputs["dtype"] = {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
                           "float32": None, "f32": None}[inputs["dtype"]]
    if model_type == "macaron":
        return ViTMacaron(**inputs)
    return ViTODE(**inputs)


def setup_mesh_and_sharding():
    mesh = make_mesh(num_data=len(jax.devices()), num_model=1)
    return mesh, batch_sharding(mesh)


def fused_mesh_gate(mesh):
    """(ok, dp_mesh) for the fused Pallas train steps on this mesh.

    Pallas custom calls cannot be auto-partitioned by GSPMD, so the fused
    steps run either single-device (plain jit) or through their shard_map
    DP wrappers on a data-only mesh. Any mesh with model>1 must keep the
    flax/GSPMD path: ok=False. dp_mesh is None on a single device (plain
    jit), else the mesh to hand the fused step's ``mesh=``."""
    n_dev = int(np.prod(list(mesh.shape.values())))
    if n_dev == 1:
        return True, None
    if mesh.shape.get("model", 1) == 1:
        return True, mesh
    return False, None


def replicate(tree, mesh):
    """Replicate a pytree over the mesh (params/teacher live everywhere;
    batches are the only sharded inputs)."""
    from odevit_tpu.parallel.mesh import replicated
    return jax.device_put(tree, replicated(mesh))


def load_teacher(checkpoint_path: str, num_classes: int,
                 hf_name: str = "facebook/dino-vitb16"):
    """Teacher params: reference .pt / HF directory / HF hub cache; returns
    (ViTTeacher module, params) or (None, None) when nothing is available
    (free training proceeds without the cls graft, with a warning)."""
    from odevit_tpu.teacher.vit import ViTTeacher
    from odevit_tpu.teacher.convert import load_teacher_params

    teacher = ViTTeacher.dino_b16(num_classes=num_classes)
    if checkpoint_path and os.path.exists(checkpoint_path):
        return teacher, load_teacher_params(checkpoint_path)
    try:
        from transformers import ViTForImageClassification
        hf = ViTForImageClassification.from_pretrained(
            hf_name, num_labels=num_classes, local_files_only=True)
        from odevit_tpu.teacher.convert import torch_vit_to_flax
        return teacher, torch_vit_to_flax(hf.state_dict())
    except Exception as e:
        print(f"[teacher] no teacher weights available "
              f"({checkpoint_path!r} missing, HF cache: {e})")
        return None, None


def preprocess_for(img_size: int, native: Optional[int] = None):
    """Resize only when the model resolution differs from the data's."""
    return make_preprocess(image_size=img_size)
