"""Infra tests: config loader, metric logging, data pipeline, checkpoint."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from odevit_tpu.config.loader import initialize, compose, ConfigNode
from odevit_tpu.utils.logging import MetricLogger
from odevit_tpu.data.cifar import load_cifar10, load_cifar100
from odevit_tpu.data.imagefolder import ImageFolder
from odevit_tpu.data.pipeline import (ArrayLoader, make_preprocess,
                                      synthetic_dataset)


def test_config_loader(tmp_path):
    (tmp_path / "exp.yaml").write_text(
        "setup:\n  dict:\n    epochs: 300\n    lambda_param: 0.5\n"
        "modeling:\n  student:\n    inputs:\n      embed_dim: 768\n"
        "      solver: euler\n")
    with initialize(config_path=str(tmp_path), version_base="1.3.2"):
        cfg = compose(config_name="exp")
    assert cfg.setup.dict.epochs == 300
    assert cfg.modeling.student.inputs.embed_dim == 768
    assert dict(**cfg.modeling.student.inputs)["solver"] == "euler"
    assert cfg.select("setup.dict.lambda_param") == 0.5
    assert cfg.select("missing.key", 7) == 7

    with initialize(config_path=str(tmp_path)):
        cfg2 = compose("exp", overrides=["setup.dict.epochs=5",
                                         "data.name=cifar10"])
    assert cfg2.setup.dict.epochs == 5
    assert cfg2.data.name == "cifar10"

    with initialize(config_path=str(tmp_path)):
        with pytest.raises(FileNotFoundError):
            compose("nope")


def test_metric_logger(tmp_path):
    logger = MetricLogger(name="t", config={"a": 1}, root=str(tmp_path))
    logger.log({"loss": jnp.float32(1.5), "acc": 0.25})
    logger.log({"loss": 1.0}, step=10)
    logger.finish()
    lines = [json.loads(l) for l in
             open(tmp_path / "t" / "metrics.jsonl")]
    assert lines[0]["loss"] == 1.5 and lines[0]["_step"] == 0
    assert lines[1]["_step"] == 10
    assert json.load(open(tmp_path / "t" / "config.json")) == {"a": 1}


def _write_cifar10(root):
    import pickle
    base = root / "cifar-10-batches-py"
    base.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(1, 6):
        data = {"data": rng.integers(0, 256, (20, 3072), dtype=np.uint8),
                "labels": list(rng.integers(0, 10, 20))}
        (base / f"data_batch_{i}").write_bytes(pickle.dumps(data))
    (base / "test_batch").write_bytes(pickle.dumps(
        {"data": rng.integers(0, 256, (10, 3072), dtype=np.uint8),
         "labels": list(rng.integers(0, 10, 10))}))


def test_cifar_reader(tmp_path):
    _write_cifar10(tmp_path)
    x, y = load_cifar10(str(tmp_path), train=True)
    assert x.shape == (100, 32, 32, 3) and x.dtype == np.uint8
    assert y.shape == (100,)
    xt, yt = load_cifar10(str(tmp_path), train=False)
    assert xt.shape == (10, 32, 32, 3)


def test_imagefolder(tmp_path):
    from PIL import Image
    for cls in ("cat", "dog"):
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(3):
            Image.new("RGB", (40, 30), color=(i * 40, 10, 10)).save(
                d / f"{i}.png")
    ds = ImageFolder(str(tmp_path / "train"), image_size=16)
    assert len(ds) == 6 and ds.num_classes == 2
    assert ds.class_to_idx == {"cat": 0, "dog": 1}
    img = ds.decode(0)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    batch = ds.gather([0, 3, 5])
    assert batch.shape == (3, 16, 16, 3)


def test_array_loader():
    imgs, labels = synthetic_dataset(50, image_size=8, num_classes=3)
    loader = ArrayLoader(imgs, labels, batch_size=16, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3          # drop_last
    assert batches[0]["pixel_values"].shape == (16, 8, 8, 3)
    # epochs shuffle differently, same loader reproducible by seed
    l2 = ArrayLoader(imgs, labels, batch_size=16, shuffle=True, seed=1)
    b2 = list(l2)
    np.testing.assert_array_equal(np.asarray(batches[0]["labels"]),
                                  np.asarray(b2[0]["labels"]))
    second_epoch = list(l2)
    assert not np.array_equal(np.asarray(second_epoch[0]["labels"]),
                              np.asarray(b2[0]["labels"]))


def test_synthetic_jitter_variant():
    """Jittered synthetic data: class signal survives translation+flip
    (the property that makes crop/flip augmentation label-preserving,
    VERDICT r3 item 6) and stays deterministic by seed."""
    imgs, labels = synthetic_dataset(40, image_size=16, num_classes=4,
                                     seed=3, jitter=5, signal=1.0)
    imgs2, labels2 = synthetic_dataset(40, image_size=16, num_classes=4,
                                       seed=3, jitter=5, signal=1.0)
    np.testing.assert_array_equal(imgs, imgs2)
    np.testing.assert_array_equal(labels, labels2)
    assert imgs.dtype == np.uint8 and imgs.shape == (40, 16, 16, 3)

    # signal=1.0 -> pure shifted template; a horizontal flip of any
    # sample equals the template at the mirrored offset, i.e. another
    # VALID sample of the same class (mirror-symmetric template)
    a, b = synthetic_dataset(200, image_size=16, num_classes=2, seed=0,
                             jitter=3, signal=1.0)
    first = a[0]
    flipped = first[:, ::-1]
    # the flipped image must re-occur (up to cyclic shift) as the same
    # class's template: check by minimizing over all cyclic shifts
    diffs = [np.abs(np.roll(first, (dy, dx), axis=(0, 1)).astype(int)
                    - flipped.astype(int)).max()
             for dy in range(16) for dx in range(16)]
    assert min(diffs) <= 1          # uint8 rounding of the /2 symmetrize

    # different samples of one class are shifts of one another
    same = np.where(b == b[0])[0]
    if len(same) > 1:
        other = a[same[1]]
        diffs = [np.abs(np.roll(first, (dy, dx), axis=(0, 1)).astype(int)
                        - other.astype(int)).max()
                 for dy in range(16) for dx in range(16)]
        assert min(diffs) == 0

    # jitter=0 keeps the historical pinned behavior byte-identical
    p1, _ = synthetic_dataset(10, image_size=8, num_classes=3, seed=1)
    p2, _ = synthetic_dataset(10, image_size=8, num_classes=3, seed=1,
                              jitter=0)
    np.testing.assert_array_equal(p1, p2)


def test_preprocess_matches_hf_processor():
    """Device-side resize+normalize vs the HF DINO processor. Resampling
    kernels differ slightly (PIL vs XLA bilinear), so compare loosely but
    meaningfully."""
    from transformers import ViTImageProcessor
    proc = ViTImageProcessor(size={"height": 224, "width": 224},
                             image_mean=[0.485, 0.456, 0.406],
                             image_std=[0.229, 0.224, 0.225])
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    want = proc(img, return_tensors="np")["pixel_values"][0]  # [3,224,224]
    pre = make_preprocess(image_size=224)
    got = np.asarray(pre(jnp.asarray(img[None])))[0].transpose(2, 0, 1)
    assert got.shape == want.shape
    assert np.abs(got - want).mean() < 0.05, np.abs(got - want).mean()
    # native-res path: exact normalize, no resize
    pre32 = make_preprocess(image_size=None)
    got32 = np.asarray(pre32(jnp.asarray(img[None])))[0]
    want32 = (img.astype(np.float32) / 255.0
              - np.array([0.485, 0.456, 0.406])) / np.array(
                  [0.229, 0.224, 0.225])
    np.testing.assert_allclose(got32, want32, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    from odevit_tpu.ckpt.checkpoint import CheckpointManager
    from odevit_tpu.train.state import (all_trainable, create_train_state,
                                        make_optimizer)
    from odevit_tpu.models.vit_ode import ViTODE

    m = ViTODE(img_size=8, patch_size=4, embed_dim=16, num_heads=2,
               num_classes=3, num_eval_steps=3, solver="euler",
               register_tokens=0)
    x = jnp.ones((1, 8, 8, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    tx = make_optimizer(1e-3, trainable_mask=all_trainable(v["params"]))
    state = create_train_state(v["params"], tx)

    cm = CheckpointManager(str(tmp_path), "exp1")
    assert cm.save(state, metric=0.5, lr=1e-3)
    assert not cm.save(state, metric=0.4)           # worse -> not saved
    assert cm.save(state, metric=0.6)                # better -> saved
    assert cm.best_metric() == 0.6

    state2 = create_train_state(
        jax.tree_util.tree_map(jnp.zeros_like, v["params"]), tx)
    restored, meta = cm.restore(state2)
    np.testing.assert_array_equal(
        np.asarray(restored.params["head"]["kernel"]),
        np.asarray(state.params["head"]["kernel"]))
    assert meta["best_metric"] == 0.6

    # params-only partial restore (serving: caller's optimizer layout
    # need not match the saved opt state)
    p = cm.restore_params(
        jax.tree_util.tree_map(jnp.zeros_like, v["params"]))
    np.testing.assert_array_equal(
        np.asarray(p["head"]["kernel"]),
        np.asarray(state.params["head"]["kernel"]))


def test_reference_pt_import(tmp_path):
    """Round-trip: export our params under reference torch names, import
    through the converter, outputs must match exactly."""
    import torch
    from odevit_tpu.ckpt.checkpoint import load_reference_vitode_checkpoint
    from odevit_tpu.models.vit_ode import ViTODE

    m = ViTODE(img_size=8, patch_size=4, embed_dim=16, num_heads=2,
               num_classes=3, num_eval_steps=3, solver="euler",
               register_tokens=2)
    x = jnp.ones((2, 8, 8, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    p = jax.tree_util.tree_map(np.asarray, v["params"])

    pk = p["patch_embed"]["proj_kernel"]     # [C*p*p, D]
    conv = pk.T.reshape(16, 3, 4, 4)         # [D, C, p, p]
    sd = {
        "patch_embed.proj.weight": conv,
        "patch_embed.proj.bias": p["patch_embed"]["proj_bias"],
        "patch_embed.cls_token": p["patch_embed"]["cls_token"],
        "patch_embed.register_tokens": p["patch_embed"]["register_tokens"],
        "patch_embed.pos_embed": p["patch_embed"]["pos_embed"],
        "odefunc.block.norm_attn.weight": p["vf"]["norm_attn"]["scale"],
        "odefunc.block.norm_attn.bias": p["vf"]["norm_attn"]["bias"],
        "odefunc.block.norm_mlp.weight": p["vf"]["norm_mlp"]["scale"],
        "odefunc.block.norm_mlp.bias": p["vf"]["norm_mlp"]["bias"],
        "odefunc.block.attn.mha.in_proj_weight":
            p["vf"]["attn"]["qkv_kernel"].T,
        "odefunc.block.attn.mha.out_proj.weight":
            p["vf"]["attn"]["out_kernel"].T,
        "odefunc.block.mlp.fc1.weight": p["vf"]["mlp"]["fc1_kernel"].T,
        "odefunc.block.mlp.fc2.weight": p["vf"]["mlp"]["fc2_kernel"].T,
        "head.weight": p["head"]["kernel"].T,
        "head.bias": p["head"]["bias"],
    }
    path = str(tmp_path / "ref.pt")
    torch.save({"state_dict": {k: torch.tensor(np.asarray(val))
                               for k, val in sd.items()},
                "optimizer": {}, "lr_scheduler": 1e-4}, path)

    imported = load_reference_vitode_checkpoint(path, embed_dim=16)
    out0 = m.apply({"params": p}, x)["logits"]
    out1 = m.apply({"params": imported}, x)["logits"]
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               atol=1e-6)


def test_public_api_surface():
    """Every name in the top-level lazy API resolves to a real object,
    and the import itself is jax-free until an attribute is touched."""
    import odevit_tpu
    assert odevit_tpu.__version__
    for name in odevit_tpu.__all__:
        if name == "__version__":
            continue
        assert getattr(odevit_tpu, name) is not None, name
    import pytest
    with pytest.raises(AttributeError):
        odevit_tpu.not_a_real_export
