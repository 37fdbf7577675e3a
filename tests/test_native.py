"""Native C++ batch assembler: build, correctness vs numpy fallback,
determinism, augmentation semantics."""

import numpy as np
import pytest

from odevit_tpu.data import native


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (50, 16, 16, 3), dtype=np.uint8)


def test_native_library_builds():
    lib = native.get_lib()
    # the image ships g++, so the native path must actually build here
    assert lib is not None, "native batcher failed to build"


def test_plain_gather_matches_numpy(dataset):
    idx = np.array([3, 1, 41, 7], np.int64)
    got = native.assemble_batch(dataset, idx)
    np.testing.assert_array_equal(got, dataset[idx])


def test_augmented_matches_numpy_fallback(dataset):
    idx = np.arange(8, dtype=np.int64)
    got = native.assemble_batch(dataset, idx, augment=True, seed=42)
    want = native._numpy_assemble(dataset, idx, True, 4, 42)
    np.testing.assert_array_equal(got, want)


def test_augmentation_is_deterministic_and_varies(dataset):
    idx = np.arange(8, dtype=np.int64)
    a = native.assemble_batch(dataset, idx, augment=True, seed=1)
    b = native.assemble_batch(dataset, idx, augment=True, seed=1)
    c = native.assemble_batch(dataset, idx, augment=True, seed=2)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    # augmentation preserves shape/dtype and keeps pixel value set
    assert a.shape == (8, 16, 16, 3) and a.dtype == np.uint8


def test_loader_augment_path(dataset):
    from odevit_tpu.data.pipeline import ArrayLoader
    labels = np.arange(50, dtype=np.int32)
    loader = ArrayLoader(dataset, labels, batch_size=16, shuffle=True,
                         seed=0, augment=True)
    batch = next(iter(loader))
    assert np.asarray(batch["pixel_values"]).shape == (16, 16, 16, 3)


def test_augment_wired_through_config():
    """`data.dataset.augment: true` reaches the train ArrayLoader (and
    only the train one) via cli.common.build_loaders."""
    import numpy as np
    from odevit_tpu.cli.common import build_loaders
    from odevit_tpu.config.loader import ConfigNode

    cfg = ConfigNode.wrap({
        "data": {"dataset": {"name": "synthetic", "augment": True,
                             "augment_pad": 2},
                 "collator": {"train": {"batch_size": 4},
                              "val": {"batch_size": 4}}}})
    imgs = np.zeros((16, 8, 8, 3), np.uint8)
    labels = np.zeros(16, np.int32)
    tr, va = build_loaders(cfg, (imgs, labels), (imgs, labels))
    assert tr.augment is True and tr.augment_pad == 2
    assert va.augment is False
    batch = next(iter(tr))
    assert batch["pixel_values"].shape == (4, 8, 8, 3)
