"""CIFAR-10/100 readers (torchvision on-disk pickle layout, no torchvision).

Returns uint8 [N, 32, 32, 3] images + int labels as numpy arrays, loaded
entirely into host RAM (170MB). The reference loads these via torchvision
datasets with ``download=False`` (main_classification_ode.py:69-85).
"""

from __future__ import annotations

import os
import pickle
from typing import Tuple

import numpy as np


def _load_pickle(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f, encoding="latin1")


def _to_images(raw: np.ndarray) -> np.ndarray:
    # stored as [N, 3072] channel-major rows -> [N, 32, 32, 3] uint8
    return raw.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1).copy()


def load_cifar10(root: str, train: bool = True
                 ) -> Tuple[np.ndarray, np.ndarray]:
    base = os.path.join(root, "cifar-10-batches-py")
    files = [f"data_batch_{i}" for i in range(1, 6)] if train \
        else ["test_batch"]
    imgs, labels = [], []
    for fname in files:
        d = _load_pickle(os.path.join(base, fname))
        imgs.append(np.asarray(d["data"], np.uint8))
        labels.extend(d["labels"])
    return _to_images(np.concatenate(imgs)), np.asarray(labels, np.int32)


def load_cifar100(root: str, train: bool = True
                  ) -> Tuple[np.ndarray, np.ndarray]:
    base = os.path.join(root, "cifar-100-python")
    d = _load_pickle(os.path.join(base, "train" if train else "test"))
    return (_to_images(np.asarray(d["data"], np.uint8)),
            np.asarray(d["fine_labels"], np.int32))


def load_dataset(name: str, root: str, train: bool = True):
    if name == "cifar10":
        return load_cifar10(root, train)
    if name == "cifar100":
        return load_cifar100(root, train)
    raise ValueError(f"unknown cifar dataset {name!r}")
