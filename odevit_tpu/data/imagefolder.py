"""ImageFolder dataset: <root>/<class_name>/*.{jpg,png,...} (the
ImageNet-100 layout the reference consumes via torchvision's ImageFolder,
main_classification_ode_distillation.py:74-75).

Decodes with PIL on the host, resizing at decode time to a fixed square
so batches have static shapes (device-side normalize happens in the jit'd
step). Truncated images are tolerated, matching the reference's
``ImageFile.LOAD_TRUNCATED_IMAGES = True``. Decoding fans out over a
thread pool inside the loader (PIL releases the GIL for decode+resize).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".gif", ".webp")


class ImageFolder:
    def __init__(self, root: str, image_size: int = 224):
        self.root = root
        self.image_size = image_size
        classes = sorted(d for d in os.listdir(root)
                         if os.path.isdir(os.path.join(root, d)))
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith(_EXTS):
                    self.samples.append((os.path.join(cdir, fname),
                                         self.class_to_idx[c]))
        self.labels = np.asarray([s[1] for s in self.samples], np.int32)

    def __len__(self):
        return len(self.samples)

    @property
    def num_classes(self):
        return len(self.class_to_idx)

    def decode(self, index: int) -> np.ndarray:
        from PIL import Image, ImageFile
        ImageFile.LOAD_TRUNCATED_IMAGES = True
        path, _ = self.samples[index]
        with Image.open(path) as im:
            im = im.convert("RGB").resize(
                (self.image_size, self.image_size), Image.BILINEAR)
            return np.asarray(im, np.uint8)

    def gather(self, indices, num_threads: int = 16) -> np.ndarray:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=num_threads) as pool:
            return np.stack(list(pool.map(self.decode, indices)))
