"""Collator: reference-compatible collate surface.

The reference wraps an HF image processor in a Collator whose
``classification_collate_fn`` turns a list of (PIL image, label) pairs
into {"pixel_values", "labels", "raw_images"}
(/root/reference/datasets/collator.py:6-22). This shim offers the same
call surface for code migrating from the reference — but note the
TPU-first pipeline (odevit_tpu.data.pipeline) deliberately moves
resize/normalize ON DEVICE and only uses this class for PIL-list inputs.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import numpy as np


class Collator:
    def __init__(self, processor=None, image_size: int = 224):
        """``processor``: optional HF image processor; when None, images
        are resized host-side to ``image_size`` and returned as uint8 for
        device-side normalization."""
        self.processor = processor
        self.image_size = image_size

    def classification_collate_fn(self, batch: Sequence[Tuple[Any, int]]):
        images = [b[0] for b in batch]
        labels = np.asarray([b[1] for b in batch], np.int32)
        if self.processor is not None:
            pixel_values = self.processor(
                images, return_tensors="np")["pixel_values"]
            # HF gives NCHW floats; the framework is NHWC
            pixel_values = np.transpose(pixel_values, (0, 2, 3, 1))
        else:
            from PIL import Image
            arrs = []
            for im in images:
                if not hasattr(im, "resize"):
                    im = Image.fromarray(np.asarray(im))
                im = im.convert("RGB").resize(
                    (self.image_size, self.image_size), Image.BILINEAR)
                arrs.append(np.asarray(im, np.uint8))
            pixel_values = np.stack(arrs)
        return {"pixel_values": pixel_values, "labels": labels,
                "raw_images": images}
