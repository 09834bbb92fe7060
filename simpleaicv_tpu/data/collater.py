"""Batch collaters.

Parity: reference ``ClassificationCollater``
(simpleAICV/classification/common.py:645-666) stacks to NCHW; ours stacks to
**NHWC** (TPU-native layout) — the models are NHWC so no transpose ever
happens on device.
"""

from __future__ import annotations

import numpy as np


class ClassificationCollater:
    """``image_dtype="uint8"`` ships raw [0,255] batches through the worker
    pipe at 1/4 the bytes of float32 — use with the on-device augmentation
    pipeline (data/device_augment.py casts to f32 on chip). Keep the f32
    default for host-normalized pipelines."""

    def __init__(self, image_dtype=np.float32):
        self.image_dtype = np.dtype(image_dtype)

    def __call__(self, samples):
        images = np.stack([s["image"] for s in samples]).astype(
            self.image_dtype)
        labels = np.asarray([s["label"] for s in samples], np.int32)
        return {"image": images, "label": labels}
