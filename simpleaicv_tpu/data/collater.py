"""Batch collaters.

Parity: reference ``ClassificationCollater``
(simpleAICV/classification/common.py:645-666) stacks to NCHW; ours stacks to
**NHWC** (TPU-native layout) — the models are NHWC so no transpose ever
happens on device.
"""

from __future__ import annotations

import numpy as np


class ClassificationCollater:

    def __call__(self, samples):
        images = np.stack([s["image"] for s in samples]).astype(np.float32)
        labels = np.asarray([s["label"] for s in samples], np.int32)
        return {"image": images, "label": labels}
