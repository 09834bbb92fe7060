"""Binary-segmentation (salient-object detection) data pipeline (parity:
reference simpleAICV/salient_object_detection/common.py — yolo-style
keep-ratio resize, /255 normalize, zero-padded square-canvas collater)."""

from __future__ import annotations

import cv2
import numpy as np

__all__ = ["BinarySegResize", "BinarySegRandomHorizontalFlip",
           "BinarySegNormalize", "BinarySegCollater"]


class BinarySegResize:
    """Keep-ratio resize so max side == resize (yolo style)."""

    def __init__(self, resize=832):
        self.resize = resize

    def __call__(self, sample):
        image, mask = sample["image"], sample["mask"]
        h, w = image.shape[:2]
        factor = self.resize / max(h, w)
        nh, nw = int(round(h * factor)), int(round(w * factor))
        sample["image"] = cv2.resize(image, (nw, nh))
        sample["mask"] = cv2.resize(mask.astype(np.float32), (nw, nh),
                                    interpolation=cv2.INTER_NEAREST)
        sample["size"] = np.array([nh, nw], np.float32)
        sample["scale"] = np.float32(sample.get("scale", 1.0) * factor)
        return sample


class BinarySegRandomHorizontalFlip:

    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, sample):
        if np.random.uniform(0, 1) < self.prob:
            sample["image"] = sample["image"][:, ::-1].copy()
            sample["mask"] = sample["mask"][:, ::-1].copy()
        return sample


class BinarySegNormalize:

    def __call__(self, sample):
        sample["image"] = sample["image"] / 255.0
        return sample


class BinarySegCollater:
    """-> image [B,S,S,3] f32 + mask [B,S,S] f32 on zero-padded canvases."""

    def __init__(self, resize=832):
        self.resize = resize

    def __call__(self, samples):
        b, s = len(samples), self.resize
        images = np.zeros((b, s, s, 3), np.float32)
        masks = np.zeros((b, s, s), np.float32)
        for i, smp in enumerate(samples):
            img = smp["image"]
            h, w = img.shape[:2]
            images[i, :h, :w] = img
            masks[i, :h, :w] = smp["mask"]
        return {"image": images, "mask": masks}
