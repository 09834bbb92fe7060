"""Mosaic detection augmentation (parity: reference
simpleAICV/detection/datasets/cocodataset.py:173 MosaicResizeCocoDetection —
with probability p, paste 4 resized images into a 2x-size canvas around a
random center and merge their annotations, then resize back)."""

from __future__ import annotations

import random
from typing import Callable, Optional

import cv2
import numpy as np


class MosaicResizeDetection:
    """Wraps any detection dataset with mosaic mixing."""

    def __init__(self, dataset, resize: int = 640, mosaic_prob: float = 0.5,
                 transform: Optional[Callable] = None):
        self.dataset = dataset
        self.resize = resize
        self.mosaic_prob = mosaic_prob
        self.transform = transform

    def __len__(self):
        return len(self.dataset)

    def _base(self, idx):
        return self.dataset[idx]

    def __getitem__(self, idx):
        if random.random() >= self.mosaic_prob:
            sample = self._base(idx)
        else:
            r = self.resize
            canvas = np.zeros((2 * r, 2 * r, 3), np.float32)
            cx = int(random.uniform(0.5 * r, 1.5 * r))
            cy = int(random.uniform(0.5 * r, 1.5 * r))
            all_annots = []
            idxs = [idx] + [random.randint(0, len(self.dataset) - 1)
                            for _ in range(3)]
            corners = [(0, 0, cx, cy), (cx, 0, 2 * r, cy),
                       (0, cy, cx, 2 * r), (cx, cy, 2 * r, 2 * r)]
            for i, (x1, y1, x2, y2) in zip(idxs, corners):
                s = self._base(i)
                img, ann = s["image"], s["annots"]
                tw, th = x2 - x1, y2 - y1
                if tw < 2 or th < 2:
                    continue
                h, w = img.shape[:2]
                fx, fy = tw / w, th / h
                canvas[y1:y2, x1:x2] = cv2.resize(img, (tw, th))
                if ann.shape[0] > 0:
                    a = ann.copy()
                    a[:, [0, 2]] = a[:, [0, 2]] * fx + x1
                    a[:, [1, 3]] = a[:, [1, 3]] * fy + y1
                    all_annots.append(a)
            annots = (np.concatenate(all_annots, 0) if all_annots
                      else np.zeros((0, 5), np.float32))
            # resize the 2r canvas back to r
            canvas = cv2.resize(canvas, (r, r))
            if annots.shape[0] > 0:
                annots[:, :4] *= 0.5
                wh_ok = ((annots[:, 2] - annots[:, 0]) > 2) & \
                        ((annots[:, 3] - annots[:, 1]) > 2)
                annots = annots[wh_ok]
            sample = {"image": canvas, "annots": annots,
                      "scale": np.float32(1.0),
                      "size": np.array([r, r], np.float32)}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
