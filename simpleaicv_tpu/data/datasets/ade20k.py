"""ADE20K semantic-segmentation dataset (parity: reference
simpleAICV/semantic_segmentation/datasets/ade20kdataset.py — 150 classes,
label 0 = background mapped to ignore via reduce_zero_label)."""

from __future__ import annotations

import os
from typing import Callable, Optional

import cv2
import numpy as np


class ADE20KDataset:

    def __init__(self, root_dir: str, image_sets: str = "training",
                 reduce_zero_label: bool = True, ignore_index: int = 255,
                 transform: Optional[Callable] = None):
        self.root_dir = root_dir
        self.image_sets = image_sets
        self.reduce_zero_label = reduce_zero_label
        self.ignore_index = ignore_index
        self.transform = transform
        self._items = None

    def _scan(self):
        if self._items is not None:
            return
        img_dir = os.path.join(self.root_dir, "images", self.image_sets)
        ann_dir = os.path.join(self.root_dir, "annotations", self.image_sets)
        items = []
        for fname in sorted(os.listdir(img_dir)):
            stem = os.path.splitext(fname)[0]
            mask_path = os.path.join(ann_dir, stem + ".png")
            if os.path.exists(mask_path):
                items.append((os.path.join(img_dir, fname), mask_path))
        self._items = items

    def __len__(self):
        self._scan()
        return len(self._items)

    def __getitem__(self, idx):
        self._scan()
        img_path, mask_path = self._items[idx]
        image = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2RGB)
        mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE).astype(np.int32)
        if self.reduce_zero_label:
            mask = mask - 1
            mask[mask < 0] = self.ignore_index
        sample = {"image": image.astype(np.float32), "mask": mask,
                  "scale": np.float32(1.0),
                  "size": np.array(image.shape[:2], np.float32)}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
