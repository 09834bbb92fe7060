"""COCO semantic-segmentation dataset (parity: reference
simpleAICV/semantic_segmentation/datasets/cocosemanticsegmentationdataset.py
:48-170 — per-pixel category mask painted instance-by-instance, later
instances overwriting earlier ones; reduce_zero_label maps background 0 to
ignore 255 and shifts classes 1..80 down to 0..79)."""

from __future__ import annotations

import os
from typing import Callable, Optional

import cv2
import numpy as np

from .coco import CocoDetection
from .coco_instance import _segmentation_to_mask


class CocoSemanticSegmentation(CocoDetection):
    """Sample: image + 'mask' [H,W] int32 (+ scale/size)."""

    def __init__(self, root_dir: str, set_name: str = "train2017",
                 transform: Optional[Callable] = None,
                 reduce_zero_label: bool = False):
        super().__init__(root_dir, set_name, transform=transform)
        self.reduce_zero_label = reduce_zero_label

    def __getitem__(self, idx):
        self._load()
        image_id = self.image_ids[idx]
        info = self.images[image_id]
        path = os.path.join(self.root_dir, "images", self.set_name,
                            info["file_name"])
        if not os.path.exists(path):
            path = os.path.join(self.root_dir, self.set_name,
                                info["file_name"])
        image = cv2.imdecode(np.fromfile(path, np.uint8), cv2.IMREAD_COLOR)
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB).astype(np.float32)
        h, w = image.shape[:2]

        mask = np.zeros((h, w), np.float64)
        for a in self.anns_by_image.get(image_id, []):
            if "ignore" in a:
                continue
            binary = _segmentation_to_mask(a.get("segmentation", []), h, w)
            label = self.cat_id_to_label[a["category_id"]] + 1  # 1..80
            mask = mask * (1 - binary) + binary * label
        mask = mask.astype(np.int32)
        if self.reduce_zero_label:
            # background 0 -> ignore 255; classes 1..80 -> 0..79
            mask[mask == 0] = 256
            mask = mask - 1

        sample = {"image": image, "mask": mask,
                  "scale": np.float32(1.0),
                  "size": np.array([h, w], np.float32)}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
