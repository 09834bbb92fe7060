"""COCO instance-segmentation dataset (parity: reference
simpleAICV/instance_segmentation/datasets/cocodataset.py
CocoInstanceSegmentation — per-instance boxes + rasterised polygon masks).
Parses instances_*.json directly and rasterises polygons / uncompressed RLE
with cv2 (no pycocotools in this environment)."""

from __future__ import annotations

import os
from typing import Callable, Optional

import cv2
import numpy as np

from .coco import CocoDetection


def _segmentation_to_mask(seg, h: int, w: int) -> np.ndarray:
    mask = np.zeros((h, w), np.uint8)
    if isinstance(seg, dict):  # uncompressed or COCO compressed RLE
        from simpleaicv_tpu.data.rle import rle_decode
        if "size" not in seg:
            seg = dict(seg, size=[h, w])
        return rle_decode(seg)
    for poly in seg:
        pts = np.asarray(poly, np.float32).reshape(-1, 2).astype(np.int32)
        cv2.fillPoly(mask, [pts], 1)
    return mask


class CocoInstanceSegmentation(CocoDetection):
    """Sample: image + 'annots' [M,5] + 'masks' (list of [H,W] float32)."""

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

        annots, masks = [], []
        for a in self.anns_by_image.get(image_id, []):
            x, y, bw, bh = a["bbox"]
            if bw < 1 or bh < 1:
                continue
            annots.append([x, y, x + bw, y + bh,
                           self.cat_id_to_label[a["category_id"]]])
            masks.append(_segmentation_to_mask(
                a.get("segmentation", []), h, w).astype(np.float32))
        annots = (np.asarray(annots, np.float32) if annots
                  else np.zeros((0, 5), np.float32))
        sample = {"image": image, "annots": annots, "masks": masks,
                  "scale": np.float32(1.0),
                  "size": np.array([h, w], np.float32),
                  "image_id": image_id}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
