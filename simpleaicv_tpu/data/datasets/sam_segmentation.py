"""SAM interactive-segmentation dataset (parity: reference
simpleAICV/interactive_segmentation/sam_segmentation_dataset.py:1-886 —
root/<set_name>/<set_type>/ images with per-image json mask annotations
(SA-1B style: {'annotations': [{'segmentation': rle-or-polygon, 'bbox': ...}]});
one object mask sampled per example)."""

from __future__ import annotations

import json
import os
import random
from typing import Callable, Optional, Sequence

import cv2
import numpy as np


def _decode_segmentation(seg, h, w):
    """Polygon list, uncompressed RLE, or COCO compressed RLE (real SA-1B
    jsons use the compressed string form) -> binary mask."""
    mask = np.zeros((h, w), np.uint8)
    if isinstance(seg, dict):
        from simpleaicv_tpu.data.rle import rle_decode
        if "size" not in seg:
            seg = dict(seg, size=[h, w])
        return rle_decode(seg)
    for poly in seg:
        pts = np.asarray(poly, np.float32).reshape(-1, 2).astype(np.int32)
        cv2.fillPoly(mask, [pts], 1)
    return mask


class SAMSegmentationDataset:

    def __init__(self, root_dir: str, set_name_list: Sequence[str] = ("sa_000000",),
                 set_type: str = "train",
                 per_image_mask_chosen: str = "random",
                 transform: Optional[Callable] = None):
        self.root_dir = root_dir
        self.set_name_list = list(set_name_list)
        self.set_type = set_type
        self.per_image_mask_chosen = per_image_mask_chosen
        self.transform = transform
        self._items = None

    def _scan(self):
        if self._items is not None:
            return
        items = []
        for set_name in self.set_name_list:
            d = os.path.join(self.root_dir, set_name)
            if self.set_type and os.path.isdir(os.path.join(d,
                                                            self.set_type)):
                d = os.path.join(d, self.set_type)
            if not os.path.isdir(d):
                continue
            for fname in sorted(os.listdir(d)):
                if fname.lower().endswith((".jpg", ".jpeg", ".png")):
                    stem = os.path.splitext(fname)[0]
                    jpath = os.path.join(d, stem + ".json")
                    if os.path.exists(jpath):
                        items.append((os.path.join(d, fname), jpath))
        self._items = items

    def __len__(self):
        self._scan()
        return len(self._items)

    def __getitem__(self, idx):
        self._scan()
        img_path, json_path = self._items[idx]
        image = cv2.cvtColor(cv2.imread(img_path),
                             cv2.COLOR_BGR2RGB).astype(np.float32)
        h, w = image.shape[:2]
        with open(json_path, encoding="utf-8") as f:
            ann = json.load(f)
        annots = ann.get("annotations", [])
        if annots:
            if self.per_image_mask_chosen == "random":
                chosen = random.choice(annots)
            else:  # biggest area
                chosen = max(annots, key=lambda a: a.get("area", 0))
            mask = _decode_segmentation(chosen.get("segmentation", []), h, w)
        else:
            mask = np.zeros((h, w), np.uint8)
        sample = {"image": image, "mask": mask.astype(np.float32)}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
