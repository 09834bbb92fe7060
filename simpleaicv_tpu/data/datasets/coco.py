"""COCO detection dataset (parity: reference
simpleAICV/detection/datasets/cocodataset.py:46 — xyxy+class annots with
crowd/degenerate filtering, 80 contiguous class ids).

Self-contained: parses instances_*.json directly (no pycocotools in this
environment)."""

from __future__ import annotations

import json
import os
from typing import Callable, Optional

import cv2
import numpy as np

COCO_CLASSES_NUM = 80


class CocoDetection:

    def __init__(self, root_dir: str, set_name: str = "train2017",
                 transform: Optional[Callable] = None,
                 filter_no_object_image: bool = False):
        self.root_dir = root_dir
        self.set_name = set_name
        self.transform = transform
        self.filter_no_object_image = filter_no_object_image
        self._loaded = False

    def _load(self):
        if self._loaded:
            return
        ann_path = os.path.join(self.root_dir, "annotations",
                                f"instances_{self.set_name}.json")
        with open(ann_path) as f:
            data = json.load(f)

        cats = sorted(data["categories"], key=lambda c: c["id"])
        self.cat_id_to_label = {c["id"]: i for i, c in enumerate(cats)}
        self.label_to_cat_id = {i: c["id"] for i, c in enumerate(cats)}
        self.class_names = [c["name"] for c in cats]

        self.images = {im["id"]: im for im in data["images"]}
        anns_by_image: dict = {}
        for a in data["annotations"]:
            if a.get("iscrowd", 0):
                continue
            anns_by_image.setdefault(a["image_id"], []).append(a)

        image_ids = sorted(self.images.keys())
        if self.filter_no_object_image:
            image_ids = [i for i in image_ids if anns_by_image.get(i)]
        self.image_ids = image_ids
        self.anns_by_image = anns_by_image
        self._loaded = True

    def __len__(self):
        self._load()
        return len(self.image_ids)

    def load_annots(self, image_id) -> np.ndarray:
        anns = self.anns_by_image.get(image_id, [])
        out = []
        for a in anns:
            x, y, w, h = a["bbox"]
            if w < 1 or h < 1 or a.get("area", w * h) <= 0:
                continue
            out.append([x, y, x + w, y + h,
                        self.cat_id_to_label[a["category_id"]]])
        if not out:
            return np.zeros((0, 5), np.float32)
        return np.asarray(out, np.float32)

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
        sample = {"image": image, "annots": self.load_annots(image_id),
                  "scale": np.float32(1.0),
                  "size": np.array(image.shape[:2], np.float32),
                  "image_id": image_id}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class FakeDetectionDataset:
    """Synthetic detection data: colored rectangles on noise, class = color."""

    def __init__(self, num_samples=64, image_hw=256, num_classes=8,
                 max_boxes=4, transform: Optional[Callable] = None):
        self.num_samples = num_samples
        self.image_hw = image_hw
        self.num_classes = num_classes
        self.max_boxes = max_boxes
        self.transform = transform

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.RandomState(idx)
        hw = self.image_hw
        image = rng.uniform(0, 60, (hw, hw, 3)).astype(np.float32)
        n = rng.randint(1, self.max_boxes + 1)
        annots = []
        for _ in range(n):
            w = rng.randint(hw // 8, hw // 2)
            h = rng.randint(hw // 8, hw // 2)
            x1 = rng.randint(0, hw - w)
            y1 = rng.randint(0, hw - h)
            cls = rng.randint(0, self.num_classes)
            color = np.zeros(3, np.float32)
            color[cls % 3] = 200.0 + 55.0 * (cls // 3) / max(
                self.num_classes // 3, 1)
            image[y1:y1 + h, x1:x1 + w] = color
            annots.append([x1, y1, x1 + w, y1 + h, cls])
        sample = {"image": image,
                  "annots": np.asarray(annots, np.float32),
                  "scale": np.float32(1.0),
                  "size": np.array([hw, hw], np.float32),
                  "image_id": idx}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
