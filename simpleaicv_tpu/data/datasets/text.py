"""OCR datasets (parity: reference
simpleAICV/text_detection/datasets/text_detection_dataset.py:14 and
simpleAICV/text_recognition/datasets/text_recognition_dataset.py — combined
multi-subdataset readers over ``root/<set_name>/<set_type>`` image folders with
``<set_name>_<set_type>.json`` label files)."""

from __future__ import annotations

import json
import os
from typing import Callable, Optional, Sequence

import cv2
import numpy as np


class TextDetection:
    """Labels json: per-image {'shapes': [{'points': [[x,y],...], 'label' or
    'ignore' flag}, ...]} (RCTW/ART/LSVT/MLT/ReCTS preprocessed layout)."""

    def __init__(self, root_dir: str, set_name_list: Sequence[str],
                 set_type: str = "train",
                 transform: Optional[Callable] = None):
        self.root_dir = root_dir
        self.set_name_list = list(set_name_list)
        self.set_type = set_type
        self.transform = transform
        self._items = None

    def _scan(self):
        if self._items is not None:
            return
        items = []
        for set_name in self.set_name_list:
            img_dir = os.path.join(self.root_dir, set_name, self.set_type)
            label_path = os.path.join(self.root_dir, set_name,
                                      f"{set_name}_{self.set_type}.json")
            if not (os.path.isdir(img_dir) and os.path.exists(label_path)):
                continue
            with open(label_path, encoding="utf-8") as f:
                labels = json.load(f)
            for key, ann in sorted(labels.items()):
                path = os.path.join(img_dir, key)
                if os.path.exists(path):
                    items.append((path, ann))
        self._items = items

    def __len__(self):
        self._scan()
        return len(self._items)

    def __getitem__(self, idx):
        self._scan()
        path, ann = self._items[idx]
        image = cv2.cvtColor(cv2.imread(path),
                             cv2.COLOR_BGR2RGB).astype(np.float32)
        polys, ignores = [], []
        shapes = ann.get("shapes", ann) if isinstance(ann, dict) else ann
        for shape in shapes:
            pts = np.asarray(shape.get("points", shape.get("box", [])),
                             np.float32)
            if pts.size < 6:
                continue
            polys.append(pts.reshape(-1, 2))
            label = shape.get("label", "")
            ignores.append(label in ("###", "*") or shape.get("ignore",
                                                              False))
        sample = {"image": image, "annots": polys, "ignore_flags": ignores}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class TextRecognition:
    """Labels json: per-image filename -> text string."""

    def __init__(self, root_dir: str, set_name_list: Sequence[str],
                 set_type: str = "train",
                 transform: Optional[Callable] = None):
        self.root_dir = root_dir
        self.set_name_list = list(set_name_list)
        self.set_type = set_type
        self.transform = transform
        self._items = None

    def _scan(self):
        if self._items is not None:
            return
        items = []
        for set_name in self.set_name_list:
            img_dir = os.path.join(self.root_dir, set_name, self.set_type)
            label_path = os.path.join(self.root_dir, set_name,
                                      f"{set_name}_{self.set_type}.json")
            if not (os.path.isdir(img_dir) and os.path.exists(label_path)):
                continue
            with open(label_path, encoding="utf-8") as f:
                labels = json.load(f)
            for key, text in sorted(labels.items()):
                path = os.path.join(img_dir, key)
                if os.path.exists(path):
                    if isinstance(text, dict):
                        text = text.get("label", "")
                    items.append((path, text))
        self._items = items

    def __len__(self):
        self._scan()
        return len(self._items)

    def __getitem__(self, idx):
        self._scan()
        path, text = self._items[idx]
        image = cv2.cvtColor(cv2.imread(path),
                             cv2.COLOR_BGR2RGB).astype(np.float32)
        sample = {"image": image, "label": text}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
