"""ImageNet-1K folder dataset (parity: reference
simpleAICV/classification/datasets/ilsvrc2012dataset.py:8 — class ids from
sorted sub-folder names, cv2 BGR->RGB decode)."""

from __future__ import annotations

import os
from typing import Callable, Optional

import cv2
import numpy as np


class ILSVRC2012Dataset:
    """``native_decode_hw``: when set, JPEGs are decoded by the native
    C++ path (csrc/native_io.cpp — libjpeg DCT-scaled decode + bilinear
    stretch resize straight to ``(hw, hw)`` f32, the reference
    classification Resize geometry: simpleAICV/classification/common.py:543
    plain ``cv2.resize``), replacing the cv2 decode and any Resize step in
    ``transform``. The cv2 fallback (library absent, or a file that is not
    a decodable JPEG — e.g. ImageNet's CMYK/PNG-disguised files) produces
    the SAME ``(hw, hw)`` geometry, so batch shapes are always uniform."""

    def __init__(self, root_dir: str, set_name: str = "train",
                 transform: Optional[Callable] = None,
                 native_decode_hw: Optional[int] = None):
        self.root_dir = root_dir
        self.set_name = set_name
        self.transform = transform
        self.native_decode_hw = native_decode_hw
        self._items = None
        self._class_to_idx = None

    def _scan(self):
        if self._items is not None:
            return
        split_dir = os.path.join(self.root_dir, self.set_name)
        classes = sorted(
            d for d in os.listdir(split_dir)
            if os.path.isdir(os.path.join(split_dir, d)))
        self._class_to_idx = {c: i for i, c in enumerate(classes)}
        items = []
        for c in classes:
            cdir = os.path.join(split_dir, c)
            for fname in sorted(os.listdir(cdir)):
                items.append((os.path.join(cdir, fname), self._class_to_idx[c]))
        self._items = items

    def __len__(self):
        self._scan()
        return len(self._items)

    def __getitem__(self, idx):
        self._scan()
        path, label = self._items[idx]
        image = None
        if self.native_decode_hw is not None:
            from ..native_io import decode_resize
            with open(path, "rb") as f:
                image = decode_resize(f.read(), self.native_decode_hw,
                                      letterbox=False)
        if image is None:
            image = cv2.cvtColor(
                cv2.imdecode(np.fromfile(path, np.uint8), cv2.IMREAD_COLOR),
                cv2.COLOR_BGR2RGB).astype(np.float32)
            if self.native_decode_hw is not None:
                hw = self.native_decode_hw
                image = cv2.resize(image, (hw, hw))
        sample = {"image": image, "label": int(label)}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
