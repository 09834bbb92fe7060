"""Combined multi-subdataset folder readers shared by salient-object
detection, human matting, parsing and face detection (parity: the reference's
per-task dataset files, all of which scan ``root/<set_name>/<set_type>``
folder layouts):

  * SalientObjectDetectionDataset
    (simpleAICV/salient_object_detection/datasets/
     salient_object_detection_dataset.py:21 — image .jpg + mask .png pairs in
     the same folder, combined over set_name_list e.g. DIS5K/HRS10K/HRSOD/
     UHRSD);
  * HumanMattingDataset (simpleAICV/human_matting/... — same layout, mask is
    the alpha; trimap derived by erode/dilate);
  * HumanParsingDataset / FaceParsingDataset (…/datasets/*.py — image + label
    png);
  * FaceDetectionDataset (simpleAICV/face_detection/datasets/
    face_detection_dataset.py:25 — images/<set_type> + json with per-image
    'face_box' lists).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional, Sequence

import cv2
import numpy as np

__all__ = ["SalientObjectDetectionDataset", "HumanMattingDataset",
           "HumanParsingDataset", "FaceParsingDataset",
           "FaceDetectionDataset"]

_IMG_EXT = (".jpg", ".jpeg", ".png")


class _PairFolderBase:
    """root/<set_name>/<set_type>/ holding image files and same-stem .png
    masks."""

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
            d = os.path.join(self.root_dir, set_name, self.set_type)
            if not os.path.isdir(d):
                continue
            files = sorted(os.listdir(d))
            stems = {}
            for f in files:
                stem, ext = os.path.splitext(f)
                stems.setdefault(stem, {})[ext.lower()] = os.path.join(d, f)
            for stem, exts in sorted(stems.items()):
                img = next((exts[e] for e in (".jpg", ".jpeg") if e in exts),
                           None)
                mask = exts.get(".png")
                if img and mask:
                    items.append((img, mask))
        self._items = items

    def __len__(self):
        self._scan()
        return len(self._items)

    def _load_pair(self, idx):
        img_path, mask_path = self._items[idx]
        image = cv2.cvtColor(cv2.imread(img_path),
                             cv2.COLOR_BGR2RGB).astype(np.float32)
        mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
        return image, mask


class SalientObjectDetectionDataset(_PairFolderBase):

    def __getitem__(self, idx):
        self._scan()
        image, mask = self._load_pair(idx)
        sample = {"image": image,
                  "mask": (mask > 127).astype(np.float32),
                  "scale": np.float32(1.0),
                  "size": np.array(image.shape[:2], np.float32)}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class HumanMattingDataset(_PairFolderBase):
    """mask png holds the alpha in [0,255]; trimap derived by erode/dilate of
    the binarised alpha (unknown band = 128)."""

    def __init__(self, *args, trimap_kernel: int = 15, **kwargs):
        super().__init__(*args, **kwargs)
        self.trimap_kernel = trimap_kernel

    def __getitem__(self, idx):
        self._scan()
        image, alpha8 = self._load_pair(idx)
        alpha = alpha8.astype(np.float32) / 255.0
        k = cv2.getStructuringElement(
            cv2.MORPH_ELLIPSE, (self.trimap_kernel, self.trimap_kernel))
        fg = (alpha > 0.95).astype(np.uint8)
        any_a = (alpha > 0.05).astype(np.uint8)
        eroded = cv2.erode(fg, k)
        dilated = cv2.dilate(any_a, k)
        trimap = np.zeros_like(alpha8, np.float32)
        trimap[dilated > 0] = 128.0
        trimap[eroded > 0] = 255.0
        sample = {"image": image, "alpha": alpha, "trimap": trimap,
                  "scale": np.float32(1.0),
                  "size": np.array(image.shape[:2], np.float32)}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class HumanParsingDataset(_PairFolderBase):

    def __getitem__(self, idx):
        self._scan()
        image, mask = self._load_pair(idx)
        sample = {"image": image, "mask": mask.astype(np.int32),
                  "scale": np.float32(1.0),
                  "size": np.array(image.shape[:2], np.float32)}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class FaceParsingDataset(HumanParsingDataset):
    pass


class FaceDetectionDataset:
    """root/<set_name>/images/<set_type>/* + root/<set_name>/annotations/
    <set_name>_<set_type>.json with per-image {'face_box': [[x1,y1,x2,y2]]}
    (reference face_detection_dataset.py:25-60)."""

    def __init__(self, root_dir: str, set_name_list=("wider_face",),
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
            img_dir = os.path.join(self.root_dir, set_name, "images",
                                   self.set_type)
            json_path = os.path.join(
                self.root_dir, set_name, "annotations",
                f"{set_name}_{self.set_type}.json")
            if not (os.path.isdir(img_dir) and os.path.exists(json_path)):
                continue
            with open(json_path, encoding="utf-8") as f:
                labels = json.load(f)
            for name in sorted(os.listdir(img_dir)):
                if name in labels:
                    items.append((os.path.join(img_dir, name),
                                  labels[name]["face_box"]))
        self._items = items

    def __len__(self):
        self._scan()
        return len(self._items)

    def __getitem__(self, idx):
        self._scan()
        path, boxes = self._items[idx]
        image = cv2.cvtColor(cv2.imread(path),
                             cv2.COLOR_BGR2RGB).astype(np.float32)
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        annots = np.concatenate(
            [boxes, np.zeros((boxes.shape[0], 1), np.float32)], axis=1)
        sample = {"image": image, "annots": annots,
                  "scale": np.float32(1.0),
                  "size": np.array(image.shape[:2], np.float32)}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
