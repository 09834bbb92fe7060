"""Semantic-segmentation transforms + collater (parity: reference
simpleAICV/semantic_segmentation/common.py:16-320). Sample dict: 'image'
(HWC f32), 'mask' (HW int), 'scale', 'size'. Fixed square canvas; mask padded
with ignore_index."""

from __future__ import annotations

import random

import cv2
import numpy as np

__all__ = ["SegResize", "SegRandomCropResize", "SegRandomHorizontalFlip",
           "SegPhotoMetricDistortion", "SegNormalize",
           "SemanticSegmentationCollater", "FakeSegmentationDataset"]


class SegResize:
    """Scale longest side to ``resize`` keeping aspect."""

    def __init__(self, resize=512):
        self.resize = resize

    def __call__(self, sample):
        image, mask = sample["image"], sample["mask"]
        h, w = image.shape[:2]
        factor = self.resize / max(h, w)
        nh, nw = int(round(h * factor)), int(round(w * factor))
        sample["image"] = cv2.resize(image, (nw, nh))
        sample["mask"] = cv2.resize(mask.astype(np.float32), (nw, nh),
                                    interpolation=cv2.INTER_NEAREST
                                    ).astype(mask.dtype)
        sample["scale"] = sample.get("scale", 1.0) * np.float32(factor)
        sample["size"] = np.array([nh, nw], np.float32)
        return sample


class SegRandomCropResize:
    """Random scale jitter + crop with max-category-fraction guard
    (reference :44-127)."""

    def __init__(self, image_scale=(2048, 512), multi_scale_range=(0.5, 2.0),
                 crop_size=(512, 512), cat_max_ratio=0.75, ignore_index=255):
        self.image_scale = image_scale
        self.multi_scale_range = multi_scale_range
        self.crop_size = crop_size
        self.cat_max_ratio = cat_max_ratio
        self.ignore_index = ignore_index

    def _rand_crop_bbox(self, image):
        h, w = image.shape[:2]
        ch = min(self.crop_size[1], h)
        cw = min(self.crop_size[0], w)
        y = random.randint(0, h - ch)
        x = random.randint(0, w - cw)
        return y, y + ch, x, x + cw

    def __call__(self, sample):
        image, mask = sample["image"], sample["mask"]
        h, w = image.shape[:2]
        ratio = random.uniform(*self.multi_scale_range)
        target = max(self.image_scale) * ratio
        factor = target / max(h, w)
        nh, nw = int(round(h * factor)), int(round(w * factor))
        image = cv2.resize(image, (nw, nh))
        mask = cv2.resize(mask.astype(np.float32), (nw, nh),
                          interpolation=cv2.INTER_NEAREST).astype(mask.dtype)

        bbox = self._rand_crop_bbox(image)
        if self.cat_max_ratio < 1.0:
            for _ in range(10):
                y1, y2, x1, x2 = bbox
                crop_mask = mask[y1:y2, x1:x2]
                labels, counts = np.unique(crop_mask, return_counts=True)
                counts = counts[labels != self.ignore_index]
                if counts.size > 1 and counts.max() / counts.sum() < \
                        self.cat_max_ratio:
                    break
                bbox = self._rand_crop_bbox(image)
        y1, y2, x1, x2 = bbox
        sample["image"] = image[y1:y2, x1:x2]
        sample["mask"] = mask[y1:y2, x1:x2]
        sample["size"] = np.array(sample["image"].shape[:2], np.float32)
        return sample


class SegRandomHorizontalFlip:

    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, sample):
        if random.random() < self.prob:
            sample["image"] = np.ascontiguousarray(sample["image"][:, ::-1])
            sample["mask"] = np.ascontiguousarray(sample["mask"][:, ::-1])
        return sample


class SegPhotoMetricDistortion:
    """Brightness/contrast/saturation/hue jitter (reference :148-262)."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18, prob=0.5):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta
        self.prob = prob

    def __call__(self, sample):
        img = sample["image"].astype(np.float32)
        if random.random() < self.prob:
            img += random.uniform(-self.brightness_delta,
                                  self.brightness_delta)
        if random.random() < self.prob:
            img *= random.uniform(*self.contrast_range)
        hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                           cv2.COLOR_RGB2HSV).astype(np.float32)
        if random.random() < self.prob:
            hsv[..., 1] *= random.uniform(*self.saturation_range)
        if random.random() < self.prob:
            hsv[..., 0] = (hsv[..., 0] +
                           random.uniform(-self.hue_delta, self.hue_delta)) \
                % 180
        img = cv2.cvtColor(np.clip(hsv, 0, 255).astype(np.uint8),
                           cv2.COLOR_HSV2RGB).astype(np.float32)
        sample["image"] = img
        return sample


class SegNormalize:

    def __call__(self, sample):
        sample["image"] = (sample["image"] / 255.0).astype(np.float32)
        return sample


class SemanticSegmentationCollater:

    def __init__(self, resize=512, ignore_index=255):
        self.resize = resize
        self.ignore_index = ignore_index

    def __call__(self, samples):
        n = len(samples)
        images = np.zeros((n, self.resize, self.resize, 3), np.float32)
        masks = np.full((n, self.resize, self.resize),
                        self.ignore_index if self.ignore_index else 0,
                        np.int32)
        sizes = np.zeros((n, 2), np.float32)
        for i, s in enumerate(samples):
            img, m = s["image"], s["mask"]
            images[i, :img.shape[0], :img.shape[1]] = img
            masks[i, :m.shape[0], :m.shape[1]] = m
            sizes[i] = s.get("size", img.shape[:2])
        return {"image": images, "mask": masks, "size": sizes}


class FakeSegmentationDataset:
    """Synthetic: class-colored blobs."""

    def __init__(self, num_samples=32, image_hw=128, num_classes=6,
                 ignore_index=255, transform=None):
        self.num_samples = num_samples
        self.image_hw = image_hw
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.transform = transform

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.RandomState(idx)
        hw = self.image_hw
        image = rng.uniform(0, 40, (hw, hw, 3)).astype(np.float32)
        mask = np.zeros((hw, hw), np.int32)
        for _ in range(3):
            cls = rng.randint(1, self.num_classes)
            w, h = rng.randint(hw // 6, hw // 2, 2)
            x, y = rng.randint(0, hw - w), rng.randint(0, hw - h)
            mask[y:y + h, x:x + w] = cls
            image[y:y + h, x:x + w] = 40.0 * cls
        sample = {"image": image, "mask": mask, "scale": np.float32(1.0),
                  "size": np.array([hw, hw], np.float32)}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
