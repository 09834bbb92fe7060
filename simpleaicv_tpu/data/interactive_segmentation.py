"""SAM data pipeline (parity: reference
simpleAICV/interactive_segmentation/common.py — SamResize:18 (long-side resize
+ pad to square), SamNormalize:109, SAMBatchCollater:139 (samples 1-9 positive
prompt points per mask, noisy prompt boxes); dataset prompt generation
sam_segmentation_dataset.py:272-340 (noise_bbox/noise_mask))."""

from __future__ import annotations

import random
from typing import Optional

import cv2
import numpy as np

__all__ = ["SamResize", "SAMBatchCollater", "FakeSAMSegmentationDataset"]


class SamResize:
    """Resize long side to ``resize``; image and mask padded later by the
    collater's fixed canvas."""

    def __init__(self, resize=1024):
        self.resize = resize

    def __call__(self, sample):
        image, mask = sample["image"], sample["mask"]
        h, w = image.shape[:2]
        factor = self.resize / max(h, w)
        nh, nw = int(round(h * factor)), int(round(w * factor))
        sample["image"] = cv2.resize(image, (nw, nh))
        sample["mask"] = cv2.resize(mask.astype(np.float32), (nw, nh),
                                    interpolation=cv2.INTER_NEAREST)
        sample["scale"] = sample.get("scale", 1.0) * np.float32(factor)
        return sample


def noise_bbox(box, h, w, std_ratio=0.1, max_offset=20):
    """Jitter box corners by N(0, 0.1*side) clipped to 20px (reference
    sam_segmentation_dataset.py:272-306)."""
    x1, y1, x2, y2 = box
    bw, bh = x2 - x1, y2 - y1
    noise = np.clip(np.random.randn(4) * std_ratio * np.array(
        [bw, bh, bw, bh]), -max_offset, max_offset)
    x1 = np.clip(x1 + noise[0], 0, w - 1)
    y1 = np.clip(y1 + noise[1], 0, h - 1)
    x2 = np.clip(x2 + noise[2], x1 + 1, w)
    y2 = np.clip(y2 + noise[3], y1 + 1, h)
    return np.array([x1, y1, x2, y2], np.float32)


class SAMBatchCollater:
    """Builds fixed-shape prompt tensors:
      prompt_point [B, max_points, 3] (x, y, label; −1 pad)
      prompt_box   [B, 4]
      prompt_mask  [B, s, s, 1] low-res prior mask (s = resize//4)
      mask         [B, resize, resize] gt binary mask
    """

    def __init__(self, resize=1024, positive_point_num_range=(1, 9),
                 max_points: int = 9, use_noise_bbox=True):
        self.resize = resize
        self.point_range = positive_point_num_range
        self.max_points = max_points
        self.use_noise_bbox = use_noise_bbox

    def __call__(self, samples):
        n = len(samples)
        r = self.resize
        images = np.zeros((n, r, r, 3), np.float32)
        masks = np.zeros((n, r, r), np.float32)
        points = np.full((n, self.max_points, 3), -1.0, np.float32)
        boxes = np.zeros((n, 4), np.float32)
        low = r // 4
        prior_masks = np.zeros((n, low, low, 1), np.float32)

        for i, s in enumerate(samples):
            img, m = s["image"], s["mask"]
            h, w = img.shape[:2]
            images[i, :h, :w] = img / 255.0
            masks[i, :h, :w] = m

            ys, xs = np.nonzero(masks[i])
            if len(ys) > 0:
                k = random.randint(*self.point_range)
                k = min(k, self.max_points, len(ys))
                sel = np.random.choice(len(ys), k, replace=False)
                points[i, :k, 0] = xs[sel]
                points[i, :k, 1] = ys[sel]
                points[i, :k, 2] = 1.0
                box = np.array([xs.min(), ys.min(), xs.max(), ys.max()],
                               np.float32)
                boxes[i] = noise_bbox(box, r, r) if self.use_noise_bbox \
                    else box
            prior = cv2.resize(masks[i], (low, low),
                               interpolation=cv2.INTER_NEAREST)
            prior_masks[i, :, :, 0] = prior

        return {"image": images, "mask": masks, "prompt_point": points,
                "prompt_box": boxes, "prompt_mask": prior_masks}


class FakeSAMSegmentationDataset:
    """Synthetic: one bright ellipse per image as the object."""

    def __init__(self, num_samples=32, image_hw=256,
                 transform: Optional[SamResize] = None):
        self.num_samples = num_samples
        self.image_hw = image_hw
        self.transform = transform

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.RandomState(idx)
        hw = self.image_hw
        image = rng.uniform(0, 60, (hw, hw, 3)).astype(np.float32)
        mask = np.zeros((hw, hw), np.float32)
        cx, cy = rng.randint(hw // 4, 3 * hw // 4, 2)
        ax, ay = rng.randint(hw // 8, hw // 3, 2)
        cv2.ellipse(mask, (cx, cy), (ax, ay), 0, 0, 360, 1.0, -1)
        image[mask > 0] = 220.0
        sample = {"image": image, "mask": mask}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class SAMMattingCollater:
    """SAM-matting batches (parity: reference
    simpleAICV/interactive_segmentation/common_matting.py — prompts sampled
    from the alpha>0.5 foreground; alpha and the 0/128/255 trimap padded to
    the square canvas):
      image [B,S,S,3], alpha [B,S,S], trimap [B,S,S],
      prompt_point [B,max_points,3], prompt_box [B,4]."""

    def __init__(self, resize=1024, positive_point_num_range=(1, 9),
                 max_points: int = 9, use_noise_bbox=True):
        self.resize = resize
        self.point_range = positive_point_num_range
        self.max_points = max_points
        self.use_noise_bbox = use_noise_bbox

    def __call__(self, samples):
        n = len(samples)
        r = self.resize
        images = np.zeros((n, r, r, 3), np.float32)
        alphas = np.zeros((n, r, r), np.float32)
        trimaps = np.zeros((n, r, r), np.float32)
        points = np.full((n, self.max_points, 3), -1.0, np.float32)
        boxes = np.zeros((n, 4), np.float32)

        for i, s in enumerate(samples):
            img = s["image"]
            h, w = img.shape[:2]
            images[i, :h, :w] = img if img.max() <= 1.5 else img / 255.0
            alphas[i, :h, :w] = s["alpha"]
            trimaps[i, :h, :w] = s["trimap"]
            fg = alphas[i] > 0.5
            ys, xs = np.nonzero(fg)
            if len(ys) > 0:
                k = random.randint(*self.point_range)
                k = min(k, self.max_points, len(ys))
                sel = np.random.choice(len(ys), k, replace=False)
                points[i, :k, 0] = xs[sel]
                points[i, :k, 1] = ys[sel]
                points[i, :k, 2] = 1.0
                box = np.array([xs.min(), ys.min(), xs.max(), ys.max()],
                               np.float32)
                boxes[i] = noise_bbox(box, r, r) if self.use_noise_bbox \
                    else box
        return {"image": images, "alpha": alphas, "trimap": trimaps,
                "prompt_point": points, "prompt_box": boxes}
