"""Human-matting data pipeline (parity: reference
simpleAICV/human_matting/common.py:189-290 — square-stretch Resize with
nearest-neighbour trimap, /255 Normalize, zero-padded fixed-canvas collater).
The trimap keeps the reference's raw {0, 128, 255} coding (bg/unknown/fg);
losses convert to class ids on device."""

from __future__ import annotations

import cv2
import numpy as np

__all__ = ["MattingResize", "MattingRandomHorizontalFlip", "MattingNormalize",
           "HumanMattingCollater", "FakeHumanMattingDataset"]


class MattingResize:
    """Stretch image/alpha to resize×resize (bilinear); trimap nearest so the
    {0,128,255} coding survives (reference common.py:199-204)."""

    def __init__(self, resize=832):
        self.resize = resize

    def __call__(self, sample):
        s = self.resize
        sample["image"] = cv2.resize(sample["image"], (s, s))
        sample["alpha"] = cv2.resize(sample["alpha"], (s, s))
        sample["trimap"] = cv2.resize(sample["trimap"], (s, s),
                                      interpolation=cv2.INTER_NEAREST)
        sample["size"] = np.array([s, s], np.float32)
        return sample


class MattingRandomHorizontalFlip:

    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, sample):
        if np.random.uniform(0, 1) < self.prob:
            sample["image"] = sample["image"][:, ::-1].copy()
            sample["alpha"] = sample["alpha"][:, ::-1].copy()
            sample["trimap"] = sample["trimap"][:, ::-1].copy()
        return sample


class MattingNormalize:
    """image -> [0,1]; alpha already [0,1]; trimap kept raw."""

    def __call__(self, sample):
        sample["image"] = sample["image"] / 255.0
        return sample


class HumanMattingCollater:
    """-> image [B,S,S,3] f32 (NHWC), alpha [B,S,S] f32, trimap [B,S,S] f32
    with {0,128,255} values; zero-padded canvases (reference common.py:
    236-290, without the NCHW permute)."""

    def __init__(self, resize=832):
        self.resize = resize

    def __call__(self, samples):
        b, s = len(samples), self.resize
        images = np.zeros((b, s, s, 3), np.float32)
        alphas = np.zeros((b, s, s), np.float32)
        trimaps = np.zeros((b, s, s), np.float32)
        for i, smp in enumerate(samples):
            img = smp["image"]
            h, w = img.shape[:2]
            images[i, :h, :w] = img
            alphas[i, :h, :w] = smp["alpha"]
            trimaps[i, :h, :w] = smp["trimap"]
        return {"image": images, "alpha": alphas, "trimap": trimaps}


class FakeHumanMattingDataset:
    """Synthetic portrait-like samples: a soft-edged ellipse alpha over a
    random background, trimap derived by erode/dilate like the real dataset."""

    def __init__(self, num_samples=32, image_hw=64, transform=None, seed=0):
        self.num_samples = num_samples
        self.image_hw = image_hw
        self.transform = transform
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.RandomState(self.seed * 100003 + idx)
        hw = self.image_hw
        alpha = np.zeros((hw, hw), np.float32)
        cy, cx = rng.randint(hw // 4, 3 * hw // 4, 2)
        ay, ax = rng.randint(hw // 6, hw // 3, 2)
        cv2.ellipse(alpha, (cx, cy), (ax, ay), rng.uniform(0, 180), 0, 360,
                    1.0, -1)
        alpha = cv2.GaussianBlur(alpha, (7, 7), 2.0)
        fg = rng.uniform(0, 255, 3).astype(np.float32)
        bg = rng.uniform(0, 255, 3).astype(np.float32)
        image = alpha[..., None] * fg + (1 - alpha[..., None]) * bg
        image += rng.randn(hw, hw, 3).astype(np.float32) * 4

        k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
        eroded = cv2.erode((alpha > 0.95).astype(np.uint8), k)
        dilated = cv2.dilate((alpha > 0.05).astype(np.uint8), k)
        trimap = np.zeros((hw, hw), np.float32)
        trimap[dilated > 0] = 128.0
        trimap[eroded > 0] = 255.0

        sample = {"image": np.clip(image, 0, 255).astype(np.float32),
                  "alpha": alpha, "trimap": trimap,
                  "scale": np.float32(1.0),
                  "size": np.array([hw, hw], np.float32)}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
