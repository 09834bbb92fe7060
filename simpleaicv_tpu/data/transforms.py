"""Classification transform zoo (numpy/cv2, host side).

API parity with reference simpleAICV/classification/common.py:22-660: every
transform is a callable over a sample dict with 'image' (HWC numpy) and
'label'. The PIL<->cv2 adapters of the reference are identity here (we are
numpy end-to-end); torch-wrapped ops are reimplemented in numpy with the same
sampling semantics.

TPU note: transforms produce fixed-shape float32 NHWC canvases — the XLA
contract. Heavy per-pixel math (normalize) can be deferred to device via the
collater's ``normalize_on_device`` flag.
"""

from __future__ import annotations

import math
import random
from typing import Sequence

import cv2
import numpy as np

__all__ = [
    "Opencv2PIL", "PIL2Opencv", "Pad", "RandomHorizontalFlip", "RandomCrop",
    "RandomResizedCrop", "Resize", "CenterCrop", "Normalize",
    "MeanStdNormalize", "RandomErasing", "PCAJitter", "Compose",
    # reference-name aliases
    "TorchPad", "TorchRandomHorizontalFlip", "TorchRandomCrop",
    "TorchRandomResizedCrop", "TorchResize", "TorchCenterCrop",
    "TorchMeanStdNormalize",
]


class Compose:

    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, sample):
        for t in self.transforms:
            sample = t(sample)
        return sample


class Opencv2PIL:
    """Identity (numpy end-to-end); kept for config-surface parity."""

    def __call__(self, sample):
        return sample


class PIL2Opencv:

    def __call__(self, sample):
        return sample


class Pad:

    def __init__(self, padding=4, fill=0, padding_mode="reflect"):
        self.padding = padding
        self.fill = fill
        self.padding_mode = padding_mode

    def __call__(self, sample):
        image = sample["image"]
        p = self.padding
        if self.padding_mode == "reflect":
            image = np.pad(image, ((p, p), (p, p), (0, 0)), mode="reflect")
        else:
            image = np.pad(image, ((p, p), (p, p), (0, 0)), mode="constant",
                           constant_values=self.fill)
        sample["image"] = image
        return sample


class RandomHorizontalFlip:

    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, sample):
        if random.random() < self.prob:
            sample["image"] = np.ascontiguousarray(sample["image"][:, ::-1, :])
        return sample


class RandomCrop:

    def __init__(self, resize=224):
        self.resize = int(resize)

    def __call__(self, sample):
        image = sample["image"]
        h, w = image.shape[:2]
        th = tw = self.resize
        y = random.randint(0, max(h - th, 0))
        x = random.randint(0, max(w - tw, 0))
        sample["image"] = image[y:y + th, x:x + tw]
        return sample


class RandomResizedCrop:
    """torchvision RandomResizedCrop semantics: sample area scale in ``scale``
    and log-uniform aspect in (3/4, 4/3), 10 tries then center fallback."""

    def __init__(self, resize=224, scale=(0.08, 1.0), ratio=(3. / 4., 4. / 3.)):
        self.resize = int(resize)
        self.scale = scale
        self.ratio = ratio

    def __call__(self, sample):
        image = sample["image"]
        h, w = image.shape[:2]
        area = h * w
        for _ in range(10):
            target_area = random.uniform(*self.scale) * area
            log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
            aspect = math.exp(random.uniform(*log_ratio))
            cw = int(round(math.sqrt(target_area * aspect)))
            ch = int(round(math.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                y = random.randint(0, h - ch)
                x = random.randint(0, w - cw)
                crop = image[y:y + ch, x:x + cw]
                break
        else:
            in_ratio = w / h
            if in_ratio < self.ratio[0]:
                cw, ch = w, int(round(w / self.ratio[0]))
            elif in_ratio > self.ratio[1]:
                ch, cw = h, int(round(h * self.ratio[1]))
            else:
                cw, ch = w, h
            y = (h - ch) // 2
            x = (w - cw) // 2
            crop = image[y:y + ch, x:x + cw]
        sample["image"] = cv2.resize(
            crop.astype(np.float32), (self.resize, self.resize),
            interpolation=cv2.INTER_LINEAR)
        return sample


class Resize:
    """torchvision Resize(int): resize the short side keeping aspect."""

    def __init__(self, resize=224):
        self.resize = int(resize)

    def __call__(self, sample):
        image = sample["image"]
        h, w = image.shape[:2]
        if h <= w:
            nh, nw = self.resize, int(round(w * self.resize / h))
        else:
            nh, nw = int(round(h * self.resize / w)), self.resize
        sample["image"] = cv2.resize(image.astype(np.float32), (nw, nh),
                                     interpolation=cv2.INTER_LINEAR)
        return sample


class CenterCrop:

    def __init__(self, resize=224):
        self.resize = int(resize)

    def __call__(self, sample):
        image = sample["image"]
        h, w = image.shape[:2]
        th = tw = self.resize
        y = max((h - th) // 2, 0)
        x = max((w - tw) // 2, 0)
        sample["image"] = image[y:y + th, x:x + tw]
        return sample


class Normalize:
    """image / 255 (reference common.py:190-206 — no mean/std)."""

    def __call__(self, sample):
        sample["image"] = (sample["image"] / 255.0).astype(np.float32)
        return sample


class MeanStdNormalize:

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, sample):
        image = sample["image"].astype(np.float32) / 255.0
        sample["image"] = (image - self.mean) / self.std
        return sample


class RandomErasing:
    """timm-style random erasing (reference common.py:561-644)."""

    def __init__(self, prob=0.5, area_range=(0.02, 1. / 3.),
                 min_aspect_ratio=0.3, mode="pixel"):
        self.prob = prob
        self.area_range = area_range
        self.log_aspect = (math.log(min_aspect_ratio),
                           math.log(1.0 / min_aspect_ratio))
        self.mode = mode

    def __call__(self, sample):
        if random.random() > self.prob:
            return sample
        image = sample["image"].astype(np.float32)
        h, w, c = image.shape
        area = h * w
        for _ in range(10):
            target = random.uniform(*self.area_range) * area
            aspect = math.exp(random.uniform(*self.log_aspect))
            eh = int(round(math.sqrt(target * aspect)))
            ew = int(round(math.sqrt(target / aspect)))
            if eh < h and ew < w:
                y = random.randint(0, h - eh)
                x = random.randint(0, w - ew)
                if self.mode == "pixel":
                    image[y:y + eh, x:x + ew] = np.random.randn(
                        eh, ew, c).astype(np.float32)
                else:
                    image[y:y + eh, x:x + ew] = 0.0
                break
        sample["image"] = image
        return sample


class PCAJitter:
    """AlexNet-style PCA color jitter (reference common.py:270-310)."""

    def __init__(self, alpha_std=0.1):
        self.alpha_std = alpha_std

    def __call__(self, sample):
        image = sample["image"].astype(np.float32) / 255.0
        flat = image.reshape(-1, 3)
        cov = np.cov(flat, rowvar=False)
        eigval, eigvec = np.linalg.eigh(cov)
        alpha = np.random.normal(0, self.alpha_std, 3)
        delta = eigvec @ (alpha * eigval)
        sample["image"] = (image + delta) * 255.0
        return sample


# reference-name aliases (the configs use Torch* names)
TorchPad = Pad
TorchRandomHorizontalFlip = RandomHorizontalFlip
TorchRandomCrop = RandomCrop
TorchRandomResizedCrop = RandomResizedCrop
TorchResize = Resize
TorchCenterCrop = CenterCrop
TorchMeanStdNormalize = MeanStdNormalize
