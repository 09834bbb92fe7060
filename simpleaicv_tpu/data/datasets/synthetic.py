"""Synthetic datasets for tests and benchmarks (no real data on disk)."""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


class FakeClassificationDataset:
    """Deterministic per-index random image + label."""

    def __init__(self, num_samples: int = 512, image_hw: int = 32,
                 num_classes: int = 100,
                 transform: Optional[Callable] = None):
        self.num_samples = num_samples
        self.image_hw = image_hw
        self.num_classes = num_classes
        self.transform = transform

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.RandomState(idx)
        sample = {
            "image": rng.randint(
                0, 256, (self.image_hw, self.image_hw, 3)).astype(np.float32),
            "label": int(rng.randint(0, self.num_classes)),
        }
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class LearnableDetectionDataset:
    """Separable synthetic detection task: ONE pure-color rectangle per
    image, class = color channel (R/G/B). Unlike
    :class:`~simpleaicv_tpu.data.datasets.coco.FakeDetectionDataset`
    (overlapping boxes overwrite each other — label noise), every annotation
    here is exactly visible, so FCOS-class detectors reach high mAP within a
    few hundred steps and end-to-end learning of the assembled loop
    (assignment -> loss -> grads -> optimizer -> decode -> COCO mAP) can be
    asserted. Plays the role of the reference's results.md COCO tables
    (/root/reference/results.md:102-562) in this offline env.

    ``set_name`` offsets seeds so train/val draws are disjoint."""

    def __init__(self, num_samples: int = 64, image_hw: int = 96,
                 set_name: str = "train",
                 transform: Optional[Callable] = None):
        self.num_samples = num_samples
        self.image_hw = image_hw
        self.num_classes = 3
        self.seed_base = 0 if set_name == "train" else 1_000_003
        self.transform = transform

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.RandomState(self.seed_base + idx)
        hw = self.image_hw
        image = rng.uniform(0, 60, (hw, hw, 3)).astype(np.float32)
        w = rng.randint(hw // 4, hw // 2)
        h = rng.randint(hw // 4, hw // 2)
        x1 = rng.randint(0, hw - w)
        y1 = rng.randint(0, hw - h)
        cls = rng.randint(0, 3)
        color = np.zeros(3, np.float32)
        color[cls] = 230.0
        image[y1:y1 + h, x1:x1 + w] = color
        sample = {"image": image,
                  "annots": np.asarray([[x1, y1, x1 + w, y1 + h, cls]],
                                       np.float32),
                  "scale": np.float32(1.0),
                  "size": np.array([hw, hw], np.float32),
                  "image_id": idx}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class TwoModeImageDataset:
    """Two-mode toy distribution for diffusion convergence tests: each
    sample is a constant image at pixel level ``(±mode + 1) * 127.5`` plus
    small Gaussian noise. A DDPM trained on this must reproduce BOTH modes
    at sampling time — the minimal in-env check that the diffusion loop
    (q-sample -> noise-pred loss -> optimizer -> reverse-process sampler)
    learns a distribution, not just a loss floor."""

    def __init__(self, num_samples: int = 64, image_hw: int = 16,
                 mode: float = 0.6):
        self.num_samples = num_samples
        self.image_hw = image_hw
        self.mode = mode

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.RandomState(idx)
        sign = 1.0 if idx % 2 == 0 else -1.0
        base = (sign * self.mode + 1.0) * 127.5
        img = base + 4.0 * rng.randn(self.image_hw, self.image_hw, 3)
        return {"image": np.clip(img, 0, 255).astype(np.float32),
                "label": 0}


class LearnableClassificationDataset:
    """Separable synthetic classification task: each class is a fixed random
    smooth template plus per-sample Gaussian noise. Unlike
    :class:`FakeClassificationDataset` (random labels — nothing to learn),
    a small model reaches ~100% accuracy in a few epochs, so end-to-end
    convergence of the full Trainer stack (loader -> SPMD step -> optimizer/
    schedule/EMA -> eval -> best-checkpoint) can be asserted without any
    real dataset on disk (this offline env has none; the reference's
    results.md accuracy tables play this role upstream).

    ``set_name`` offsets the per-sample noise seeds so train and val draws
    are disjoint while sharing the class templates.
    """

    def __init__(self, num_samples: int = 256, image_hw: int = 32,
                 num_classes: int = 4, noise: float = 20.0,
                 set_name: str = "train",
                 transform: Optional[Callable] = None):
        self.num_samples = num_samples
        self.image_hw = image_hw
        self.num_classes = num_classes
        self.noise = noise
        self.seed_base = 0 if set_name == "train" else 1_000_003
        self.transform = transform
        # fixed per-class smooth templates in [64, 192] (room for noise)
        self.templates = [
            64.0 + 128.0 * np.random.RandomState(7 + c).rand(
                image_hw, image_hw, 3).astype(np.float32)
            for c in range(num_classes)]

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        label = idx % self.num_classes
        rng = np.random.RandomState(self.seed_base + idx)
        image = self.templates[label] + self.noise * rng.randn(
            self.image_hw, self.image_hw, 3).astype(np.float32)
        sample = {"image": np.clip(image, 0.0, 255.0),
                  "label": int(label)}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
