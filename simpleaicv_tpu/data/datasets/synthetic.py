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
