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
