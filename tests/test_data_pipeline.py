"""Data pipeline: loader determinism/sharding, mixup-cutmix labels,
augmentation sanity."""

import numpy as np

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.data.loader import DataLoader
from simpleaicv_tpu.data.collater import ClassificationCollater
from simpleaicv_tpu.data.datasets import FakeClassificationDataset
from simpleaicv_tpu.data.mixupcutmix import MixupCutmixClassificationCollater
from simpleaicv_tpu.data.auto_rand_augment import AutoAugment, RandAugment
from simpleaicv_tpu.data.transforms import (RandomResizedCrop, Resize,
                                            CenterCrop, MeanStdNormalize)


def test_loader_deterministic_per_epoch():
    ds = FakeClassificationDataset(64, 8, 10)
    loader = DataLoader(ds, 16, ClassificationCollater(), shuffle=True,
                        seed=3, num_workers=2)
    loader.set_epoch(1)
    first = [b["label"].copy() for b in loader]
    loader.set_epoch(1)
    again = [b["label"].copy() for b in loader]
    for a, b in zip(first, again):
        np.testing.assert_array_equal(a, b)
    loader.set_epoch(2)
    other = [b["label"].copy() for b in loader]
    assert any((a != b).any() for a, b in zip(first, other))
    assert len(first) == 4  # 64 / 16


def test_mixup_cutmix_labels_sum_to_one():
    ds = FakeClassificationDataset(8, 16, 10)
    coll = MixupCutmixClassificationCollater(num_classes=10,
                                             label_smoothing=0.1)
    np.random.seed(0)
    batch = coll([ds[i] for i in range(8)])
    assert batch["label"].shape == (8, 10)
    np.testing.assert_allclose(batch["label"].sum(1), 1.0, atol=1e-5)
    assert batch["image"].shape == (8, 16, 16, 3)


def test_augment_pipeline_shapes():
    sample = {"image": np.random.RandomState(0).uniform(
        0, 255, (48, 64, 3)).astype(np.float32), "label": 1}
    for t in (AutoAugment(), RandAugment(N=2, M=9),
              RandomResizedCrop(resize=32), Resize(resize=32),
              MeanStdNormalize([0.5] * 3, [0.25] * 3)):
        out = t(dict(sample))
        assert out["image"].ndim == 3
    s = CenterCrop(resize=32)(Resize(resize=36)(dict(sample)))
    assert s["image"].shape == (32, 32, 3)
