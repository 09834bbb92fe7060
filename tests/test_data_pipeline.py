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


def test_coco_semantic_segmentation_mask(tmp_path):
    """CocoSemanticSegmentation paints instance polygons into a per-pixel
    category map with later annotations overwriting, and reduce_zero_label
    maps background to 255 / classes 1..K to 0..K-1 (reference
    cocosemanticsegmentationdataset.py:138-170)."""
    import json
    import os
    import numpy as np
    import cv2
    from simpleaicv_tpu.data.datasets import CocoSemanticSegmentation

    root = tmp_path / "coco"
    os.makedirs(root / "annotations")
    os.makedirs(root / "val2017")
    img = np.zeros((20, 30, 3), np.uint8)
    cv2.imwrite(str(root / "val2017" / "000001.jpg"), img)
    data = {
        "categories": [{"id": 7, "name": "a"}, {"id": 9, "name": "b"}],
        "images": [{"id": 1, "file_name": "000001.jpg",
                    "height": 20, "width": 30}],
        "annotations": [
            # class a (label 0 -> painted value 1) covers left block
            {"id": 1, "image_id": 1, "category_id": 7, "iscrowd": 0,
             "bbox": [0, 0, 10, 10],
             "segmentation": [[0, 0, 10, 0, 10, 10, 0, 10]]},
            # class b (label 1 -> value 2) overlaps, painted later -> wins
            {"id": 2, "image_id": 1, "category_id": 9, "iscrowd": 0,
             "bbox": [5, 0, 10, 10],
             "segmentation": [[5, 0, 15, 0, 15, 10, 5, 10]]},
        ],
    }
    with open(root / "annotations" / "instances_val2017.json", "w") as f:
        json.dump(data, f)

    ds = CocoSemanticSegmentation(str(root), set_name="val2017")
    mask = ds[0]["mask"]
    assert mask[5, 2] == 1           # class a region
    assert mask[5, 12] == 2          # class b region
    assert mask[5, 8] == 2           # overlap: later annotation wins
    assert mask[15, 25] == 0         # background

    ds = CocoSemanticSegmentation(str(root), set_name="val2017",
                                  reduce_zero_label=True)
    mask = ds[0]["mask"]
    assert mask[5, 2] == 0 and mask[5, 12] == 1 and mask[15, 25] == 255


def test_auto_augment_all_policies_and_ops():
    """Full policy zoo (reference auto_rand_augment.py:358-496): every policy
    variant runs every one of its ops without error and preserves shape."""
    import random as _random
    import numpy as _np
    from simpleaicv_tpu.data.auto_rand_augment import (AutoAugment,
                                                       RandAugment,
                                                       AugmentOp,
                                                       _OP_FNS, _to_pil)
    _random.seed(0)
    img = (_np.random.RandomState(0).rand(48, 48, 3) * 255).astype(
        _np.float32)
    for policy in ("v0", "v0r", "original", "originalr"):
        aug = AutoAugment(policy=policy)
        for _ in range(8):
            out = aug({"image": img.copy()})
            assert out["image"].shape == img.shape
    # every op executes at full probability and max magnitude
    pil = _to_pil(img)
    for name in _OP_FNS:
        AugmentOp(name, 1.0, 10)(pil)
        AugmentOp(name, 1.0, 0)(pil)
    # posterize level 10 in the v0 table == bits 4; Posterize at level 0
    # keeps 0 bits -> black image (TPU EfficientNet behavior)
    black = _np.asarray(AugmentOp("Posterize", 1.0, 0)(pil))
    assert black.max() == 0
    out = RandAugment(N=2, M=9)({"image": img.copy()})
    assert out["image"].shape == img.shape


def test_loader_propagates_dataset_errors_and_survives_early_break():
    """A dataset exception must surface in the consumer (not hang the
    epoch), and breaking out of an epoch early must not deadlock."""
    import pytest
    from simpleaicv_tpu.data.loader import DataLoader

    class Exploding:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            if i == 7:
                raise ValueError("corrupt sample")
            return {"x": i}

    def collate(samples):
        return [s["x"] for s in samples]

    loader = DataLoader(Exploding(), batch_size=4, num_workers=2,
                        collater=collate, shuffle=False, drop_last=False,
                        prefetch=1)
    with pytest.raises(ValueError, match="corrupt sample"):
        for _ in loader:
            pass

    class Fine:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"x": i}

    loader = DataLoader(Fine(), batch_size=4, num_workers=2,
                        collater=collate, shuffle=False, prefetch=1)
    for epoch in range(3):  # early break every epoch; must never deadlock
        for i, batch in enumerate(loader):
            if i == 1:
                break
    full = [b for b in loader]
    assert len(full) == 16


def test_loader_process_mode_matches_thread_mode():
    """worker_mode='process' (fork pool, for GIL-bound PIL augmentation)
    must deliver the exact same batches as the thread mode, propagate
    worker exceptions, and survive early break without hanging."""
    import pytest

    ds = FakeClassificationDataset(64, 8, 10)
    kw = dict(shuffle=True, seed=5, num_workers=2)
    t_loader = DataLoader(ds, 16, ClassificationCollater(),
                          worker_mode="thread", **kw)
    p_loader = DataLoader(ds, 16, ClassificationCollater(),
                          worker_mode="process", **kw)
    t_loader.set_epoch(2)
    p_loader.set_epoch(2)
    tb = list(t_loader)
    pb = list(p_loader)
    assert len(tb) == len(pb) == 4
    for a, b in zip(tb, pb):
        np.testing.assert_array_equal(a["label"], b["label"])
        np.testing.assert_allclose(a["image"], b["image"])

    # early break must not deadlock
    for i, _ in enumerate(p_loader):
        if i == 1:
            break

    # non-drop_last remainder batch
    rem = DataLoader(ds, 24, ClassificationCollater(), shuffle=False,
                     drop_last=False, num_workers=2, worker_mode="process")
    sizes = [len(b["label"]) for b in rem]
    assert sizes == [24, 24, 16]

    class Exploding:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            if i == 5:
                raise ValueError("corrupt sample")
            return {"x": i}

    bad = DataLoader(Exploding(), 4, lambda s: [x["x"] for x in s],
                     shuffle=False, num_workers=2, worker_mode="process")
    with pytest.raises(ValueError, match="corrupt sample"):
        list(bad)
