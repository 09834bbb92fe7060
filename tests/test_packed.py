"""Packed decode-once dataset cache (simpleaicv_tpu/data/packed.py).

Covers: write/read roundtrip for multi-field records, per-sample dataset
view, batch gather (native C path vs numpy fallback equality), PackedLoader
determinism / epoch reshuffle / drop_last, equivalence with the per-sample
DataLoader pipeline on identical seeds, JPEG folder packing, and the
Trainer integration smoke (packed dataset end-to-end train step).
"""

import os

import numpy as np
import pytest

from simpleaicv_tpu.data import native_io
from simpleaicv_tpu.data.packed import (PackReader, PackWriter,
                                        PackedDataset, PackedLoader,
                                        pack_dataset, pack_image_folder)


def _write_demo_pack(path, n=37, hw=16):
    rng = np.random.RandomState(0)
    fields = {"image": ((hw, hw, 3), "uint8"), "label": ((), "int32"),
              "weight": ((5,), "float32")}
    samples = []
    with PackWriter(path, fields, n, meta={"class_names": ["a", "b"]}) as w:
        for i in range(n):
            s = {"image": rng.randint(0, 256, (hw, hw, 3), np.uint8),
                 "label": np.int32(i % 7),
                 "weight": rng.randn(5).astype(np.float32)}
            samples.append(s)
            w.add(s)
    return samples


def test_roundtrip(tmp_path):
    path = str(tmp_path / "demo.pack")
    samples = _write_demo_pack(path)
    r = PackReader(path)
    assert len(r) == len(samples)
    assert r.meta["class_names"] == ["a", "b"]
    for i in (0, 5, len(samples) - 1):
        s = r.read_sample(i)
        np.testing.assert_array_equal(s["image"], samples[i]["image"])
        assert s["label"] == samples[i]["label"]
        np.testing.assert_array_equal(s["weight"], samples[i]["weight"])


def test_read_batch_matches_fancy_index(tmp_path):
    path = str(tmp_path / "demo.pack")
    samples = _write_demo_pack(path)
    r = PackReader(path)
    idx = np.array([3, 0, 11, 11, 36])
    batch = r.read_batch(idx, n_threads=2)
    ref_img = np.stack([samples[i]["image"] for i in idx])
    np.testing.assert_array_equal(batch["image"], ref_img)
    np.testing.assert_array_equal(
        batch["label"], np.array([samples[i]["label"] for i in idx]))


@pytest.mark.skipif(not native_io.available(), reason="native io not built")
def test_native_gather_equals_numpy(tmp_path):
    path = str(tmp_path / "demo.pack")
    _write_demo_pack(path, n=64, hw=24)
    r = PackReader(path)
    arr = r.arrays["image"]
    idx = np.random.RandomState(1).randint(0, 64, 17)
    got = native_io.gather_records(arr, idx, n_threads=3)
    assert got is not None
    np.testing.assert_array_equal(got, np.asarray(arr)[idx])


def test_packed_dataset_view(tmp_path):
    path = str(tmp_path / "demo.pack")
    samples = _write_demo_pack(path)
    ds = PackedDataset(path)
    assert len(ds) == len(samples)
    s = ds[4]
    assert s["image"].dtype == np.float32  # dataset contract: f32 [0,255]
    np.testing.assert_array_equal(s["image"],
                                  samples[4]["image"].astype(np.float32))
    assert ds.class_names == ["a", "b"]


def test_packed_loader_determinism_and_epochs(tmp_path):
    path = str(tmp_path / "demo.pack")
    _write_demo_pack(path, n=40)
    loader = PackedLoader(path, batch_size=8, shuffle=True, seed=3)
    assert len(loader) == 5
    loader.set_epoch(1)
    run1 = [b["label"].copy() for b in loader]
    run2 = [b["label"].copy() for b in loader]
    for a, b in zip(run1, run2):
        np.testing.assert_array_equal(a, b)  # same epoch -> same order
    loader.set_epoch(2)
    run3 = np.concatenate([b["label"] for b in loader])
    assert not np.array_equal(np.concatenate(run1), run3)  # reshuffled
    # epoch covers each sample exactly once
    loader2 = PackedLoader(path, batch_size=8, shuffle=True, seed=3,
                           drop_last=False)
    idx_seen = np.sort(np.concatenate(
        [b["weight"][:, 0] for b in loader2]))
    assert len(idx_seen) == 40


def test_packed_loader_matches_dataloader_order(tmp_path):
    """PackedLoader and the per-sample DataLoader use the same
    (seed, epoch)-keyed permutation, so the fast path is a drop-in: same
    batches, same order."""
    from simpleaicv_tpu.data.collater import ClassificationCollater
    from simpleaicv_tpu.data.datasets import FakeClassificationDataset
    from simpleaicv_tpu.data.loader import DataLoader

    ds = FakeClassificationDataset(num_samples=30, image_hw=12,
                                   num_classes=9)
    path = str(tmp_path / "fake.pack")
    pack_dataset(ds, path)
    ref_loader = DataLoader(ds, 6, ClassificationCollater(
        image_dtype="uint8"), shuffle=True, num_workers=2, seed=11)
    fast_loader = PackedLoader(path, 6, shuffle=True, seed=11)
    ref_loader.set_epoch(2)
    fast_loader.set_epoch(2)
    for rb, fb in zip(ref_loader, fast_loader):
        np.testing.assert_array_equal(rb["image"], fb["image"])
        np.testing.assert_array_equal(rb["label"], fb["label"])


def test_pack_image_folder_jpeg(tmp_path):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path / "folder"
    rng = np.random.RandomState(0)
    truth = {}
    for ci, cname in enumerate(["cat", "dog"]):
        os.makedirs(root / cname)
        for j in range(3):
            img = rng.randint(0, 256, (40 + 8 * j, 52, 3), np.uint8)
            p = str(root / cname / f"im{j}.jpg")
            cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                        [cv2.IMWRITE_JPEG_QUALITY, 95])
            truth[p] = ci
    out = str(tmp_path / "folder.pack")
    pack_image_folder(str(root), out, image_hw=32, batch=4)
    r = PackReader(out)
    assert len(r) == 6
    assert r.meta["class_names"] == ["cat", "dog"]
    labels = np.asarray(r.arrays["label"])
    np.testing.assert_array_equal(np.sort(labels), [0, 0, 0, 1, 1, 1])
    imgs = np.asarray(r.arrays["image"])
    assert imgs.shape == (6, 32, 32, 3)
    # decoded content, not zeros: JPEG of random noise keeps wide range
    assert imgs.std() > 30


def test_trainer_integration_packed(tmp_path):
    """End-to-end: a config whose train_dataset is a PackedDataset trains
    through the PackedLoader fast path (uint8 -> device augment) and the
    loss is finite."""
    from simpleaicv_tpu.core.trainer import Trainer
    from simpleaicv_tpu.tasks import classification
    from simpleaicv_tpu.data.datasets import LearnableClassificationDataset
    from simpleaicv_tpu.data.collater import ClassificationCollater
    from simpleaicv_tpu.data.device_augment import (DeviceAugmentPipeline,
                                                    DeviceRandomErasing)
    from simpleaicv_tpu.core.registry import BACKBONES
    from simpleaicv_tpu.losses import CELoss

    ds = LearnableClassificationDataset(num_samples=32, image_hw=16,
                                        num_classes=4)
    path = str(tmp_path / "train.pack")
    pack_dataset(ds, path)

    class config:
        network = "resnet18cifar"
        model = BACKBONES.create("resnet18cifar", num_classes=4)
        train_criterion = CELoss()
        test_criterion = CELoss()
        train_dataset = PackedDataset(path)
        test_dataset = None
        train_collater = ClassificationCollater()
        test_collater = ClassificationCollater()
        seed = 0
        batch_size = 8
        epochs = 1
        input_image_size = 16
        optimizer = ("SGD", {"lr": 0.1, "momentum": 0.9,
                             "global_weight_decay": False,
                             "weight_decay": 5e-4, "no_weight_decay_layer_name_list": []})
        scheduler = ("CosineLR", {"warm_up_epochs": 0, "min_lr": 1e-6})
        num_workers = 2
        print_interval = 2
        device_augment = DeviceAugmentPipeline(
            erasing=DeviceRandomErasing(prob=0.2))

    t = Trainer(config, str(tmp_path / "work"),
                make_loss_fn=classification.make_loss_fn,
                make_eval_fn=classification.make_eval_fn,
                evaluate=classification.evaluate)
    assert isinstance(t.train_loader, PackedLoader)
    loss = t.train_epoch(1)
    assert np.isfinite(loss)
