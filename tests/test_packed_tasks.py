"""Detection + SAM packed caches (data/packed_tasks.py): round-trip
equivalence against the live transform/collater pipelines, and PackedLoader
integration. These close the heavy-input verticals (COCO 832²–1024², SA-1B)
onto the decode-once path — reference
tools/train_detection_model.py:74-94 feeds them with DataLoader worker
pools instead."""

import numpy as np
import pytest

from simpleaicv_tpu.data.datasets.coco import FakeDetectionDataset
from simpleaicv_tpu.data.interactive_segmentation import (
    FakeSAMSegmentationDataset, SAMBatchCollater, SamResize)
from simpleaicv_tpu.data.packed import PackedDataset, PackedLoader, PackReader
from simpleaicv_tpu.data.packed_tasks import (PackedDetectionCollate,
                                              PackedSAMCollate,
                                              pack_detection_dataset,
                                              pack_sam_dataset)


def _reference_detection_batch(ds_factory, indices, hw):
    """The live host pipeline's batch for given samples: DetectionResize
    (yolo_style) + Normalize + DetectionCollater."""
    from simpleaicv_tpu.data.detection import (DetectionCollater,
                                               DetectionResize, Normalize)
    from simpleaicv_tpu.data.transforms import Compose
    tfm = Compose([DetectionResize(resize=hw, resize_type="yolo_style"),
                   Normalize()])
    ds = ds_factory(tfm)
    return DetectionCollater(resize=hw, resize_type="yolo_style",
                             max_annots_num=20)([ds[i] for i in indices])


def test_pack_detection_round_trip(tmp_path):
    hw = 128
    raw = FakeDetectionDataset(num_samples=8, image_hw=160, num_classes=3,
                               max_boxes=2)
    path = str(tmp_path / "det.pack")
    pack_detection_dataset(raw, path, image_hw=hw, max_annots=20)

    r = PackReader(path)
    assert r.meta["task"] == "detection"
    assert r.fields["image"]["shape"] == [hw, hw, 3]
    assert r.fields["annots"]["shape"] == [20, 5]

    idx = np.arange(8)
    got = PackedDetectionCollate()(r.read_batch(idx))
    want = _reference_detection_batch(
        lambda t: FakeDetectionDataset(num_samples=8, image_hw=160,
                                       num_classes=3, max_boxes=2,
                                       transform=t), idx, hw)
    # annots/scale/size: identical geometry math -> exact
    np.testing.assert_allclose(got["annots"], want["annots"], atol=1e-5)
    np.testing.assert_allclose(got["scale"], want["scale"], atol=1e-6)
    np.testing.assert_allclose(got["size"], want["size"], atol=0)
    # image: pack rounds to the uint8 lattice AFTER the same cv2 resize the
    # live pipeline runs on f32 — bounded by half a quantum post-normalize
    assert got["image"].shape == want["image"].shape
    assert np.max(np.abs(got["image"] - want["image"])) <= 0.51 / 255.0


def test_packed_detection_loader(tmp_path):
    hw = 128
    raw = FakeDetectionDataset(num_samples=12, image_hw=160, num_classes=3)
    path = str(tmp_path / "det.pack")
    pack_detection_dataset(raw, path, image_hw=hw, max_annots=20)
    loader = PackedLoader(path, batch_size=4, shuffle=True, seed=0,
                          collate=PackedDetectionCollate())
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["image"].shape == (4, hw, hw, 3)
    assert b["image"].dtype == np.float32
    assert b["image"].max() <= 1.0
    assert b["annots"].shape == (4, 20, 5)
    # every batch has at least one real (non-pad) annotation
    assert (b["annots"][..., 4] >= 0).any()


def test_pack_sam_round_trip(tmp_path):
    hw = 64
    raw = FakeSAMSegmentationDataset(6, 96)  # non-square-to-canvas path
    path = str(tmp_path / "sam.pack")
    pack_sam_dataset(raw, path, image_hw=hw, max_point_candidates=16)

    r = PackReader(path)
    assert r.meta["task"] == "sam"
    idx = np.arange(6)
    got = PackedSAMCollate(use_noise_bbox=False)(r.read_batch(idx))

    # live pipeline on the same samples
    live_ds = FakeSAMSegmentationDataset(6, 96, transform=SamResize(hw))
    want = SAMBatchCollater(resize=hw, use_noise_bbox=False)(
        [live_ds[i] for i in idx])

    for k in ("image", "mask", "prompt_point", "prompt_box", "prompt_mask"):
        assert got[k].shape == want[k].shape, k
        assert got[k].dtype == want[k].dtype, k
    # mask is stored bit-packed lossless -> exact
    np.testing.assert_array_equal(got["mask"], want["mask"])
    # prior mask is the same nearest-downsample of the same gt
    np.testing.assert_array_equal(got["prompt_mask"], want["prompt_mask"])
    # tight boxes over identical masks -> exact
    np.testing.assert_allclose(got["prompt_box"], want["prompt_box"])
    # image: uint8 lattice bound
    assert np.max(np.abs(got["image"] - want["image"])) <= 0.51 / 255.0
    # prompt points: positive labels on true foreground pixels
    pts = got["prompt_point"]
    for i in range(6):
        real = pts[i, :, 2] > 0
        assert real.any()
        xs = pts[i, real, 0].astype(int)
        ys = pts[i, real, 1].astype(int)
        assert (got["mask"][i, ys, xs] == 1.0).all()


def test_packed_sam_loader_shapes(tmp_path):
    hw = 64
    raw = FakeSAMSegmentationDataset(8, 96)
    path = str(tmp_path / "sam.pack")
    pack_sam_dataset(raw, path, image_hw=hw)
    loader = PackedLoader(path, batch_size=4, shuffle=True, seed=1,
                          collate=PackedSAMCollate())
    b = next(iter(loader))
    assert b["image"].shape == (4, hw, hw, 3)
    assert b["mask"].shape == (4, hw, hw)
    assert b["prompt_point"].shape == (4, 9, 3)
    assert b["prompt_box"].shape == (4, 4)
    assert b["prompt_mask"].shape == (4, hw // 4, hw // 4, 1)


def test_trainer_routes_packed_detection(tmp_path):
    """Trainer + PackedDataset + packed_batch collater -> PackedLoader fast
    path; one real FCOS epoch trains from the pack."""
    import jax.numpy as jnp

    from simpleaicv_tpu.core.registry import LOSSES, MODELS
    from simpleaicv_tpu.core.trainer import Trainer
    from simpleaicv_tpu.tasks import detection

    hw = 128
    raw = FakeDetectionDataset(num_samples=16, image_hw=160, num_classes=3)
    path = str(tmp_path / "det.pack")
    pack_detection_dataset(raw, path, image_hw=hw, max_annots=20)

    class config:
        network = "resnet18_fcos"
        num_classes = 3
        input_image_size = hw
        model = MODELS.create(network, num_classes=3)
        train_criterion = LOSSES.create("FCOSLoss")
        train_dataset = PackedDataset(path)
        test_dataset = None
        train_collater = PackedDetectionCollate()
        test_collater = None
        seed = 0
        batch_size = 8
        num_workers = 2
        accumulation_steps = 1
        use_ema_model = False
        epochs = 1
        print_interval = 1
        optimizer = ("AdamW", {"lr": 1e-4, "global_weight_decay": False,
                               "weight_decay": 1e-4,
                               "no_weight_decay_layer_name_list": []})
        scheduler = ("CosineLR", {"warm_up_epochs": 0})

    init_batch = {"image": jnp.zeros((2, hw, hw, 3), jnp.float32)}
    trainer = Trainer(config, str(tmp_path / "work"),
                      make_loss_fn=detection.make_loss_fn,
                      make_eval_fn=None, evaluate=None,
                      init_batch=init_batch)
    assert isinstance(trainer.train_loader, PackedLoader)
    best = trainer.run()
    assert np.isfinite(best)
