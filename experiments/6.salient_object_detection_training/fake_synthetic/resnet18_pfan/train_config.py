"""Synthetic salient-object-detection smoke experiment."""

import numpy as np

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.segmentation import FakeSegmentationDataset


class _BinaryWrap:
    """Reuse FakeSegmentationDataset but binarize the mask."""

    def __init__(self, ds):
        self.ds = ds

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        s = self.ds[i]
        s["mask"] = (s["mask"] > 0).astype(np.float32)
        s["image"] = s["image"] / 255.0
        return s


class _Collater:

    def __call__(self, samples):
        return {
            "image": np.stack([s["image"] for s in samples]).astype(
                np.float32),
            "mask": np.stack([s["mask"] for s in samples]).astype(np.float32),
        }


class config:
    network = "resnet18_pfan_segmentation"
    input_image_size = 64

    model = MODELS.create(network)
    train_criterion = None
    criterion_list = [
        ("BinaryBCELoss", 1.0, LOSSES.create("BinaryBCELoss")),
        ("BCEIouloss", 1.0, LOSSES.create("BCEIouloss")),
    ]

    train_dataset = _BinaryWrap(FakeSegmentationDataset(32, 64, 2))
    test_dataset = _BinaryWrap(FakeSegmentationDataset(8, 64, 2))
    train_collater = _Collater()
    test_collater = _Collater()

    seed = 0
    batch_size = 8
    num_workers = 2
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 3e-4, "global_weight_decay": False,
                           "weight_decay": 1e-3,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 0})
    epochs = 2
    print_interval = 2
    use_ema_model = False
