"""Eval-only config for the synthetic FCOS smoke experiment (mirrors the
reference's per-experiment test_config.py convention)."""

import os

from simpleaicv_tpu.core.registry import MODELS, DECODERS
from simpleaicv_tpu.data.datasets.coco import FakeDetectionDataset
from simpleaicv_tpu.data.detection import DetectionResize, Normalize, \
    DetectionCollater
from simpleaicv_tpu.data.transforms import Compose

_DIR = os.path.dirname(os.path.abspath(__file__))


class config:
    network = "resnet18_fcos"
    num_classes = 8
    input_image_size = 128

    model = MODELS.create(network, num_classes=num_classes)
    decoder = DECODERS.create("FCOSDecoder", topn=500, max_object_num=50)

    # the 'best' dir is the stable name; the metric-suffixed symlink next to
    # it changes per run
    trained_model_path = os.path.join(_DIR, "checkpoints", "best")

    test_dataset = FakeDetectionDataset(
        num_samples=16, image_hw=160, num_classes=num_classes,
        transform=Compose([
            DetectionResize(resize=input_image_size,
                            resize_type="yolo_style"),
            Normalize(),
        ]))
    test_collater = DetectionCollater(resize=input_image_size,
                                      resize_type="yolo_style")

    batch_size = 8
    num_workers = 2
