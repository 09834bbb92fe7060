"""Eval-only config for the synthetic SOLOv2 smoke experiment."""

import os

from simpleaicv_tpu.core.registry import MODELS, DECODERS
from simpleaicv_tpu.data.instance_segmentation import (
    FakeInstanceSegmentationDataset, InstanceSegmentationResize,
    InstanceNormalize, SOLOV2InstanceSegmentationCollater)
from simpleaicv_tpu.data.transforms import Compose

_DIR = os.path.dirname(os.path.abspath(__file__))


class config:
    network = "resnet18_solov2"
    num_classes = 4
    input_image_size = 128

    model = MODELS.create(network, num_classes=num_classes)
    decoder = DECODERS.create("SOLOV2Decoder", topn=100, max_object_num=20)
    trained_model_path = os.path.join(_DIR, "checkpoints", "best")

    test_dataset = FakeInstanceSegmentationDataset(
        num_samples=4, image_hw=160, num_classes=num_classes,
        transform=Compose([
            InstanceSegmentationResize(resize=input_image_size,
                                       resize_type="yolo_style"),
            InstanceNormalize(),
        ]))
    test_collater = SOLOV2InstanceSegmentationCollater(
        resize=input_image_size, resize_type="yolo_style")

    batch_size = 4
    num_workers = 2
