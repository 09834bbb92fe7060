"""CIFAR-100 eval config (pairs with tools/test_classification.py)."""

import numpy as np

from simpleaicv_tpu.core.registry import BACKBONES, LOSSES
from simpleaicv_tpu.data.datasets import CIFAR100Dataset
from simpleaicv_tpu.data.transforms import Compose, MeanStdNormalize
from simpleaicv_tpu.data.collater import ClassificationCollater

CIFAR100_path = "/root/datasets/CIFAR100"


class config:
    network = "resnet18cifar"
    num_classes = 100
    input_image_size = 32

    model = BACKBONES.create(network, num_classes=num_classes)
    trained_model_path = ""   # point at checkpoints/best
    test_criterion = LOSSES.create("CELoss")

    test_dataset = CIFAR100Dataset(
        root_dir=CIFAR100_path, set_name="test",
        transform=Compose([
            MeanStdNormalize(mean=np.array([125.3, 123.0, 113.9]) / 255.0,
                             std=np.array([63.0, 62.1, 66.7]) / 255.0),
        ]))
    test_collater = ClassificationCollater()

    seed = 0
    batch_size = 128
    num_workers = 4
