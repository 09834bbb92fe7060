"""CIFAR-10 ResNet-18 (parity: reference 0.classification_training/cifar10 (capability beyond results.md) —
200 epochs, pad-crop-flip aug; target top-1 n/a)."""

import os
import sys

import numpy as np

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))
from path import CIFAR10_path  # noqa: E402

from simpleaicv_tpu.core.registry import BACKBONES, LOSSES
from simpleaicv_tpu.data.datasets import CIFAR10Dataset
from simpleaicv_tpu.data.transforms import (Compose, Pad,
                                            RandomHorizontalFlip, RandomCrop,
                                            MeanStdNormalize)
from simpleaicv_tpu.data.collater import ClassificationCollater

_MEAN = np.array([125.3, 123.0, 113.9]) / 255.0
_STD = np.array([63.0, 62.1, 66.7]) / 255.0


class config:
    network = "resnet18cifar"
    num_classes = 10
    input_image_size = 32

    model = BACKBONES.create(network, num_classes=num_classes)
    trained_model_path = ""

    train_criterion = LOSSES.create("CELoss")
    test_criterion = LOSSES.create("CELoss")

    train_dataset = CIFAR10Dataset(
        root_dir=CIFAR10_path, set_name="train",
        transform=Compose([
            Pad(padding=4, fill=0, padding_mode="reflect"),
            RandomHorizontalFlip(prob=0.5),
            RandomCrop(resize=input_image_size),
            MeanStdNormalize(mean=_MEAN, std=_STD),
        ]))
    test_dataset = CIFAR10Dataset(
        root_dir=CIFAR10_path, set_name="test",
        transform=Compose([MeanStdNormalize(mean=_MEAN, std=_STD)]))
    train_collater = ClassificationCollater()
    test_collater = ClassificationCollater()

    seed = 0
    batch_size = 128
    num_workers = 4
    accumulation_steps = 1

    optimizer = ("SGD", {"lr": 0.1, "momentum": 0.9,
                         "global_weight_decay": False,
                         "weight_decay": 5e-4,
                         "no_weight_decay_layer_name_list": []})
    scheduler = ("MultiStepLR", {"warm_up_epochs": 0,
                                 "milestones": [60, 120, 160],
                                 "gamma": 0.2})

    epochs = 200
    print_interval = 50
    use_ema_model = False
