"""ImageNet-1K darknettiny from scratch (parity: reference
0.classification_training/imagenet — target top-1 57.858)."""

import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))
from path import ILSVRC2012_path  # noqa: E402

from simpleaicv_tpu.core.registry import BACKBONES, LOSSES
from simpleaicv_tpu.data.datasets import ILSVRC2012Dataset
from simpleaicv_tpu.data.transforms import (Compose, RandomResizedCrop,
                                            RandomHorizontalFlip, Resize,
                                            CenterCrop, Normalize)
from simpleaicv_tpu.data.collater import ClassificationCollater


class config:
    network = "darknettiny"
    num_classes = 1000
    input_image_size = 256

    model = BACKBONES.create(network, num_classes=num_classes)
    trained_model_path = ""

    train_criterion = LOSSES.create("CELoss")
    test_criterion = LOSSES.create("CELoss")

    train_dataset = ILSVRC2012Dataset(
        root_dir=ILSVRC2012_path, set_name="train",
        transform=Compose([
            RandomResizedCrop(resize=input_image_size),
            RandomHorizontalFlip(prob=0.5),
            Normalize(),
        ]))
    test_dataset = ILSVRC2012Dataset(
        root_dir=ILSVRC2012_path, set_name="val",
        transform=Compose([
            Resize(resize=int(input_image_size * 256 / 224)),
            CenterCrop(resize=input_image_size),
            Normalize(),
        ]))
    train_collater = ClassificationCollater()
    test_collater = ClassificationCollater()

    seed = 0
    batch_size = 256
    num_workers = 16
    accumulation_steps = 1

    optimizer = ("SGD", {"lr": 0.1, "momentum": 0.9, "global_weight_decay": False, "weight_decay": 1e-4, "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 5})

    epochs = 100
    print_interval = 100
    use_ema_model = False
    ema_model_decay = 0.9999
