"""ImageNet-1K van_b3 (parity: reference
0.classification_training/imagenet/van_b3/train_config.py — 224², bs512
accum2, AdamW 2.5e-4, wd 5e-2, CosineLR 300 epochs warmup 5, RandAugment +
RandomErasing + mixup/cutmix one-hot CE)."""

import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))
from path import ILSVRC2012_path  # noqa: E402

from simpleaicv_tpu.core.registry import BACKBONES, LOSSES
from simpleaicv_tpu.data.datasets import ILSVRC2012Dataset
from simpleaicv_tpu.data.transforms import (Compose, RandomResizedCrop,
                                            RandomHorizontalFlip, Resize,
                                            CenterCrop, Normalize,
                                            RandomErasing)
from simpleaicv_tpu.data.auto_rand_augment import RandAugment
from simpleaicv_tpu.data.collater import ClassificationCollater
from simpleaicv_tpu.data.mixupcutmix import MixupCutmixClassificationCollater


class config:
    network = "van_b3"
    num_classes = 1000
    input_image_size = 224

    model = BACKBONES.create(network, num_classes=num_classes)
    trained_model_path = ""

    # mixup/cutmix produces soft one-hot labels
    train_criterion = LOSSES.create("OneHotLabelCELoss")
    test_criterion = LOSSES.create("CELoss")

    train_dataset = ILSVRC2012Dataset(
        root_dir=ILSVRC2012_path, set_name="train",
        transform=Compose([
            RandomResizedCrop(resize=input_image_size),
            RandomHorizontalFlip(prob=0.5),
            RandAugment(N=2, M=9),
            Normalize(),
            RandomErasing(prob=0.25),
        ]))
    test_dataset = ILSVRC2012Dataset(
        root_dir=ILSVRC2012_path, set_name="val",
        transform=Compose([
            Resize(resize=256),
            CenterCrop(resize=input_image_size),
            Normalize(),
        ]))
    train_collater = MixupCutmixClassificationCollater(
        use_mixup=True, mixup_alpha=0.8, cutmix_alpha=1.0,
        label_smoothing=0.1, num_classes=num_classes)
    test_collater = ClassificationCollater()

    seed = 0
    batch_size = 512
    num_workers = 16
    # PIL AutoAugment is GIL-bound: fork workers keep the chip fed
    loader_worker_mode = "process"
    accumulation_steps = 2

    optimizer = (
        "AdamW",
        {
            "lr": 2.5e-4,
            "global_weight_decay": False,
            "weight_decay": 5e-2,
            "no_weight_decay_layer_name_list": [],
        },
    )
    scheduler = (
        "CosineLR",
        {
            "warm_up_epochs": 5,
            "min_lr": 1e-6,
        },
    )

    epochs = 300
    print_interval = 100

    use_ema_model = False
    ema_model_decay = 0.9999

    mesh_data = -1
    mesh_fsdp = 1
