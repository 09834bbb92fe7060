"""ViT-B/16 ImageNet recipe with ON-DEVICE augmentation: same math as the
sibling ``vit_base_patch16`` recipe (RandAugment(2,9) + normalize + random
erasing + mixup/cutmix, reference
0.classification_training/imagenet/vit_base_patch16), but the whole
augmentation stack runs inside the jitted train step on the sharded global
batch (data/device_augment.py).  Host workers only decode + crop + flip, so
the input pipeline keeps a chip fed from a small-core host — the reference
needs 16+ dataloader cores for its PIL path."""

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
from simpleaicv_tpu.data.device_augment import (DeviceAugmentPipeline,
                                                DeviceRandAugment,
                                                DeviceMixupCutmix,
                                                DeviceRandomErasing)


class config:
    network = "vit_base_patch16"
    num_classes = 1000
    input_image_size = 224

    model = BACKBONES.create(network, image_size=input_image_size,
                             num_classes=num_classes, global_pool=True,
                             drop_path_prob=0.1)
    trained_model_path = ""  # e.g. converted MAE pretrain

    train_criterion = LOSSES.create("OneHotLabelCELoss")
    test_criterion = LOSSES.create("CELoss")

    # host: decode + crop + flip only (raw [0,255] float batches)
    train_dataset = ILSVRC2012Dataset(
        root_dir=ILSVRC2012_path, set_name="train",
        transform=Compose([
            RandomResizedCrop(resize=input_image_size),
            RandomHorizontalFlip(prob=0.5),
        ]))
    test_dataset = ILSVRC2012Dataset(
        root_dir=ILSVRC2012_path, set_name="val",
        transform=Compose([
            Resize(resize=256), CenterCrop(resize=input_image_size),
            Normalize(),
        ]))
    # uint8 transport: raw batches cross the worker pipe at 1/4 the
    # float32 bytes; the device pipeline casts to f32 on chip
    train_collater = ClassificationCollater(image_dtype="uint8")
    test_collater = ClassificationCollater()

    # device: RandAugment -> /255 -> erasing -> mixup/cutmix, inside jit
    device_augment = DeviceAugmentPipeline(
        augment=DeviceRandAugment(N=2, M=9),
        erasing=DeviceRandomErasing(prob=0.25),
        mixupcutmix=DeviceMixupCutmix(
            use_mixup=True, mixup_alpha=0.8, cutmix_alpha=1.0,
            num_classes=num_classes))

    seed = 0
    batch_size = 1024
    num_workers = 16
    accumulation_steps = 1

    optimizer = (
        "AdamW",
        {
            "lr": 1e-3,
            "global_weight_decay": False,
            "weight_decay": 0.05,
            "beta1": 0.9,
            "beta2": 0.999,
            "no_weight_decay_layer_name_list": ["position_encoding",
                                                 "cls_token"],
            "lr_layer_decay": 0.75,
            "lr_layer_decay_block_nums": 12,
            "block_name": "blocks",
        },
    )
    scheduler = ("CosineLR", {"warm_up_epochs": 5, "min_lr": 1e-6})

    epochs = 100
    print_interval = 100
    use_ema_model = False
