"""[vit_large_patch16 MAE finetune — parity: reference vit_large_patch16_for_official_mae_pretrain (official or self-train MAE checkpoint via trained_model_path)]
ImageNet-1K ViT-H/14 finetune from official MAE weights (parity:
reference 0.classification_training/imagenet — target top-1 86.608 per
results.md:145-153; convert the official MAE checkpoint with
tools/convert_official_weights.py --family mae_vit)."""

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
    network = "vit_large_patch16"
    num_classes = 1000
    input_image_size = 224

    model = BACKBONES.create(network, num_classes=num_classes,
                             global_pool=True, drop_path_prob=0.3,
                             use_gradient_checkpoint=True)
    trained_model_path = ""  # converted official MAE ViT-H checkpoint

    train_criterion = LOSSES.create("LabelSmoothCELoss")
    test_criterion = LOSSES.create("CELoss")

    train_dataset = ILSVRC2012Dataset(
        root_dir=ILSVRC2012_path, set_name="train",
        transform=Compose([RandomResizedCrop(resize=input_image_size),
                           RandomHorizontalFlip(prob=0.5), Normalize()]))
    test_dataset = ILSVRC2012Dataset(
        root_dir=ILSVRC2012_path, set_name="val",
        transform=Compose([Resize(resize=256),
                           CenterCrop(resize=input_image_size), Normalize()]))
    train_collater = ClassificationCollater()
    test_collater = ClassificationCollater()

    seed = 0
    batch_size = 128
    num_workers = 16
    accumulation_steps = 1

    optimizer = ("AdamW", {"lr": 1e-3, "global_weight_decay": True,
                           "weight_decay": 0.05,
                           "no_weight_decay_layer_name_list": [],
                           "lr_layer_decay": 0.75,
                           "lr_layer_decay_block_nums": 32,
                           "block_name": "blocks_"})
    scheduler = ("CosineLR", {"warm_up_epochs": 5})
    epochs = 50
    print_interval = 100
    use_ema_model = True
    ema_model_decay = 0.9999
