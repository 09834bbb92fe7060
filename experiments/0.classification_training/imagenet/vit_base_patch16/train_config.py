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
from simpleaicv_tpu.data.mixupcutmix import MixupCutmixClassificationCollater
from simpleaicv_tpu.data.collater import ClassificationCollater


class config:
    """ViT-B/16 finetune with layer-wise lr decay + mixup/cutmix (parity:
    reference 0.classification_training/imagenet/vit_base_patch16...)."""
    network = "vit_base_patch16"
    num_classes = 1000
    input_image_size = 224

    model = BACKBONES.create(network, image_size=input_image_size,
                             num_classes=num_classes, global_pool=True,
                             drop_path_prob=0.1)
    trained_model_path = ""  # e.g. converted MAE pretrain

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
            Resize(resize=256), CenterCrop(resize=input_image_size),
            Normalize(),
        ]))
    train_collater = MixupCutmixClassificationCollater(
        use_mixup=True, mixup_alpha=0.8, cutmix_alpha=1.0,
        num_classes=num_classes)
    test_collater = ClassificationCollater()

    seed = 0
    batch_size = 1024
    num_workers = 16
    # PIL AutoAugment is GIL-bound: fork workers keep the chip fed
    loader_worker_mode = "process"
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
            # ViT layer-wise lr decay (reference tools/utils.py:294-338)
            "lr_layer_decay": 0.75,
            "lr_layer_decay_block_nums": 12,
            "block_name": "blocks",
        },
    )
    scheduler = ("CosineLR", {"warm_up_epochs": 5, "min_lr": 1e-6})

    epochs = 100
    print_interval = 100
    use_ema_model = False
