import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))

from path import ILSVRC2012_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.datasets import ILSVRC2012Dataset
from simpleaicv_tpu.data.transforms import (Compose, RandomResizedCrop,
                                            RandomHorizontalFlip, Normalize)
from simpleaicv_tpu.data.collater import ClassificationCollater


class config:
    """ViT-L MAE pretrain (parity: reference
    2.masked_image_modeling_training/imagenet/mae_vit_large_patch16_224)."""
    network = "vit_large_patch16_224_mae_pretrain_model"
    input_image_size = 224

    model = MODELS.create(network)
    train_criterion = LOSSES.create("MAEMSELoss")

    train_dataset = ILSVRC2012Dataset(
        root_dir=ILSVRC2012_path, set_name="train",
        transform=Compose([
            RandomResizedCrop(resize=input_image_size, scale=(0.2, 1.0)),
            RandomHorizontalFlip(prob=0.5),
            Normalize(),
        ]))
    test_dataset = None
    train_collater = ClassificationCollater()
    test_collater = None

    seed = 0
    batch_size = 1024
    num_workers = 16
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 1.5e-4 * 1024 / 256, "beta1": 0.9,
                           "beta2": 0.95, "global_weight_decay": False,
                           "weight_decay": 0.05,
                           "no_weight_decay_layer_name_list":
                               ["cls_token", "mask_token"]})
    scheduler = ("CosineLR", {"warm_up_epochs": 40})
    epochs = 400
    print_interval = 100
    use_ema_model = False
