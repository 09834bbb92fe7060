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
    """ViT-MoE-B/16 from scratch: the vit_base recipe with every second FFN
    a token-routed 8-expert top-2 MoE (beyond-parity; parallel/moe.py).
    ~3.4x the params of ViT-B at roughly ViT-B per-token train FLOPs; on a
    multi-chip mesh shard the expert stacks with
    ``expert_param_sharding(mesh, params, axis='fsdp')`` (docs/SCALING.md)."""
    network = "vit_moe_base_patch16"
    num_classes = 1000
    input_image_size = 224

    model = BACKBONES.create(network, image_size=input_image_size,
                             num_classes=num_classes, global_pool=True,
                             drop_path_prob=0.1, num_experts=8, top_k=2,
                             capacity_factor=1.25)
    trained_model_path = ""

    train_criterion = LOSSES.create("OneHotLabelCELoss")
    test_criterion = LOSSES.create("CELoss")
    moe_aux_weight = 0.01  # load-balance + router-z (ST-MoE defaults)

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
                                                 "cls_token", "router"],
            "lr_layer_decay": 0.75,
            "lr_layer_decay_block_nums": 12,
            "block_name": "blocks",
        },
    )
    scheduler = ("CosineLR", {"warm_up_epochs": 5, "min_lr": 1e-6})

    epochs = 100
    print_interval = 100
    use_ema_model = False
