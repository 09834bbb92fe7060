"""Synthetic MoE-ViT classification smoke (beyond-parity: token-routed
mixture-of-experts FFN blocks, parallel/moe.py). Exercises the sown
load-balance aux loss through the standard engine loss path and, on a
multi-device mesh, expert-parallel sharding of the [E, ...] expert stacks."""

from simpleaicv_tpu.core.registry import BACKBONES, LOSSES
from simpleaicv_tpu.data.datasets import FakeClassificationDataset
from simpleaicv_tpu.data.collater import ClassificationCollater


class config:
    network = "vit_moe_tiny_patch16"
    num_classes = 10
    input_image_size = 64

    model = BACKBONES.create(network, num_classes=num_classes,
                             image_size=input_image_size, num_experts=4,
                             top_k=2)
    train_criterion = LOSSES.create("CELoss")
    test_criterion = LOSSES.create("CELoss")

    train_dataset = FakeClassificationDataset(
        num_samples=256, image_hw=64, num_classes=num_classes)
    test_dataset = FakeClassificationDataset(
        num_samples=64, image_hw=64, num_classes=num_classes)
    train_collater = ClassificationCollater()
    test_collater = ClassificationCollater()

    moe_aux_weight = 0.01  # load-balance + router-z aux loss weight

    seed = 0
    batch_size = 32
    num_workers = 2
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 3e-4, "global_weight_decay": False,
                           "weight_decay": 0.05,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 1, "min_lr": 1e-6})
    epochs = 3
    print_interval = 4
    use_ema_model = False
