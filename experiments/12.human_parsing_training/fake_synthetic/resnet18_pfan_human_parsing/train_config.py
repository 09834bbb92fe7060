"""Synthetic face-parsing smoke experiment (mirrors the shape of reference
11.human_parsing_training/CelebAMask-HQ/resnet50_pfan_human_parsing/
train_config.py)."""

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.segmentation import (FakeSegmentationDataset,
                                              SegNormalize,
                                              SemanticSegmentationCollater)
from simpleaicv_tpu.data.transforms import Compose


class config:
    network = "resnet18_pfan_human_parsing"
    num_classes = 7  # incl. background
    input_image_size = 64
    ignore_index = 255

    model = MODELS.create(network, num_classes=num_classes)
    # reference parsing trains CELoss + IoULoss(softmax) at ratio 1:1
    train_criterion = LOSSES.create("SegCombinedLoss", loss_cfg=[
        ("SegCELoss", 1.0, {"ignore_index": ignore_index}),
        ("SegIoULoss", 1.0, {"logit_type": "softmax",
                             "ignore_index": ignore_index}),
    ])

    train_dataset = FakeSegmentationDataset(
        48, 64, num_classes, transform=Compose([SegNormalize()]))
    test_dataset = FakeSegmentationDataset(
        16, 64, num_classes, transform=Compose([SegNormalize()]))
    train_collater = SemanticSegmentationCollater(resize=input_image_size)
    test_collater = SemanticSegmentationCollater(resize=input_image_size)

    seed = 0
    batch_size = 8
    num_workers = 2
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 3e-4, "global_weight_decay": False,
                           "weight_decay": 1e-3,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 0, "min_lr": 1e-6})
    epochs = 2
    print_interval = 3
    use_ema_model = False
