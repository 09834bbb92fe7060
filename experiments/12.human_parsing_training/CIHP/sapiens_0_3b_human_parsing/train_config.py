"""[Sapiens-0.3B seg head — parity: reference 12.human_parsing_training/CIHP/sapiens_0_3b_human_parsing]
PFAN human parsing on CIHP (parity: reference
12.human_parsing_training/CIHP/sapiens_0_3b_human_parsing/
train_config.py — 512x512, 20 classes incl. background, CE+IoU 1:1,
AdamW 1e-4 cosine, 100 epochs)."""

import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))
from path import human_parsing_dataset_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.datasets.combined_folder import HumanParsingDataset
from simpleaicv_tpu.data.segmentation import (SegResize, SegNormalize,
                                              SegRandomHorizontalFlip,
                                              SemanticSegmentationCollater)
from simpleaicv_tpu.data.transforms import Compose


class config:
    network = "sapiens_0_3b_human_parsing"
    num_classes = 20  # incl. background
    input_image_size = 512
    ignore_index = 255

    backbone_pretrained_path = ""
    model = MODELS.create(network, num_classes=num_classes)

    train_criterion = LOSSES.create("SegCombinedLoss", loss_cfg=[
        ("SegCELoss", 1.0, {"ignore_index": ignore_index}),
        ("SegIoULoss", 1.0, {"logit_type": "softmax",
                             "ignore_index": ignore_index}),
    ])

    train_dataset = HumanParsingDataset(
        human_parsing_dataset_path, set_name_list=["CIHP"],
        set_type="train",
        transform=Compose([SegResize(resize=input_image_size),
                           SegRandomHorizontalFlip(prob=0.5),
                           SegNormalize()]))
    test_dataset = HumanParsingDataset(
        human_parsing_dataset_path, set_name_list=["CIHP"],
        set_type="val",
        transform=Compose([SegResize(resize=input_image_size),
                           SegNormalize()]))
    train_collater = SemanticSegmentationCollater(resize=input_image_size)
    test_collater = SemanticSegmentationCollater(resize=input_image_size)

    seed = 0
    batch_size = 192
    num_workers = 16
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 1e-4, "global_weight_decay": False,
                           "weight_decay": 1e-3,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 1, "min_lr": 1e-6})
    epochs = 100
    print_interval = 50
    save_interval = 10
    use_ema_model = False

    mesh_data = -1
    mesh_fsdp = 1
