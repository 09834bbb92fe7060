"""PFAN salient-object detection on the combined DIS5K/HRS10K/HRSOD/UHRSD
sets (parity: reference
6.salient_object_detection_training/resnet50_pfan_segmentation/
train_config.py — 832x832, BCE+BCEIou 1:1, AdamW 1e-4 cosine)."""

import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))
from path import salient_object_detection_dataset_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.datasets.combined_folder import (
    SalientObjectDetectionDataset)
from simpleaicv_tpu.data.binary_segmentation import (
    BinarySegResize, BinarySegRandomHorizontalFlip, BinarySegNormalize,
    BinarySegCollater)
from simpleaicv_tpu.data.transforms import Compose

_SETS = ["DIS5K", "HRS10K", "HRSOD", "UHRSD"]


class config:
    network = "convformerm36_pfan_segmentation"
    input_image_size = 832

    backbone_pretrained_path = ""
    model = MODELS.create(network)
    train_criterion = None
    criterion_list = [
        ("BinaryBCELoss", 1.0, LOSSES.create("BinaryBCELoss")),
        ("BCEIouloss", 1.0, LOSSES.create("BCEIouloss")),
    ]

    train_dataset = SalientObjectDetectionDataset(
        salient_object_detection_dataset_path, set_name_list=_SETS,
        set_type="train",
        transform=Compose([BinarySegResize(resize=input_image_size),
                           BinarySegRandomHorizontalFlip(prob=0.5),
                           BinarySegNormalize()]))
    test_dataset = SalientObjectDetectionDataset(
        salient_object_detection_dataset_path, set_name_list=_SETS,
        set_type="val",
        transform=Compose([BinarySegResize(resize=input_image_size),
                           BinarySegNormalize()]))
    train_collater = BinarySegCollater(resize=input_image_size)
    test_collater = BinarySegCollater(resize=input_image_size)

    seed = 0
    batch_size = 96
    num_workers = 16
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 1e-4, "global_weight_decay": False,
                           "weight_decay": 1e-3,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 1, "min_lr": 1e-6})
    epochs = 100
    print_interval = 50
    use_ema_model = False

    mesh_data = -1
    mesh_fsdp = 1
