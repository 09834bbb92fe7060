"""[ConvFormer-M36 backbone — parity: reference 4.semantic_segmentation_training/ade20k/convformerm36_deeplabv3plus]
ADE20K DeepLabV3+ ResNet-50 (parity: reference
4.semantic_segmentation_training/ade20k — target mIoU 40.462 per
results.md:290-297)."""

import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))
from path import ADE20Kdataset_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.datasets import ADE20KDataset
from simpleaicv_tpu.data.segmentation import (SegRandomCropResize,
                                              SegRandomHorizontalFlip,
                                              SegPhotoMetricDistortion,
                                              SegNormalize, SegResize,
                                              SemanticSegmentationCollater)
from simpleaicv_tpu.data.transforms import Compose


class config:
    network = "convformerm36_deeplabv3plus"
    num_classes = 150
    input_image_size = 512
    ignore_index = 255

    model = MODELS.create(network, num_classes=num_classes)
    trained_model_path = ""
    train_criterion = LOSSES.create("SegCELoss", ignore_index=ignore_index)

    train_dataset = ADE20KDataset(
        ADE20Kdataset_path, image_sets="training",
        transform=Compose([
            SegRandomCropResize(image_scale=(2048, 512),
                                multi_scale_range=(0.5, 2.0),
                                crop_size=(input_image_size,
                                           input_image_size)),
            SegRandomHorizontalFlip(prob=0.5),
            SegPhotoMetricDistortion(),
            SegNormalize(),
        ]))
    test_dataset = ADE20KDataset(
        ADE20Kdataset_path, image_sets="validation",
        transform=Compose([
            SegResize(resize=input_image_size),
            SegNormalize(),
        ]))
    train_collater = SemanticSegmentationCollater(resize=input_image_size,
                                                  ignore_index=ignore_index)
    test_collater = SemanticSegmentationCollater(resize=input_image_size,
                                                 ignore_index=ignore_index)

    seed = 0
    batch_size = 16
    num_workers = 8
    accumulation_steps = 1

    optimizer = (
        "AdamW",
        {
            "lr": 1e-4,
            "global_weight_decay": False,
            "weight_decay": 1e-3,
            "no_weight_decay_layer_name_list": [],
        },
    )
    scheduler = ("PolyLR", {"warm_up_epochs": 1, "power": 0.9})

    epochs = 128
    print_interval = 100
    use_ema_model = False
