"""YOLACT R50 COCO 1024 (parity: reference
5.instance_segmentation_training/coco/res50_yolact_yoloresize1024/
train_config.py — AdamW 1e-4, MultiStepLR [24,36] @39 epochs, bs 64)."""

import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))

from path import COCO2017_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS, LOSSES, DECODERS
from simpleaicv_tpu.data.datasets import CocoInstanceSegmentation
from simpleaicv_tpu.data.instance_segmentation import (
    InstanceSegmentationResize, InstanceRandomHorizontalFlip,
    InstanceNormalize, YOLACTInstanceSegmentationCollater)
from simpleaicv_tpu.data.transforms import Compose


class config:
    network = "resnet50_yolact"
    num_classes = 80
    input_image_size = 1024

    # YOLACT class head includes background at index 0
    model = MODELS.create(network, num_classes=num_classes + 1)
    train_criterion = LOSSES.create("YOLACTLoss", resize=input_image_size)
    decoder = DECODERS.create("YOLACTDecoder", resize=input_image_size)

    _train_transform = Compose([
        InstanceSegmentationResize(resize=input_image_size,
                                   resize_type="yolo_style",
                                   multi_scale=True),
        InstanceRandomHorizontalFlip(prob=0.5),
        InstanceNormalize(),
    ])
    _test_transform = Compose([
        InstanceSegmentationResize(resize=input_image_size,
                                   resize_type="yolo_style"),
        InstanceNormalize(),
    ])
    train_dataset = CocoInstanceSegmentation(
        COCO2017_path, set_name="train2017", filter_no_object_image=True,
        transform=_train_transform)
    test_dataset = CocoInstanceSegmentation(
        COCO2017_path, set_name="val2017", transform=_test_transform)
    train_collater = YOLACTInstanceSegmentationCollater(
        resize=input_image_size, resize_type="yolo_style")
    test_collater = YOLACTInstanceSegmentationCollater(
        resize=input_image_size, resize_type="yolo_style")

    seed = 0
    batch_size = 64
    num_workers = 16
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 1e-4, "global_weight_decay": False,
                           "weight_decay": 1e-3,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("MultiStepLR", {"warm_up_epochs": 1, "gamma": 0.1,
                                 "milestones": [24, 36]})
    epochs = 39
    print_interval = 100
    use_ema_model = False

    mesh_data = -1
    mesh_fsdp = 1
