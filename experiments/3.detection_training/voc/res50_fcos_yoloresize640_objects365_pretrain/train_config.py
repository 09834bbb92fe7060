"""[finetune from the Objects365 checkpoint — parity: reference 3.detection_training/voc/res50_fcos_yoloresize640_objects365_pretrain]
VOC FCOS ResNet-50, yolo-style 640 (parity: reference
3.detection_training/voc/res50_fcos_yoloresize640/train_config.py —
20 classes, 13 epochs, bs 32; VOC-style AP eval)."""

import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))
from path import VOCdataset_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS, LOSSES, DECODERS
from simpleaicv_tpu.data.datasets import VocDetection
from simpleaicv_tpu.data.detection import (DetectionResize,
                                           RandomHorizontalFlip, Normalize,
                                           DetectionCollater)
from simpleaicv_tpu.data.transforms import Compose


class config:
    network = "resnet50_fcos"
    num_classes = 20
    input_image_size = 640

    model = MODELS.create(network, num_classes=num_classes)
    trained_model_path = ""  # objects365-pretrained checkpoint

    train_criterion = LOSSES.create("FCOSLoss")
    decoder = DECODERS.create("FCOSDecoder")

    train_dataset = VocDetection(
        VOCdataset_path,
        image_sets=[("2007", "trainval"), ("2012", "trainval")],
        transform=Compose([
            DetectionResize(resize=input_image_size,
                            resize_type="yolo_style", multi_scale=True),
            RandomHorizontalFlip(prob=0.5),
            Normalize(),
        ]))
    test_dataset = VocDetection(
        VOCdataset_path, image_sets=[("2007", "test")],
        transform=Compose([
            DetectionResize(resize=input_image_size,
                            resize_type="yolo_style"),
            Normalize(),
        ]))
    train_collater = DetectionCollater(resize=input_image_size,
                                       resize_type="yolo_style")
    test_collater = DetectionCollater(resize=input_image_size,
                                      resize_type="yolo_style")

    seed = 0
    batch_size = 32
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
    scheduler = (
        "MultiStepLR",
        {
            "warm_up_epochs": 0.5,
            "gamma": 0.1,
            "milestones": [8, 12],
        },
    )

    epochs = 13
    print_interval = 100

    use_ema_model = False
