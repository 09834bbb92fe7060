"""[finetune from the Objects365 checkpoint — parity: reference 3.detection_training/coco/res50_fcos_retinaresize800_objects365_pretrain]
COCO FCOS ResNet-50, retina-style resize 800 (parity: reference
3.detection_training/coco/res50_fcos_retinaresize800/train_config.py —
13 epochs; target mAP 41.071 per results.md:221-233)."""

import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))
from path import COCO2017_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS, LOSSES, DECODERS
from simpleaicv_tpu.data.datasets import CocoDetection
from simpleaicv_tpu.data.detection import (DetectionResize,
                                           RandomHorizontalFlip, Normalize,
                                           DetectionCollater)
from simpleaicv_tpu.data.transforms import Compose


class config:
    network = "resnet50_fcos"
    num_classes = 80
    input_image_size = 800

    model = MODELS.create(network, num_classes=num_classes)
    trained_model_path = ""  # objects365-pretrained checkpoint

    train_criterion = LOSSES.create("FCOSLoss")
    decoder = DECODERS.create("FCOSDecoder")

    train_dataset = CocoDetection(
        COCO2017_path, set_name="train2017",
        filter_no_object_image=True,
        transform=Compose([
            DetectionResize(resize=input_image_size,
                            resize_type="retina_style", multi_scale=True),
            RandomHorizontalFlip(prob=0.5),
            Normalize(),
        ]))
    test_dataset = CocoDetection(
        COCO2017_path, set_name="val2017",
        transform=Compose([
            DetectionResize(resize=input_image_size,
                            resize_type="retina_style"),
            Normalize(),
        ]))
    train_collater = DetectionCollater(resize=input_image_size,
                                       resize_type="retina_style")
    test_collater = DetectionCollater(resize=input_image_size,
                                      resize_type="retina_style")

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
