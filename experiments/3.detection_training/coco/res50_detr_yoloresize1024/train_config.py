import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))

from path import COCO2017_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS, LOSSES, DECODERS
from simpleaicv_tpu.data.datasets import CocoDetection
from simpleaicv_tpu.data.detection import (DetectionResize,
                                           RandomHorizontalFlip, RandomCrop,
                                           Normalize, DETRDetectionCollater)
from simpleaicv_tpu.data.transforms import Compose


class config:
    """DETR R50 1024 (parity: reference
    3.detection_training/coco/res50_detr_yoloresize1024/train_config.py —
    500 epochs, MultiStepLR [400], backbone lr 1e-5, clip_max_norm 0.1)."""
    network = "resnet50_detr"
    num_classes = 80
    input_image_size = 1024

    model = MODELS.create(network, num_classes=num_classes)
    train_criterion = LOSSES.create("DETRLoss", num_classes=num_classes)
    decoder = DECODERS.create("DETRDecoder")

    train_dataset = CocoDetection(
        COCO2017_path, set_name="train2017", filter_no_object_image=True,
        transform=Compose([
            DetectionResize(resize=input_image_size,
                            resize_type="yolo_style", multi_scale=True),
            RandomHorizontalFlip(prob=0.5), RandomCrop(prob=0.5),
            Normalize()]))
    test_dataset = CocoDetection(
        COCO2017_path, set_name="val2017",
        transform=Compose([
            DetectionResize(resize=input_image_size,
                            resize_type="yolo_style"), Normalize()]))
    train_collater = DETRDetectionCollater(resize=input_image_size,
                                           resize_type="yolo_style")
    test_collater = DETRDetectionCollater(resize=input_image_size,
                                          resize_type="yolo_style")

    seed = 0
    batch_size = 64
    num_workers = 16
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 1e-4, "global_weight_decay": False,
                           "weight_decay": 1e-4,
                           "sub_layer_lr": {"backbone": 1e-5},
                           "no_weight_decay_layer_name_list": [],
                           "clip_max_norm": 0.1})
    scheduler = ("MultiStepLR", {"warm_up_epochs": 0, "gamma": 0.1,
                                 "milestones": [400]})
    epochs = 500
    print_interval = 100
    use_ema_model = False
