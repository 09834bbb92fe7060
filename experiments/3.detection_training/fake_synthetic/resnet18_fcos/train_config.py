"""Synthetic-data FCOS smoke experiment (CPU/TPU-runnable without COCO on
disk; mirrors the shape of reference
3.detection_training/coco/res50_fcos_retinaresize800/train_config.py)."""

from simpleaicv_tpu.core.registry import MODELS, LOSSES, DECODERS
from simpleaicv_tpu.data.datasets.coco import FakeDetectionDataset
from simpleaicv_tpu.data.detection import (DetectionResize,
                                           RandomHorizontalFlip, Normalize,
                                           DetectionCollater)
from simpleaicv_tpu.data.transforms import Compose


class config:
    network = "resnet18_fcos"
    num_classes = 8
    input_image_size = 128  # yolo-style square canvas

    model = MODELS.create(network, num_classes=num_classes)

    train_criterion = LOSSES.create("FCOSLoss")
    decoder = DECODERS.create("FCOSDecoder", topn=500, max_object_num=50)

    train_dataset = FakeDetectionDataset(
        num_samples=64, image_hw=160, num_classes=num_classes,
        transform=Compose([
            DetectionResize(resize=input_image_size, resize_type="yolo_style"),
            RandomHorizontalFlip(prob=0.5),
            Normalize(),
        ]))
    test_dataset = FakeDetectionDataset(
        num_samples=16, image_hw=160, num_classes=num_classes,
        transform=Compose([
            DetectionResize(resize=input_image_size, resize_type="yolo_style"),
            Normalize(),
        ]))
    train_collater = DetectionCollater(resize=input_image_size,
                                       resize_type="yolo_style")
    test_collater = DetectionCollater(resize=input_image_size,
                                      resize_type="yolo_style")

    seed = 0
    batch_size = 8
    num_workers = 2
    accumulation_steps = 1

    optimizer = ("AdamW", {"lr": 1e-4, "global_weight_decay": False,
                           "weight_decay": 1e-3,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 0, "min_lr": 1e-6})

    epochs = 2
    print_interval = 4
    use_ema_model = False
