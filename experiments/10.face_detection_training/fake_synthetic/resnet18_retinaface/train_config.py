"""Synthetic RetinaFace smoke (fake single-class boxes; CPU/TPU-runnable)."""

from simpleaicv_tpu.core.registry import MODELS, LOSSES, DECODERS
from simpleaicv_tpu.data.datasets.coco import FakeDetectionDataset
from simpleaicv_tpu.data.detection import (DetectionResize,
                                           RandomHorizontalFlip, Normalize,
                                           DetectionCollater)
from simpleaicv_tpu.data.transforms import Compose


class config:
    network = "resnet18_retinaface"
    num_classes = 1
    input_image_size = 128

    model = MODELS.create(network)
    train_criterion = LOSSES.create("RetinaFaceLoss")
    decoder = DECODERS.create("RetinaFaceDecoder")

    train_dataset = FakeDetectionDataset(
        num_samples=32, image_hw=160, num_classes=num_classes,
        transform=Compose([
            DetectionResize(resize=input_image_size,
                            resize_type="yolo_style"),
            RandomHorizontalFlip(prob=0.5), Normalize()]))
    test_dataset = FakeDetectionDataset(
        num_samples=16, image_hw=160, num_classes=num_classes,
        transform=Compose([
            DetectionResize(resize=input_image_size,
                            resize_type="yolo_style"), Normalize()]))
    train_collater = DetectionCollater(resize=input_image_size)
    test_collater = DetectionCollater(resize=input_image_size)

    seed = 0
    batch_size = 8
    num_workers = 2
    accumulation_steps = 1
    optimizer = ("SGD", {"lr": 0.01, "momentum": 0.9,
                         "global_weight_decay": False, "weight_decay": 5e-4,
                         "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 0})
    epochs = 2
    print_interval = 2
    use_ema_model = False
