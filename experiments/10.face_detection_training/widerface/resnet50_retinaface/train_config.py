import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))

from path import face_detection_dataset_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS, LOSSES, DECODERS
from simpleaicv_tpu.data.datasets import FaceDetectionDataset
from simpleaicv_tpu.data.detection import (DetectionResize,
                                           RandomHorizontalFlip, Normalize,
                                           DetectionCollater)
from simpleaicv_tpu.data.transforms import Compose


class config:
    """RetinaFace R50 1024 (parity: reference; target WiderFace
    easy/med/hard 0.9369/0.9148/0.7801 @100ep)."""
    network = "resnet50_retinaface"
    num_classes = 1
    input_image_size = 1024

    model = MODELS.create(network)
    train_criterion = LOSSES.create("RetinaFaceLoss")
    decoder = DECODERS.create("RetinaFaceDecoder")

    train_dataset = FaceDetectionDataset(
        face_detection_dataset_path, set_name_list=["wider_face"],
        set_type="train",
        transform=Compose([
            DetectionResize(resize=input_image_size,
                            resize_type="yolo_style", multi_scale=True),
            RandomHorizontalFlip(prob=0.5), Normalize()]))
    test_dataset = FaceDetectionDataset(
        face_detection_dataset_path, set_name_list=["wider_face"],
        set_type="val",
        transform=Compose([
            DetectionResize(resize=input_image_size,
                            resize_type="yolo_style"), Normalize()]))
    train_collater = DetectionCollater(resize=input_image_size,
                                       resize_type="yolo_style")
    test_collater = DetectionCollater(resize=input_image_size,
                                      resize_type="yolo_style")

    seed = 0
    batch_size = 32
    num_workers = 16
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 1e-4, "global_weight_decay": False,
                           "weight_decay": 1e-3,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 1})
    epochs = 100
    print_interval = 100
    use_ema_model = False
