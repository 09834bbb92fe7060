"""Synthetic DINO-DETR smoke experiment."""

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.datasets.coco import FakeDetectionDataset
from simpleaicv_tpu.data.detection import (DetectionResize,
                                           DETRDetectionCollater, Normalize)
from simpleaicv_tpu.data.transforms import Compose


class config:
    network = "resnet18_dinodetr"
    num_classes = 8
    input_image_size = 128

    model = MODELS.create(network, num_classes=num_classes, query_nums=20,
                          encoder_layer_nums=1, decoder_layer_nums=2,
                          hidden_inplanes=64, feedforward_planes=128,
                          dn_number=8)
    train_criterion = LOSSES.create("DINODETRLoss", num_classes=num_classes)

    train_dataset = FakeDetectionDataset(
        num_samples=16, image_hw=128, num_classes=num_classes,
        transform=Compose([
            DetectionResize(resize=input_image_size,
                            resize_type="yolo_style"),
            Normalize(),
        ]))
    test_dataset = None
    train_collater = DETRDetectionCollater(resize=input_image_size,
                                           resize_type="yolo_style",
                                           max_annots_num=4)
    test_collater = None

    seed = 0
    batch_size = 4
    num_workers = 2
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 1e-4, "global_weight_decay": False,
                           "weight_decay": 1e-4,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 0})
    epochs = 2
    print_interval = 2
    use_ema_model = False
